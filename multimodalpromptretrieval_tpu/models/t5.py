"""From-scratch JAX T5 encoder-decoder with HF-parity numerics.

Re-implements the parts of ``transformers.T5ForConditionalGeneration`` that
the reference model uses (architectures/T5VisionModel.py:59,200,233):

  * encoder over ``inputs_embeds`` (image-prefix + token embeddings),
  * teacher-forced decoder + CE loss with -100 label masking,
  * greedy ``generate(max_new_tokens=N)`` as a single ``lax.while_loop``
    with a preallocated KV cache (one jit for prefill + decode).

Numerical semantics matched against HF (tests/test_t5_parity.py runs both
on shared random weights):

  * RMS norm with fp32 reduction (T5LayerNorm);
  * **unscaled** attention logits (the 1/sqrt(d) is folded into T5's weights);
  * relative position bias (32 buckets, max distance 128), bidirectional in
    the encoder, unidirectional in the decoder, **no bias on cross-attention**;
  * decoder self-attention uses a causal mask only — HF builds an all-ones
    padding mask when none is passed, and the reference never passes one;
  * tied LM head with the ``d_model ** -0.5`` output scaling;
  * greedy decode starts from ``decoder_start_token_id`` (= pad = 0), stops
    per-sequence at EOS (= 1) and pads the remainder with pad tokens.

Layers are stored stacked on a leading axis and executed with ``lax.scan``
— one compiled block regardless of depth, TPU-friendly compile times.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from multimodalpromptretrieval_tpu.ops.attention import multi_head_attention
from multimodalpromptretrieval_tpu.ops.decode_attention import (
    block_attention_indicator,
    decode_attention,
    decode_attention_fused,
    decode_attention_indicator,
    decode_attention_reference,
)
from multimodalpromptretrieval_tpu.ops.layers import (
    dense,
    dropout as _dropout,
    gelu_new,
    rms_norm,
)
from multimodalpromptretrieval_tpu.ops.quant import kconcat, kout_dim, kslice

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 512
    d_kv: int = 64
    d_ff: int = 2048
    num_layers: int = 6
    num_decoder_layers: int = 6
    num_heads: int = 8
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_epsilon: float = 1e-6
    feed_forward_proj: str = "relu"  # "relu" | "gated-gelu"
    pad_token_id: int = 0
    eos_token_id: int = 1
    decoder_start_token_id: int = 0
    dropout_rate: float = 0.1
    # TPU execution knobs (not part of HF parity):
    attention_impl: str = "xla"  # "xla" | "pallas" | "auto"
    # Decode-loop single-query attention. Measured on v5e (B=512,
    # docs/TPU_NOTES.md): the XLA einsum path wins by ~8x — the Pallas
    # flat-2D kernel is sequencer-bound at Lq=1 (12 tiny grid launches
    # per step) — so "xla" is the default; "pallas" stays available for
    # re-evaluation on other topologies.
    # "indicator" (row caches + 0/1 head-indicator MXU dots; measured
    # 37.3 -> 23.9 ms per 20-step B=512 decode on v5e, greedy ids
    # identical) | "xla" (head-layout caches + einsum; the parity
    # reference) | "pallas" (fused row kernel; sequencer-bound here)
    decode_attention_impl: str = "indicator"
    # Decode-loop layer iteration. "unroll" (default): layers statically
    # unrolled so the KV caches stay direct while_loop carry members and
    # XLA proves the dynamic_update_slice chains in-place — fastest, but
    # the serialized HLO grows with depth (t5-base/large graphs exceed
    # this environment's remote-compile upload limit, HTTP 413 —
    # docs/TPU_NOTES.md). "scan": one lax.scan over the stacked layers —
    # tiny HLO at any depth, at the documented cost of re-stacking the
    # scanned caches every step (~2x cache HBM traffic per token).
    decode_layers: str = "unroll"  # "unroll" | "scan"
    remat: bool = False  # jax.checkpoint each layer (activation recompute)

    @property
    def inner_dim(self) -> int:
        return self.num_heads * self.d_kv

    @staticmethod
    def t5_small() -> "T5Config":
        return T5Config()

    @staticmethod
    def t5_base() -> "T5Config":
        return T5Config(d_model=768, d_ff=3072, num_layers=12,
                        num_decoder_layers=12, num_heads=12)

    @staticmethod
    def t5_large() -> "T5Config":
        return T5Config(d_model=1024, d_ff=4096, num_layers=24,
                        num_decoder_layers=24, num_heads=16)

    @staticmethod
    def from_version(version: str) -> "T5Config":
        """Map the reference's ``T5_version`` config key to a config."""
        if "large" in version:
            return T5Config.t5_large()
        if "base" in version:
            return T5Config.t5_base()
        return T5Config.t5_small()

    @staticmethod
    def tiny(vocab_size: int = 128) -> "T5Config":
        """Small config for unit tests."""
        return T5Config(vocab_size=vocab_size, d_model=32, d_kv=8, d_ff=64,
                        num_layers=2, num_decoder_layers=2, num_heads=4)


# ---------------------------------------------------------------------------
# Parameter init
# ---------------------------------------------------------------------------


def _init_attn(key, cfg: T5Config, d_model: int) -> Params:
    kq, kk, kv, ko = jax.random.split(key, 4)
    # T5's "factor" init: q scaled by (d_model * d_kv) ** -0.5 etc.
    def n(k, shape, std):
        return (jax.random.normal(k, shape, jnp.float32) * std)

    return {
        "q": n(kq, (d_model, cfg.inner_dim), (d_model * cfg.d_kv) ** -0.5),
        "k": n(kk, (d_model, cfg.inner_dim), d_model**-0.5),
        "v": n(kv, (d_model, cfg.inner_dim), d_model**-0.5),
        "o": n(ko, (cfg.inner_dim, d_model), cfg.inner_dim**-0.5),
    }


def _init_ff(key, cfg: T5Config) -> Params:
    k0, k1, k2 = jax.random.split(key, 3)
    std_in = cfg.d_model**-0.5
    std_out = cfg.d_ff**-0.5
    if cfg.feed_forward_proj == "gated-gelu":
        return {
            "wi_0": jax.random.normal(k0, (cfg.d_model, cfg.d_ff)) * std_in,
            "wi_1": jax.random.normal(k1, (cfg.d_model, cfg.d_ff)) * std_in,
            "wo": jax.random.normal(k2, (cfg.d_ff, cfg.d_model)) * std_out,
        }
    return {
        "wi": jax.random.normal(k0, (cfg.d_model, cfg.d_ff)) * std_in,
        "wo": jax.random.normal(k2, (cfg.d_ff, cfg.d_model)) * std_out,
    }


def init_t5(key, cfg: T5Config) -> Params:
    """Random init (T5 'factor' scheme). Converters overwrite this layout."""
    keys = jax.random.split(key, 8)

    def stack(fn, n, key):
        ks = jax.random.split(key, n)
        return jax.tree.map(lambda *xs: jnp.stack(xs), *[fn(k) for k in ks])

    def enc_layer(k):
        k1, k2 = jax.random.split(k)
        return {
            "attn": _init_attn(k1, cfg, cfg.d_model),
            "attn_ln": jnp.ones((cfg.d_model,)),
            "ff": _init_ff(k2, cfg),
            "ff_ln": jnp.ones((cfg.d_model,)),
        }

    def dec_layer(k):
        k1, k2, k3 = jax.random.split(k, 3)
        return {
            "self_attn": _init_attn(k1, cfg, cfg.d_model),
            "self_ln": jnp.ones((cfg.d_model,)),
            "cross_attn": _init_attn(k2, cfg, cfg.d_model),
            "cross_ln": jnp.ones((cfg.d_model,)),
            "ff": _init_ff(k3, cfg),
            "ff_ln": jnp.ones((cfg.d_model,)),
        }

    return {
        "shared": jax.random.normal(keys[0], (cfg.vocab_size, cfg.d_model)) * 1.0,
        "encoder": {
            "block": stack(enc_layer, cfg.num_layers, keys[1]),
            "rel_bias": jax.random.normal(
                keys[2], (cfg.relative_attention_num_buckets, cfg.num_heads)
            ) * (cfg.inner_dim**-0.5),
            "final_ln": jnp.ones((cfg.d_model,)),
        },
        "decoder": {
            "block": stack(dec_layer, cfg.num_decoder_layers, keys[3]),
            "rel_bias": jax.random.normal(
                keys[4], (cfg.relative_attention_num_buckets, cfg.num_heads)
            ) * (cfg.inner_dim**-0.5),
            "final_ln": jnp.ones((cfg.d_model,)),
        },
    }


# ---------------------------------------------------------------------------
# Relative position bias
# ---------------------------------------------------------------------------


def relative_position_bucket(
    relative_position: jnp.ndarray, *, bidirectional: bool,
    num_buckets: int, max_distance: int,
) -> jnp.ndarray:
    """HF T5's bucketing, in int32. relative_position = key_pos - query_pos."""
    rel = relative_position
    bucket = jnp.zeros_like(rel)
    if bidirectional:
        num_buckets //= 2
        bucket = bucket + (rel > 0).astype(jnp.int32) * num_buckets
        rel = jnp.abs(rel)
    else:
        rel = -jnp.minimum(rel, 0)
    max_exact = num_buckets // 2
    is_small = rel < max_exact
    rel_f = jnp.maximum(rel.astype(jnp.float32), 1.0)
    large = max_exact + (
        jnp.log(rel_f / max_exact)
        / jnp.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    large = jnp.minimum(large, num_buckets - 1)
    return bucket + jnp.where(is_small, rel, large)


def compute_position_bias(
    rel_bias_table: jnp.ndarray, q_len: int, k_len: int, *,
    bidirectional: bool, cfg: T5Config,
) -> jnp.ndarray:
    """Returns (1, H, q_len, k_len) additive bias."""
    ctx = jax.lax.broadcasted_iota(jnp.int32, (q_len, k_len), 0)
    mem = jax.lax.broadcasted_iota(jnp.int32, (q_len, k_len), 1)
    buckets = relative_position_bucket(
        mem - ctx, bidirectional=bidirectional,
        num_buckets=cfg.relative_attention_num_buckets,
        max_distance=cfg.relative_attention_max_distance,
    )
    bias = rel_bias_table[buckets]  # (q, k, H)
    return jnp.transpose(bias, (2, 0, 1))[None]


# ---------------------------------------------------------------------------
# Blocks
# ---------------------------------------------------------------------------


def _attention_block(p: Params, cfg: T5Config, x_q, x_kv, *, bias, kv_mask,
                     causal, tp_axis=None):
    """One attention sub-block.

    ``tp_axis``: Megatron-style tensor parallelism inside ``shard_map``
    (parallel/pipeline.py TP×PP composition): the q/k/v kernels arrive
    column-sharded over that mesh axis (this rank holds H_local =
    kernel_cols / d_kv heads — derived from the param shape, so the same
    code serves the unsharded case), the o kernel row-sharded, and the
    partial o-projection outputs are psum-merged so the block's output
    is replicated across the axis. ``bias`` must already be the local
    heads' rows (shard the rel_bias table's head dim over the axis).
    Under pjit (tp_axis=None) GSPMD derives the same collectives from
    the param shardings instead (parallel/mesh.param_shardings)."""
    B, Lq, _ = x_q.shape
    Lk = x_kv.shape[1]
    Dk = cfg.d_kv
    # local head count (== cfg.num_heads unsharded); kout_dim handles
    # int8-quantized kernel dicts (ops/quant)
    H = kout_dim(p["q"]) // Dk

    def split_heads(y, L):
        return jnp.transpose(y.reshape(B, L, H, Dk), (0, 2, 1, 3))

    q = split_heads(dense(x_q, p["q"]), Lq)
    k = split_heads(dense(x_kv, p["k"]), Lk)
    v = split_heads(dense(x_kv, p["v"]), Lk)
    o = multi_head_attention(
        q, k, v, bias=bias, kv_mask=kv_mask, causal=causal,
        scale=1.0, impl=cfg.attention_impl,
    )
    o = jnp.transpose(o, (0, 2, 1, 3)).reshape(B, Lq, H * Dk)
    o = dense(o, p["o"])
    if tp_axis is not None:
        o = jax.lax.psum(o, tp_axis)
    return o


def _ff_block(p: Params, cfg: T5Config, x, rate: float = 0.0, rng=None,
              tp_axis=None):
    """FF sub-block; with ``tp_axis`` the wi kernel(s) are column-sharded
    and wo row-sharded over that shard_map axis, partials psum-merged.
    The activation dropout then acts on the d_ff shard — each rank draws
    from the same (replicated) key, which is still a valid independent
    mask per hidden unit (dropout bits are not a parity surface)."""
    if cfg.feed_forward_proj == "gated-gelu":
        h = gelu_new(dense(x, p["wi_0"])) * dense(x, p["wi_1"])
    else:
        h = jax.nn.relu(dense(x, p["wi"]))
    h = _dropout(h, rate, rng)  # HF T5DenseActDense: dropout after act
    h = dense(h, p["wo"])
    if tp_axis is not None:
        h = jax.lax.psum(h, tp_axis)
    return h


def encoder_block(p: Params, cfg: T5Config, x, *, bias, kv_mask, rng=None,
                  tp_axis=None):
    """One encoder block (pre-LN self-attention + FF with residuals).

    The single source of truth for the encoder layer math: the scan in
    :func:`t5_encode` and the pipeline-parallel stages
    (parallel/pipeline.py) both call this. Returns ``(x, rng)`` with the
    rng advanced past this layer's dropout draws (HF stream order).
    ``tp_axis`` tensor-parallelizes the sub-blocks inside shard_map (see
    :func:`_attention_block`); the residual stream stays replicated
    across that axis, and the post-sub-block dropouts draw replicated
    keys so every rank applies the identical mask.
    """
    rate = cfg.dropout_rate
    r1 = r2 = r3 = None
    if rng is not None:
        rng, r1, r2, r3 = jax.random.split(rng, 4)
    h = rms_norm(x, p["attn_ln"], cfg.layer_norm_epsilon)
    x = x + _dropout(_attention_block(p["attn"], cfg, h, h, bias=bias,
                                      kv_mask=kv_mask, causal=False,
                                      tp_axis=tp_axis),
                     rate, r1)
    h = rms_norm(x, p["ff_ln"], cfg.layer_norm_epsilon)
    x = x + _dropout(_ff_block(p["ff"], cfg, h, rate=rate, rng=r2,
                               tp_axis=tp_axis),
                     rate, r3)
    return x, rng


def decoder_block(p: Params, cfg: T5Config, x, *, encoder_hidden, bias,
                  enc_kv_mask, rng=None, tp_axis=None):
    """One decoder block (causal self-attn + cross-attn + FF).

    Shared by the :func:`t5_decode_train` scan/unrolled paths and the
    pipeline-parallel stages. Decoder self-attention is causal with no
    padding mask (HF default — see t5_decode_train). Returns ``(x, rng)``.
    ``tp_axis``: see :func:`encoder_block`.
    """
    rate = cfg.dropout_rate
    r1 = r2 = r3 = r4 = None
    if rng is not None:
        rng, r1, r2, r3, r4 = jax.random.split(rng, 5)
    h = rms_norm(x, p["self_ln"], cfg.layer_norm_epsilon)
    x = x + _dropout(_attention_block(p["self_attn"], cfg, h, h,
                                      bias=bias, kv_mask=None,
                                      causal=True, tp_axis=tp_axis),
                     rate, r1)
    h = rms_norm(x, p["cross_ln"], cfg.layer_norm_epsilon)
    x = x + _dropout(_attention_block(p["cross_attn"], cfg, h,
                                      encoder_hidden, bias=None,
                                      kv_mask=enc_kv_mask,
                                      causal=False, tp_axis=tp_axis),
                     rate, r2)
    h = rms_norm(x, p["ff_ln"], cfg.layer_norm_epsilon)
    x = x + _dropout(_ff_block(p["ff"], cfg, h, rate=rate, rng=r3,
                               tp_axis=tp_axis),
                     rate, r4)
    return x, rng


def t5_encode(
    params: Params, cfg: T5Config, inputs_embeds: jnp.ndarray,
    attention_mask: Optional[jnp.ndarray] = None,
    dropout_rng=None,
) -> jnp.ndarray:
    """Encoder stack over raw input embeddings. attention_mask: (B, L) in {0,1}.

    ``dropout_rng`` enables HF-style training dropout (rate
    cfg.dropout_rate) at the T5Stack points: input embeddings, each
    sublayer output before the residual add, the FF hidden after the
    activation, and the final hidden state. The reference trains with HF's
    default 0.1 active (main.py:170 ``model.train()``); eval is
    deterministic (rng=None).
    """
    enc = params["encoder"]
    L = inputs_embeds.shape[1]
    bias = compute_position_bias(enc["rel_bias"], L, L, bidirectional=True, cfg=cfg)
    kv_mask = None if attention_mask is None else attention_mask.astype(bool)
    rate = cfg.dropout_rate
    x0 = _dropout(inputs_embeds, rate, dropout_rng)

    if cfg.attention_impl == "row":
        # TPU fast path (see models/clip._transformer and docs/TPU_NOTES.md):
        # unrolled layers + (B·L, D) activations so every dense is one large
        # MXU GEMM (scan's dynamic weight slices force a windowed batched
        # emitter at ~6% peak), attention in the row-layout Pallas kernel
        # with the relative-position bias resident in VMEM. Differentiable
        # (row_attention has a custom VJP); math identical to the scan path.
        from multimodalpromptretrieval_tpu.ops.norm import fused_rms_norm
        from multimodalpromptretrieval_tpu.ops.row_attention import (
            row_attention_packed,
        )

        B = inputs_embeds.shape[0]
        D = cfg.d_model
        W = cfg.inner_dim
        interpret = jax.default_backend() == "cpu"
        n_layers = cfg.num_layers
        x = x0.reshape(B * L, D)
        bias_h = bias[0]  # (H, L, L)
        mask = None if attention_mask is None else attention_mask
        rng = dropout_rng
        # One fused q/k/v GEMM per layer; the packed kernel slices the
        # lane-aligned [q | k | v] column groups in VMEM (no split copies).
        # kconcat/kslice keep the packing working when the kernels are
        # int8-quantized dicts (ops/quant; per-out-channel scales
        # concatenate along the packed axis).
        qkv_w = kconcat(
            [enc["block"]["attn"]["q"], enc["block"]["attn"]["k"],
             enc["block"]["attn"]["v"]], axis=2)  # (Lyrs, D, 3W)
        def row_layer(x, p, qkv_li, r1, r2, r3):
            h = fused_rms_norm(x, p["attn_ln"], cfg.layer_norm_epsilon)
            qkv = dense(h, qkv_li).reshape(B, L, 3 * W)
            o = row_attention_packed(qkv, bias_h, mask,
                                     heads=cfg.num_heads, scale=1.0,
                                     interpret=interpret)
            o = dense(o.reshape(B * L, W), p["attn"]["o"])
            x = x + _dropout(o, rate, r1)
            h = fused_rms_norm(x, p["ff_ln"], cfg.layer_norm_epsilon)
            return x + _dropout(_ff_block(p["ff"], cfg, h, rate=rate,
                                          rng=r2), rate, r3)

        if cfg.remat:
            # same flag the scan path honors below: recompute each
            # layer's activations in backward instead of keeping them
            row_layer = jax.checkpoint(row_layer)
        for li in range(n_layers):
            p = jax.tree.map(lambda a: a[li], enc["block"])
            r1 = r2 = r3 = None
            if rng is not None:
                rng, r1, r2, r3 = jax.random.split(rng, 4)
            x = row_layer(x, p, kslice(qkv_w, li), r1, r2, r3)
        x = fused_rms_norm(x, enc["final_ln"], cfg.layer_norm_epsilon)
        x = _dropout(x, rate, None if dropout_rng is None
                     else jax.random.fold_in(dropout_rng, 1))
        return x.reshape(B, L, D)

    def layer(carry, inp):
        x, rng = carry
        x, rng = encoder_block(inp, cfg, x, bias=bias, kv_mask=kv_mask,
                               rng=rng)
        return (x, rng), None

    if cfg.remat:
        layer = jax.checkpoint(layer)
    (x, _), _ = jax.lax.scan(layer, (x0, dropout_rng), enc["block"])
    x = rms_norm(x, enc["final_ln"], cfg.layer_norm_epsilon)
    return _dropout(x, rate, None if dropout_rng is None
                    else jax.random.fold_in(dropout_rng, 1))


def t5_decode_train(
    params: Params, cfg: T5Config, encoder_hidden: jnp.ndarray,
    encoder_mask: Optional[jnp.ndarray], decoder_input_ids: jnp.ndarray,
    dropout_rng=None,
) -> jnp.ndarray:
    """Teacher-forced decoder. Returns LM logits (B, T, V) in fp32.

    Decoder self-attention is causal with no padding mask (HF default when
    the caller does not pass decoder_attention_mask — the reference never
    does, architectures/T5VisionModel.py:233).
    """
    dec = params["decoder"]
    T = decoder_input_ids.shape[1]
    rate = cfg.dropout_rate
    x = params["shared"][decoder_input_ids]
    x = _dropout(x, rate, None if dropout_rng is None
                 else jax.random.fold_in(dropout_rng, 4))
    bias = compute_position_bias(dec["rel_bias"], T, T, bidirectional=False, cfg=cfg)
    enc_kv_mask = None if encoder_mask is None else encoder_mask.astype(bool)

    def layer(carry, inp):
        x, rng = carry
        x, rng = decoder_block(inp, cfg, x, encoder_hidden=encoder_hidden,
                               bias=bias, enc_kv_mask=enc_kv_mask, rng=rng)
        return (x, rng), None

    if cfg.remat:
        layer = jax.checkpoint(layer)
    rng0 = (None if dropout_rng is None
            else jax.random.fold_in(dropout_rng, 2))
    if cfg.attention_impl == "row":
        # TPU fast path: statically unrolled layers — under lax.scan the
        # dynamically-sliced weights force the windowed batched-GEMM
        # emitter (~6% peak; the same pathology as the ViT scan,
        # docs/TPU_NOTES.md). Same math/rng stream as the scan below.
        carry = (x, rng0)
        for li in range(cfg.num_decoder_layers):
            carry, _ = layer(carry, jax.tree.map(
                lambda a, li=li: a[li], dec["block"]))
        x = carry[0]
    else:
        (x, _), _ = jax.lax.scan(layer, (x, rng0), dec["block"])
    x = rms_norm(x, dec["final_ln"], cfg.layer_norm_epsilon)
    x = _dropout(x, rate, None if dropout_rng is None
                 else jax.random.fold_in(dropout_rng, 3))
    x = x * (cfg.d_model**-0.5)  # tied-embedding output scaling
    logits = jnp.dot(x, params["shared"].T.astype(x.dtype))
    return logits.astype(jnp.float32)


def shift_right(labels: jnp.ndarray, cfg: T5Config) -> jnp.ndarray:
    """HF _shift_right: prepend decoder_start, drop last, -100 -> pad."""
    shifted = jnp.concatenate(
        [jnp.full((labels.shape[0], 1), cfg.decoder_start_token_id, labels.dtype),
         labels[:, :-1]], axis=1)
    return jnp.where(shifted == -100, cfg.pad_token_id, shifted)


def t5_loss(
    params: Params, cfg: T5Config, inputs_embeds: jnp.ndarray,
    attention_mask: Optional[jnp.ndarray], labels: jnp.ndarray,
    dropout_rng=None,
) -> jnp.ndarray:
    """Cross-entropy with -100 ignore, mean over valid tokens (HF parity).
    Pass ``dropout_rng`` during training for HF-style dropout."""
    enc = t5_encode(params, cfg, inputs_embeds, attention_mask, dropout_rng)
    logits = t5_decode_train(params, cfg, enc, attention_mask,
                             shift_right(labels, cfg), dropout_rng)
    valid = labels != -100
    safe_labels = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    token_ll = jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    return -jnp.sum(token_ll * valid) / jnp.maximum(jnp.sum(valid), 1)


def _attention_probs(p: Params, cfg: T5Config, x_q, x_kv, *, bias, kv_mask,
                     causal):
    """Like _attention_block but also returns the softmax probabilities —
    the diagnostic path behind HF's output_attentions=True (used by the
    attention-viz eval mode, reference utils.py:127-284). XLA-only."""
    B, Lq, _ = x_q.shape
    Lk = x_kv.shape[1]
    H, Dk = cfg.num_heads, cfg.d_kv

    def split_heads(y, L):
        return jnp.transpose(y.reshape(B, L, H, Dk), (0, 2, 1, 3))

    q = split_heads(dense(x_q, p["q"]), Lq)
    k = split_heads(dense(x_kv, p["k"]), Lk)
    v = split_heads(dense(x_kv, p["v"]), Lk)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32)
    if bias is not None:
        scores = scores + bias.astype(jnp.float32)
    if kv_mask is not None:
        scores = jnp.where(kv_mask[:, None, None, :], scores, -1e9)
    if causal:
        qi = jax.lax.broadcasted_iota(jnp.int32, (Lq, Lk), 0)
        ki = jax.lax.broadcasted_iota(jnp.int32, (Lq, Lk), 1)
        scores = jnp.where((ki <= qi)[None, None], scores, -1e9)
    probs = jax.nn.softmax(scores, axis=-1)
    o = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(q.dtype), v)
    o = jnp.transpose(o, (0, 2, 1, 3)).reshape(B, Lq, H * Dk)
    return dense(o, p["o"]), probs


def t5_forward_with_attentions(
    params: Params, cfg: T5Config, inputs_embeds: jnp.ndarray,
    attention_mask: Optional[jnp.ndarray], decoder_input_ids: jnp.ndarray,
):
    """Full teacher-forced forward returning every attention map.

    Returns dict with ``encoder_attentions`` (L, B, H, Lsrc, Lsrc),
    ``decoder_attentions`` (L, B, H, T, T), ``cross_attentions``
    (L, B, H, T, Lsrc) and ``logits`` — the JAX analogue of HF
    ``output_attentions=True`` that the viz mode consumes.
    """
    enc = params["encoder"]
    dec = params["decoder"]
    L = inputs_embeds.shape[1]
    T = decoder_input_ids.shape[1]
    kv_mask = None if attention_mask is None else attention_mask.astype(bool)
    enc_bias = compute_position_bias(enc["rel_bias"], L, L,
                                     bidirectional=True, cfg=cfg)

    def enc_layer(x, p):
        h = rms_norm(x, p["attn_ln"], cfg.layer_norm_epsilon)
        a, probs = _attention_probs(p["attn"], cfg, h, h, bias=enc_bias,
                                    kv_mask=kv_mask, causal=False)
        x = x + a
        h = rms_norm(x, p["ff_ln"], cfg.layer_norm_epsilon)
        x = x + _ff_block(p["ff"], cfg, h)
        return x, probs

    x, enc_attn = jax.lax.scan(enc_layer, inputs_embeds, enc["block"])
    enc_hidden = rms_norm(x, enc["final_ln"], cfg.layer_norm_epsilon)

    dec_bias = compute_position_bias(dec["rel_bias"], T, T,
                                     bidirectional=False, cfg=cfg)
    y = params["shared"][decoder_input_ids]

    def dec_layer(y, p):
        h = rms_norm(y, p["self_ln"], cfg.layer_norm_epsilon)
        a, self_probs = _attention_probs(p["self_attn"], cfg, h, h,
                                         bias=dec_bias, kv_mask=None,
                                         causal=True)
        y = y + a
        h = rms_norm(y, p["cross_ln"], cfg.layer_norm_epsilon)
        a, cross_probs = _attention_probs(p["cross_attn"], cfg, h,
                                          enc_hidden, bias=None,
                                          kv_mask=kv_mask, causal=False)
        y = y + a
        h = rms_norm(y, p["ff_ln"], cfg.layer_norm_epsilon)
        y = y + _ff_block(p["ff"], cfg, h)
        return y, (self_probs, cross_probs)

    y, (dec_attn, cross_attn) = jax.lax.scan(dec_layer, y, dec["block"])
    y = rms_norm(y, dec["final_ln"], cfg.layer_norm_epsilon)
    y = y * (cfg.d_model**-0.5)
    logits = jnp.dot(y, params["shared"].T.astype(y.dtype))
    return {
        "encoder_attentions": enc_attn,
        "decoder_attentions": dec_attn,
        "cross_attentions": cross_attn,
        "logits": logits.astype(jnp.float32),
        "encoder_hidden": enc_hidden,
    }


# ---------------------------------------------------------------------------
# Greedy decode: one jit for the whole while_loop with preallocated KV cache
# ---------------------------------------------------------------------------


def _precompute_cross_kv(params, cfg, encoder_hidden):
    """Cross-attention K/V depend only on encoder output: compute once.

    Row layout (Lyrs, B, Lk, W) — exactly what the projections produce;
    the old (Lyrs, B, H, Lk, Dh) head split cost two full-cache layout
    copies per decode call (HLO copy.88/copy.90, ~3 ms at B=512)."""
    def per_layer(p):
        return (dense(encoder_hidden, p["cross_attn"]["k"]),
                dense(encoder_hidden, p["cross_attn"]["v"]))

    return jax.vmap(per_layer)(params["decoder"]["block"])


def t5_greedy_decode(
    params: Params, cfg: T5Config, encoder_hidden: jnp.ndarray,
    encoder_mask: Optional[jnp.ndarray], max_new_tokens: int = 20,
    early_stop: bool = True,
) -> jnp.ndarray:
    """Greedy generation. Returns (B, 1 + max_new_tokens) int32 sequences
    beginning with decoder_start_token_id; positions after EOS are pad.

    Matches HF ``generate(inputs_embeds=..., do_sample=False,
    max_new_tokens=N)`` (architectures/T5VisionModel.py:200-205).

    TPU shape discipline (decode is bandwidth/latency-bound): activations
    stay 2-D (B, D) rows, per-layer q/k/v fused into one GEMM, argmax on
    the compute-dtype logits. ``cfg.decode_attention_impl`` picks the
    per-step attention + cache layout:

      * "indicator" (default): row-layout (B, T, W) caches + 0/1
        head-indicator MXU dots (ops/decode_attention.py) — the measured
        winner on v5e (23.9 vs 37.3 ms for 20 steps at B=512, greedy ids
        identical). Kills both the kLoop matvec fusions (~92 us each,
        >half the step) and the cross-K/V head-split copies;
      * "xla": head-layout (B, H, T, Dh) caches + the XLA einsum — the
        parity reference (exact _attention_xla semantics);
      * "pallas": row-layout caches + the fused single-query Pallas
        kernel — kept for re-evaluation on other topologies; measured
        sequencer-bound here (docs/TPU_NOTES.md).
    """
    dec = params["decoder"]
    B = encoder_hidden.shape[0]
    H, Lyrs = cfg.num_heads, cfg.num_decoder_layers
    W = cfg.inner_dim
    Dh = cfg.d_kv
    T = max_new_tokens
    interpret = jax.default_backend() == "cpu"
    row = cfg.decode_attention_impl in ("pallas", "indicator", "fused")
    if cfg.decode_attention_impl == "pallas":
        attend = functools.partial(decode_attention, interpret=interpret)
    elif cfg.decode_attention_impl == "fused":
        attend = functools.partial(decode_attention_fused,
                                   interpret=interpret)
    elif cfg.decode_attention_impl == "indicator":
        attend = decode_attention_indicator
    else:
        attend = decode_attention_reference

    cross_k, cross_v = _precompute_cross_kv(params, cfg, encoder_hidden)
    if not row:
        # one-time head split (Lyrs, B, Lk, W) -> (Lyrs, B, H, Lk, Dh):
        # a full-cache layout copy per decode call, amortized over the
        # T per-step attentions that read it
        def heads_of(a):
            L = a.shape[2]
            return jnp.transpose(
                a.reshape(Lyrs, B, L, H, Dh), (0, 1, 3, 2, 4))
        cross_k, cross_v = heads_of(cross_k), heads_of(cross_v)
    enc_kv_mask = (None if encoder_mask is None
                   else encoder_mask.astype(jnp.int32))
    # Full causal decoder position bias, sliced per step: (H, T, T).
    full_bias = compute_position_bias(dec["rel_bias"], T, T,
                                      bidirectional=False, cfg=cfg)[0]
    # Fuse the per-layer self-attention q/k/v projections into one matmul
    # per decode step: (Lyrs, D, 3·W). The MXU sees one larger GEMM
    # instead of three skinny ones; q/k/v come out as lane-aligned
    # column slices of the result. kconcat/kslice keep this working for
    # int8-quantized kernels (ops/quant).
    qkv_w = kconcat(
        [dec["block"]["self_attn"]["q"], dec["block"]["self_attn"]["k"],
         dec["block"]["self_attn"]["v"]], axis=2)

    cache_shape = ((Lyrs, B, T, W) if row else (Lyrs, B, H, T, Dh))
    self_k = jnp.zeros(cache_shape, encoder_hidden.dtype)
    self_v = jnp.zeros_like(self_k)
    tokens = jnp.full((B, T + 1), cfg.pad_token_id, jnp.int32)
    tokens = tokens.at[:, 0].set(cfg.decoder_start_token_id)
    finished = jnp.zeros((B,), bool)

    def step_fn(state):
        t, tokens, self_k, self_v, finished = state
        cur = tokens[jnp.arange(B), t]  # current input token (B,)
        x = params["shared"][cur]  # (B, D)

        # keys 0..t are populated; the validity mask is batch-invariant so
        # it folds into the additive bias row (one fused (H, T) input)
        kv_valid = (jax.lax.broadcasted_iota(jnp.int32, (H, T), 1) <= t)
        bias_row = jax.lax.dynamic_slice(
            full_bias, (0, t, 0), (H, 1, T)).reshape(H, T)
        bias_row = jnp.where(kv_valid, bias_row, -1e9)

        # Layers statically unrolled (decoder depth is small): the KV
        # caches stay direct members of the while_loop carry, so XLA can
        # prove the dynamic_update_slice chains in-place. Threading them
        # through a lax.scan as stacked ys forces a full-cache copy per
        # step (~2x the whole KV cache in HBM traffic each token).
        def pick(tree, li):
            return jax.tree.map(lambda a: a[li], tree)

        def self_attention(li, q, k_new, v_new, self_k, self_v):
            if row:
                self_k = jax.lax.dynamic_update_slice(
                    self_k, k_new[None, :, None, :], (li, 0, t, 0))
                self_v = jax.lax.dynamic_update_slice(
                    self_v, v_new[None, :, None, :], (li, 0, t, 0))
                o = attend(q, self_k[li], self_v[li], bias=bias_row,
                           kv_mask=None, heads=H, scale=1.0)
                return o, self_k, self_v
            self_k = jax.lax.dynamic_update_slice(
                self_k, k_new.reshape(B, H, Dh)[None, :, :, None, :],
                (li, 0, 0, t, 0))
            self_v = jax.lax.dynamic_update_slice(
                self_v, v_new.reshape(B, H, Dh)[None, :, :, None, :],
                (li, 0, 0, t, 0))
            o = multi_head_attention(
                q.reshape(B, H, Dh)[:, :, None, :], self_k[li],
                self_v[li], bias=bias_row[None, :, None, :],
                causal=False, scale=1.0, impl="xla")
            return jnp.transpose(o, (0, 2, 1, 3)).reshape(B, W), \
                self_k, self_v

        def cross_attention(li, q):
            if row:
                return attend(q, cross_k[li], cross_v[li], bias=None,
                              kv_mask=enc_kv_mask, heads=H, scale=1.0)
            o = multi_head_attention(
                q.reshape(B, H, Dh)[:, :, None, :], cross_k[li],
                cross_v[li], bias=None, kv_mask=enc_kv_mask,
                causal=False, scale=1.0, impl="xla")
            return jnp.transpose(o, (0, 2, 1, 3)).reshape(B, W)

        if cfg.decode_layers == "scan":
            # One scanned layer keeps the program tiny at any depth
            # (depth-proportional HLO is the unroll's weakness); the
            # scanned caches come back as re-stacked ys — the ~2x
            # cache-traffic trade the comment above describes.
            # DELIBERATE duplication of the unrolled branch's layer math
            # below (the unroll's helpers update the STACKED caches in
            # place, which is what lets XLA prove the in-place chain —
            # sharing one per-slice body would add a slice/writeback
            # there): any edit to one branch must hit both, and
            # tests/test_t5_parity.py::
            # test_scan_decode_layers_matches_unroll pins them bit-equal.
            def layer_fn(xc, xs):
                p, qw, ck, cv, sk, sv = xs
                h = rms_norm(xc, p["self_ln"], cfg.layer_norm_epsilon)
                qkv = dense(h, qw)
                q, k_new, v_new = (qkv[:, :W], qkv[:, W:2 * W],
                                   qkv[:, 2 * W:])
                if row:
                    sk = jax.lax.dynamic_update_slice(
                        sk, k_new[:, None, :], (0, t, 0))
                    sv = jax.lax.dynamic_update_slice(
                        sv, v_new[:, None, :], (0, t, 0))
                    o = attend(q, sk, sv, bias=bias_row, kv_mask=None,
                               heads=H, scale=1.0)
                else:
                    sk = jax.lax.dynamic_update_slice(
                        sk, k_new.reshape(B, H, Dh)[:, :, None, :],
                        (0, 0, t, 0))
                    sv = jax.lax.dynamic_update_slice(
                        sv, v_new.reshape(B, H, Dh)[:, :, None, :],
                        (0, 0, t, 0))
                    o = multi_head_attention(
                        q.reshape(B, H, Dh)[:, :, None, :], sk, sv,
                        bias=bias_row[None, :, None, :], causal=False,
                        scale=1.0, impl="xla")
                    o = jnp.transpose(o, (0, 2, 1, 3)).reshape(B, W)
                xc = xc + dense(o, p["self_attn"]["o"])

                h = rms_norm(xc, p["cross_ln"], cfg.layer_norm_epsilon)
                qc = dense(h, p["cross_attn"]["q"])
                if row:
                    oc = attend(qc, ck, cv, bias=None,
                                kv_mask=enc_kv_mask, heads=H, scale=1.0)
                else:
                    oc = multi_head_attention(
                        qc.reshape(B, H, Dh)[:, :, None, :], ck, cv,
                        bias=None, kv_mask=enc_kv_mask, causal=False,
                        scale=1.0, impl="xla")
                    oc = jnp.transpose(oc, (0, 2, 1, 3)).reshape(B, W)
                xc = xc + dense(oc, p["cross_attn"]["o"])

                h = rms_norm(xc, p["ff_ln"], cfg.layer_norm_epsilon)
                xc = xc + _ff_block(p["ff"], cfg, h)
                return xc, (sk, sv)

            x, (self_k, self_v) = jax.lax.scan(
                layer_fn, x,
                (dec["block"], qkv_w, cross_k, cross_v, self_k, self_v))
        else:
            for li in range(Lyrs):
                p = pick(dec["block"], li)
                h = rms_norm(x, p["self_ln"], cfg.layer_norm_epsilon)
                qkv = dense(h, kslice(qkv_w, li))  # (B, 3W)
                q, k_new, v_new = (qkv[:, :W], qkv[:, W:2 * W],
                                   qkv[:, 2 * W:])
                o, self_k, self_v = self_attention(
                    li, q, k_new, v_new, self_k, self_v)
                x = x + dense(o, p["self_attn"]["o"])

                h = rms_norm(x, p["cross_ln"], cfg.layer_norm_epsilon)
                q = dense(h, p["cross_attn"]["q"])
                x = x + dense(cross_attention(li, q), p["cross_attn"]["o"])

                h = rms_norm(x, p["ff_ln"], cfg.layer_norm_epsilon)
                x = x + _ff_block(p["ff"], cfg, h)
        x = rms_norm(x, dec["final_ln"], cfg.layer_norm_epsilon)
        x = x * (cfg.d_model**-0.5)
        logits = jnp.dot(x, params["shared"].T.astype(x.dtype))
        # argmax directly on the compute-dtype logits: bf16 -> fp32 is an
        # injective monotone map, so the argmax (incl. first-max ties) is
        # identical to argmax(logits.astype(fp32)) — and XLA can fuse the
        # reduction with the LM-head GEMM instead of materializing a
        # (B, vocab) fp32 tensor each step.
        next_tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        next_tok = jnp.where(finished, cfg.pad_token_id, next_tok)
        finished = jnp.logical_or(finished, next_tok == cfg.eos_token_id)
        tokens = tokens.at[:, t + 1].set(next_tok)
        return t + 1, tokens, self_k, self_v, finished

    def cond_fn(state):
        t, _, _, _, finished = state
        if not early_stop:
            # benchmark mode: always run all T steps (random-weight models
            # emit EOS immediately, which would undercount decode cost)
            return t < T
        return jnp.logical_and(t < T, ~jnp.all(finished))

    _, tokens, _, _, _ = jax.lax.while_loop(
        cond_fn, step_fn, (jnp.int32(0), tokens, self_k, self_v, finished))
    return tokens


def t5_spec_greedy_decode(
    params: Params, cfg: T5Config, encoder_hidden: jnp.ndarray,
    encoder_mask: Optional[jnp.ndarray], draft_ids: jnp.ndarray,
    max_new_tokens: int = 20, block: int = 4,
) -> jnp.ndarray:
    """Hint-draft speculative greedy decode — same outputs as
    :func:`t5_greedy_decode` (early_stop semantics), fewer serial steps.

    ``draft_ids`` (B, Dw): a per-row PROPOSED continuation aligned to
    absolute output slots (slot m+1's candidate is ``draft_ids[:, m]``).
    The serving draft is the retrieved answer's token tail (already
    device-resident in the hint tables — retrieval/hints.py): a trained
    model usually generates exactly the retrieved answer, so whole
    answers verify in one pass. Exactness does NOT depend on the draft:
    every accepted token is the argmax given a verified prefix.

    Each iteration runs ONE decoder pass over ``block + 1`` positions
    [cur, d_0..d_{S-1}] at per-row offsets: output o_j is the true greedy
    token for slot n+j+1 whenever d_0..d_{j-1} all matched, so the
    longest matched prefix plus the bonus token (1..S+1 tokens) is
    accepted per pass. Worst case (useless drafts) accepts 1 token per
    pass — the lockstep loop's rate, at ~(S+1)x the FLOPs but the SAME
    serial KV-cache read count, which is what the latency-bound decode
    actually pays for (docs/TPU_NOTES.md).

    Per-row mechanics (the NEXT_STEPS r2 design): per-row decode
    positions ``n``, per-row K/V cache writes, per-row bias rows
    gathered from the full (H, Tc, Tc) table, per-(row, query) validity
    folded into the additive bias. Rejected/bonus cache slots hold stale
    K/V but sit at or beyond each row's frontier, where the next pass
    rewrites them before any masked read can see them.

    TPU cost shape (bisected on v5e, scripts/probe_decode_step.py): the
    first cut used jnp scatters for the per-row-offset cache writes and
    head-layout einsum attention — 14.5 ms/pass at B=512 (10x a lockstep
    step; slower end-to-end than not drafting at all). The production
    pass instead (a) writes the cache with a one-hot matmul + masked
    select (no TPU scatter: two full-bandwidth passes over the layer's
    cache), and (b) runs block attention on the ROW-layout caches via
    the 0/1 head-indicator GEMMs (ops/decode_attention.
    block_attention_indicator) — no (B, T, H, Dh) relayout copies of
    the self/cross caches per pass. ``cfg.decode_attention_impl="xla"``
    keeps the head-einsum variant as the parity reference.

    Reference behavior covered: greedy generate(max_new_tokens)
    (architectures/T5VisionModel.py:200-205), exact per-row EOS stop.
    """
    dec = params["decoder"]
    B = encoder_hidden.shape[0]
    H, Lyrs = cfg.num_heads, cfg.num_decoder_layers
    W = cfg.inner_dim
    Dh = cfg.d_kv
    T = max_new_tokens
    S = int(block)
    assert S >= 1
    Tc = T + S  # block queries can run S past the last real slot
    Dw = draft_ids.shape[1]

    cross_k, cross_v = _precompute_cross_kv(params, cfg, encoder_hidden)
    Lk = cross_k.shape[2]
    enc_kv_mask = (None if encoder_mask is None
                   else encoder_mask.astype(bool))
    full_bias = compute_position_bias(dec["rel_bias"], Tc, Tc,
                                      bidirectional=False, cfg=cfg)[0]
    qkv_w = kconcat(
        [dec["block"]["self_attn"]["q"], dec["block"]["self_attn"]["k"],
         dec["block"]["self_attn"]["v"]], axis=2)

    self_k = jnp.zeros((Lyrs, B, Tc, W), encoder_hidden.dtype)
    self_v = jnp.zeros_like(self_k)
    tokens = jnp.full((B, T + 1), cfg.pad_token_id, jnp.int32)
    tokens = tokens.at[:, 0].set(cfg.decoder_start_token_id)
    n0 = jnp.zeros((B,), jnp.int32)
    finished = jnp.zeros((B,), bool)
    jj = jnp.arange(S + 1, dtype=jnp.int32)
    brow = jnp.arange(B, dtype=jnp.int32)

    def heads(y, L):
        return jnp.transpose(y.reshape(B, L, H, Dh), (0, 2, 1, 3))

    def step_fn(state):
        tokens, n, self_k, self_v, finished = state
        nc = jnp.minimum(n, T - 1)
        cur = tokens[brow, nc]                                  # (B,)
        dslot = nc[:, None] + jj[None, 1:] - 1                  # (B, S)
        drafts = jnp.where(
            dslot < Dw,
            jnp.take_along_axis(draft_ids, jnp.clip(dslot, 0, Dw - 1),
                                axis=1),
            jnp.int32(cfg.pad_token_id))
        in_tok = jnp.concatenate([cur[:, None], drafts], axis=1)
        x = params["shared"][in_tok]                            # (B,S+1,D)
        qpos = nc[:, None] + jj[None, :]                        # (B, S+1)
        # per-(row, query) additive bias: rel-pos row + key validity
        bias_rows = jnp.take(full_bias, qpos, axis=1)        # (H,B,S+1,Tc)
        bias_rows = jnp.transpose(bias_rows, (1, 0, 2, 3)
                                  ).astype(jnp.float32)
        kpos = jnp.arange(Tc, dtype=jnp.int32)
        valid = kpos[None, None, :] <= qpos[:, :, None]         # (B,S+1,Tc)
        bias_eff = jnp.where(valid[:, None], bias_rows, -1e9)

        def pick(tree, li):
            return jax.tree.map(lambda a: a[li], tree)

        # one-hot per-row write map, shared by every layer's cache update:
        # row b writes block position j into cache slot n[b]+j (slots are
        # distinct within a row by construction, so the one-hot matmul
        # sums at most one contribution per (b, t))
        onehot = (kpos[None, None, :] == qpos[:, :, None])      # (B,S+1,Tc)
        written = jnp.any(onehot, axis=1)                       # (B, Tc)
        indicator = cfg.decode_attention_impl != "xla"

        # (B, S+1, H, Tc) additive bias for the indicator path's
        # (B, S+1, Tc, H) score layout / the xla path's (B, H, Lq, Lk)
        bias_bshj = jnp.transpose(bias_eff, (0, 2, 1, 3))

        def layer_body(xc, p, qw, ck, cv, sk, sv):
            """One decoder layer of the verification pass over PER-LAYER
            cache slices sk/sv (B, Tc, W); returns (x, sk, sv). The cache
            update is a one-hot matmul + masked select (no TPU scatter:
            two full-bandwidth passes over the layer's cache)."""
            h = rms_norm(xc, p["self_ln"], cfg.layer_norm_epsilon)
            qkv = dense(h, qw)                                  # (B,S+1,3W)
            q, k_new, v_new = (qkv[..., :W], qkv[..., W:2 * W],
                               qkv[..., 2 * W:])
            dk = jnp.einsum("bjt,bjw->btw", onehot.astype(k_new.dtype),
                            k_new)
            dv = jnp.einsum("bjt,bjw->btw", onehot.astype(v_new.dtype),
                            v_new)
            sk = jnp.where(written[:, :, None], dk, sk)
            sv = jnp.where(written[:, :, None], dv, sv)
            if indicator:
                o = block_attention_indicator(
                    q, sk, sv, heads=H, bias=bias_bshj)
            else:
                o = multi_head_attention(
                    heads(q, S + 1), heads(sk, Tc), heads(sv, Tc),
                    bias=bias_eff, causal=False, scale=1.0, impl="xla")
                o = jnp.transpose(o, (0, 2, 1, 3)).reshape(B, S + 1, W)
            xc = xc + dense(o, p["self_attn"]["o"])

            h = rms_norm(xc, p["cross_ln"], cfg.layer_norm_epsilon)
            qc = dense(h, p["cross_attn"]["q"])
            if indicator:
                oc = block_attention_indicator(
                    qc, ck, cv, heads=H, kv_mask=enc_kv_mask)
            else:
                oc = multi_head_attention(
                    heads(qc, S + 1), heads(ck, Lk), heads(cv, Lk),
                    bias=None, kv_mask=enc_kv_mask, causal=False,
                    scale=1.0, impl="xla")
                oc = jnp.transpose(oc, (0, 2, 1, 3)).reshape(B, S + 1, W)
            xc = xc + dense(oc, p["cross_attn"]["o"])

            h = rms_norm(xc, p["ff_ln"], cfg.layer_norm_epsilon)
            return xc + _ff_block(p["ff"], cfg, h), sk, sv

        if cfg.decode_layers == "scan":
            # depth-proportional HLO workaround, same as t5_greedy_decode
            def scan_fn(xc, xs):
                p, qw, ck, cv, sk, sv = xs
                xc, sk, sv = layer_body(xc, p, qw, ck, cv, sk, sv)
                return xc, (sk, sv)

            x, (self_k, self_v) = jax.lax.scan(
                scan_fn, x,
                (dec["block"], qkv_w, cross_k, cross_v, self_k, self_v))
        else:
            for li in range(Lyrs):
                x, sk, sv = layer_body(
                    x, pick(dec["block"], li), kslice(qkv_w, li),
                    cross_k[li], cross_v[li], self_k[li], self_v[li])
                self_k = jax.lax.dynamic_update_index_in_dim(
                    self_k, sk, li, 0)
                self_v = jax.lax.dynamic_update_index_in_dim(
                    self_v, sv, li, 0)
        x = rms_norm(x, dec["final_ln"], cfg.layer_norm_epsilon)
        x = x * (cfg.d_model**-0.5)
        logits = jnp.dot(x, params["shared"].T.astype(x.dtype))
        o_tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)   # (B, S+1)

        # accept the longest draft prefix that matched, plus the bonus
        match = (o_tok[:, :S] == drafts).astype(jnp.int32)
        a = jnp.sum(jnp.cumprod(match, axis=1), axis=1)         # 0..S
        acc = a + 1
        # exact per-row EOS stop: truncate at the first emitted EOS
        is_eos = (o_tok == cfg.eos_token_id) & (jj[None, :] < acc[:, None])
        any_eos = jnp.any(is_eos, axis=1)
        first_eos = jnp.argmax(is_eos, axis=1).astype(jnp.int32)
        acc = jnp.where(any_eos, first_eos + 1, acc)
        cap = T - n
        hit_eos = any_eos & (first_eos + 1 <= cap)
        acc = jnp.where(finished, 0, jnp.minimum(acc, cap))

        m = jnp.arange(T + 1, dtype=jnp.int32)[None, :]
        rel = m - n[:, None] - 1
        write = (rel >= 0) & (rel < acc[:, None])
        og = jnp.take_along_axis(o_tok, jnp.clip(rel, 0, S), axis=1)
        tokens = jnp.where(write, og, tokens)
        return tokens, n + acc, self_k, self_v, finished | hit_eos

    def cond_fn(state):
        _, n, _, _, finished = state
        return jnp.any(jnp.logical_and(~finished, n < T))

    tokens, _, _, _, _ = jax.lax.while_loop(
        cond_fn, step_fn, (tokens, n0, self_k, self_v, finished))
    return tokens
