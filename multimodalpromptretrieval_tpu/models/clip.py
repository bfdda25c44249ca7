"""From-scratch JAX CLIP (ViT visual tower + text transformer).

Re-implements what the reference uses from ``openai/CLIP`` (ViT-B/32 by
default; PubMedCLIP ships the same architecture):

  * ``clip_image_tokens``  — the reference's monkey-patched
    ``visual.forward`` that returns **all** (1 + grid²) per-token embeddings
    projected to the shared space (architectures/T5VisionModel.py:112-139).
    Row 0 is exactly ``encode_image``'s pooled embedding, so one tower serves
    both the visual-prefix and the retrieval-query paths.
  * ``clip_encode_text``   — token+position embeddings -> causal pre-LN
    transformer -> ln_final -> EOT-position pooling (argmax of token ids) ->
    text projection (the reference's dead ``get_clip_text_features`` mirrors
    this; the live call is ``clip_model.encode_text`` in
    dataset/VQAFeatureDataset.py:147,190).

TPU notes: the patchify conv is lowered to a single reshaped matmul on the
MXU; blocks are stacked and run under ``lax.scan``; attention rides the same
fused kernel as T5 (with 1/sqrt(d_head) scaling and a causal flag for the
text tower).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp

from multimodalpromptretrieval_tpu.ops.attention import multi_head_attention
from multimodalpromptretrieval_tpu.ops.layers import dense, layer_norm, quick_gelu

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class CLIPConfig:
    embed_dim: int = 512
    # vision
    image_resolution: int = 224
    vision_width: int = 768
    vision_layers: int = 12
    patch_size: int = 32
    # text
    context_length: int = 77
    vocab_size: int = 49408
    text_width: int = 512
    text_layers: int = 12
    # head counts default to the CLIP convention (width / 64)
    vision_heads_override: int = 0
    text_heads_override: int = 0
    # execution; the text tower keeps its own knob for ablation. Early
    # r2 measurements had the packed kernel SLOWER at text lengths
    # (20.1 vs 16.2 ms at B=512), but after the fused-norm/kernel-default
    # rework "row" wins there too (13.9 vs 15.5 ms,
    # scripts/bench_components.py) — serving configs now use "row" for
    # both towers (bench.py, docs/TPU_NOTES.md)
    attention_impl: str = "xla"
    text_attention_impl: str = ""  # "" -> follow attention_impl

    @property
    def vision_heads(self) -> int:
        return self.vision_heads_override or max(1, self.vision_width // 64)

    @property
    def text_heads(self) -> int:
        return self.text_heads_override or max(1, self.text_width // 64)

    @property
    def grid(self) -> int:
        return self.image_resolution // self.patch_size

    @property
    def num_image_tokens(self) -> int:
        return self.grid * self.grid + 1

    @staticmethod
    def vit_b32() -> "CLIPConfig":
        return CLIPConfig()

    @staticmethod
    def tiny() -> "CLIPConfig":
        return CLIPConfig(embed_dim=16, image_resolution=32, vision_width=32,
                          vision_layers=2, patch_size=16, context_length=12,
                          vocab_size=64, text_width=24, text_layers=2,
                          vision_heads_override=2, text_heads_override=2)


# CLIP's torchvision preprocess normalization constants (clip/clip.py upstream)
IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)


def _init_block(key, width: int) -> Params:
    ks = jax.random.split(key, 4)
    s = width**-0.5
    return {
        "ln_1": {"w": jnp.ones((width,)), "b": jnp.zeros((width,))},
        "attn": {
            "wqkv": jax.random.normal(ks[0], (width, 3 * width)) * s,
            "bqkv": jnp.zeros((3 * width,)),
            "out": jax.random.normal(ks[1], (width, width)) * s,
            "out_b": jnp.zeros((width,)),
        },
        "ln_2": {"w": jnp.ones((width,)), "b": jnp.zeros((width,))},
        "mlp": {
            "fc": jax.random.normal(ks[2], (width, 4 * width)) * s,
            "fc_b": jnp.zeros((4 * width,)),
            "proj": jax.random.normal(ks[3], (4 * width, width)) * s,
            "proj_b": jnp.zeros((width,)),
        },
    }


def init_clip(key, cfg: CLIPConfig) -> Params:
    ks = jax.random.split(key, 10)

    def stack(n, key, width):
        return jax.tree.map(
            lambda *xs: jnp.stack(xs),
            *[_init_block(k, width) for k in jax.random.split(key, n)])

    vw, tw = cfg.vision_width, cfg.text_width
    return {
        "visual": {
            "conv1": jax.random.normal(
                ks[0], (3 * cfg.patch_size**2, vw)) * vw**-0.5,
            "class_embedding": jax.random.normal(ks[1], (vw,)) * vw**-0.5,
            "pos_embedding": jax.random.normal(
                ks[2], (cfg.num_image_tokens, vw)) * vw**-0.5,
            "ln_pre": {"w": jnp.ones((vw,)), "b": jnp.zeros((vw,))},
            "blocks": stack(cfg.vision_layers, ks[3], vw),
            "ln_post": {"w": jnp.ones((vw,)), "b": jnp.zeros((vw,))},
            "proj": jax.random.normal(ks[4], (vw, cfg.embed_dim)) * vw**-0.5,
        },
        "text": {
            "token_embedding": jax.random.normal(
                ks[5], (cfg.vocab_size, tw)) * 0.02,
            "pos_embedding": jax.random.normal(
                ks[6], (cfg.context_length, tw)) * 0.01,
            "blocks": stack(cfg.text_layers, ks[7], tw),
            "ln_final": {"w": jnp.ones((tw,)), "b": jnp.zeros((tw,))},
            "text_projection": jax.random.normal(
                ks[8], (tw, cfg.embed_dim)) * tw**-0.5,
        },
        "logit_scale": jnp.asarray(2.6592),  # ln(1/0.07), CLIP's init
    }


# grouped block-diagonal packing candidates for short-sequence row
# attention, largest preferred (see the comment inside _transformer).
# G=8 swept best on v5e at L=16 (scripts/probe_text_tower.py --sweep);
# module-level so probes can sweep it without editing the tower.
_PACK_GROUPS = (8, 4, 2)


def _transformer(blocks: Params, x: jnp.ndarray, heads: int, *,
                 causal: bool, attention_impl: str) -> jnp.ndarray:
    B, L, W = x.shape
    Dh = W // heads

    if attention_impl == "row":
        # TPU fast path (docs/TPU_NOTES.md trace findings): flatten to
        # (B·L, W) so every dense is ONE large MXU GEMM — under lax.scan a
        # (B, L, W) @ (W, ·) dot compiles to B tiny batched GEMMs at ~6%
        # peak — and run attention through the row-layout Pallas kernel
        # (no head transposes / HBM score tensors). Layers are unrolled:
        # scan's dynamically-sliced weights force the windowed GEMM
        # emitter. ~22% faster ViT tower at B=512; identical math.
        from multimodalpromptretrieval_tpu.ops.norm import fused_layer_norm
        from multimodalpromptretrieval_tpu.ops.row_attention import (
            row_attention_packed,
        )

        interpret = jax.default_backend() == "cpu"
        n_layers = jax.tree.leaves(blocks)[0].shape[0]
        # Grouped block-diagonal packing: at serving text lengths (L=16
        # after EOT truncation) one grid step per sequence runs tiny
        # (L, Dh, L) dots far below MXU shape. Packing G sequences per
        # step — reshape (B, L, 3W) -> (B/G, G·L, 3W) + a static
        # block-diagonal additive bias (-1e9 off-block) — keeps ONE dot
        # per head per step, just G× bigger. Mathematically identical:
        # the reshape preserves within-block order, the causal iota over
        # G·L keeps per-image causality, and -1e9 underflows to exactly 0
        # through the fp32 softmax (bit-exact on the MXU; on CPU only the
        # K=G·L dot accumulation tree rounds differently, ~1e-7).
        # scripts/probe_grouped_text.py: EXACT sums for G up to 32 on
        # chip; tower 9.62 -> 6.19 ms at B=512, L=16.
        # Only engaged for short sequences where the dots are tiny and
        # the G× extra masked-score FLOPs are noise.
        group = 1
        bias = None
        if L <= 32:
            group = next((g for g in _PACK_GROUPS if B % g == 0), 1)
        if group > 1:
            pos = jnp.arange(group * L) // L
            blockdiag = jnp.where(pos[:, None] == pos[None, :], 0.0, -1e9)
            bias = jnp.broadcast_to(
                blockdiag[None].astype(jnp.float32),
                (heads, group * L, group * L))
        x = x.reshape(B * L, W)
        for li in range(n_layers):
            p = jax.tree.map(lambda a: a[li], blocks)
            h = fused_layer_norm(x, p["ln_1"]["w"], p["ln_1"]["b"])
            qkv = dense(h, p["attn"]["wqkv"], p["attn"]["bqkv"])
            o = row_attention_packed(
                qkv.reshape(B // group, group * L, 3 * W), bias,
                heads=heads, scale=Dh**-0.5,
                causal=causal, interpret=interpret).reshape(B * L, W)
            x = x + dense(o, p["attn"]["out"], p["attn"]["out_b"])
            h = fused_layer_norm(x, p["ln_2"]["w"], p["ln_2"]["b"])
            h = quick_gelu(dense(h, p["mlp"]["fc"], p["mlp"]["fc_b"]))
            x = x + dense(h, p["mlp"]["proj"], p["mlp"]["proj_b"])
        return x.reshape(B, L, W)

    def block(x, p):
        h = layer_norm(x, p["ln_1"]["w"], p["ln_1"]["b"])
        qkv = dense(h, p["attn"]["wqkv"], p["attn"]["bqkv"])
        q, k, v = jnp.split(qkv, 3, axis=-1)
        split = lambda y: jnp.transpose(  # noqa: E731
            y.reshape(B, L, heads, Dh), (0, 2, 1, 3))
        o = multi_head_attention(
            split(q), split(k), split(v), causal=causal,
            scale=Dh**-0.5,
            impl="xla" if attention_impl == "row" else attention_impl)
        o = jnp.transpose(o, (0, 2, 1, 3)).reshape(B, L, W)
        x = x + dense(o, p["attn"]["out"], p["attn"]["out_b"])
        h = layer_norm(x, p["ln_2"]["w"], p["ln_2"]["b"])
        h = quick_gelu(dense(h, p["mlp"]["fc"], p["mlp"]["fc_b"]))
        x = x + dense(h, p["mlp"]["proj"], p["mlp"]["proj_b"])
        return x, None

    x, _ = jax.lax.scan(block, x, blocks)
    return x


def patchify(images: jnp.ndarray, patch: int) -> jnp.ndarray:
    """(B, 3, H, W) -> (B, grid², 3·p²) with conv-compatible ordering
    (channel-major within a patch, matching the flattened conv kernel)."""
    B, C, H, W = images.shape
    g = H // patch
    x = images.reshape(B, C, g, patch, g, patch)
    x = jnp.transpose(x, (0, 2, 4, 1, 3, 5))  # B, gy, gx, C, py, px
    return x.reshape(B, g * g, C * patch * patch)


def clip_image_tokens(params: Params, cfg: CLIPConfig,
                      images: jnp.ndarray) -> jnp.ndarray:
    """All-token image features: (B, 1+grid², embed_dim).

    Row 0 == ``encode_image`` (CLS pooled); rows 1.. are the patch tokens the
    reference prepends to the T5 prompt. images: (B, 3, R, R), preprocessed.
    """
    v = params["visual"]
    x = jnp.dot(patchify(images, cfg.patch_size), v["conv1"],
                preferred_element_type=images.dtype)
    cls = jnp.broadcast_to(v["class_embedding"].astype(x.dtype),
                           (x.shape[0], 1, x.shape[-1]))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + v["pos_embedding"].astype(x.dtype)
    x = layer_norm(x, v["ln_pre"]["w"], v["ln_pre"]["b"])
    x = _transformer(v["blocks"], x, cfg.vision_heads, causal=False,
                     attention_impl=cfg.attention_impl)
    x = layer_norm(x, v["ln_post"]["w"], v["ln_post"]["b"])
    return jnp.dot(x, v["proj"].astype(x.dtype))


def clip_encode_image(params: Params, cfg: CLIPConfig,
                      images: jnp.ndarray) -> jnp.ndarray:
    """Pooled image embedding (B, embed_dim) — OpenAI ``encode_image``."""
    return clip_image_tokens(params, cfg, images)[:, 0]


def truncate_text_ids(ids, multiple: int = 8):
    """Drop all-padding tail columns (bucketed to ``multiple``) — output of
    clip_encode_text is bit-identical on the shortened batch (causal + EOT
    pooling), with ~context/len less compute."""
    import numpy as np

    ids = np.asarray(ids)
    # row length = LAST nonzero position + 1, not the nonzero COUNT: BPE
    # id 0 is the real token '!' (first bytes_to_unicode entry), so a
    # count would undercount rows containing '!' and could slice off the
    # EOT column. Every valid row ends with EOT (nonzero), so the last
    # nonzero is the EOT position.
    nz = ids != 0
    lengths = np.where(nz.any(axis=1),
                       ids.shape[1] - nz[:, ::-1].argmax(axis=1),
                       ids.shape[1])
    width = int(max(1, lengths.max()))
    width = min(ids.shape[1], -(-width // multiple) * multiple)
    return ids[:, :width]


def clip_encode_text(params: Params, cfg: CLIPConfig,
                     token_ids: jnp.ndarray) -> jnp.ndarray:
    """Pooled text embedding (B, embed_dim) — OpenAI ``encode_text``.

    token_ids: (B, context_length) int32 (clip tokenizer output, zero-padded);
    pooling takes the EOT position = argmax of ids (EOT has the highest id).
    """
    t = params["text"]
    L = token_ids.shape[1]
    x = t["token_embedding"][token_ids]
    # slice the position table: inputs shorter than context_length are
    # exactly equivalent (causal attention + EOT pooling means positions
    # past the last real token never influence the embedding) and much
    # cheaper — serving truncates to the longest real question
    x = x + t["pos_embedding"][:L].astype(x.dtype)
    x = _transformer(t["blocks"], x, cfg.text_heads, causal=True,
                     attention_impl=(cfg.text_attention_impl
                                     or cfg.attention_impl))
    x = layer_norm(x, t["ln_final"]["w"], t["ln_final"]["b"])
    eot = jnp.argmax(token_ids, axis=-1)
    pooled = x[jnp.arange(x.shape[0]), eot]
    return jnp.dot(pooled, t["text_projection"].astype(x.dtype))
