"""Fused multi-head attention for TPU.

Two interchangeable implementations behind one API:

  * ``_attention_xla``    — plain jnp ops; XLA fuses these well at the short
    sequence lengths used by MPR_Gen (<= 512 text + 50 image tokens). Exact
    softmax (fp32, max-subtracted) so it doubles as the parity reference.
  * ``_flash_attention``  — blockwise (FlashAttention-style) Pallas kernel
    with online softmax. Used on TPU for the encoder/prefill paths; the
    natural seed for longer contexts later.

Both support the full feature set the reference's models need
(architectures/T5VisionModel.py delegates attention to HF T5 + OpenAI CLIP):

  * additive attention bias broadcastable over batch — T5's relative position
    bias of shape (1, H, Lq, Lk);
  * a key/value validity mask (B, Lk) — padding;
  * a causal flag — decoder self-attention and the CLIP text tower;
  * optional scale — 1/sqrt(d_head) for CLIP, **no scaling** for T5 (HF T5
    folds the scale into the initialized weights and multiplies by 1).

Layout: q, k, v are (B, H, L, Dh).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e9  # matches HF's additive mask magnitude well enough at fp32


def _attention_xla(q, k, v, bias, kv_mask, causal, scale):
    B, H, Lq, Dh = q.shape
    Lk = k.shape[2]
    scores = jnp.einsum("bhqd,bhkd->bhqk", q,
                        k.astype(q.dtype)).astype(jnp.float32)
    if scale != 1.0:
        scores = scores * scale
    if bias is not None:
        scores = scores + bias.astype(jnp.float32)
    if kv_mask is not None:
        scores = jnp.where(kv_mask[:, None, None, :], scores, _NEG_INF)
    if causal:
        qi = jax.lax.broadcasted_iota(jnp.int32, (Lq, Lk), 0)
        ki = jax.lax.broadcasted_iota(jnp.int32, (Lq, Lk), 1)
        scores = jnp.where((ki <= qi)[None, None], scores, _NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


# ---------------------------------------------------------------------------
# Pallas flash attention
# ---------------------------------------------------------------------------


def _flash_kernel(
    q_ref, k_ref, v_ref, bias_ref, mask_ref, o_ref,
    m_scr, l_scr, acc_scr,
    *, causal: bool, scale: float, block_q: int, block_k: int, lk: int,
):
    """Grid = (BH, num_q_blocks, num_k_blocks); k innermost (sequential on TPU).

    Running max / sum / accumulator live in VMEM scratch and persist across
    the k grid dimension (TPU executes the grid sequentially).
    """
    ik = pl.program_id(2)
    nk = pl.num_programs(2)
    iq = pl.program_id(1)

    @pl.when(ik == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    def _compute():
        q = q_ref[0]
        k = k_ref[0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        if scale != 1.0:
            s = s * scale
        if bias_ref is not None:
            s = s + bias_ref[0].astype(jnp.float32)
        # Key-side validity: padding mask and/or padded tail rows of Lk.
        col = ik * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1)
        valid = col < lk
        if mask_ref is not None:
            valid = jnp.logical_and(valid, mask_ref[0] != 0)
        if causal:
            row = iq * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0)
            valid = jnp.logical_and(valid, col <= row)
        s = jnp.where(valid, s, _NEG_INF)

        m_prev = m_scr[:]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_scr[:] = l_scr[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_scr[:] = m_new

    if causal:
        # skip fully-future k blocks: their columns are all masked
        @pl.when(ik * block_k <= iq * block_q + (block_q - 1))
        def _():
            _compute()
    else:
        _compute()

    @pl.when(ik == nk - 1)
    def _finalize():
        o_ref[0] = (acc_scr[:] / l_scr[:]).astype(o_ref.dtype)


def _pad_to(x, axis, mult):
    size = x.shape[axis]
    pad = (-size) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(
    jax.jit, static_argnames=("causal", "scale", "block_q", "block_k", "interpret")
)
def _flash_attention(
    q, k, v, bias=None, kv_mask=None, *, causal=False, scale=1.0,
    block_q=512, block_k=1024, interpret=False,
):
    """Defaults tuned on v5e (docs/TPU_NOTES.md): (512, 1024) blocks are
    ~2.1x XLA at L=4096 causal; the clamps below shrink them for short
    sequences."""
    B, H, Lq, Dh = q.shape
    Lk = k.shape[2]
    block_q = min(block_q, max(8, 1 << (Lq - 1).bit_length()))
    block_k = min(block_k, max(128, 1 << (Lk - 1).bit_length()))
    qp = _pad_to(q.reshape(B * H, Lq, Dh), 1, block_q)
    kp = _pad_to(k.reshape(B * H, Lk, Dh), 1, block_k)
    vp = _pad_to(v.reshape(B * H, Lk, Dh), 1, block_k)
    Lqp, Lkp = qp.shape[1], kp.shape[1]
    nq, nk = Lqp // block_q, Lkp // block_k

    in_specs = [
        pl.BlockSpec((1, block_q, Dh), lambda bh, iq, ik: (bh, iq, 0),
                     memory_space=pl.ANY if interpret else pltpu.VMEM),
        pl.BlockSpec((1, block_k, Dh), lambda bh, iq, ik: (bh, ik, 0),
                     memory_space=pl.ANY if interpret else pltpu.VMEM),
        pl.BlockSpec((1, block_k, Dh), lambda bh, iq, ik: (bh, ik, 0),
                     memory_space=pl.ANY if interpret else pltpu.VMEM),
    ]
    args = [qp, kp, vp]
    if bias is not None:
        bB, bH = bias.shape[0], bias.shape[1]
        bias_f = _pad_to(_pad_to(bias.reshape(bB * bH, Lq, Lk), 1, block_q), 2, block_k)
        # map the (B*H,) grid row onto the (bB*bH,) flattened bias with
        # modulo on BOTH broadcast dims — handles (B,H), (1,H), (B,1) and
        # (1,1) biases; the old two-case map indexed out of range for
        # (B,1) and (1,1) with B>1
        idx = lambda bh, iq, ik: (  # noqa: E731
            ((bh // H) % bB) * bH + (bh % H) % bH, iq, ik)
        in_specs.append(pl.BlockSpec((1, block_q, block_k), idx,
                                     memory_space=pl.ANY if interpret else pltpu.VMEM))
        args.append(bias_f)
    if kv_mask is not None:
        # 3-D so the block's trailing two dims are (1, block_k) over an
        # array whose second-to-last dim is exactly 1 — TPU tiling rule
        # (last two block dims must divide (8, 128) or equal the array's)
        mask_f = _pad_to(kv_mask.astype(jnp.int32), 1, block_k)[:, None, :]
        in_specs.append(pl.BlockSpec(
            (1, 1, block_k), lambda bh, iq, ik: (bh // H, 0, ik),
            memory_space=pl.ANY if interpret else pltpu.VMEM))
        args.append(mask_f)

    kernel = functools.partial(
        _make_kernel(bias is not None, kv_mask is not None),
        causal=causal, scale=scale, block_q=block_q, block_k=block_k, lk=Lk,
    )
    out = pl.pallas_call(
        kernel,
        grid=(B * H, nq, nk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, block_q, Dh), lambda bh, iq, ik: (bh, iq, 0),
                               memory_space=pl.ANY if interpret else pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, Lqp, Dh), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, Dh), jnp.float32),
        ],
        interpret=interpret,
    )(*args)
    return out[:, :Lq].reshape(B, H, Lq, Dh)


def _make_kernel(has_bias: bool, has_mask: bool):
    """Adapt _flash_kernel's signature to the optional bias/mask operands."""
    if has_bias and has_mask:
        return _flash_kernel
    if has_bias:
        def k_b(q, k, v, b, o, m, l, a, **kw):
            return _flash_kernel(q, k, v, b, None, o, m, l, a, **kw)
        return k_b
    if has_mask:
        def k_m(q, k, v, msk, o, m, l, a, **kw):
            return _flash_kernel(q, k, v, None, msk, o, m, l, a, **kw)
        return k_m

    def k_n(q, k, v, o, m, l, a, **kw):
        return _flash_kernel(q, k, v, None, None, o, m, l, a, **kw)
    return k_n


def multi_head_attention(
    q, k, v, *, bias=None, kv_mask=None, causal=False, scale=None, impl="auto"
):
    """Multi-head attention over (B, H, L, Dh) tensors.

    impl: 'xla' | 'pallas' | 'auto'. 'auto' uses the Pallas kernel on TPU
    backends and XLA elsewhere (CPU tests exercise the kernel explicitly via
    interpret mode in tests/test_attention.py).
    """
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    if impl == "auto":
        impl = "pallas" if jax.default_backend() not in ("cpu",) else "xla"
    if impl == "pallas":
        return _flash_attention(q, k, v, bias, kv_mask, causal=causal, scale=scale)
    if impl == "pallas_interpret":
        return _flash_attention(
            q, k, v, bias, kv_mask, causal=causal, scale=scale, interpret=True
        )
    return _attention_xla(q, k, v, bias, kv_mask, causal, scale)
