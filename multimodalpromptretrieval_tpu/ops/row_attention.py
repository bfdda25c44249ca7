"""Row-layout fused attention: no head-split transposes, no HBM score
materialization.

Device-trace finding (docs/TPU_NOTES.md, scripts/parse_trace.py): at ViT
shapes (L=50, H=12, Dh=64, B=512) XLA's attention costs ~29 ms/forward, of
which ~15.8 ms is the out-projection residual fusion reading the
head-merge TRANSPOSE at ~60 GB/s and ~13.8 ms is raw layout copies — the
attention math itself is negligible. Both einsum layouts canonicalize to
the same HLO, so the fix is a kernel whose inputs AND outputs are plain
``(B, L, W)`` rows (the exact layout the surrounding GEMMs produce and
consume): per grid step one image's q/k/v rows land in VMEM, each head is
a static 64-lane column slice, scores/softmax never touch HBM, and the
output rows drop straight into the out-projection with clean fusions.

Exact same math as the XLA path (fp32 scores, exact softmax).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(q_ref, k_ref, v_ref, o_ref, *, H: int, Dh: int, scale: float):
    q = q_ref[0]  # (L, W) rows, W = H * Dh
    k = k_ref[0]
    v = v_ref[0]
    for h in range(H):
        sl = slice(h * Dh, (h + 1) * Dh)
        s = jax.lax.dot_general(
            q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o_ref[0, :, sl] = jax.lax.dot_general(
            p.astype(v.dtype), v[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _forward(q, k, v, heads: int, scale: float, interpret: bool):
    B, L, W = q.shape
    Dh = W // heads
    kern = functools.partial(_kernel, H=heads, Dh=Dh, scale=scale)
    spec = pl.BlockSpec((1, L, W), lambda b: (b, 0, 0),
                        memory_space=pl.ANY if interpret else pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[spec] * 3,
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((B, L, W), q.dtype),
        interpret=interpret,
    )(q, k, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _row_attention(q, k, v, heads, scale, interpret):
    return _forward(q, k, v, heads, scale, interpret)


def _row_fwd(q, k, v, heads, scale, interpret):
    return _forward(q, k, v, heads, scale, interpret), (q, k, v)


def _row_bwd(heads, scale, interpret, res, g):
    """Standard attention backward, recomputed per head in XLA (the kernel
    is an inference fast path; training through it is rare, so we trade
    backward speed for zero saved-score memory)."""
    q, k, v = res
    B, L, W = q.shape
    Dh = W // heads

    def heads_of(x):
        return jnp.transpose(x.reshape(B, L, heads, Dh), (0, 2, 1, 3))

    qh, kh, vh, gh = map(heads_of, (q, k, v, g))
    s = jnp.einsum("bhqd,bhkd->bhqk", qh, kh).astype(jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1)
    dv = jnp.einsum("bhqk,bhqd->bhkd", p.astype(gh.dtype), gh)
    dp = jnp.einsum("bhqd,bhkd->bhqk", gh, vh).astype(jnp.float32)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True)) * scale
    ds = ds.astype(qh.dtype)
    dq = jnp.einsum("bhqk,bhkd->bhqd", ds, kh)
    dk = jnp.einsum("bhqk,bhqd->bhkd", ds, qh)

    def merge(x):
        return jnp.transpose(x, (0, 2, 1, 3)).reshape(B, L, W)

    return merge(dq), merge(dk), merge(dv)


_row_attention.defvjp(_row_fwd, _row_bwd)


@functools.partial(jax.jit, static_argnames=("heads", "scale", "interpret"))
def row_attention(q, k, v, *, heads: int, scale: float,
                  interpret: bool = False):
    """q, k, v, result: (B, L, W) with W = heads · head_dim. L ≤ ~256.
    Differentiable (custom VJP recomputes the standard backward)."""
    return _row_attention(q, k, v, heads, scale, interpret)
