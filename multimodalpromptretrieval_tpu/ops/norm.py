"""Fused single-pass LayerNorm / RMSNorm Pallas kernels.

Trace finding (docs/TPU_NOTES.md): after the row-layout attention fix the
ViT tower's #2 op family is layernorm — XLA materializes the fp32 convert
and runs multi-pass reductions over HBM-resident activations (~10 ms of a
43 ms forward at B=512). These kernels do the whole normalization in one
VMEM pass per row block: read bf16 rows once, reduce in fp32 on-chip,
write bf16 once — ~2 HBM touches instead of ~6.

Numerics are identical to the jnp versions in ``ops/layers.py`` (fp32
mean/variance, cast back to the input dtype before the affine transform —
the torch semantics the reference relies on; reference models delegate to
``torch.nn.LayerNorm`` / HF ``T5LayerNorm``). Differentiable via a custom
VJP that recomputes the standard backward through the jnp implementation,
so gradients match XLA autodiff exactly.

Falls back to the jnp path when the feature width is not lane-aligned
(W % 128 != 0) or the row count is tiny — unit-test shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multimodalpromptretrieval_tpu.ops.layers import layer_norm, rms_norm

_BLOCK_ROWS = 512


def _ln_kernel(x_ref, w_ref, b_ref, o_ref, *, eps):
    x = x_ref[...]
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    # reciprocal(sqrt(..)), NOT lax.rsqrt: the approximate-rsqrt lowering
    # is not guaranteed bit-equal to the jnp reference this kernel
    # promises to match (ops/layers.layer_norm)
    y = (x32 - mean) * jnp.reciprocal(jnp.sqrt(var + eps))
    o_ref[...] = (y.astype(x.dtype) * w_ref[...] + b_ref[...]).astype(x.dtype)


def _rms_kernel(x_ref, w_ref, o_ref, *, eps):
    x = x_ref[...]
    x32 = x.astype(jnp.float32)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    y = x32 * jnp.reciprocal(jnp.sqrt(var + eps))  # bit-equal to rms_norm
    o_ref[...] = (w_ref[...] * y.astype(x.dtype)).astype(x.dtype)


def _run(kernel, x2d, vecs, eps, interpret):
    N, W = x2d.shape
    R = min(_BLOCK_ROWS, N)
    mem = pl.ANY if interpret else pltpu.VMEM
    row_spec = pl.BlockSpec((R, W), lambda i: (i, 0), memory_space=mem)
    vec_spec = pl.BlockSpec((1, W), lambda i: (0, 0), memory_space=mem)
    return pl.pallas_call(
        functools.partial(kernel, eps=eps),
        grid=(pl.cdiv(N, R),),
        in_specs=[row_spec] + [vec_spec] * len(vecs),
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((N, W), x2d.dtype),
        interpret=interpret,
    )(x2d, *(v.reshape(1, W) for v in vecs))


def _supported(x) -> bool:
    W = x.shape[-1]
    n = x.size // W
    return W % 128 == 0 and n >= 16


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _fused_ln(x, w, b, eps, interpret):
    shape = x.shape
    out = _run(_ln_kernel, x.reshape(-1, shape[-1]), (w, b), eps, interpret)
    return out.reshape(shape)


def _fused_ln_fwd(x, w, b, eps, interpret):
    return _fused_ln(x, w, b, eps, interpret), (x, w, b)


def _fused_ln_bwd(eps, interpret, res, g):
    x, w, b = res
    _, vjp = jax.vjp(lambda x, w, b: layer_norm(x, w, b, eps), x, w, b)
    return vjp(g)


_fused_ln.defvjp(_fused_ln_fwd, _fused_ln_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _fused_rms(x, w, eps, interpret):
    shape = x.shape
    out = _run(_rms_kernel, x.reshape(-1, shape[-1]), (w,), eps, interpret)
    return out.reshape(shape)


def _fused_rms_fwd(x, w, eps, interpret):
    return _fused_rms(x, w, eps, interpret), (x, w)


def _fused_rms_bwd(eps, interpret, res, g):
    x, w = res
    _, vjp = jax.vjp(lambda x, w: rms_norm(x, w, eps), x, w)
    return vjp(g)


_fused_rms.defvjp(_fused_rms_fwd, _fused_rms_bwd)


def fused_layer_norm(x, w, b, eps: float = 1e-5,
                     interpret: bool | None = None):
    """Single-pass torch.nn.LayerNorm over the last axis. Same numerics and
    gradients as ``ops.layers.layer_norm``; jnp fallback off-TPU shapes."""
    if not _supported(x):
        return layer_norm(x, w, b, eps)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    return _fused_ln(x, w, b, eps, interpret)


def fused_rms_norm(x, w, eps: float = 1e-6,
                   interpret: bool | None = None):
    """Single-pass HF T5LayerNorm over the last axis. Same numerics and
    gradients as ``ops.layers.rms_norm``; jnp fallback off-TPU shapes."""
    if not _supported(x):
        return rms_norm(x, w, eps)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    return _fused_rms(x, w, eps, interpret)
