"""Normalization and pointwise layers shared by the T5 and CLIP towers.

These are deliberately small, fusion-friendly jnp functions: XLA:TPU fuses
them into the surrounding matmuls, so no Pallas is needed here. The numerics
match the reference's torch implementations exactly at fp32:

  * ``rms_norm``  == HF ``T5LayerNorm`` (no mean subtraction, no bias, the
    variance is computed in fp32 regardless of the compute dtype).
  * ``layer_norm`` == ``torch.nn.LayerNorm`` (used by the CLIP towers; CLIP's
    ``LayerNorm`` subclass only changes dtype handling, the math is the same).
  * ``quick_gelu`` == OpenAI CLIP's ``QuickGELU`` (x * sigmoid(1.702 x)).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dropout(x: jnp.ndarray, rate: float, rng) -> jnp.ndarray:
    """Inverted dropout (torch semantics: scale by 1/(1-rate) at train
    time). Identity when ``rng`` is None (eval — ``model.eval()`` in the
    reference driver) or ``rate`` <= 0. The one implementation shared by
    the T5 / MPRGen / BAN dropout points."""
    if rng is None or rate <= 0.0:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), jnp.zeros_like(x))


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """T5-style RMS norm. Reference: HF transformers T5LayerNorm.

    The reduction runs in fp32 and the result is cast back to the weight's
    dtype before scaling, mirroring the torch implementation used by the
    reference model (architectures/T5VisionModel.py delegates to HF T5).
    """
    orig_dtype = x.dtype
    x32 = x.astype(jnp.float32)
    variance = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    x32 = x32 * jnp.reciprocal(jnp.sqrt(variance + eps))
    return weight * x32.astype(orig_dtype)


def layer_norm(
    x: jnp.ndarray,
    weight: jnp.ndarray,
    bias: jnp.ndarray,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """torch.nn.LayerNorm semantics (biased variance, affine)."""
    orig_dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jnp.reciprocal(jnp.sqrt(var + eps))
    return (y.astype(orig_dtype) * weight + bias).astype(orig_dtype)


def dense(x: jnp.ndarray, kernel, bias: jnp.ndarray | None = None) -> jnp.ndarray:
    """y = x @ kernel (+ bias). ``kernel`` is stored (in_dim, out_dim).

    Torch ``nn.Linear`` stores (out, in); converters transpose once at load
    time so the hot path is a plain MXU matmul.

    ``kernel`` may also be an int8 quantized-kernel dict produced by
    :func:`ops.quant.quantize_kernel` (the opt-in W8A8 serving mode) —
    the dispatch is on the pytree type, resolved at trace time, so the
    fp path pays nothing.
    """
    if isinstance(kernel, dict):
        from multimodalpromptretrieval_tpu.ops.quant import dense_q8

        return dense_q8(x, kernel, bias)
    y = jnp.dot(x, kernel, preferred_element_type=x.dtype)
    if bias is not None:
        y = y + bias
    return y


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    """OpenAI CLIP QuickGELU: x * sigmoid(1.702 * x)."""
    return x * jnp.reciprocal(1.0 + jnp.exp(-1.702 * x))


def gelu_new(x: jnp.ndarray) -> jnp.ndarray:
    """tanh-approximated GELU (HF 'gelu_new'), used by T5 v1.1 gated-gelu."""
    x32 = x.astype(jnp.float32)
    y = 0.5 * x32 * (1.0 + jnp.tanh(0.7978845608028654 * (x32 + 0.044715 * x32**3)))
    return y.astype(x.dtype)


def weight_norm_kernel(v: jnp.ndarray, g: jnp.ndarray) -> jnp.ndarray:
    """torch.nn.utils.weight_norm with dim=None: w = g * v / ||v||_F.

    ``g`` is a scalar (0-d) parameter; the norm is over the whole tensor.
    Used by the BAN fusion variant (reference network/connect.py uses
    weight_norm(..., dim=None) everywhere).
    """
    norm = jnp.sqrt(jnp.sum(jnp.square(v.astype(jnp.float32))))
    return (g * v.astype(jnp.float32) / norm).astype(v.dtype)
