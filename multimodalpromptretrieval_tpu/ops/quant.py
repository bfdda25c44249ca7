"""int8 weight quantization for serving (opt-in, off by default).

The reference serves everything at full precision (PyTorch fp32 —
architectures/T5VisionModel.py has no quantization); this module adds a
TPU-native W8A8 path the reference has no equivalent for: the v5e MXU
runs int8×int8→int32 matmuls at twice the bf16 FLOP rate, and int8
weights halve the HBM bytes per GEMM.

Scheme (standard symmetric post-training quantization):

  * weights: per-output-channel symmetric int8 — ``s_w[j] =
    max_i |w[i, j]| / 127``, ``w_q = round(w / s_w)``;
  * activations: dynamic per-row symmetric int8 at run time —
    ``s_x[r] = max_j |x[r, j]| / 127`` (a cheap lane reduce XLA fuses
    with the surrounding elementwise ops);
  * ``y = (x_q @ w_q) · s_x · s_w + b`` with an int32 MXU accumulator,
    so the only precision loss is the two round-to-nearest steps.

A quantized kernel is a plain dict ``{"q8": int8 (…, in, out),
"q_scale": fp32 (…, 1, out)}`` so it rides every existing pytree
transform (scan xs slicing, tree.map layer picks, device_put). The hot
paths never branch at run time: :func:`ops.layers.dense` dispatches on
the kernel's type at trace time.

Quantization is applied to a COPY of the serving params
(:func:`quantize_params`); training, checkpoints, and the master fp32
params are untouched. By default only the T5 encoder/decoder GEMMs are
quantized — the CLIP towers feed the retrieval index, whose corpus side
was embedded at full precision, so quantizing them could shift
neighbor ranks (the ``clip=True`` switch exists for measurement but is
not used by the serving default).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp

Params = Any

#: pytree key of the int8 payload inside a quantized-kernel dict.
Q8 = "q8"
#: pytree key of the per-output-channel fp32 scale.
QSCALE = "q_scale"


def is_quantized(kernel) -> bool:
    """True iff ``kernel`` is a quantized-kernel dict."""
    return isinstance(kernel, dict) and Q8 in kernel


def quantize_kernel(w: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """(…, in, out) float kernel -> {"q8", "q_scale"} per-out-channel
    symmetric int8. Leading axes (a layer-stacked (L, in, out) kernel)
    quantize independently per (layer, out-channel)."""
    w32 = jnp.asarray(w, jnp.float32)
    amax = jnp.max(jnp.abs(w32), axis=-2, keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(w32 / scale), -127, 127).astype(jnp.int8)
    return {Q8: q, QSCALE: scale}


def quantize_rows(x: jnp.ndarray):
    """Dynamic per-row activation quantization: (…, K) -> (int8 x_q,
    fp32 (…, 1) scale). Rows that are all-zero get scale eps (x_q = 0)."""
    x32 = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(x32 / scale), -127, 127).astype(jnp.int8)
    return q, scale


def dense_q8(x: jnp.ndarray, kernel: Dict[str, jnp.ndarray],
             bias: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """W8A8 dense: y = (x_q @ w_q) · s_x · s_w (+ bias), int32 MXU
    accumulator. Output in ``x.dtype`` (the compute dtype)."""
    xq, sx = quantize_rows(x)
    acc = jax.lax.dot_general(
        xq, kernel[Q8],
        dimension_numbers=(((x.ndim - 1,), (kernel[Q8].ndim - 2,)),
                           ((), ())),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * sx * kernel[QSCALE].reshape(
        kernel[QSCALE].shape[-1])
    y = y.astype(x.dtype)
    if bias is not None:
        y = y + bias
    return y


def kout_dim(kernel) -> int:
    """Output (last-axis) width of a raw or quantized kernel — e.g. the
    local head count of a possibly-TP-sharded q/k/v kernel is
    ``kout_dim(p["q"]) // d_kv`` (models/t5._attention_block)."""
    return (kernel[Q8].shape[-1] if is_quantized(kernel)
            else kernel.shape[-1])


def kslice(kernel, i: int):
    """Layer-index a (possibly layer-stacked, possibly quantized) kernel:
    raw (L, in, out)[i] or {"q8": (L, in, out), "q_scale": (L, 1, out)}
    sliced leaf-wise."""
    if is_quantized(kernel):
        return {Q8: kernel[Q8][i], QSCALE: kernel[QSCALE][i]}
    return kernel[i]


def kconcat(kernels: Sequence, axis: int):
    """Concatenate kernels along an OUT axis (the last one) — e.g. the
    per-layer fused [q | k | v] packing in models/t5.py. Per-out-channel
    scales concatenate along the same axis, so the packed quantized
    kernel is bit-identical to quantizing after packing. Mixing raw and
    quantized kernels is an error (a silent dequant would hide a
    misconfigured quantization plan)."""
    quant = [is_quantized(k) for k in kernels]
    if not any(quant):
        return jnp.concatenate(list(kernels), axis=axis)
    if not all(quant):
        raise ValueError("kconcat: mixed raw/quantized kernels")
    ndim = kernels[0][Q8].ndim
    if axis % ndim != ndim - 1:
        raise ValueError("kconcat on quantized kernels requires the out "
                         f"(last) axis, got axis={axis} for ndim={ndim}")
    return {Q8: jnp.concatenate([k[Q8] for k in kernels], axis=axis),
            QSCALE: jnp.concatenate([k[QSCALE] for k in kernels],
                                    axis=axis)}


# ---------------------------------------------------------------------------
# Quantization plan over the MPRGen param tree
# ---------------------------------------------------------------------------

#: kernel names inside a T5 encoder/decoder block dict that feed
#: ops.layers.dense in the hot paths (models/t5.py _attention_block /
#: _ff_block and the row/decode fast paths).
_T5_BLOCK_KERNELS = frozenset(
    ["q", "k", "v", "o", "wi", "wi_0", "wi_1", "wo"])
#: kernel names inside a CLIP transformer block (models/clip._transformer).
_CLIP_BLOCK_KERNELS = frozenset(["wqkv", "out", "fc", "proj"])


def _quantize_block_tree(block: Params, names: frozenset) -> Params:
    """Recursively replace float kernels named in ``names`` (under any
    nesting, e.g. self_attn/cross_attn/ff) with quantized dicts."""
    if not isinstance(block, dict):
        return block
    out = {}
    for key, val in block.items():
        if key in names and not isinstance(val, dict):
            out[key] = quantize_kernel(val)
        else:
            out[key] = _quantize_block_tree(val, names)
    return out


def quantize_params(params: Params, *, t5: bool = True,
                    clip: bool = False) -> Params:
    """Serving-params copy with the hot GEMM kernels int8-quantized.

    ``t5=True`` quantizes the T5 encoder + decoder block kernels (the
    LM head / shared embedding stays full precision: the greedy argmax
    reads it directly and per-row dequant noise there flips token
    ties). ``clip=True`` additionally quantizes the CLIP vision + text
    transformer blocks — off by default because the retrieval corpus
    was embedded at full precision (see module docstring).

    Everything not quantized is passed through by reference (no copy).
    """
    out = dict(params)
    if t5 and "t5" in out:
        t5p = dict(out["t5"])
        for stack in ("encoder", "decoder"):
            if stack not in t5p:
                continue
            sp = dict(t5p[stack])
            sp["block"] = _quantize_block_tree(sp["block"],
                                               _T5_BLOCK_KERNELS)
            t5p[stack] = sp
        out["t5"] = t5p
    if clip and "clip" in out:
        cp = dict(out["clip"])
        for tower in ("visual", "text"):
            if tower in cp and isinstance(cp[tower], dict) \
                    and "blocks" in cp[tower]:
                tw = dict(cp[tower])
                tw["blocks"] = _quantize_block_tree(tw["blocks"],
                                                    _CLIP_BLOCK_KERNELS)
                cp[tower] = tw
        out["clip"] = cp
    return out


def quantized_paths(params: Params) -> List[str]:
    """Dotted paths of every quantized kernel in ``params`` (debug aid)."""
    found: List[str] = []

    def walk(node, path):
        if is_quantized(node):
            found.append(path)
            return
        if isinstance(node, dict):
            for key, val in node.items():
                walk(val, f"{path}.{key}" if path else key)

    walk(params, "")
    return found
