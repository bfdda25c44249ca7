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

Supports the features the towers need: optional additive bias (H, L, L)
— T5's relative position bias, shared across the batch and VMEM-resident —
and an optional per-row key validity mask (B, L). Exact same math as the
XLA path (fp32 scores, exact softmax), differentiable via a custom VJP
that recomputes the standard attention backward.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e9


def _make_kernel(H, Dh, scale, has_bias, has_mask):
    def kernel(*refs):
        i = 0
        q_ref, k_ref, v_ref = refs[0], refs[1], refs[2]
        i = 3
        bias_ref = refs[i] if has_bias else None
        i += 1 if has_bias else 0
        mask_ref = refs[i] if has_mask else None
        i += 1 if has_mask else 0
        o_ref = refs[i]

        q = q_ref[0]  # (L, W) rows, W = H * Dh
        k = k_ref[0]
        v = v_ref[0]
        for h in range(H):
            sl = slice(h * Dh, (h + 1) * Dh)
            s = jax.lax.dot_general(
                q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            if scale != 1.0:
                s = s * scale
            if bias_ref is not None:
                s = s + bias_ref[h].astype(jnp.float32)
            if mask_ref is not None:
                s = jnp.where(mask_ref[0] != 0, s, _NEG_INF)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            o_ref[0, :, sl] = jax.lax.dot_general(
                p.astype(v.dtype), v[:, sl], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(o_ref.dtype)

    return kernel


def _forward(q, k, v, bias, kv_mask, heads: int, scale: float,
             interpret: bool):
    B, L, W = q.shape
    Dh = W // heads
    kern = _make_kernel(heads, Dh, scale, bias is not None,
                        kv_mask is not None)
    mem = pl.ANY if interpret else pltpu.VMEM
    spec = pl.BlockSpec((1, L, W), lambda b: (b, 0, 0), memory_space=mem)
    in_specs = [spec, spec, spec]
    args = [q, k, v]
    if bias is not None:
        # (H, L, L) — batch-invariant, resident across grid steps
        in_specs.append(pl.BlockSpec((heads, L, L), lambda b: (0, 0, 0),
                                     memory_space=mem))
        args.append(bias)
    if kv_mask is not None:
        # (B, 1, L): block trailing dims (1, L) match the array's
        in_specs.append(pl.BlockSpec((1, 1, L), lambda b: (b, 0, 0),
                                     memory_space=mem))
        args.append(kv_mask.astype(jnp.int32)[:, None, :])
    return pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=in_specs,
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((B, L, W), q.dtype),
        interpret=interpret,
    )(*args)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _row_attention(q, k, v, bias, kv_mask, heads, scale, interpret):
    return _forward(q, k, v, bias, kv_mask, heads, scale, interpret)


def _row_fwd(q, k, v, bias, kv_mask, heads, scale, interpret):
    out = _forward(q, k, v, bias, kv_mask, heads, scale, interpret)
    return out, (q, k, v, bias, kv_mask)


def _row_bwd(heads, scale, interpret, res, g):
    """Standard attention backward, recomputed per head in XLA (the kernel
    is an inference fast path; training recomputes scores — zero saved
    memory, grads exact)."""
    q, k, v, bias, kv_mask = res
    B, L, W = q.shape
    Dh = W // heads

    def heads_of(x):
        return jnp.transpose(x.reshape(B, L, heads, Dh), (0, 2, 1, 3))

    qh, kh, vh, gh = map(heads_of, (q, k, v, g))
    s = jnp.einsum("bhqd,bhkd->bhqk", qh, kh).astype(jnp.float32)
    if scale != 1.0:
        s = s * scale
    if bias is not None:
        s = s + bias[None].astype(jnp.float32)
    if kv_mask is not None:
        s = jnp.where(kv_mask[:, None, None, :] != 0, s, _NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    dv = jnp.einsum("bhqk,bhqd->bhkd", p.astype(gh.dtype), gh)
    dp = jnp.einsum("bhqd,bhkd->bhqk", gh, vh).astype(jnp.float32)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    d_bias = (jnp.sum(ds, axis=0).astype(bias.dtype)
              if bias is not None else None)
    ds_scaled = (ds * scale).astype(qh.dtype)
    dq = jnp.einsum("bhqk,bhkd->bhqd", ds_scaled, kh)
    dk = jnp.einsum("bhqk,bhqd->bhkd", ds_scaled, qh)

    def merge(x):
        return jnp.transpose(x, (0, 2, 1, 3)).reshape(B, L, W)

    return merge(dq), merge(dk), merge(dv), d_bias, None


_row_attention.defvjp(_row_fwd, _row_bwd)


@functools.partial(jax.jit,
                   static_argnames=("heads", "scale", "interpret"))
def row_attention(q, k, v, bias=None, kv_mask=None, *, heads: int,
                  scale: float, interpret: bool = False):
    """q, k, v, result: (B, L, W) with W = heads · head_dim; L ≤ ~256.
    bias: optional (heads, L, L) additive scores; kv_mask: optional (B, L)
    key validity. Differentiable (custom VJP)."""
    return _row_attention(q, k, v, bias, kv_mask, heads, scale, interpret)


# ---------------------------------------------------------------------------
# Packed-QKV variant: one (B, L, 3W) input straight from the fused QKV GEMM
# ---------------------------------------------------------------------------


# Images per grid step in the packed kernel (first candidate that divides
# B and fits VMEM wins; module-level so benchmarks can sweep it).
# EMPTY = one image per step: packing G>1 images measured ~26% SLOWER on
# v5e at B=512 (53.2 vs 42.2 ms ViT tower, scripts/bench_variants.py) —
# the statically unrolled G-loop serializes compute that Pallas otherwise
# overlaps with the next grid step's block DMA.
_PACK_G_CANDIDATES = ()


def _make_packed_kernel(G, H, Dh, W, L, scale, has_bias, has_mask, causal):
    def kernel(*refs):
        qkv_ref = refs[0]
        i = 1
        bias_ref = refs[i] if has_bias else None
        i += 1 if has_bias else 0
        mask_ref = refs[i] if has_mask else None
        i += 1 if has_mask else 0
        o_ref = refs[i]

        causal_add = None
        if causal:
            qi = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
            ki = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
            causal_add = jnp.where(ki <= qi, 0.0, _NEG_INF)
        # G images per grid step: the per-image VMEM footprint is tiny
        # (L=50 rows), so one step per image leaves the sequencer
        # overhead-bound at large B — statically unrolled inner loop
        for g in range(G):
            rows = qkv_ref[g]  # (L, 3W): [q | k | v] lane-aligned slices
            for h in range(H):
                q = rows[:, h * Dh:(h + 1) * Dh]
                k = rows[:, W + h * Dh:W + (h + 1) * Dh]
                v = rows[:, 2 * W + h * Dh:2 * W + (h + 1) * Dh]
                s = jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                if scale != 1.0:
                    s = s * scale
                if bias_ref is not None:
                    s = s + bias_ref[h].astype(jnp.float32)
                if mask_ref is not None:
                    s = jnp.where(mask_ref[g] != 0, s, _NEG_INF)
                if causal_add is not None:
                    s = s + causal_add
                m = jnp.max(s, axis=-1, keepdims=True)
                p = jnp.exp(s - m)
                p = p / jnp.sum(p, axis=-1, keepdims=True)
                o_ref[g, :, h * Dh:(h + 1) * Dh] = jax.lax.dot_general(
                    p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(o_ref.dtype)

    return kernel


def _packed_forward(qkv, bias, kv_mask, heads, scale, interpret, causal):
    B, L, W3 = qkv.shape
    W = W3 // 3
    Dh = W // heads
    G = 1
    for cand in _PACK_G_CANDIDATES:
        if B % cand == 0 and cand * L * W3 * 2 * 2 <= 2 * 1024 * 1024:
            G = cand
            break
    kern = _make_packed_kernel(G, heads, Dh, W, L, scale, bias is not None,
                               kv_mask is not None, causal)
    mem = pl.ANY if interpret else pltpu.VMEM
    in_specs = [pl.BlockSpec((G, L, W3), lambda b: (b, 0, 0),
                             memory_space=mem)]
    args = [qkv]
    if bias is not None:
        in_specs.append(pl.BlockSpec((heads, L, L), lambda b: (0, 0, 0),
                                     memory_space=mem))
        args.append(bias)
    if kv_mask is not None:
        in_specs.append(pl.BlockSpec((G, 1, L), lambda b: (b, 0, 0),
                                     memory_space=mem))
        args.append(kv_mask.astype(jnp.int32)[:, None, :])
    return pl.pallas_call(
        kern,
        grid=(B // G,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((G, L, W), lambda b: (b, 0, 0),
                               memory_space=mem),
        out_shape=jax.ShapeDtypeStruct((B, L, W), qkv.dtype),
        interpret=interpret,
    )(*args)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _row_attention_packed(qkv, bias, kv_mask, heads, scale, interpret,
                          causal):
    return _packed_forward(qkv, bias, kv_mask, heads, scale, interpret,
                           causal)


def _packed_fwd(qkv, bias, kv_mask, heads, scale, interpret, causal):
    out = _packed_forward(qkv, bias, kv_mask, heads, scale, interpret,
                          causal)
    return out, (qkv, bias, kv_mask)


def _packed_bwd(heads, scale, interpret, causal, res, g):
    qkv, bias, kv_mask = res
    W = qkv.shape[-1] // 3
    q, k, v = qkv[..., :W], qkv[..., W:2 * W], qkv[..., 2 * W:]
    eff_bias = bias
    if causal:
        # fold the causal mask into an (H, L, L) additive bias for the
        # recompute backward (at fp32 the masked exp underflows to 0, so
        # add and replace give identical probs and grads)
        L = qkv.shape[1]
        qi = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
        ki = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
        causal_bias = jnp.where(ki <= qi, 0.0, _NEG_INF).astype(jnp.float32)
        eff_bias = jnp.broadcast_to(
            causal_bias[None] if bias is None
            else bias.astype(jnp.float32) + causal_bias[None],
            (heads, L, L))
    dq, dk, dv, d_bias, _ = _row_bwd(heads, scale, interpret,
                                     (q, k, v, eff_bias, kv_mask), g)
    if bias is None:
        d_bias = None
    elif causal:
        # _row_bwd matched eff_bias (fp32); the cotangent must match the
        # PRIMAL bias dtype or custom_vjp rejects it
        d_bias = d_bias.astype(bias.dtype)
    return jnp.concatenate([dq, dk, dv], axis=-1), d_bias, None


_row_attention_packed.defvjp(_packed_fwd, _packed_bwd)


@functools.partial(jax.jit,
                   static_argnames=("heads", "scale", "interpret", "causal"))
def row_attention_packed(qkv, bias=None, kv_mask=None, *, heads: int,
                         scale: float, interpret: bool = False,
                         causal: bool = False):
    """Like ``row_attention`` but takes the fused-GEMM output directly:
    qkv (B, L, 3W) with lane-aligned [q | k | v] column groups. Skips the
    three (B·L, W) split copies XLA would emit for ``jnp.split``.
    Optional causal masking (CLIP text tower). Differentiable
    (custom VJP; same backward math as row_attention)."""
    return _row_attention_packed(qkv, bias, kv_mask, heads, scale,
                                 interpret, causal)
