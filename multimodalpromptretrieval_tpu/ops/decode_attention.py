"""Single-query attention over row-layout KV for the greedy decode loop.

Trace finding (docs/TPU_NOTES.md): in the decode while_loop XLA emits the
per-step cross-attention einsums (q·Kᵀ and P·V at Lq=1) as kLoop "window"
fusions that read the (B, H, Lk, Dh) caches at ~40% of HBM bandwidth —
at B=512, Lk=82 that is ~1.7 ms of the ~2.3 ms step (12 fusions/step), and
the (B, Lk, H, Dh) head-split transposes of the cross K/V precompute cost
another ~3 ms per call (copy.88/copy.90).

This kernel keeps K/V in the row layout the projections produce —
``(B, T, W)`` with W = heads·head_dim, no head transposes anywhere — and
fuses score + softmax + value-gather into one pass over the cache:

  * grid over batch blocks; one block's q rows and K/V rows live in VMEM;
  * each head is a static 64-lane column slice (same trick as
    ops/row_attention.py);
  * scores/softmax in fp32, never touching HBM;
  * the only HBM traffic is one full-bandwidth read of K and V.

MEASURED OUTCOME (v5e, B=512, scripts/bench_variants.py): this loses to
the XLA einsum path ~8x — the per-(block, head) ops are tiny and the
kernel is sequencer/launch-bound, while XLA's window fusions, slow as
they are per byte, pipeline across the whole step. An all-heads-at-once
reformulation (0/1 indicator matmuls) inside Pallas compiled but
produced wrong results on-chip (Mosaic shape-cast miscompile at
(Bb, T, ·)->(Bb·T, ·) with fp32 operands) AND was still slower — see
docs/TPU_NOTES.md. The same indicator-matmul idea expressed in PLAIN XLA
(``decode_attention_indicator`` below) is the one that wins: 23.9 vs
37.3 ms for a 20-step B=512 decode, greedy ids identical — now the
default (``T5Config.decode_attention_impl="indicator"``). This Pallas
kernel stays as the ``"pallas"`` option for other topologies and as the
tested row-layout reference.

Semantics match ``ops.attention._attention_xla`` with Lq=1: fp32 scores,
additive fp32 bias, -1e9 key masking, exact softmax, probs cast to the
value dtype for the PV contraction. Inference-only (the decode loop is
never differentiated).

Reference behavior covered: HF T5 incremental decoding with KV cache, as
driven by ``generate(max_new_tokens=20)`` (reference
architectures/T5VisionModel.py:200-205).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e9


def decode_attention_reference(q, k, v, bias=None, kv_mask=None, *,
                               heads: int, scale: float = 1.0):
    """XLA reference: q (B, W), k/v (B, T, W), bias (H, T), kv_mask (B, T)
    -> (B, W). Same math as ops.attention._attention_xla at Lq=1."""
    B, T, W = k.shape
    Dh = W // heads
    qh = q.reshape(B, heads, Dh)
    kh = k.reshape(B, T, heads, Dh)
    vh = v.reshape(B, T, heads, Dh)
    s = jnp.einsum("bhd,bthd->bht", qh, kh.astype(q.dtype)
                   ).astype(jnp.float32)
    if scale != 1.0:
        s = s * scale
    if bias is not None:
        s = s + bias[None].astype(jnp.float32)
    if kv_mask is not None:
        s = jnp.where(kv_mask[:, None, :] != 0, s, _NEG_INF)
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    o = jnp.einsum("bht,bthd->bhd", p, vh)
    return o.reshape(B, W)


def decode_attention_indicator(q, k, v, bias=None, kv_mask=None, *,
                               heads: int, scale: float = 1.0):
    """Single-query attention on row-layout caches via 0/1 head-indicator
    GEMMs — pure XLA, no head splits, no batched matvecs.

    The head-layout einsum path compiles each per-step q.Kt / P.V to a
    kLoop window fusion (~92 us for ~2.6 MFLOP — the dominant decode
    cost, see t5.t5_greedy_decode). Here the caches stay (B, T, W) rows
    (killing the cross-K/V head-split copies too) and the per-head
    reductions become two MXU dots against a constant (W, H) indicator:

      scores[b,t,h] = sum_w (q[b,w]*k[b,t,w]) * seg[w,h]
      out[b,w]      = sum_t (p @ seg.T)[b,t,w] * v[b,t,w]

    The elementwise (B, T, W) passes keep the full 512-lane width, so
    nothing runs off the fast path. fp32 products/accumulation; probs
    rounded to the value dtype before the PV pass — the same semantics
    as ``decode_attention_reference`` (parity: tests/test_decode_attention).

    q: (B, W); k, v: (B, T, W); bias: (H, T); kv_mask: (B, T) -> (B, W).
    """
    B, T, W = k.shape
    H = heads
    Dh = W // H
    # 0/1 indicator: exact in any dtype (one nonzero per row/column)
    seg = (jax.lax.broadcasted_iota(jnp.int32, (W, H), 0) // Dh
           == jax.lax.broadcasted_iota(jnp.int32, (W, H), 1)
           ).astype(q.dtype)
    # (B, T, W) intermediates stay in the compute dtype — the HBM-traffic
    # floor per layer is one bf16 pass over K and one over V; under bf16
    # the per-element q*k products round once before the fp32-accumulated
    # indicator dot (the reference's MXU keeps them exact), the ONLY
    # deviation from decode_attention_reference. The PV side is exact:
    # p_exp is a 0/1 scatter of p (value-copying), and its products
    # against V accumulate in fp32 like the reference einsum.
    prod = q[:, None, :] * k.astype(q.dtype)
    # HIGHEST so fp32 operands are NOT bf16-truncated on the MXU (TPU's
    # default precision); a no-op for bf16 production inputs. Without it
    # the "exact" 0/1 dots silently round their fp32 operand.
    s = jax.lax.dot_general(
        prod.reshape(B * T, W), seg, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST).reshape(B, T, H)
    s = s.astype(q.dtype).astype(jnp.float32)  # reference rounding point
    if scale != 1.0:
        s = s * scale
    if bias is not None:
        s = s + jnp.transpose(bias)[None].astype(jnp.float32)
    if kv_mask is not None:
        s = jnp.where(kv_mask[:, :, None] != 0, s, _NEG_INF)
    p = jax.nn.softmax(s, axis=1)  # over T
    p = p.astype(q.dtype)  # reference rounding point
    p_exp = jax.lax.dot_general(
        p.reshape(B * T, H), seg, (((1,), (1,)), ((), ())),
        preferred_element_type=q.dtype,
        precision=jax.lax.Precision.HIGHEST).reshape(B, T, W)
    o = jnp.sum(p_exp.astype(jnp.float32) * v.astype(jnp.float32), axis=1)
    return o.astype(q.dtype)


def block_attention_indicator(q, k, v, *, heads: int, bias=None,
                              kv_mask=None, scale: float = 1.0):
    """Block-query (Lq=S) attention on row-layout caches via the same 0/1
    head-indicator GEMMs as :func:`decode_attention_indicator` — the
    speculative-verification pass's attention (models/t5.
    t5_spec_greedy_decode): S draft positions attend the whole cache with
    NO head-split transposes of K/V (the (B, T, H, Dh) relayout copies
    were most of the naive block pass's cost on v5e).

    q: (B, S, W); k, v: (B, T, W); bias: additive fp32 (B, S, H, T)
    (per-row validity folded in by the caller); kv_mask: (B, T).
    Returns (B, S, W). Same rounding points as the single-query
    indicator path.

    HBM assumption (ADVICE r3): ``prod`` is a (B, S, T, W) intermediate —
    ~215 MB bf16 per layer pass at the largest measured config
    (cross-attention, B=512, S=5, T=82, W=512) IF XLA materializes it
    instead of fusing it into the dot_general (profiles at the measured
    configs show it fused). Self-attention keeps T = S+1 small, so the
    cross-attention term bounds it. If encoder lengths or batches grow
    past the serving configs, chunk over T here before assuming fusion.
    """
    B, S, W = q.shape
    T = k.shape[1]
    H = heads
    Dh = W // H
    seg = (jax.lax.broadcasted_iota(jnp.int32, (W, H), 0) // Dh
           == jax.lax.broadcasted_iota(jnp.int32, (W, H), 1)
           ).astype(q.dtype)
    prod = q[:, :, None, :] * k[:, None, :, :].astype(q.dtype)  # (B,S,T,W)
    s = jax.lax.dot_general(
        prod.reshape(B * S * T, W), seg, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST).reshape(B, S, T, H)
    s = s.astype(q.dtype).astype(jnp.float32)  # reference rounding point
    if scale != 1.0:
        s = s * scale
    if bias is not None:
        s = s + jnp.transpose(bias, (0, 1, 3, 2))  # (B,S,H,T)->(B,S,T,H)
    if kv_mask is not None:
        s = jnp.where(kv_mask[:, None, :, None] != 0, s, _NEG_INF)
    p = jax.nn.softmax(s, axis=2)  # over T
    p = p.astype(q.dtype)  # reference rounding point
    p_exp = jax.lax.dot_general(
        p.reshape(B * S * T, H), seg, (((1,), (1,)), ((), ())),
        preferred_element_type=q.dtype,
        precision=jax.lax.Precision.HIGHEST).reshape(B, S, T, W)
    o = jnp.sum(p_exp.astype(jnp.float32)
                * v[:, None, :, :].astype(jnp.float32), axis=2)
    return o.astype(q.dtype)


def _make_kernel(Bb, T, W, H, Dh, scale, has_bias, has_mask):
    """Flat-2D formulation (Mosaic-friendly): broadcasting a (Bb, 1, Dh)
    query over the sublane dim of a (Bb, T, Dh) key block fails the TPU
    compiler, so instead the query rows are replicated T× with an exact
    0/1 matmul and everything runs on (Bb·T, ·) 2-D tiles; per-(b,h)
    score rows come back via free leading-dim reshapes."""
    def kernel(*refs):
        i = 0
        q_ref, k_ref, v_ref = refs[0], refs[1], refs[2]
        i = 3
        bias_ref = refs[i] if has_bias else None
        i += 1 if has_bias else 0
        mask_ref = refs[i] if has_mask else None
        i += 1 if has_mask else 0
        o_ref = refs[i]

        q = q_ref[...]                    # (Bb, W)
        mask_add = None
        if mask_ref is not None:
            # additive -1e9 instead of where-replace: jnp.where on an int
            # mask fails the Mosaic TPU compile; at fp32 both make the
            # masked exp underflow to exactly 0, so outputs are identical
            mask_add = (1.0 - mask_ref[...].astype(jnp.float32)) * _NEG_INF
        # replication matrix: (R @ x)[b·T + t] = x[b] — exact in any dtype
        # (single nonzero per output row)
        rows = jax.lax.broadcasted_iota(jnp.int32, (Bb * T, Bb), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (Bb * T, Bb), 1)
        R = (rows // T == cols).astype(q.dtype)
        # per-head (Bb·T, Dh) working set — slicing the full (Bb·T, W)
        # flats here instead would triple the VMEM footprint and OOM at
        # cross-attention sizes (B=512, T=82)
        for h in range(H):
            sl = slice(h * Dh, (h + 1) * Dh)
            kh = k_ref[:, :, sl].reshape(Bb * T, Dh)
            # fp32 operands need HIGHEST to avoid MXU bf16 truncation;
            # Mosaic rejects fp32 contract precision for bf16 operands,
            # so pick per-dtype (bf16 dots are single-pass either way)
            prec = (jax.lax.Precision.HIGHEST if q.dtype == jnp.float32
                    else jax.lax.Precision.DEFAULT)
            qr = jax.lax.dot_general(
                R, q[:, sl], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec).astype(q.dtype)
            # fp32 products + fp32 accumulate, rounded to the compute
            # dtype once — the same semantics as the MXU einsum in
            # decode_attention_reference
            s = jnp.sum(
                qr.astype(jnp.float32) * kh.astype(jnp.float32),
                axis=-1, keepdims=True)          # (Bb·T, 1)
            s = s.astype(q.dtype).astype(jnp.float32).reshape(Bb, T)
            if scale != 1.0:
                s = s * scale
            if bias_ref is not None:
                s = s + bias_ref[h:h + 1, :].astype(jnp.float32)
            if mask_add is not None:
                s = s + mask_add
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            pf = p.astype(q.dtype).reshape(Bb * T, 1)
            vh = v_ref[:, :, sl].reshape(Bb * T, Dh)
            pv = pf.astype(jnp.float32) * vh.astype(jnp.float32)
            o_ref[:, sl] = jnp.sum(
                pv.reshape(Bb, T, Dh), axis=1).astype(o_ref.dtype)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("heads", "scale", "interpret"))
def decode_attention(q, k, v, bias=None, kv_mask=None, *, heads: int,
                     scale: float = 1.0, interpret: bool = False):
    """Fused single-query attention.

    q: (B, W); k, v: (B, T, W) row-layout caches; bias: optional (H, T)
    additive scores (T5 relative-position row at the current step);
    kv_mask: optional (B, T) key validity. Returns (B, W).
    """
    B, T, W = k.shape
    Dh = W // heads
    if (W % 128 != 0 or T < 16) and not interpret:
        # W: lane alignment; T: Mosaic rejects the (Bb, T, ·) -> (Bb·T, ·)
        # leading-dim collapse for tiny T (probed: T=5 fails, T>=16 ok —
        # scripts/mosaic_probe.py)
        return decode_attention_reference(
            q, k, v, bias, kv_mask, heads=heads, scale=scale)
    # batch block: K+V rows for the block (~3 MB single-buffered; the
    # flat-2D working set adds ~2x that in fp32 transients). Sized by the
    # actual element width — fp32 inputs would otherwise overrun 2x.
    bb = max(1, min(B, (3 * 1024 * 1024) // (2 * T * W * k.dtype.itemsize)))
    while B % bb:
        bb -= 1
    kern = _make_kernel(bb, T, W, heads, Dh, scale, bias is not None,
                        kv_mask is not None)
    mem = pl.ANY if interpret else pltpu.VMEM
    qspec = pl.BlockSpec((bb, W), lambda b: (b, 0), memory_space=mem)
    kvspec = pl.BlockSpec((bb, T, W), lambda b: (b, 0, 0), memory_space=mem)
    in_specs = [qspec, kvspec, kvspec]
    args = [q, k, v]
    if bias is not None:
        in_specs.append(pl.BlockSpec((heads, T), lambda b: (0, 0),
                                     memory_space=mem))
        args.append(bias)
    if kv_mask is not None:
        in_specs.append(pl.BlockSpec((bb, T), lambda b: (b, 0),
                                     memory_space=mem))
        args.append(kv_mask.astype(jnp.int32))
    return pl.pallas_call(
        kern,
        grid=(B // bb,),
        in_specs=in_specs,
        out_specs=qspec,
        out_shape=jax.ShapeDtypeStruct((B, W), q.dtype),
        interpret=interpret,
    )(*args)


# ---------------------------------------------------------------------------
# One-pass fused indicator kernel
# ---------------------------------------------------------------------------


def _make_fused_kernel(Bb, T, W, H, Dh, scale, has_bias, has_mask):
    """Full-lane-width formulation of :func:`decode_attention_indicator`
    inside one kernel: the (Bb·T, W) flats (query replication via an exact
    0/1 R-matmul, q⊙K products, the head-indicator score/expansion dots
    and the R**T segment-sum) all keep 512 lanes on the MXU/VPU; only the
    8 per-head softmaxes touch narrow data. Every reshape is a leading-dim
    collapse/split (probed OK in bf16, scripts/mosaic_probe.py)."""
    def kernel(*refs):
        i = 3
        q_ref, k_ref, v_ref = refs[0], refs[1], refs[2]
        bias_ref = refs[i] if has_bias else None
        i += 1 if has_bias else 0
        mask_ref = refs[i] if has_mask else None
        i += 1 if has_mask else 0
        o_ref = refs[i]

        q = q_ref[...]
        dt = q.dtype
        rows = jax.lax.broadcasted_iota(jnp.int32, (Bb * T, Bb), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (Bb * T, Bb), 1)
        R = (rows // T == cols).astype(dt)  # exact replication matrix
        # Mosaic requires 32-bit matmul accumulators; the 0/1 matmuls
        # copy values exactly, so the fp32->dt casts are lossless
        # HIGHEST keeps fp32 operands un-truncated on the MXU — the 0/1
        # matmuls are only "exact" if the data operand isn't rounded
        # first. Mosaic rejects fp32 contract precision on bf16 operands,
        # so pick per-dtype (bf16 dots are single-pass either way).
        prec = (jax.lax.Precision.HIGHEST if dt == jnp.float32
                else jax.lax.Precision.DEFAULT)
        qr = jax.lax.dot_general(
            R, q, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec).astype(dt)
        kf = k_ref[...].reshape(Bb * T, W)
        prod = qr * kf  # dt products (the indicator path's one rounding)
        wi = jax.lax.broadcasted_iota(jnp.int32, (W, H), 0)
        hi = jax.lax.broadcasted_iota(jnp.int32, (W, H), 1)
        seg = (wi // Dh == hi).astype(dt)
        s8 = jax.lax.dot_general(
            prod, seg, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec)  # (Bb*T, H)
        mask_add = None
        if mask_ref is not None:
            mask_add = (1.0 - mask_ref[...].astype(jnp.float32)) * _NEG_INF
        cols_p = []
        for h in range(H):
            s = s8[:, h:h + 1].reshape(Bb, T)
            s = s.astype(dt).astype(jnp.float32)  # reference rounding
            if scale != 1.0:
                s = s * scale
            if bias_ref is not None:
                s = s + bias_ref[h:h + 1, :].astype(jnp.float32)
            if mask_add is not None:
                s = s + mask_add
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            cols_p.append(p.astype(dt).reshape(Bb * T, 1))
        p8 = jnp.concatenate(cols_p, axis=1)  # (Bb*T, H) value-exact
        p_exp = jax.lax.dot_general(
            p8, seg, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec).astype(dt)  # exact copy
        pv = (p_exp.astype(jnp.float32)
              * v_ref[...].reshape(Bb * T, W).astype(jnp.float32))
        # pv is fp32 even in bf16 mode — HIGHEST here keeps the segment
        # sum fp32-accurate like the reference's fp32 p·V accumulation
        o_ref[...] = jax.lax.dot_general(
            R.astype(jnp.float32), pv, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST).astype(o_ref.dtype)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("heads", "scale", "interpret"))
def decode_attention_fused(q, k, v, bias=None, kv_mask=None, *, heads: int,
                           scale: float = 1.0, interpret: bool = False):
    """One-pass fused single-query attention (indicator formulation).

    Same signature/semantics as :func:`decode_attention` /
    :func:`decode_attention_indicator`: q (B, W), k/v (B, T, W) row
    caches, bias (H, T), kv_mask (B, T) -> (B, W). K and V cross HBM
    exactly once; the XLA indicator path pays ~3x that in materialized
    (B, T, W) intermediates.

    MEASURED OUTCOME (v5e, 20-step B=512 decode inside the real
    while_loop): 96.8 ms vs 24.0 ms for the XLA indicator path, greedy
    ids identical. Like the per-head kernel above, per-step work at
    these shapes is too small to amortize Mosaic kernel overhead, even
    with every op at full lane width — HBM traffic is NOT the binding
    constraint XLA-side. Kept as the tested third formulation
    (``decode_attention_impl="fused"``); the default stays "indicator".
    """
    B, T, W = k.shape
    Dh = W // heads
    if (W % 128 != 0 or T < 16) and not interpret:
        return decode_attention_reference(
            q, k, v, bias, kv_mask, heads=heads, scale=scale)
    # block budget: K+V dt blocks + two (Bb*T, W) dt flats + one fp32
    # flat ~= 4*itemsize * Bb * T * W bytes (8 at bf16 — the on-chip
    # probed value, kept exactly), plus double-buffered K/V pipelines;
    # ~5 MB keeps the worst case (cross-attention T=64) under the 16 MB
    # scoped-VMEM limit (probed: 8 MB budget OOMs at 17.5 MB there).
    # fp32 inputs double the divisor instead of overrunning.
    bb = max(1, min(B, (5 * 1024 * 1024)
                    // (4 * k.dtype.itemsize * T * W)))
    while B % bb:
        bb -= 1
    kern = _make_fused_kernel(bb, T, W, heads, Dh, scale, bias is not None,
                              kv_mask is not None)
    mem = pl.ANY if interpret else pltpu.VMEM
    qspec = pl.BlockSpec((bb, W), lambda b: (b, 0), memory_space=mem)
    kvspec = pl.BlockSpec((bb, T, W), lambda b: (b, 0, 0), memory_space=mem)
    in_specs = [qspec, kvspec, kvspec]
    args = [q, k, v]
    if bias is not None:
        in_specs.append(pl.BlockSpec((heads, T), lambda b: (0, 0),
                                     memory_space=mem))
        args.append(bias)
    if kv_mask is not None:
        in_specs.append(pl.BlockSpec((bb, T), lambda b: (b, 0),
                                     memory_space=mem))
        args.append(kv_mask.astype(jnp.int32))
    return pl.pallas_call(
        kern,
        grid=(B // bb,),
        in_specs=in_specs,
        out_specs=qspec,
        out_shape=jax.ShapeDtypeStruct((B, W), q.dtype),
        interpret=interpret,
    )(*args)
