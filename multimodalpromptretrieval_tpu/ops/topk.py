"""Fused L2-distance + top-k retrieval kernel.

Reference semantics (dataset/VQAFeatureDataset.py:192-197): Euclidean
``torch.cdist`` of the (B, 1024) query batch against the (N, 1024) corpus
index, row-wise ``argsort`` ascending, then slice ``[1:1+k]`` in the training
phase (self-match skip) or ``[0:k]`` at test time. NOTE: the similarity is
**L2 over raw (un-normalized) CLIP embeddings, not cosine** (SURVEY.md
quirk #1) — rank parity is defined against that.

Implementations:
  * ``_l2_topk_xla``    — (-2 q @ idx^T + |idx|^2) on the MXU + ``lax.top_k``.
  * ``_l2_topk_pallas`` — single Pallas kernel streaming the index through
    VMEM in blocks, keeping a running per-row top-k in scratch; the distance
    matrix is never materialized in HBM.

Both return distances ascending with ties broken by the lower corpus index
(stable, matching a stable argsort of the distance row).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Python float, not a jnp scalar: the Pallas kernel must not capture traced
# constants (pallas_call rejects captured consts).
_BIG = 3.4e38


def _sq_dists(query: jnp.ndarray, index: jnp.ndarray, index_sq: jnp.ndarray):
    """Squared L2 distances via the MXU. query (B,D), index (N,D)."""
    dots = jnp.dot(query.astype(jnp.float32), index.T.astype(jnp.float32),
                   preferred_element_type=jnp.float32)
    q_sq = jnp.sum(jnp.square(query.astype(jnp.float32)), axis=-1, keepdims=True)
    return q_sq - 2.0 * dots + index_sq[None, :]


def _l2_topk_xla(query, index, k, index_sq):
    sq = _sq_dists(query, index, index_sq)
    neg, idx = jax.lax.top_k(-sq, k)  # lax.top_k is stable (lower index wins ties)
    return jnp.sqrt(jnp.maximum(-neg, 0.0)), idx.astype(jnp.int32)


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------


def _topk_kernel(q_ref, idx_ref, nsq_ref, qsq_ref, out_d_ref, out_i_ref,
                 best_d, best_i, *, k: int, block_n: int, n: int):
    """Grid = (num_n_blocks,). Running top-k lives in VMEM scratch."""
    j = pl.program_id(0)
    nb = pl.num_programs(0)

    @pl.when(j == 0)
    def _init():
        best_d[:] = jnp.full_like(best_d, _BIG)
        best_i[:] = jnp.zeros_like(best_i)

    #

    q = q_ref[:]
    blk = idx_ref[:]
    dots = jax.lax.dot_general(q, blk, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)
    sq = qsq_ref[:] - 2.0 * dots + nsq_ref[:]  # (B, block_n)
    col = j * block_n + jax.lax.broadcasted_iota(
        jnp.int32, sq.shape, 1)
    sq = jnp.where(col < n, sq, _BIG)  # mask the padded tail of the index

    # Merge the block into the running top-k: k extraction passes.
    B = sq.shape[0]
    kp = best_d.shape[1]
    cand_d = jnp.concatenate([best_d[:], sq], axis=1)
    cand_i = jnp.concatenate([best_i[:], col], axis=1)
    new_d = []
    new_i = []
    for _ in range(k):
        m = jnp.min(cand_d, axis=1, keepdims=True)  # (B, 1)
        # stable argmin: lowest corpus index among equal-distance entries
        pos_of_min = jnp.min(
            jnp.where(cand_d == m, cand_i, jnp.int32(2**30)), axis=1,
            keepdims=True)
        taken = jnp.logical_and(cand_d == m, cand_i == pos_of_min)
        new_d.append(m)
        new_i.append(pos_of_min)
        cand_d = jnp.where(taken, _BIG, cand_d)
    pad = kp - k
    if pad:
        new_d.append(jnp.full((B, pad), _BIG))
        new_i.append(jnp.zeros((B, pad), jnp.int32))
    best_d[:] = jnp.concatenate(new_d, axis=1)
    best_i[:] = jnp.concatenate(new_i, axis=1)

    @pl.when(j == nb - 1)
    def _done():
        out_d_ref[:] = jnp.sqrt(jnp.maximum(best_d[:], 0.0))
        out_i_ref[:] = best_i[:]


@functools.partial(jax.jit, static_argnames=("k", "block_n", "interpret"))
def _l2_topk_pallas(query, index, k, index_sq, block_n=512, interpret=False):
    B, D = query.shape
    N = index.shape[0]
    block_n = min(block_n, max(128, 1 << (N - 1).bit_length()))
    padN = (-N) % block_n
    idx_p = jnp.pad(index, ((0, padN), (0, 0)))
    nsq_p = jnp.pad(index_sq, (0, padN))
    nb = idx_p.shape[0] // block_n
    kp = max(8, -(-k // 8) * 8)  # scratch sublane alignment
    q32 = query.astype(jnp.float32)
    qsq = jnp.sum(jnp.square(q32), axis=-1, keepdims=True)

    out_d, out_i = pl.pallas_call(
        functools.partial(_topk_kernel, k=k, block_n=block_n, n=N),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((B, D), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, D), lambda j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((B, kp), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, kp), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, kp), jnp.float32),
            jax.ShapeDtypeStruct((B, kp), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, kp), jnp.float32),
            pltpu.VMEM((B, kp), jnp.int32),
        ],
        interpret=interpret,
    )(q32, idx_p.astype(jnp.float32), nsq_p[None], qsq)
    return out_d[:, :k], out_i[:, :k]


def l2_topk(query, index, k: int, *, index_sq=None, impl="auto",
            skip_first: bool = False):
    """Top-k nearest corpus rows by Euclidean distance.

    Args:
      query: (B, D) query embeddings.
      index: (N, D) corpus embeddings.
      k: neighbours to return.
      index_sq: optional precomputed (N,) squared norms of the index rows
        (amortize across calls for a static corpus).
      skip_first: drop the single nearest match — the reference's training
        phase behavior (dataset/VQAFeatureDataset.py:194-195), which assumes
        the query itself is in the corpus.

    Returns: (distances (B, k) ascending, indices (B, k) int32).
    """
    fetch = k + 1 if skip_first else k
    if index_sq is None:
        index_sq = jnp.sum(jnp.square(index.astype(jnp.float32)), axis=-1)
    if impl == "auto":
        impl = "pallas" if jax.default_backend() not in ("cpu",) else "xla"
    if impl == "pallas":
        d, i = _l2_topk_pallas(query, index, fetch, index_sq)
    elif impl == "pallas_interpret":
        d, i = _l2_topk_pallas(query, index, fetch, index_sq, interpret=True)
    else:
        d, i = _l2_topk_xla(query, index, fetch, index_sq)
    if skip_first:
        d, i = d[:, 1:], i[:, 1:]
    return d, i
