"""Index-sharded retrieval: local top-k per shard + all-gather merge.

The retrieval index is (N, 1024) fp32 (dataset/VQAFeatureDataset.py:145-167
in the reference). Sharding it row-wise over the "data" mesh axis makes the
distance matmul and candidate scan fully parallel; each device produces its
local top-k (with globally-offset indices), a k-per-device all-gather rides
the ICI, and a final merge keeps the overall top-k. Results are identical to
the single-device kernel: distances ascending, ties to the lower corpus row.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from multimodalpromptretrieval_tpu.ops.topk import _l2_topk_xla

# plain float (weakly-typed; promotes to the fp32 operand dtype) — a
# module-level jnp constant would initialize the XLA backend at import
# time, which breaks jax.distributed.initialize (multihost.py)
_BIG = 3.4e38


def pad_index_for_mesh(index, mesh: Mesh):
    """Pad the corpus to a multiple of the data-axis size and shard it."""
    n_shards = mesh.shape["data"]
    n = index.shape[0]
    pad = (-n) % n_shards
    padded = jnp.pad(index, ((0, pad), (0, 0)))
    sharded = jax.device_put(
        padded, NamedSharding(mesh, P("data", None)))
    return sharded, n


def sharded_l2_topk(query, index_sharded, n_valid: int, k: int, *,
                    mesh: Mesh, skip_first: bool = False):
    """Top-k nearest rows by L2 over a row-sharded index.

    query: (B, D) replicated. index_sharded: (N_pad, D) sharded on "data".
    Returns (distances (B, k), global indices (B, k)) — identical ranking to
    ops.topk.l2_topk on the unsharded index.
    """
    fetch = k + 1 if skip_first else k
    n_shards = mesh.shape["data"]
    rows_per = index_sharded.shape[0] // n_shards

    def local(q, idx_shard):
        # idx_shard arrives (rows_per, D) inside shard_map
        shard_id = jax.lax.axis_index("data")
        sq = jnp.sum(jnp.square(idx_shard.astype(jnp.float32)), axis=-1)
        # mask padded tail rows (global row id >= n_valid)
        base = shard_id * rows_per
        local_ids = base + jax.lax.broadcasted_iota(
            jnp.int32, (rows_per, 1), 0)[:, 0]
        sq = jnp.where(local_ids < n_valid, sq, _BIG)
        d, i = _l2_topk_xla(q, idx_shard, min(fetch, rows_per), sq)
        gi = base + i
        # gather candidates from every shard: (n_shards, B, fetch)
        all_d = jax.lax.all_gather(d, "data")
        all_i = jax.lax.all_gather(gi, "data")
        B = q.shape[0]
        cand_d = jnp.transpose(all_d, (1, 0, 2)).reshape(B, -1)
        cand_i = jnp.transpose(all_i, (1, 0, 2)).reshape(B, -1)
        # merge with lower-global-index tie-break: sort candidates by index
        # first, then a stable sort by distance keeps ascending index among
        # equal distances.
        idx_order = jnp.argsort(cand_i, axis=1)
        d_by_idx = jnp.take_along_axis(cand_d, idx_order, axis=1)
        i_by_idx = jnp.take_along_axis(cand_i, idx_order, axis=1)
        final = jnp.argsort(d_by_idx, axis=1)[:, :fetch]
        out_d = jnp.take_along_axis(d_by_idx, final, axis=1)
        out_i = jnp.take_along_axis(i_by_idx, final, axis=1)
        return out_d, out_i

    from jax import shard_map

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(), P("data", None)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    d, i = fn(query, index_sharded)
    if skip_first:
        d, i = d[:, 1:], i[:, 1:]
    return d, i.astype(jnp.int32)
