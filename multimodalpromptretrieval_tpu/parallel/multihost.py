"""Multi-host (multi-process) execution over DCN via ``jax.distributed``.

The reference is a single-process, single-GPU script (SURVEY.md §2c), so
the distribution story is owned entirely by this framework. Within one
host, parallelism is the ``("data", "model")`` mesh (parallel/mesh.py).
This module extends the SAME mesh across hosts: ``jax.distributed`` forms
the cluster, ``jax.devices()`` becomes the global device set, and the
GSPMD-sharded steps are unchanged — XLA routes the gradient psum over ICI
within a host and DCN across hosts.

Execution contract (the standard JAX multi-controller model):

* every process runs the same program over the same host-side data — the
  data layer is deterministic per seed, so each process derives identical
  batches and global arrays are built with ``make_array_from_callback``,
  where each process materializes only its addressable shards;
* every process executes the same sequence of global computations (the
  jitted steps); host-only work may differ;
* host artifacts (checkpoints, logs) are written by process 0 only
  (:func:`is_primary`).

Validated WITHOUT a cluster in tests/test_multihost.py: two OS processes
× N virtual CPU devices (gloo collectives standing in for DCN) train
identically to one process over the same global mesh — the raw train step
bit-exactly, the full Experiment to float precision (cross-process psum
reduction order differs from the single-process all-reduce by ≤4e-7).
"""

from __future__ import annotations

import os
from functools import lru_cache
from typing import Any, Dict, Optional

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None, *,
               platform: Optional[str] = None) -> None:
    """Form (or join) the multi-process cluster. Call once per process,
    before building meshes or placing arrays.

    Arguments default to JAX's own environment/cluster auto-detection
    (``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` /
    ``JAX_PROCESS_ID``, or the cluster plugins). ``platform="cpu"``
    forces the host platform with gloo cross-process collectives — the
    no-hardware validation mode. The session may pre-pin a TPU platform
    through a pre-imported jax, so the env var alone is too late;
    ``jax.config`` is the reliable override (docs/TPU_NOTES.md).
    """
    if platform is not None:
        os.environ["JAX_PLATFORMS"] = platform
        jax.config.update("jax_platforms", platform)
    try:
        on_cpu = platform == "cpu" or jax.config.read(
            "jax_platforms") == "cpu"
    except Exception:
        on_cpu = platform == "cpu"
    if on_cpu:
        # cross-process collectives on the host platform (stands in for
        # DCN when validating without a cluster); must precede initialize
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    kwargs: Dict[str, Any] = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = int(num_processes)
    if process_id is not None:
        kwargs["process_id"] = int(process_id)
    jax.distributed.initialize(**kwargs)


def shutdown() -> None:
    """Leave the cluster (safe to call when not initialized)."""
    try:
        jax.distributed.shutdown()
    except Exception:
        pass


def barrier(name: str = "mpr_barrier") -> None:
    """Block until every process reaches this point. Use between a
    primary-only artifact write (checkpoint) and its consumption by other
    processes over the shared FS. No-op in single-process runs."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


def is_primary() -> bool:
    """True on the process that owns host artifacts (checkpoints, logs).
    Also true in ordinary single-process runs."""
    return jax.process_index() == 0


@lru_cache(maxsize=None)
def spans_processes(mesh: Mesh) -> bool:
    """True when ``mesh`` contains devices this process cannot address —
    i.e. arrays on it are global and host transfers must go through
    :func:`place` / :func:`fetch`."""
    me = jax.process_index()
    return any(d.process_index != me for d in mesh.devices.flat)


def _place_leaf(x: Any, sharding: NamedSharding):
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        return x  # already a global array; trust its placement
    host = np.asarray(x)
    return jax.make_array_from_callback(
        host.shape, sharding, lambda idx: host[idx])


def place(tree: Any, mesh: Mesh, spec: P = P()) -> Any:
    """Place host data (identical on every process) as GLOBAL arrays with
    partition ``spec`` on ``mesh``. Each process only materializes its
    addressable shards; leaves that are already global pass through."""
    sh = NamedSharding(mesh, spec)
    return jax.tree_util.tree_map(lambda x: _place_leaf(x, sh), tree)


def place_like(tree: Any, shardings: Any) -> Any:
    """:func:`place` with a per-leaf sharding pytree (e.g.
    ``parallel.mesh.param_shardings`` for TP-sharded parameters)."""
    return jax.tree_util.tree_map(_place_leaf, tree, shardings)


def global_batch(arrays: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Batch dict (host, identical per process) -> global arrays sharded
    over the mesh "data" axis."""
    sh = NamedSharding(mesh, P("data"))
    return {k: _place_leaf(v, sh) for k, v in arrays.items()}


@lru_cache(maxsize=None)
def _replicator(mesh: Mesh):
    # one jit object per mesh so repeated fetches hit the trace cache
    return jax.jit(lambda a: a, out_shardings=NamedSharding(mesh, P()))


def fetch(x: Any, mesh: Mesh) -> np.ndarray:
    """Device -> host fetch that also works on cross-process sharded
    arrays: replicate over the mesh inside jit (an all-gather), then read
    the local copy. Falls back to a plain ``np.asarray`` when nothing
    spans processes (the zero-overhead single-host path)."""
    if (not isinstance(x, jax.Array) or x.is_fully_addressable
            or x.is_fully_replicated):
        return np.asarray(x)
    return np.asarray(_replicator(mesh)(x))
