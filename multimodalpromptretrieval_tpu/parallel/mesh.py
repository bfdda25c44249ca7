"""Mesh construction and pjit-sharded train / eval / predict steps.

Strategy (SURVEY.md §2c): **data parallelism over the ICI mesh is the
first-class strategy** at t5-small / ViT-B scale — params replicated, batch
sharded on the leading axis; XLA turns the grad reduction into a psum over
ICI.

The mesh is 2-D ("data", "model"). With ``n_model > 1`` the T5 tower runs
Megatron-style tensor parallelism: attention q/k/v and FF wi kernels are
column-sharded over "model", the o / wo kernels row-sharded
(``param_shardings``), so each block needs exactly one reduce per
sub-layer — XLA GSPMD derives the collectives from the param shardings
alone. Out of scope for perf at t5-small scale, but the mesh abstraction
must not preclude TP (validated against DP numerics in
tests/test_parallel.py and the driver's dryrun).

Everything compiles once per (variant, shape-bucket): the driver buckets
text lengths (data/batching.py) so jit never retraces in the hot loop.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from multimodalpromptretrieval_tpu.models import mprgen
from multimodalpromptretrieval_tpu.train.optim import adamw_update


def get_mesh(n_data: Optional[int] = None, n_model: int = 1) -> Mesh:
    """("data", "model") mesh over the first n_data*n_model devices."""
    devices = jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    import numpy as np

    grid = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# Megatron-style TP rules for the stacked T5 blocks (leading layer dim):
#   q/k/v, wi[, wi_0, wi_1]  (L, in, out)  -> column-shard out over "model"
#   o, wo                    (L, in, out)  -> row-shard in over "model"
# Matched by path suffix, so the same rules cover params AND the AdamW
# mu/nu moment trees (same layout one level deeper).
_COL_SUFFIXES = (("attn", "q"), ("attn", "k"), ("attn", "v"),
                 ("self_attn", "q"), ("self_attn", "k"), ("self_attn", "v"),
                 ("cross_attn", "q"), ("cross_attn", "k"),
                 ("cross_attn", "v"),
                 ("ff", "wi"), ("ff", "wi_0"), ("ff", "wi_1"))
_ROW_SUFFIXES = (("attn", "o"), ("self_attn", "o"), ("cross_attn", "o"),
                 ("ff", "wo"))


def _spec_for_path(path, leaf) -> P:
    keys = tuple(getattr(k, "key", getattr(k, "idx", None)) for k in path)
    tail = keys[-2:]
    if "t5" in keys and getattr(leaf, "ndim", 0) == 3:
        if tail in _COL_SUFFIXES:
            return P(None, None, "model")
        if tail in _ROW_SUFFIXES:
            return P(None, "model", None)
    return P()


def param_shardings(params, mesh: Mesh):
    """Pytree of NamedShardings: replicated everywhere except the T5 block
    kernels, which are tensor-sharded over the "model" axis (no-ops when
    n_model == 1 — a size-1 axis is replication)."""
    return jax.tree_util.tree_map_with_path(
        lambda p, x: NamedSharding(mesh, _spec_for_path(p, x)), params)


def shard_params(params, mesh: Mesh):
    """Place a params / opt-state pytree on the mesh: DP-replicated, with
    T5 kernels TP-sharded over "model" when the axis is wider than 1.
    On a mesh spanning processes (parallel/multihost.py) the pytree is
    placed as global arrays — each process materializes its shards from
    the identical host copy every process holds."""
    from multimodalpromptretrieval_tpu.parallel import multihost

    if multihost.spans_processes(mesh):
        return multihost.place_like(params, param_shardings(params, mesh))
    return jax.device_put(params, param_shardings(params, mesh))


def shard_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Shard every batch array over the "data" axis of the mesh (global
    placement when the mesh spans processes)."""
    from multimodalpromptretrieval_tpu.parallel import multihost

    if multihost.spans_processes(mesh):
        return multihost.global_batch(batch, mesh)
    s = batch_sharding(mesh)
    return {k: jax.device_put(v, s) for k, v in batch.items()}


def make_train_step(cfg: mprgen.MPRGenConfig, trainable=None, *,
                    mesh: Optional[Mesh] = None, donate: bool = True,
                    param_sharding=None):
    """loss+grad+AdamW in one jit.

    fn(params, opt_state, batch, lr, rng) -> (params, opt_state, loss).
    With a mesh, params/opt_state are replicated (or TP-sharded when
    ``param_sharding`` — a pytree from ``param_shardings`` — is given) and
    the batch is sharded on "data"; XLA inserts the grad psum over "data"
    and the activation reduces over "model".
    """

    def step(params, opt_state, batch, lr, rng):
        loss, grads = jax.value_and_grad(mprgen.loss_fn)(
            params, cfg, batch, rng)
        params, opt_state = adamw_update(
            params, grads, opt_state, lr, trainable=trainable)
        return params, opt_state, loss

    kwargs: Dict[str, Any] = {"static_argnums": ()}
    if mesh is not None:
        rep = replicated(mesh)
        data = batch_sharding(mesh)
        ps = param_sharding if param_sharding is not None else rep
        opt = {"mu": ps, "nu": ps, "step": rep}
        kwargs["in_shardings"] = (ps, opt, data, rep, rep)
        kwargs["out_shardings"] = (ps, opt, rep)
    if donate:
        kwargs["donate_argnums"] = (0, 1)
    return jax.jit(step, **kwargs)


def make_eval_loss_step(cfg: mprgen.MPRGenConfig, *,
                        mesh: Optional[Mesh] = None, param_sharding=None):
    """fn(params, batch) -> summed loss * batch_size contribution.

    Returns the mean loss over the batch (reference
    utils.get_validation_loss averages per-batch means weighted by batch
    size, utils.py:78-87)."""

    def step(params, batch):
        return mprgen.loss_fn(params, cfg, batch)

    kwargs: Dict[str, Any] = {}
    if mesh is not None:
        ps = param_sharding if param_sharding is not None \
            else replicated(mesh)
        kwargs["in_shardings"] = (ps, batch_sharding(mesh))
        kwargs["out_shardings"] = replicated(mesh)
    return jax.jit(step, **kwargs)


def make_predict_step(cfg: mprgen.MPRGenConfig, *, max_new_tokens: int = 20,
                      mesh: Optional[Mesh] = None, param_sharding=None):
    """fn(params, batch) -> generated token ids / class ids, batch-sharded."""

    def step(params, batch):
        return mprgen.predict_fn(params, cfg, batch, max_new_tokens)

    kwargs: Dict[str, Any] = {}
    if mesh is not None:
        ps = param_sharding if param_sharding is not None \
            else replicated(mesh)
        kwargs["in_shardings"] = (ps, batch_sharding(mesh))
        kwargs["out_shardings"] = batch_sharding(mesh)
    return jax.jit(step, **kwargs)


def make_predict_step_shardmap(cfg: mprgen.MPRGenConfig, mesh: Mesh, *,
                               max_new_tokens: int = 20):
    """DP predict step wrapped in shard_map (params replicated, batch split
    on "data").

    GSPMD treats Pallas custom calls (ops/row_attention.py,
    ops/decode_attention.py) as opaque and would gather their operands to
    every device under plain pjit on a real multi-chip mesh; shard_map
    instead hands each device its local batch shard and the kernels
    partition by construction. DP-only — TP-sharded params need the pjit
    path (``make_predict_step`` with ``param_sharding``).
    """
    from jax import shard_map

    def local(params, batch):
        return mprgen.predict_fn(params, cfg, batch, max_new_tokens)

    fn = shard_map(local, mesh=mesh, in_specs=(P(), P("data")),
                   out_specs=P("data"), check_vma=False)
    return jax.jit(fn)


def make_prefix_predict_step(cfg: mprgen.MPRGenConfig, *,
                             max_new_tokens: int = 20,
                             mesh: Optional[Mesh] = None,
                             param_sharding=None):
    """Generative predict over precomputed visual prefixes (batch keys:
    prefix, input_ids, text_mask)."""

    def step(params, batch):
        params = mprgen.cast_compute(params, cfg)
        return mprgen.generative_predict_from_prefix(
            params, cfg, batch["prefix"], batch["input_ids"],
            batch["text_mask"], max_new_tokens)

    kwargs: Dict[str, Any] = {}
    if mesh is not None:
        ps = param_sharding if param_sharding is not None \
            else replicated(mesh)
        kwargs["in_shardings"] = (ps, batch_sharding(mesh))
        kwargs["out_shardings"] = batch_sharding(mesh)
    return jax.jit(step, **kwargs)


def make_fused_serve_step(cfg: mprgen.MPRGenConfig, *, k: int,
                          use_quantifier: bool, eos_id: int,
                          max_new_tokens: int = 20, topk_impl: str = "auto",
                          skip_first: bool = False,
                          spec_block: int = 0,
                          mesh: Optional[Mesh] = None):
    """The whole per-request serve pipeline in ONE jit: CLIP text tower →
    (img ⊕ txt) L2 top-k over the device-resident index → in-graph
    majority vote + quantifier bucket → pre-tokenized hint splice → T5
    encode → greedy decode.

    fn(params, batch, index, index_sq, aid, hint_ids, hint_len) -> tokens,
    where batch = {prefix (B,P,d), q_ids (B,W) question ids padded to the
    final width (no EOS), q_len (B,), clip_text_ids (B,Lc),
    img_emb (B,E) fp32}. Token-exact vs the host path under the
    boundary-safety contract (retrieval/hints.py; tested in
    tests/test_serve_fastpath.py).

    ``spec_block`` > 0 switches the decode to hint-draft speculative
    verification: the step gains one trailing arg (draft_ids —
    retrieval/hints.build_draft_tables rows indexed by dense answer id;
    rows are zero-padded, and pad ids past a draft's true length merely
    stop matching) and drafts each row with its majority-vote answer's
    label tokens. Token outputs are unchanged by construction."""
    import jax.numpy as jnp

    from multimodalpromptretrieval_tpu.models.clip import clip_encode_text
    from multimodalpromptretrieval_tpu.ops.topk import l2_topk
    from multimodalpromptretrieval_tpu.retrieval import hints as rhints
    from multimodalpromptretrieval_tpu.retrieval.index import (
        QUANTIFIER_BUCKETS,
    )

    def step(params, batch, index, index_sq, aid, hint_ids, hint_len,
             draft_ids=None):
        params = mprgen.cast_compute(params, cfg)
        txt = clip_encode_text(params["clip"], cfg.clip,
                               batch["clip_text_ids"]).astype(jnp.float32)
        query = jnp.concatenate(
            [batch["img_emb"].astype(jnp.float32), txt], axis=1)
        _, idx = l2_topk(query, index, k, index_sq=index_sq,
                         impl=topk_impl, skip_first=skip_first)
        rows = rhints.vote_rows(aid[idx], use_quantifier)
        ids, mask = rhints.splice_hints(
            batch["q_ids"], batch["q_len"], hint_ids[rows],
            hint_len[rows], eos_id)
        drafts = None
        if spec_block > 0 and draft_ids is not None:
            winner = rows // len(QUANTIFIER_BUCKETS) if use_quantifier \
                else rows
            drafts = draft_ids[winner]
        return mprgen.generative_predict_from_prefix(
            params, cfg, batch["prefix"], ids, mask, max_new_tokens,
            draft_ids=drafts, spec_block=spec_block)

    kwargs: Dict[str, Any] = {}
    if mesh is not None:
        rep = replicated(mesh)
        shardings = [rep, batch_sharding(mesh), rep, rep, rep, rep, rep]
        if spec_block > 0:
            shardings += [rep]
        kwargs["in_shardings"] = tuple(shardings)
        kwargs["out_shardings"] = batch_sharding(mesh)
    return jax.jit(step, **kwargs)


def make_image_embed_prefix_step(cfg: mprgen.MPRGenConfig, *,
                                 mesh: Optional[Mesh] = None):
    """fn(params, images) -> (pooled CLIP embedding (B, E), T5 visual
    prefix (B, P, d_model)) — ONE ViT trunk pass per image (token 0 of
    ``clip_image_tokens`` is ``encode_image``). The serve path uses this
    to share the trunk between retrieval queries and decode prefixes.
    ViT towers only (``cfg.resnet is None``)."""
    from multimodalpromptretrieval_tpu.models.clip import clip_image_tokens

    def step(params, images):
        params = mprgen.cast_compute(params, cfg)
        if cfg.compute_dtype != "float32":
            import jax.numpy as jnp

            images = images.astype(jnp.dtype(cfg.compute_dtype))
        tokens = clip_image_tokens(params["clip"], cfg.clip, images)
        return tokens[:, 0], mprgen.image_prefix_from_tokens(
            params, cfg, tokens)

    kwargs: Dict[str, Any] = {}
    if mesh is not None:
        kwargs["in_shardings"] = (replicated(mesh), batch_sharding(mesh))
        kwargs["out_shardings"] = (batch_sharding(mesh),
                                   batch_sharding(mesh))
    return jax.jit(step, **kwargs)


def make_vision_tokens_step(cfg: mprgen.MPRGenConfig, *,
                            mesh: Optional[Mesh] = None,
                            param_sharding=None):
    """fn(params, images) -> frozen-trunk features (ViT tokens (B, P, C)
    or RN layer4 grid): the loop-invariant part of the visual path.
    Experiment.train caches these per unique image so the per-step work is
    only the trainable tail (mapping/projection) + T5."""

    def step(params, images):
        params = mprgen.cast_compute(params, cfg)
        if cfg.compute_dtype != "float32":
            import jax.numpy as jnp

            images = images.astype(jnp.dtype(cfg.compute_dtype))
        return mprgen.vision_trunk(params, cfg, images)

    kwargs: Dict[str, Any] = {}
    if mesh is not None:
        ps = param_sharding if param_sharding is not None \
            else replicated(mesh)
        kwargs["in_shardings"] = (ps, batch_sharding(mesh))
        kwargs["out_shardings"] = replicated(mesh)
    return jax.jit(step, **kwargs)


def make_image_prefix_step(cfg: mprgen.MPRGenConfig, *,
                           mesh: Optional[Mesh] = None, param_sharding=None):
    """fn(params, images) -> (B, P, d_model) visual prefixes."""

    def step(params, images):
        params = mprgen.cast_compute(params, cfg)
        if cfg.compute_dtype != "float32":
            import jax.numpy as jnp

            images = images.astype(jnp.dtype(cfg.compute_dtype))
        return mprgen.image_prefix(params, cfg, images)

    kwargs: Dict[str, Any] = {}
    if mesh is not None:
        ps = param_sharding if param_sharding is not None \
            else replicated(mesh)
        kwargs["in_shardings"] = (ps, batch_sharding(mesh))
        kwargs["out_shardings"] = batch_sharding(mesh)
    return jax.jit(step, **kwargs)
