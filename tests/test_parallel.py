"""Mesh / pjit sharding tests on the virtual 8-device CPU platform.

The reference has no distribution story (SURVEY.md §2c); these tests pin
down the TPU build's: DP train step over a ("data","model") mesh, sharded
batch placement, and the index-sharded retrieval top-k whose merged result
must equal the single-device kernel exactly.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodalpromptretrieval_tpu.models import mprgen
from multimodalpromptretrieval_tpu.models.clip import CLIPConfig
from multimodalpromptretrieval_tpu.models.t5 import T5Config
from multimodalpromptretrieval_tpu.ops.topk import l2_topk
from multimodalpromptretrieval_tpu.parallel import (
    mesh as pmesh,
    retrieval as pret,
)
from multimodalpromptretrieval_tpu.train.optim import adamw_init


def _tiny_cfg():
    return mprgen.MPRGenConfig(
        t5=T5Config(vocab_size=256, d_model=32, d_kv=8, d_ff=64,
                    num_layers=2, num_decoder_layers=2, num_heads=4),
        clip=CLIPConfig(embed_dim=32, image_resolution=32, vision_width=32,
                        vision_layers=1, patch_size=16, context_length=8,
                        vocab_size=64, text_width=32,
                        vision_heads_override=2, text_heads_override=2),
        use_image_info=True,
    )


def _batch(cfg, B):
    rng = np.random.default_rng(0)
    R = cfg.clip.image_resolution
    return {
        "images": rng.normal(size=(B, 3, R, R)).astype(np.float32),
        "input_ids": rng.integers(2, cfg.t5.vocab_size,
                                  size=(B, 12)).astype(np.int32),
        "text_mask": np.ones((B, 12), np.int32),
        "labels": rng.integers(2, cfg.t5.vocab_size,
                               size=(B, 6)).astype(np.int64),
    }


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return pmesh.get_mesh(n_data=8)


def test_dp_train_step_runs_and_matches_single_device(mesh):
    cfg = _tiny_cfg()
    params = mprgen.init_mprgen(jax.random.PRNGKey(0), cfg)
    opt = adamw_init(params)
    batch = _batch(cfg, 16)

    # single-device reference
    step1 = pmesh.make_train_step(cfg, donate=False)
    p1, _, loss1 = step1(params, opt, batch, jnp.float32(1e-3),
                         jax.random.PRNGKey(1))

    # 8-way DP
    p = pmesh.shard_params(params, mesh)
    o = pmesh.shard_params(opt, mesh)
    b = pmesh.shard_batch(batch, mesh)
    step8 = pmesh.make_train_step(cfg, mesh=mesh, donate=False)
    p8, _, loss8 = step8(p, o, b, jnp.float32(1e-3), jax.random.PRNGKey(1))

    np.testing.assert_allclose(float(loss1), float(loss8), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(p1["t5"]["shared"]), np.asarray(p8["t5"]["shared"]),
        rtol=2e-5, atol=2e-6)


def test_tp_train_step_matches_dp_numerics(mesh):
    """4x2 ("data","model") mesh: Megatron-sharded T5 kernels must produce
    the same loss and updated params as pure DP (the "model" axis has a
    real job — VERDICT r1 #8)."""
    cfg = _tiny_cfg()
    params = mprgen.init_mprgen(jax.random.PRNGKey(0), cfg)
    opt = adamw_init(params)
    batch = _batch(cfg, 16)

    step1 = pmesh.make_train_step(cfg, donate=False)
    p1, _, loss1 = step1(params, opt, batch, jnp.float32(1e-3),
                         jax.random.PRNGKey(1))

    tp_mesh = pmesh.get_mesh(n_data=4, n_model=2)
    ps = pmesh.param_shardings(params, tp_mesh)
    # the T5 block kernels really are sharded over "model"
    q_spec = ps["t5"]["encoder"]["block"]["attn"]["q"].spec
    assert q_spec == jax.sharding.PartitionSpec(None, None, "model")
    wo_spec = ps["t5"]["encoder"]["block"]["ff"]["wo"].spec
    assert wo_spec == jax.sharding.PartitionSpec(None, "model", None)

    p = pmesh.shard_params(params, tp_mesh)
    o = pmesh.shard_params(opt, tp_mesh)
    b = pmesh.shard_batch(batch, tp_mesh)
    step_tp = pmesh.make_train_step(cfg, mesh=tp_mesh, donate=False,
                                    param_sharding=ps)
    p_tp, _, loss_tp = step_tp(p, o, b, jnp.float32(1e-3),
                               jax.random.PRNGKey(1))

    np.testing.assert_allclose(float(loss1), float(loss_tp), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(p1["t5"]["shared"]), np.asarray(p_tp["t5"]["shared"]),
        rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(
        np.asarray(p1["t5"]["encoder"]["block"]["ff"]["wi"]),
        np.asarray(p_tp["t5"]["encoder"]["block"]["ff"]["wi"]),
        rtol=2e-5, atol=2e-6)


def test_tp_predict_matches_dp_tokens(mesh):
    cfg = _tiny_cfg()
    params = mprgen.init_mprgen(jax.random.PRNGKey(0), cfg)
    batch = _batch(cfg, 16)
    pbatch = {k: v for k, v in batch.items() if k != "labels"}

    ref = np.asarray(pmesh.make_predict_step(cfg, max_new_tokens=5)(
        params, pbatch))

    tp_mesh = pmesh.get_mesh(n_data=4, n_model=2)
    ps = pmesh.param_shardings(params, tp_mesh)
    p = pmesh.shard_params(params, tp_mesh)
    b = pmesh.shard_batch(pbatch, tp_mesh)
    got = np.asarray(pmesh.make_predict_step(
        cfg, max_new_tokens=5, mesh=tp_mesh, param_sharding=ps)(p, b))
    np.testing.assert_array_equal(ref, got)


def test_shardmap_predict_matches_single_device(mesh):
    # shard_map is the multi-chip serve path: Pallas custom calls don't
    # auto-partition under pjit, so the serve step hands each device its
    # local batch shard explicitly. Tokens must match the unsharded jit.
    cfg = _tiny_cfg()
    params = mprgen.init_mprgen(jax.random.PRNGKey(0), cfg)
    batch = _batch(cfg, 16)
    pbatch = {k: v for k, v in batch.items() if k != "labels"}

    ref = np.asarray(pmesh.make_predict_step(cfg, max_new_tokens=5)(
        params, pbatch))
    b = pmesh.shard_batch(pbatch, mesh)
    got = np.asarray(pmesh.make_predict_step_shardmap(
        cfg, mesh, max_new_tokens=5)(params, b))
    np.testing.assert_array_equal(ref, got)


def test_sharded_batch_placement(mesh):
    cfg = _tiny_cfg()
    b = pmesh.shard_batch(_batch(cfg, 16), mesh)
    sh = b["images"].sharding
    assert sh.is_equivalent_to(pmesh.batch_sharding(mesh), 4)


def test_sharded_retrieval_matches_single_device(mesh):
    rng = np.random.default_rng(3)
    index = rng.normal(size=(100, 64)).astype(np.float32)
    query = rng.normal(size=(5, 64)).astype(np.float32)
    # duplicate rows to exercise tie-breaking across shard boundaries
    index[50] = index[3]
    index[77] = index[3]
    ref_d, ref_i = l2_topk(jnp.asarray(query), jnp.asarray(index), 7,
                           impl="xla")
    sharded, n_valid = pret.pad_index_for_mesh(jnp.asarray(index), mesh)
    d, i = pret.sharded_l2_topk(jnp.asarray(query), sharded, n_valid, 7,
                                mesh=mesh)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ref_i))
    np.testing.assert_allclose(np.asarray(d), np.asarray(ref_d),
                               rtol=1e-5, atol=1e-5)


def test_sharded_retrieval_skip_first(mesh):
    rng = np.random.default_rng(4)
    index = rng.normal(size=(64, 32)).astype(np.float32)
    query = index[10:14]  # queries drawn from the corpus
    sharded, n_valid = pret.pad_index_for_mesh(jnp.asarray(index), mesh)
    d, i = pret.sharded_l2_topk(jnp.asarray(query), sharded, n_valid, 3,
                                mesh=mesh, skip_first=True)
    # the self-match (distance 0) must be gone
    assert np.all(np.asarray(d) > 1e-3)
    for row, qi in zip(np.asarray(i), range(10, 14)):
        assert qi not in row


def test_image_embed_prefix_step_matches_separate_paths(mesh):
    """The fused serve step (one ViT trunk pass) must reproduce
    clip_encode_image and mprgen.image_prefix exactly."""
    from multimodalpromptretrieval_tpu.models.clip import clip_encode_image

    cfg = _tiny_cfg()
    params = mprgen.init_mprgen(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(1)
    R = cfg.clip.image_resolution
    images = jnp.asarray(rng.normal(size=(8, 3, R, R)), jnp.float32)

    emb, prefix = pmesh.make_image_embed_prefix_step(cfg)(params, images)
    ref_emb = jax.jit(lambda p, x: clip_encode_image(p["clip"], cfg.clip,
                                                     x))(params, images)
    ref_prefix = jax.jit(lambda p, x: mprgen.image_prefix(p, cfg, x))(
        params, images)
    np.testing.assert_allclose(np.asarray(emb), np.asarray(ref_emb),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(prefix), np.asarray(ref_prefix),
                               rtol=1e-6, atol=1e-6)


def test_fused_serve_step_sharded_matches_single_device(mesh):
    """The ONE-jit serve program (CLIP text -> top-k -> in-graph vote ->
    hint splice -> T5 encode+decode; parallel/mesh.make_fused_serve_step)
    must produce identical greedy tokens batch-sharded over the mesh —
    the multi-chip version of the serve fast path
    (tests/test_serve_fastpath.py pins it against the host pipeline)."""
    cfg = _tiny_cfg()
    params = mprgen.init_mprgen(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(7)
    B, W, Lq = 16, 20, 10
    E = cfg.clip.embed_dim
    R = cfg.clip.image_resolution

    images = jnp.asarray(rng.normal(size=(B, 3, R, R)), jnp.float32)
    emb, prefix = pmesh.make_image_embed_prefix_step(cfg)(params, images)

    q_ids = np.zeros((B, W), np.int32)
    q_len = rng.integers(4, Lq + 1, size=(B,)).astype(np.int32)
    for r in range(B):
        q_ids[r, :q_len[r]] = rng.integers(2, cfg.t5.vocab_size,
                                           size=(q_len[r],))
    n_ans, hint_w, corpus = 6, 5, 40
    batch = {
        "prefix": prefix,
        "q_ids": jnp.asarray(q_ids),
        "q_len": jnp.asarray(q_len),
        "clip_text_ids": jnp.asarray(rng.integers(
            1, cfg.clip.vocab_size,
            size=(B, cfg.clip.context_length)), jnp.int32),
        "img_emb": emb.astype(jnp.float32),
    }
    index = jnp.asarray(rng.normal(size=(corpus, 2 * E)), jnp.float32)
    index_sq = jnp.sum(jnp.square(index), axis=-1)
    aid = jnp.asarray(rng.integers(0, n_ans, size=(corpus,)), jnp.int32)
    hint_ids = jnp.asarray(rng.integers(
        2, cfg.t5.vocab_size, size=(n_ans * 6, hint_w)), jnp.int32)
    hint_len = jnp.asarray(rng.integers(
        2, hint_w + 1, size=(n_ans * 6,)), jnp.int32)

    kw = dict(k=3, use_quantifier=True, eos_id=1, max_new_tokens=4,
              topk_impl="xla")
    ref = pmesh.make_fused_serve_step(cfg, **kw)(
        params, batch, index, index_sq, aid, hint_ids, hint_len)
    got = pmesh.make_fused_serve_step(cfg, mesh=mesh, **kw)(
        pmesh.shard_params(params, mesh), pmesh.shard_batch(batch, mesh),
        index, index_sq, aid, hint_ids, hint_len)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
