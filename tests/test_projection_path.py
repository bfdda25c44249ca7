"""The t5-large projection path: CLIP embed_dim != T5 d_model.

The reference inserts ``nn.Linear(512, 1024)`` on the image tokens when the
T5 tower is t5-large (T5VisionModel.py:49-51,133-134) — the only config
where the visual prefix is re-projected after CLIP's own proj. No other
test runs with mismatched dims, so this file pins the whole path: param
init, loss/grad flow, the frozen-trunk cache split, prediction, and a full
Experiment train/test plus MPRServer round at tiny scale.

Order note (mprgen.image_prefix_from_tokens): the reference applies the
d_model projection BEFORE the mapping MLP, which shape-errors whenever both
are active (mapping is 512->512); we map first and project after — pinned
here for the both-active combination the reference cannot run.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodalpromptretrieval_tpu.models import mprgen
from multimodalpromptretrieval_tpu.models.clip import CLIPConfig
from multimodalpromptretrieval_tpu.models.t5 import T5Config


def _cfg(**kw):
    base = dict(
        # d_model 64 vs CLIP tiny embed_dim 16 -> needs_projection
        t5=T5Config(vocab_size=128, d_model=64, d_kv=8, d_ff=64,
                    num_layers=1, num_decoder_layers=1, num_heads=4),
        clip=CLIPConfig.tiny(),
        num_classes=7,
    )
    base.update(kw)
    return mprgen.MPRGenConfig(**base)


def _batch(cfg, B=4):
    rng = np.random.default_rng(0)
    R = cfg.clip.image_resolution
    return {
        "images": rng.normal(size=(B, 3, R, R)).astype(np.float32),
        "input_ids": rng.integers(2, 128, size=(B, 8)).astype(np.int32),
        "text_mask": np.ones((B, 8), np.int32),
        "labels": rng.integers(2, 128, size=(B, 4)).astype(np.int64),
    }


def test_projection_engaged_and_shapes():
    cfg = _cfg()
    assert cfg.needs_projection
    params = mprgen.init_mprgen(jax.random.PRNGKey(0), cfg)
    assert params["proj"]["w"].shape == (cfg.clip.embed_dim,
                                         cfg.t5.d_model)
    prefix = mprgen.image_prefix(params, cfg,
                                 jnp.asarray(_batch(cfg)["images"]))
    assert prefix.shape == (4, cfg.num_image_tokens, cfg.t5.d_model)


def test_loss_grads_flow_through_projection():
    cfg = _cfg()
    params = mprgen.init_mprgen(jax.random.PRNGKey(0), cfg)
    batch = _batch(cfg)
    loss, grads = jax.value_and_grad(
        lambda p: mprgen.loss_fn(p, cfg, batch))(params)
    assert np.isfinite(float(loss))
    assert float(jnp.abs(grads["proj"]["w"]).max()) > 0.0
    # the frozen CLIP tower gets no gradient through the prefix
    clip_max = max(float(jnp.abs(g).max())
                   for g in jax.tree_util.tree_leaves(grads["clip"]))
    assert clip_max == 0.0


def test_vision_cache_split_matches_image_path_with_projection():
    """vision_trunk caches PRE-projection tokens; the trainable projection
    must still run inside the step and produce identical losses."""
    cfg = _cfg()
    params = mprgen.init_mprgen(jax.random.PRNGKey(0), cfg)
    batch = _batch(cfg)
    tokens = mprgen.vision_trunk(mprgen.cast_compute(params, cfg), cfg,
                                 jnp.asarray(batch["images"]))
    assert tokens.shape[-1] == cfg.clip.embed_dim  # cached pre-projection
    tbatch = {k: v for k, v in batch.items() if k != "images"}
    tbatch["vision_tokens"] = tokens
    l_img = float(mprgen.loss_fn(params, cfg, batch))
    l_tok = float(mprgen.loss_fn(params, cfg, tbatch))
    np.testing.assert_allclose(l_tok, l_img, rtol=1e-6, atol=1e-6)


def test_mapping_then_projection_both_active():
    cfg = _cfg(use_mapping=True)
    params = mprgen.init_mprgen(jax.random.PRNGKey(0), cfg)
    assert params["mapping"]["fc1"]["w"].shape[0] == cfg.clip.embed_dim
    batch = _batch(cfg)
    loss, grads = jax.value_and_grad(
        lambda p: mprgen.loss_fn(p, cfg, batch))(params)
    assert np.isfinite(float(loss))
    # both trainable stages receive gradient
    assert float(jnp.abs(grads["mapping"]["fc1"]["w"]).max()) > 0.0
    assert float(jnp.abs(grads["proj"]["w"]).max()) > 0.0


def test_experiment_and_server_end_to_end_with_projection(tmp_path):
    from multimodalpromptretrieval_tpu.data.synthetic import (
        generate_synthetic_slake,
        synthetic_config,
    )
    from multimodalpromptretrieval_tpu.serve import MPRServer
    from multimodalpromptretrieval_tpu.train.experiment import Experiment

    root = str(tmp_path / "synth")
    generate_synthetic_slake(os.path.join(root, "SLAKE"), n_train=16,
                             n_validate=8, n_test=8, image_size=32, seed=0)
    cfg = synthetic_config(root, batch_size=4, epochs=1, image_size=32,
                           retrieval=True, k=2)
    cfg["clip_overrides"]["image_resolution"] = 32
    cfg["clip_overrides"]["patch_size"] = 16
    cfg["t5_overrides"]["d_model"] = 96  # != clip embed_dim 64
    cfg["cache_retrieval"] = False
    paths = dict(log_root=os.path.join(root, "logs"),
                 model_root=os.path.join(root, "models"))
    exp = Experiment(cfg, train_mode=True, quiet=True, **paths)
    assert exp.model_cfg.needs_projection
    res = exp.train()
    assert np.isfinite(res["best_valid_loss"])

    exp2 = Experiment(cfg, train_mode=False, quiet=True, **paths)
    m = exp2.test()
    assert sum(m.total.values()) == 24

    server = MPRServer(exp2)
    entries = exp2.dataset_test.entries[:5]
    images = np.stack([exp2.images[e["image_name"]] for e in entries])
    answers = server.answer(images, [e["question"] for e in entries],
                            [e["task"] for e in entries])
    assert len(answers) == 5 and all(isinstance(a, str) for a in answers)
