"""Frozen-trunk vision-token cache: training from cached trunk features.

The vision tower is frozen in every reference variant
(T5VisionModel.py:29-30), so its per-token output is loop-invariant across
training steps. ``Experiment.train`` precomputes it once per unique image
(mprgen.vision_trunk) and trains from the cached tokens — these tests pin
that the cached path computes the SAME losses, gradients, and predictions
as the raw-image path, for every variant, and that end-to-end training is
unaffected.
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
        t5=T5Config(vocab_size=128, d_model=32, d_kv=8, d_ff=64,
                    num_layers=1, num_decoder_layers=1, num_heads=4),
        clip=CLIPConfig.tiny(),
        num_classes=7,
    )
    base.update(kw)
    return mprgen.MPRGenConfig(**base)


def _batch(cfg, B=4, classes=False):
    rng = np.random.default_rng(0)
    R = cfg.clip.image_resolution
    b = {
        "images": rng.normal(size=(B, 3, R, R)).astype(np.float32),
        "input_ids": rng.integers(2, 128, size=(B, 8)).astype(np.int32),
        "text_mask": np.ones((B, 8), np.int32),
    }
    if classes:
        b["class_labels"] = rng.integers(0, 7, size=(B,)).astype(np.int32)
    else:
        b["labels"] = rng.integers(2, 128, size=(B, 4)).astype(np.int64)
    return b


def _tokens_batch(params, cfg, batch):
    tokens = mprgen.vision_trunk(mprgen.cast_compute(params, cfg), cfg,
                                 jnp.asarray(batch["images"]))
    out = {k: v for k, v in batch.items() if k != "images"}
    out["vision_tokens"] = tokens
    return out


VARIANTS = {
    "generative": {},
    "head": {"use_prediction_head": True},
    "ban": {"use_prediction_head": True, "use_ban": True},
    "mapping": {"use_mapping": True},
}


@pytest.mark.parametrize("name", sorted(VARIANTS))
def test_loss_and_grads_match_image_path(name):
    cfg = _cfg(**VARIANTS[name])
    params = mprgen.init_mprgen(jax.random.PRNGKey(0), cfg)
    batch = _batch(cfg, classes=cfg.use_prediction_head)
    tbatch = _tokens_batch(params, cfg, batch)

    lg = jax.jit(jax.value_and_grad(
        lambda p, b: mprgen.loss_fn(p, cfg, b)))
    l_img, g_img = lg(params, batch)
    l_tok, g_tok = lg(params, tbatch)
    np.testing.assert_allclose(float(l_tok), float(l_img),
                               rtol=1e-6, atol=1e-6)
    flat_i = jax.tree_util.tree_leaves_with_path(g_img)
    flat_t = {jax.tree_util.keystr(p): v
              for p, v in jax.tree_util.tree_leaves_with_path(g_tok)}
    for path, leaf in flat_i:
        np.testing.assert_allclose(
            np.asarray(flat_t[jax.tree_util.keystr(path)]),
            np.asarray(leaf), rtol=1e-5, atol=1e-6,
            err_msg=f"{name}: grad mismatch at {jax.tree_util.keystr(path)}")


@pytest.mark.parametrize("name", ["generative", "head", "ban"])
def test_predict_matches_image_path(name):
    cfg = _cfg(**VARIANTS[name])
    params = mprgen.init_mprgen(jax.random.PRNGKey(0), cfg)
    batch = _batch(cfg, classes=cfg.use_prediction_head)
    batch.pop("labels", None)
    batch.pop("class_labels", None)
    tbatch = _tokens_batch(params, cfg, batch)
    out_img = np.asarray(mprgen.predict_fn(params, cfg, batch, 4))
    out_tok = np.asarray(mprgen.predict_fn(params, cfg, tbatch, 4))
    assert (out_img == out_tok).all()


def test_resnet_variant_tokens_match():
    from multimodalpromptretrieval_tpu.models.resnet import ResNetConfig

    rn = ResNetConfig(layers=(1, 1, 1, 1), width=16, image_resolution=32,
                      embed_dim=32, heads=2)
    cfg = _cfg(resnet=rn)
    params = mprgen.init_mprgen(jax.random.PRNGKey(0), cfg)
    batch = _batch(cfg)
    tbatch = _tokens_batch(params, cfg, batch)
    l_img = float(mprgen.loss_fn(params, cfg, batch))
    l_tok = float(mprgen.loss_fn(params, cfg, tbatch))
    np.testing.assert_allclose(l_tok, l_img, rtol=1e-6, atol=1e-6)


def test_experiment_trains_identically_with_and_without_cache(tmp_path):
    """End-to-end: 2 epochs over the synthetic corpus with the cache on vs
    off produce the same trained parameters (fp32; the cached trunk is the
    same computation run once instead of per step)."""
    from multimodalpromptretrieval_tpu.data.synthetic import (
        generate_synthetic_slake,
        synthetic_config,
    )
    from multimodalpromptretrieval_tpu.train.experiment import Experiment

    root = str(tmp_path / "synth")
    generate_synthetic_slake(os.path.join(root, "SLAKE"), n_train=16,
                             n_validate=8, n_test=8, image_size=32, seed=0)

    def run(cache: bool, sub: str):
        cfg = synthetic_config(root, batch_size=8, epochs=2, image_size=32)
        cfg["clip_overrides"]["image_resolution"] = 32
        cfg["clip_overrides"]["patch_size"] = 16
        cfg["cache_vision_tokens"] = cache
        exp = Experiment(cfg, train_mode=True,
                         log_root=os.path.join(str(tmp_path), sub, "logs"),
                         model_root=os.path.join(str(tmp_path), sub,
                                                 "models"),
                         quiet=True)
        exp.train()
        assert (exp._vision_tokens is not None) == cache
        return exp

    a = run(True, "on")
    b = run(False, "off")
    pa = jax.tree_util.tree_leaves_with_path(a.params)
    pb = {jax.tree_util.keystr(p): v
          for p, v in jax.tree_util.tree_leaves_with_path(b.params)}
    for path, leaf in pa:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(pb[jax.tree_util.keystr(path)]),
            rtol=1e-5, atol=1e-6,
            err_msg=f"param drift at {jax.tree_util.keystr(path)}")


def test_cache_size_guard_falls_back(tmp_path):
    from multimodalpromptretrieval_tpu.data.synthetic import (
        generate_synthetic_slake,
        synthetic_config,
    )
    from multimodalpromptretrieval_tpu.train.experiment import Experiment

    root = str(tmp_path / "synth")
    generate_synthetic_slake(os.path.join(root, "SLAKE"), n_train=8,
                             n_validate=8, n_test=8, image_size=32, seed=0)
    cfg = synthetic_config(root, batch_size=8, epochs=1, image_size=32)
    cfg["clip_overrides"]["image_resolution"] = 32
    cfg["clip_overrides"]["patch_size"] = 16
    cfg["vision_cache_max_bytes"] = 1  # force the guard
    exp = Experiment(cfg, train_mode=True,
                     log_root=os.path.join(str(tmp_path), "logs"),
                     model_root=os.path.join(str(tmp_path), "models"),
                     quiet=True)
    out = exp.train()
    assert exp._vision_tokens is None  # fell back to the image path
    assert np.isfinite(out["best_valid_loss"])
