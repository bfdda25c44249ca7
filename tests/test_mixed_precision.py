"""Mixed precision: bf16 compute over fp32 masters trains and predicts."""

import numpy as np

import jax
import jax.numpy as jnp

from multimodalpromptretrieval_tpu.models import mprgen
from multimodalpromptretrieval_tpu.models.clip import CLIPConfig
from multimodalpromptretrieval_tpu.models.t5 import T5Config
from multimodalpromptretrieval_tpu.parallel import mesh as pmesh
from multimodalpromptretrieval_tpu.train.optim import adamw_init


def _cfg(dtype):
    return mprgen.MPRGenConfig(
        t5=T5Config(vocab_size=128, d_model=32, d_kv=8, d_ff=64,
                    num_layers=1, num_decoder_layers=1, num_heads=4),
        clip=CLIPConfig.tiny(),
        compute_dtype=dtype,
    )


def _batch(cfg, B=4):
    rng = np.random.default_rng(0)
    R = cfg.clip.image_resolution
    return {
        "images": rng.normal(size=(B, 3, R, R)).astype(np.float32),
        "input_ids": rng.integers(2, 128, size=(B, 8)).astype(np.int32),
        "text_mask": np.ones((B, 8), np.int32),
        "labels": rng.integers(2, 128, size=(B, 4)).astype(np.int64),
    }


def test_bf16_train_step_keeps_fp32_masters():
    cfg = _cfg("bfloat16")
    params = mprgen.init_mprgen(jax.random.PRNGKey(0), cfg)
    step = pmesh.make_train_step(cfg, donate=False)
    p2, _, loss = step(params, adamw_init(params), _batch(cfg),
                       jnp.float32(1e-3), jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    # masters stay fp32 and actually move
    leaf = p2["t5"]["shared"]
    assert leaf.dtype == jnp.float32
    assert not np.allclose(np.asarray(leaf),
                           np.asarray(params["t5"]["shared"]))


def test_bf16_loss_close_to_fp32():
    p32 = mprgen.init_mprgen(jax.random.PRNGKey(0), _cfg("float32"))
    b = _batch(_cfg("float32"))
    l32 = float(mprgen.loss_fn(p32, _cfg("float32"), b))
    l16 = float(mprgen.loss_fn(p32, _cfg("bfloat16"), b))
    assert abs(l16 - l32) / max(abs(l32), 1e-6) < 0.05


def test_bf16_predict_returns_ids():
    cfg = _cfg("bfloat16")
    params = mprgen.init_mprgen(jax.random.PRNGKey(0), cfg)
    b = _batch(cfg)
    del b["labels"]
    out = mprgen.predict_fn(params, cfg, b, max_new_tokens=4)
    assert out.dtype == jnp.int32 and out.shape == (4, 5)


def test_bf16_adamw_moments_track_fp32_trajectory():
    """`adamw_moments_dtype` (the r5 optimizer-footprint lever): moments
    stored bf16, math in fp32 — the short-horizon trajectory must stay
    close to the fp32-moment run and the stored dtype must persist
    across steps."""
    cfg = _cfg("float32")
    params = mprgen.init_mprgen(jax.random.PRNGKey(0), cfg)
    batch = _batch(cfg)
    step = pmesh.make_train_step(cfg, donate=False)

    p32, o32 = params, adamw_init(params)
    p16, o16 = params, adamw_init(params, moments_dtype="bfloat16")
    assert o16["mu"]["t5"]["shared"].dtype == jnp.bfloat16
    for i in range(4):
        key = jax.random.PRNGKey(i)
        p32, o32, l32 = step(p32, o32, batch, jnp.float32(1e-3), key)
        p16, o16, l16 = step(p16, o16, batch, jnp.float32(1e-3), key)
    assert o16["nu"]["t5"]["shared"].dtype == jnp.bfloat16
    # same masks per step -> only moment-rounding drift separates them
    np.testing.assert_allclose(float(l32), float(l16), rtol=5e-3)
    np.testing.assert_allclose(np.asarray(p32["t5"]["shared"]),
                               np.asarray(p16["t5"]["shared"]),
                               rtol=5e-2, atol=5e-4)


def test_adamw_moments_dtype_config_key_reaches_opt_state(tmp_path):
    """`adamw_moments_dtype` in the experiment JSON must reach the
    allocated optimizer state (the key the bench t5-large trainer
    recipe relies on)."""
    import os

    from multimodalpromptretrieval_tpu.data.synthetic import (
        generate_synthetic_slake,
        synthetic_config,
    )
    from multimodalpromptretrieval_tpu.train.experiment import Experiment

    root = str(tmp_path)
    generate_synthetic_slake(os.path.join(root, "SLAKE"), n_train=8,
                             n_validate=4, n_test=4, image_size=32,
                             seed=5)
    cfg = synthetic_config(root, batch_size=4, epochs=1)
    cfg["clip_overrides"]["image_resolution"] = 32
    cfg["adamw_moments_dtype"] = "bfloat16"
    exp = Experiment(cfg, train_mode=True, quiet=True,
                     log_root=os.path.join(root, "logs"),
                     model_root=os.path.join(root, "models"))
    assert exp.opt_state["mu"]["t5"]["shared"].dtype == jnp.bfloat16
    assert exp.opt_state["nu"]["t5"]["shared"].dtype == jnp.bfloat16
