"""int8 W8A8 serving quantization (ops/quant.py + MPRServer quantize=).

The reference has no quantization (pure fp32 torch); these tests pin the
TPU-native int8 path's numerics contract: bounded error per GEMM,
pack/quantize commutation for the fused QKV kernels, plan scoping (T5
only vs +CLIP), fp32 scale preservation through cast_compute, and the
end-to-end serving integration.
"""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodalpromptretrieval_tpu.models import mprgen
from multimodalpromptretrieval_tpu.models.clip import CLIPConfig
from multimodalpromptretrieval_tpu.models.t5 import T5Config
from multimodalpromptretrieval_tpu.ops.quant import (
    dense_q8,
    is_quantized,
    kconcat,
    kslice,
    quantize_kernel,
    quantize_params,
    quantized_paths,
)


def test_dense_q8_error_bound():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(16, 64)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(64, 48)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(48,)).astype(np.float32))
    y = dense_q8(x, quantize_kernel(w), b)
    ref = x @ w + b
    rel = float(jnp.max(jnp.abs(y - ref)) / jnp.max(jnp.abs(ref)))
    # two symmetric int8 roundings: worst case ~(1/127 + 1/127) of the
    # row/channel amplitude; 2% leaves headroom for accumulation
    assert rel < 0.02, rel


def test_dense_q8_zero_rows_and_bf16():
    w = jnp.asarray(np.eye(8, dtype=np.float32))
    x = jnp.zeros((4, 8), jnp.bfloat16)
    y = dense_q8(x, quantize_kernel(w))
    assert y.dtype == jnp.bfloat16
    assert np.asarray(y).max() == 0.0


def test_pack_quantize_commutes():
    """kconcat of quantized kernels == quantize of the packed kernel
    (per-out-channel scales are local to each column)."""
    rng = np.random.default_rng(1)
    ks = [jnp.asarray(rng.normal(size=(3, 16, 8)).astype(np.float32))
          for _ in range(3)]
    packed_then_q = quantize_kernel(jnp.concatenate(ks, axis=2))
    q_then_packed = kconcat([quantize_kernel(k) for k in ks], axis=2)
    np.testing.assert_array_equal(packed_then_q["q8"],
                                  q_then_packed["q8"])
    np.testing.assert_allclose(packed_then_q["q_scale"],
                               q_then_packed["q_scale"], rtol=0, atol=0)
    # kslice picks layer i of both leaves
    sl = kslice(q_then_packed, 1)
    assert sl["q8"].shape == (16, 24) and sl["q_scale"].shape == (1, 24)


def test_kconcat_guards():
    rng = np.random.default_rng(2)
    raw = jnp.asarray(rng.normal(size=(4, 4)).astype(np.float32))
    q = quantize_kernel(raw)
    with pytest.raises(ValueError, match="mixed"):
        kconcat([raw, q], axis=1)
    with pytest.raises(ValueError, match="out"):
        kconcat([q, q], axis=0)
    # raw-only passes through to jnp.concatenate
    assert kconcat([raw, raw], axis=0).shape == (8, 4)


def _tiny_cfg(**kw):
    return mprgen.MPRGenConfig(
        t5=T5Config(vocab_size=256, d_model=32, d_kv=8, d_ff=64,
                    num_layers=2, num_decoder_layers=2, num_heads=4),
        clip=CLIPConfig(embed_dim=32, image_resolution=32, vision_width=32,
                        vision_layers=2, patch_size=16, context_length=16,
                        vocab_size=64, text_width=32,
                        vision_heads_override=2, text_heads_override=2),
        use_image_info=True, max_source_length=48, max_target_length=8,
        **kw)


def test_quantize_params_plan_scoping():
    cfg = _tiny_cfg()
    params = mprgen.init_mprgen(jax.random.PRNGKey(0), cfg)
    q_t5 = quantize_params(params, t5=True, clip=False)
    paths = quantized_paths(q_t5)
    assert any(p.startswith("t5.encoder") for p in paths)
    assert any(p.startswith("t5.decoder") for p in paths)
    assert not any(p.startswith("clip") for p in paths)
    # CLIP subtree passed through by reference, masters untouched
    assert q_t5["clip"] is params["clip"]
    assert not quantized_paths(params)
    q_all = quantize_params(params, t5=True, clip=True)
    assert any(p.startswith("clip.visual") for p in quantized_paths(q_all))
    assert any(p.startswith("clip.text") for p in quantized_paths(q_all))
    # the LM head / shared embedding is never quantized (argmax reads it)
    assert not is_quantized(q_all["t5"]["shared"])


def test_cast_compute_keeps_q_scale_fp32():
    cfg = dataclasses.replace(_tiny_cfg(), compute_dtype="bfloat16")
    params = mprgen.init_mprgen(jax.random.PRNGKey(0), cfg)
    qp = quantize_params(params, t5=True, clip=True)
    cast = mprgen.cast_compute(qp, cfg)

    scales, others = [], []

    def walk(node, inq):
        if isinstance(node, dict):
            for k, v in node.items():
                if k == "q_scale":
                    scales.append(v)
                elif k == "q8":
                    others.append(v)
                else:
                    walk(v, inq)

    walk(cast, False)
    assert scales and others
    assert all(s.dtype == jnp.float32 for s in scales)
    assert all(q.dtype == jnp.int8 for q in others)
    # ordinary fp32 leaves did get cast
    assert cast["t5"]["shared"].dtype == jnp.bfloat16


@pytest.mark.parametrize("impl", ["xla", "row"])
def test_predict_quantized_runs(impl):
    cfg = _tiny_cfg()
    cfg = dataclasses.replace(
        cfg, t5=dataclasses.replace(cfg.t5, attention_impl=impl),
        clip=dataclasses.replace(cfg.clip, attention_impl=impl))
    params = mprgen.init_mprgen(jax.random.PRNGKey(0), cfg)
    qp = quantize_params(params, t5=True, clip=True)
    rng = np.random.default_rng(0)
    batch = {
        "images": rng.normal(size=(2, 3, 32, 32)).astype(np.float32),
        "input_ids": rng.integers(2, 256, size=(2, 12)).astype(np.int32),
        "text_mask": np.ones((2, 12), np.int32),
    }
    fn = jax.jit(lambda p, b: mprgen.predict_fn(p, cfg, b,
                                                max_new_tokens=4))
    toks = np.asarray(fn(qp, batch))
    assert toks.shape == (2, 5) and toks.dtype == np.int32


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    from multimodalpromptretrieval_tpu.data.synthetic import (
        generate_synthetic_slake,
        synthetic_config,
    )
    from multimodalpromptretrieval_tpu.train.experiment import Experiment

    root = str(tmp_path_factory.mktemp("quant_serve"))
    generate_synthetic_slake(os.path.join(root, "SLAKE"), n_train=16,
                             n_validate=8, n_test=8, image_size=32, seed=0)
    cfg = synthetic_config(root, batch_size=4, epochs=1, image_size=32,
                           retrieval=True, k=2)
    cfg["clip_overrides"]["image_resolution"] = 32
    cfg["clip_overrides"]["patch_size"] = 16
    cfg["cache_retrieval"] = False
    paths = dict(log_root=os.path.join(root, "logs"),
                 model_root=os.path.join(root, "models"))
    exp = Experiment(cfg, train_mode=True, quiet=True, **paths)
    exp.train()
    return Experiment(cfg, train_mode=False, quiet=True, **paths)


def test_server_int8_serves_and_mostly_agrees(trained):
    from multimodalpromptretrieval_tpu.serve import MPRServer

    fp = MPRServer(trained)
    q = MPRServer(trained, quantize="int8")
    entries = trained.dataset_test.entries
    images = np.stack([trained.images[e["image_name"]] for e in entries])
    questions = [e["question"] for e in entries]
    tasks = [e["task"] for e in entries]
    a_fp = fp.answer(images, questions, tasks)
    a_q = q.answer(images, questions, tasks)
    assert len(a_q) == len(entries)
    assert all(isinstance(a, str) for a in a_q)
    # T5-only quantization leaves retrieval untouched and perturbs each
    # logit by <~1%; on a trained (peaked) model most answers survive
    match = sum(x == y for x, y in zip(a_fp, a_q)) / len(a_fp)
    assert match >= 0.5, (match, list(zip(a_fp, a_q)))
    # master params were not quantized in place
    assert not quantized_paths(trained.params)


def test_server_int8_rejects_unknown_mode(trained):
    from multimodalpromptretrieval_tpu.serve import MPRServer

    with pytest.raises(ValueError, match="quantize"):
        MPRServer(trained, quantize="int4")
