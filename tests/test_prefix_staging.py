"""Device-resident prefix staging for eval (Experiment.stage_image_prefixes).

``Experiment.test`` stages the visual-prefix table on device and batches
gather their rows there (serve-style; no per-batch prefix upload). These
tests pin that the staged gather feeds predict steps EXACTLY what the host
table path (``compute_image_prefixes``) fed them, including the padded last
staging chunk, and that staged-batch predictions match the direct path.
"""

import os

import numpy as np

import jax.numpy as jnp


def _experiment(tmp_path, n_train=8, n_test=7):
    # n_test=7 with batch_size 4 -> the unique-image count is NOT a
    # multiple of the staging chunk, exercising the pad-to-B tail
    from multimodalpromptretrieval_tpu.data.synthetic import (
        generate_synthetic_slake,
        synthetic_config,
    )
    from multimodalpromptretrieval_tpu.train.experiment import Experiment

    root = str(tmp_path / "synth")
    generate_synthetic_slake(os.path.join(root, "SLAKE"), n_train=n_train,
                             n_validate=4, n_test=n_test, image_size=32,
                             seed=0)
    cfg = synthetic_config(root, batch_size=4, epochs=1, image_size=32)
    cfg["clip_overrides"]["image_resolution"] = 32
    cfg["clip_overrides"]["patch_size"] = 16
    return Experiment(cfg, train_mode=False, quiet=True,
                      log_root=os.path.join(str(tmp_path), "logs"),
                      model_root=os.path.join(str(tmp_path), "models"))


def test_staged_gather_matches_host_table(tmp_path):
    exp = _experiment(tmp_path)
    entries = exp.dataset_test.entries
    host = exp.compute_image_prefixes(entries)
    exp.stage_image_prefixes(entries)
    table, rows = exp._prefix_dev
    assert set(rows) == set(host)
    for name, r in rows.items():
        np.testing.assert_array_equal(np.asarray(table[r]), host[name])

    batches = exp.make_split_batches(exp.dataset_test, "test",
                                     prefix_rows=True)
    for b in batches:
        dev = exp.device_batch(b)
        assert "prefix_rows" not in dev and "images" not in dev
        want = np.stack([host[e["image_name"]] for e in b.entries])
        np.testing.assert_array_equal(np.asarray(dev["prefix"]), want)


def test_staged_predictions_match_direct_path(tmp_path):
    from multimodalpromptretrieval_tpu.parallel import mesh as pmesh

    exp = _experiment(tmp_path)
    entries = exp.dataset_test.entries
    exp.stage_image_prefixes(entries)
    pstep = pmesh.make_prefix_predict_step(exp.model_cfg, max_new_tokens=4,
                                           mesh=exp.mesh)
    staged = [np.asarray(pstep(exp.params, exp.device_batch(b)))[b.valid]
              for b in exp.make_split_batches(exp.dataset_test, "test",
                                              prefix_rows=True)]
    dstep = pmesh.make_predict_step(exp.model_cfg, max_new_tokens=4,
                                    mesh=exp.mesh)
    direct = [np.asarray(dstep(exp.params, exp.device_batch(b)))[b.valid]
              for b in exp.make_split_batches(exp.dataset_test, "test")]
    for a, b in zip(staged, direct):
        assert (a == b).all()
