"""Seeded determinism: two identical runs produce identical parameters
(the reference pins seed 88 + cudnn.deterministic, main.py:37-42; the JAX
build should be bit-reproducible on a fixed platform)."""

import os

import numpy as np
import jax

from multimodalpromptretrieval_tpu.data.synthetic import (
    generate_synthetic_slake,
    synthetic_config,
)
from multimodalpromptretrieval_tpu.train.experiment import Experiment


def _train_once(root, tmp, tag):
    cfg = synthetic_config(root, batch_size=8, epochs=2, image_size=32)
    cfg["clip_overrides"]["image_resolution"] = 32
    cfg["clip_overrides"]["patch_size"] = 16
    exp = Experiment(cfg, train_mode=True, quiet=True,
                     log_root=os.path.join(tmp, f"logs{tag}"),
                     model_root=os.path.join(tmp, f"models{tag}"))
    exp.train()
    return jax.tree.map(np.asarray, exp.params)


def test_same_seed_same_params(tmp_path):
    root = str(tmp_path)
    generate_synthetic_slake(os.path.join(root, "SLAKE"), n_train=16,
                             n_validate=8, n_test=8, image_size=32, seed=0)
    p1 = _train_once(root, root, "a")
    p2 = _train_once(root, root, "b")
    leaves1 = jax.tree.leaves(p1)
    leaves2 = jax.tree.leaves(p2)
    assert len(leaves1) == len(leaves2)
    for a, b in zip(leaves1, leaves2):
        np.testing.assert_array_equal(a, b)


def test_epoch_reshuffle_draws_fresh_permutations(tmp_path):
    """Each training epoch must see a DIFFERENT batch order (the reference
    DataLoader(shuffle=True) reshuffles per epoch) while staying
    process-stable for a fixed (seed, epoch)."""
    root = str(tmp_path)
    generate_synthetic_slake(os.path.join(root, "SLAKE"), n_train=24,
                             n_validate=8, n_test=8, image_size=32, seed=0)
    cfg = synthetic_config(root, batch_size=8, epochs=1, image_size=32)
    cfg["clip_overrides"]["image_resolution"] = 32
    cfg["clip_overrides"]["patch_size"] = 16
    exp = Experiment(cfg, train_mode=True, quiet=True,
                     log_root=os.path.join(root, "logs"),
                     model_root=os.path.join(root, "models"))

    def order(epoch):
        batches = exp.make_split_batches(exp.dataset_train, "train",
                                         shuffle=True, epoch=epoch)
        return [e["question_id"] for b in batches
                for e, v in zip(b.entries, b.valid) if v]

    assert order(0) != order(1)  # fresh permutation per epoch
    assert order(0) == order(0)  # stable for a fixed epoch
    assert sorted(order(0)) == sorted(order(1))  # same entries overall
