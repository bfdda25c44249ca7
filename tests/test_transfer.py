"""Zero-shot dataset transfer (BASELINE config #4): train on synthetic
SLAKE, evaluate on synthetic VQA-RAD via ``transfer_dataset`` with a
VQA-RAD retrieval corpus — the reference's main.py:67-69 flow."""

import os

import numpy as np
import pytest

from multimodalpromptretrieval_tpu.data.datasets import load_dataset
from multimodalpromptretrieval_tpu.data.synthetic import (
    generate_synthetic_slake,
    generate_synthetic_vqarad,
    synthetic_config,
)
from multimodalpromptretrieval_tpu.train.experiment import Experiment


@pytest.fixture(scope="module")
def roots(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("transfer"))
    generate_synthetic_slake(os.path.join(root, "SLAKE"), n_train=16,
                             n_validate=8, n_test=8, image_size=32, seed=0)
    generate_synthetic_vqarad(os.path.join(root, "VQA_RAD"), n_train=12,
                              n_test=8, image_size=32, seed=1)
    return root


def test_vqarad_parsing(roots):
    ds = load_dataset(roots, "VQA_RAD", "train")
    # closed questions fan out into two entries (PRES + PRSE typo tag)
    tasks = {e["task"] for e in ds.entries}
    assert "Presence" in tasks and "Other" in tasks
    per_qid = {}
    for e in ds.entries:
        per_qid.setdefault(e["question_id"], []).append(e)
    assert any(len(v) == 2 for v in per_qid.values())
    # validate aliases train (quirk #7)
    val = load_dataset(roots, "VQA_RAD", "validate")
    assert len(val.entries) == len(ds.entries)


def test_combined_dataset(roots):
    slake = load_dataset(roots, "SLAKE", "train")
    rad = load_dataset(roots, "VQA_RAD", "train")
    comb = load_dataset(roots, "COMBINED", "train")
    assert len(comb.entries) == len(slake.entries) + len(rad.entries)
    plus = load_dataset(roots, "SLAKE+VQA_RAD", "train")
    assert len(plus.entries) == len(comb.entries)


def test_zero_shot_transfer_flow(roots, tmp_path):
    cfg = synthetic_config(roots, batch_size=8, epochs=1, image_size=32)
    cfg["clip_overrides"]["image_resolution"] = 32
    cfg["clip_overrides"]["patch_size"] = 16
    cfg["transfer_dataset"] = "VQA_RAD"
    cfg["retrieval"] = 1
    cfg["retrieval_dataset"] = "VQA_RAD"
    cfg["k"] = 2
    cfg["cache_retrieval"] = False
    paths = dict(log_root=os.path.join(str(tmp_path), "logs"),
                 model_root=os.path.join(str(tmp_path), "models"))
    # train: transfer_dataset must NOT apply (trains on SLAKE)
    exp = Experiment(cfg, train_mode=True, quiet=True, **paths)
    assert exp.data_name == "SLAKE"
    exp.train()
    # test: dataset swaps to VQA_RAD; retrieval corpus is VQA_RAD train
    exp2 = Experiment(cfg, train_mode=False, quiet=True, **paths)
    assert exp2.data_name == "VQA_RAD"
    assert type(exp2.retrieval_dataset).__name__ == "VQARADDataset"
    # the tokenizer must be the TRAINING one (checkpoint embedding rows
    # are tied to its ids), not one rebuilt from the transfer dataset
    assert exp2.tokenizer.vocab.pieces == exp.tokenizer.vocab.pieces
    q = exp2.dataset_test.entries[0]["question"]
    assert exp2.tokenizer.encode(q) == exp.tokenizer.encode(q)
    m = exp2.test()
    assert sum(m.total.values()) == len(exp2.dataset_test.entries)
    assert len(m.consistencies) == sum(m.total.values())
