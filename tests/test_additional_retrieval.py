"""use_additional_retrieval_data (BASELINE config #5): the prebuilt
synthetic-ROCO cache is appended to the main retrieval index
(dataset/VQAFeatureDataset.py:169-181 behavior)."""

import json
import os

import numpy as np
import pytest

from multimodalpromptretrieval_tpu.data.synthetic import (
    generate_synthetic_slake,
    synthetic_config,
)
from multimodalpromptretrieval_tpu.retrieval.index import RetrievalIndex
from multimodalpromptretrieval_tpu.train.experiment import Experiment


def test_additional_corpus_extends_index(tmp_path):
    root = str(tmp_path)
    generate_synthetic_slake(os.path.join(root, "SLAKE"), n_train=16,
                             n_validate=8, n_test=8, image_size=32, seed=0)
    # prebuilt "ROCO" cache with matching embedding dim (2 * embed_dim)
    rng = np.random.default_rng(0)
    emb = rng.normal(size=(10, 128)).astype(np.float32)
    roco = RetrievalIndex(
        emb, [f"roco{i}" for i in range(10)],
        {"question_type": ["open"] * 10,
         "question_id": [str(100000 + i) for i in range(10)],
         "question": [f"rq{i}" for i in range(10)]})
    cache_path = os.path.join(root, "roco_cache", "index.npz")
    roco.save(cache_path)

    cfg = synthetic_config(root, batch_size=8, epochs=1, image_size=32,
                           retrieval=True, k=2)
    cfg["clip_overrides"]["image_resolution"] = 32
    cfg["clip_overrides"]["patch_size"] = 16
    cfg["use_additional_retrieval_data"] = 1
    cfg["additional_retrieval_cache"] = cache_path
    cfg["cache_retrieval"] = False

    exp = Experiment(cfg, train_mode=True, quiet=True,
                     log_root=os.path.join(root, "logs"),
                     model_root=os.path.join(root, "models"))
    n_train_corpus = len(exp.retrieval_dataset.entries)
    assert len(exp.retrieval_index) == n_train_corpus + 10
    assert exp.retrieval_index.embeddings.shape == (n_train_corpus + 10, 128)
    # hints still precompute against the extended corpus
    exp.precompute_hints(exp.dataset_train, "train")
    hint = exp.hint_for(exp.dataset_train.entries[0], "train")
    assert hint.startswith("I believe the answer is ")
