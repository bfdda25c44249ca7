"""RetrievalIndex semantics: majority vote, quantifier buckets, return
modes, cache roundtrip, corpus extension (dataset/VQAFeatureDataset.py
:118-246 parity points)."""

import numpy as np
import pytest

import jax.numpy as jnp

from multimodalpromptretrieval_tpu.retrieval.index import (
    QUANTIFIER_BUCKETS,
    RetrievalIndex,
    majority_vote,
    quantifier_bucket,
)


def test_majority_vote_tie_goes_to_first_max():
    # 'a' and 'b' both occur twice; 'a' reaches its max count first
    pred, certainty = majority_vote(["a", "b", "a", "b", "c"])
    assert pred == "a"
    assert certainty == pytest.approx(2 / 5)


def test_quantifier_bucket_edges():
    """buckets[int(certainty * 5)] (quirk #11)."""
    assert quantifier_bucket(1.0) == "certainly"
    assert quantifier_bucket(0.99) == "very likely"   # int(4.95) = 4
    assert quantifier_bucket(0.5) == "maybe"          # int(2.5) = 2
    assert quantifier_bucket(0.2) == "unlikely"       # int(1.0) = 1
    assert quantifier_bucket(0.19) == "very unlikely"
    assert len(QUANTIFIER_BUCKETS) == 6


def _index(n=20, d=8, seed=0, training=False, k=3):
    rng = np.random.default_rng(seed)
    emb = rng.normal(size=(n, d)).astype(np.float32)
    answers = [f"ans{i % 4}" for i in range(n)]
    info = {"question_type": [["open", "closed"][i % 2] for i in range(n)],
            "question_id": [str(i) for i in range(n)],
            "question": [f"q{i}" for i in range(n)]}
    return RetrievalIndex(emb, answers, info, is_training_phase=training,
                          retrieval_k=k, topk_impl="xla"), emb


def test_k1_prompt_always_certainly():
    idx, emb = _index(k=1)
    prompts = idx.retrieve(jnp.asarray(emb[:3]), k=1)
    for p in prompts:
        assert p.startswith("I believe the answer is certainly ")


def test_no_quantifier_prompt():
    idx, emb = _index(k=3)
    prompts = idx.retrieve(jnp.asarray(emb[:2]), use_quantifier=False)
    for p in prompts:
        assert p.startswith("The most frequent answer is ")


def test_return_modes():
    idx, emb = _index(k=3)
    q = jnp.asarray(emb[:2])
    ans = idx.retrieve(q, return_ans=True)
    assert len(ans) == 2 and len(ans[0]) == 3
    info = idx.retrieve(q, return_info=["question_type", "question_id"])
    assert len(info[0]) == 6  # 2 fields x 3 neighbours, interleaved per hit
    dists = idx.retrieve(q, return_dists=True)
    assert len(dists) == 2
    answers, dvals = dists[0]
    assert len(answers) == 3 and dvals.shape == (3,)
    # query is row 0 of the corpus: nearest neighbour is itself at d=0
    assert dvals[0] == pytest.approx(0.0, abs=1e-3)


def test_training_phase_skips_self_match():
    idx, emb = _index(training=True, k=2)
    d, i = idx.topk(jnp.asarray(emb[:4]))
    i = np.asarray(i)
    for row, qi in zip(i, range(4)):
        assert qi not in row
    assert np.all(np.asarray(d) > 1e-3)


def test_save_load_roundtrip(tmp_path):
    idx, emb = _index()
    path = str(tmp_path / "cache" / "index.npz")
    idx.save(path)
    loaded = RetrievalIndex.load(path, is_training_phase=False,
                                 retrieval_k=3, topk_impl="xla")
    np.testing.assert_allclose(np.asarray(loaded.embeddings),
                               np.asarray(idx.embeddings))
    assert loaded.answers == idx.answers
    assert loaded.question_info == idx.question_info
    d1, i1 = idx.topk(jnp.asarray(emb[:2]))
    d2, i2 = loaded.topk(jnp.asarray(emb[:2]))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_extend_appends_corpus():
    idx, _ = _index(n=10)
    other, _ = _index(n=6, seed=1)
    idx.extend(other)
    assert len(idx) == 16
    assert idx.embeddings.shape[0] == 16
    assert len(idx.question_info["question_id"]) == 16


def test_extend_rejects_mismatched_info_keys():
    """A corpus whose question_info lacks a key must be rejected up front —
    silently extending nothing would leave that info list shorter than
    answers and IndexError on a later retrieve(return_info=...)."""
    import pytest

    idx, _ = _index(n=4)
    other, _ = _index(n=3, seed=1)
    other.question_info.pop("question_type", None)
    with pytest.raises(ValueError, match="question_info keys"):
        idx.extend(other)


def test_retrieval_cache_not_stale_across_subsets(tmp_path):
    """The disk cache is keyed by corpus content (not just class name, the
    reference's quirk #4): changing retrieval_subset must rebuild the
    index instead of serving the previous run's full corpus."""
    import os

    from multimodalpromptretrieval_tpu.data.synthetic import (
        generate_synthetic_slake,
        synthetic_config,
    )
    from multimodalpromptretrieval_tpu.train.experiment import Experiment

    root = str(tmp_path)
    generate_synthetic_slake(os.path.join(root, "SLAKE"), n_train=16,
                             n_validate=8, n_test=8, image_size=32, seed=0)

    def build(extra):
        cfg = synthetic_config(root, batch_size=8, epochs=1, image_size=32,
                               retrieval=True, k=2)
        cfg["clip_overrides"]["image_resolution"] = 32
        cfg["clip_overrides"]["patch_size"] = 16
        cfg["retrieval_cache_dir"] = os.path.join(root, "cache")
        cfg.update(extra)
        return Experiment(cfg, train_mode=True, quiet=True,
                          log_root=os.path.join(root, "logs"),
                          model_root=os.path.join(root, "models"))

    n_full = len(build({}).retrieval_index)
    n_sub = len(build({"retrieval_subset": 0.5}).retrieval_index)
    assert n_sub < n_full  # a stale class-name-keyed cache would be ==
