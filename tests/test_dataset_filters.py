"""Dataset-level config machinery: max_answers halving, stratified
subsets, task filter caps (VQAFeatureDataset.py:86-111,249-261)."""

import json

import pytest

from multimodalpromptretrieval_tpu.data.datasets import (
    SLAKEDataset,
    create_ans2label,
)


def _ds(tmp_path, answers_open, answers_closed):
    entries = []
    qid = 0
    for a in answers_open:
        entries.append({"qid": qid, "img_name": "x.png", "question": f"q{qid}",
                        "answer": a, "q_lang": "en", "content_type": "T",
                        "answer_type": "open"})
        qid += 1
    for a in answers_closed:
        entries.append({"qid": qid, "img_name": "x.png", "question": f"q{qid}",
                        "answer": a, "q_lang": "en", "content_type": "T",
                        "answer_type": "closed"})
        qid += 1
    with open(tmp_path / "train.json", "w") as f:
        json.dump(entries, f)
    return SLAKEDataset("train", str(tmp_path))


def test_filter_max_answers_halves_and_removes_overlap(tmp_path):
    ds = _ds(tmp_path,
             answers_open=["apple", "banana", "cherry", "yes"],
             answers_closed=["yes", "no"])
    kept = ds.filter_max_answers(4)
    # open answers exclude the open∩closed overlap ('yes'); each side
    # capped at num//2
    assert "yes" in kept  # from the closed half
    open_kept = [a for a in kept if a in ("apple", "banana", "cherry")]
    assert len(open_kept) == 2  # 4 // 2
    assert all(e["answer"] in kept for e in ds.entries)


def test_filter_max_answers_with_preset_set(tmp_path):
    ds = _ds(tmp_path, ["a", "b", "c"], ["yes"])
    ds.filter_max_answers(10, answer_set={"a", "yes"})
    assert {e["answer"] for e in ds.entries} == {"a", "yes"}


def test_stratified_split_seed_reproducible(tmp_path):
    ds = _ds(tmp_path, [f"a{i}" for i in range(20)],
             [f"b{i}" for i in range(10)])
    s1 = ds.get_stratified_split(0.5, seed=88)
    s2 = ds.get_stratified_split(0.5, seed=88)
    assert s1 == s2
    assert len(s1) == 15  # 0.5 per task bucket (tasks are all "T" here)


def test_task_filter_cap(tmp_path):
    ds = _ds(tmp_path, [f"a{i}" for i in range(6)], [])
    ds.filter(["T"], limit_num_examples=3)
    assert len(ds.entries) == 3
    ds2 = _ds(tmp_path, [f"a{i}" for i in range(6)], [])
    ds2.filter(["OTHER"])
    assert len(ds2.entries) == 0


def test_ans2label_spans_all_splits(tmp_path):
    tr = _ds(tmp_path, ["a"], ["yes"])
    (tmp_path / "v").mkdir()
    va = _ds(tmp_path / "v", ["b"], [])
    label2ans, ans2label = create_ans2label(tr, va)
    assert set(ans2label) == {"a", "b", "yes"}
    assert [label2ans[i] for i in range(3)] == sorted(ans2label)


def test_synthetic_open_corpus_multi_token_answers(tmp_path):
    """answer_style="open" (the de-skewed bench corpus, VERDICT r2 item 2):
    every answer is a multi-word phrase (>= 4 words -> >= 4 T5 tokens) and
    questions run long, while the SLAKE schema stays identical."""
    from multimodalpromptretrieval_tpu.data.synthetic import (
        generate_synthetic_slake,
    )

    out = generate_synthetic_slake(
        str(tmp_path / "SLAKE"), n_train=6, n_validate=2, n_test=2,
        image_size=16, seed=1, answer_style="open")
    entries = out["train"]
    assert len(entries) == 18
    for e in entries:
        assert set(e) == {"qid", "img_name", "question", "answer",
                         "q_lang", "content_type", "answer_type"}
        assert len(e["answer"].split()) >= 4
        assert len(e["question"].split()) >= 10
    # both answer types still present (closed answers are phrases too)
    assert {e["answer_type"] for e in entries} == {"open", "closed"}
