"""Synthetic ROCO question generator: determinism + documented quirks."""

import csv
import os

from multimodalpromptretrieval_tpu.data.roco_questions import (
    QuestionBucket,
    SpecificQuestionBucket,
    MODALITIES,
    MODALITY_CLOSED_T,
    SHAPE_KEYWORDS,
    SHAPE_REQUIRED,
    SHAPE_TEMPLATES,
    default_buckets,
    generate_questions,
    stratified_split,
    write_csvs,
)


def test_open_bucket_answers_with_matched_keyword():
    b = QuestionBucket("Modality", MODALITIES,
                       ["What modality is this?"], "open", seed=1)
    qs, ans = b.get_question(["ct", "noise"])
    assert ans == ["ct"]
    assert qs == ["What modality is this?"]


def test_closed_bucket_yes_no_coin():
    b = QuestionBucket("Modality", MODALITIES, MODALITY_CLOSED_T,
                       "closed", seed=3)
    # run many draws: both yes and no must occur. NOTE (faithful quirk):
    # the "wrong" keyword is sampled from the ORIGINAL-case keyword list
    # excluding the lowercased match, so 'MRI' itself can be drawn as the
    # "incorrect" answer for a matched 'mri' (reference
    # question_category.py:31-35 has the same case mismatch).
    seen = set()
    for _ in range(50):
        qs, ans = b.get_question(["mri"])
        seen.add(ans[0])
        assert qs[0]
    assert seen == {"yes", "no"}


def test_no_match_returns_none():
    b = QuestionBucket("Plane", ["axial"], ["Is this {}?"], "closed")
    assert b.get_question(["unrelated"]) is None


def test_shape_bucket_faithful_uses_last_required_word():
    """Quirk #14: the reference formats with the loop-leftover variable —
    the LAST required word ('spleen'), not the matched organ."""
    b = SpecificQuestionBucket(SHAPE_REQUIRED, "Shape", SHAPE_KEYWORDS,
                               SHAPE_TEMPLATES, "open", seed=0,
                               faithful=True)
    qs, ans = b.get_question(["oval", "kidney"])
    assert ans == ["oval"]
    assert "spleen" in qs[0]
    fixed = SpecificQuestionBucket(SHAPE_REQUIRED, "Shape", SHAPE_KEYWORDS,
                                   SHAPE_TEMPLATES, "open", seed=0,
                                   faithful=False)
    qs2, _ = fixed.get_question(["oval", "kidney"])
    assert "kidney" in qs2[0]


def test_shape_bucket_requires_organ():
    b = SpecificQuestionBucket(SHAPE_REQUIRED, "Shape", SHAPE_KEYWORDS,
                               SHAPE_TEMPLATES, "open")
    assert b.get_question(["oval"]) is None  # shape without organ


def test_generate_deterministic_with_seed():
    kw = {f"ROCO_{i:03d}": ["mri", "axial", "heart"] for i in range(5)}
    r1 = generate_questions(kw, "", seed=88, require_images=False)
    r2 = generate_questions(kw, "", seed=88, require_images=False)
    assert r1 == r2 and len(r1) > 0


def test_write_csvs_faithful_quirks(tmp_path):
    """Both CSVs contain ALL rows and land in the save-path root, with an
    empty ROCO/ dir created beside them (quirk #14)."""
    kw = {f"ROCO_{i:03d}": ["ct", "coronal"] for i in range(10)}
    rows = generate_questions(kw, "", require_images=False)
    train_p, test_p = write_csvs(rows, str(tmp_path), faithful=True)
    assert os.path.dirname(train_p) == str(tmp_path)
    assert os.path.isdir(tmp_path / "ROCO")
    with open(train_p) as f:
        train = list(csv.reader(f))[1:]
    with open(test_p) as f:
        test = list(csv.reader(f))[1:]
    assert len(train) == len(rows) and train == test


def test_write_csvs_fixed_split(tmp_path):
    kw = {f"ROCO_{i:03d}": ["ct", "coronal", "heart", "mri"]
          for i in range(30)}
    rows = generate_questions(kw, "", require_images=False)
    train_p, test_p = write_csvs(rows, str(tmp_path), faithful=False)
    assert os.path.dirname(train_p) == str(tmp_path / "ROCO")
    with open(train_p) as f:
        train = list(csv.reader(f))[1:]
    with open(test_p) as f:
        test = list(csv.reader(f))[1:]
    assert len(train) + len(test) == len(rows)
    assert 0 < len(train) < len(rows)


def test_stratified_split_fraction():
    rows = [["A", "x", "q", "a", "open"]] * 10 + \
           [["B", "x", "q", "a", "open"]] * 20
    idx = stratified_split(rows, split_fraction=0.2, seed=88)
    assert len(idx) == 2 + 4


def test_roco_rows_parse_into_dataset(tmp_path):
    """Generated CSVs load through ROCODataset (ROCO.py:16-31 parity —
    question_id = row index + 100000)."""
    from multimodalpromptretrieval_tpu.data.datasets import ROCODataset

    kw = {f"ROCO_{i:03d}": ["mri", "heart"] for i in range(4)}
    rows = generate_questions(kw, "", require_images=False)
    write_csvs(rows, str(tmp_path), faithful=False)
    ds = ROCODataset("train", str(tmp_path / "ROCO"))
    assert len(ds.entries) > 0
    assert ds.entries[0]["question_id"] == "100000"
