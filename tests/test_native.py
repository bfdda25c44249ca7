"""Native C++ components vs their pure-Python references.

The fuzzy matcher must be bit-compatible with CPython's difflib (the eval
credit depends on exact tie-breaks); the native Viterbi encoder must emit
identical ids to text/spm.viterbi_encode.
"""

from difflib import SequenceMatcher

import pytest

from multimodalpromptretrieval_tpu import native


requires_native = pytest.mark.skipif(
    native.get_library() is None, reason="g++ unavailable")


@requires_native
def test_ratio_matches_difflib():
    cases = [
        ("lung", "lungs"), ("", ""), ("a", ""), ("", "b"),
        ("cardiomegaly", "cardiomegaly"),
        ("right lower lobe", "left lower lobe"),
        ("pneumothorax", "pneumonia"),
        ("yes", "no"), ("x" * 250 + "abc", "x" * 250 + "abd"),  # autojunk
        ("abcbdab", "bdcaba"),
    ]
    for a, b in cases:
        assert native.ratio(a, b) == pytest.approx(
            SequenceMatcher(None, a, b).ratio(), abs=1e-12), (a, b)


@requires_native
def test_closest_index_matches_python_scan():
    candidates = ["lung", "heart", "liver", "lungs", "lung", "brain mri"]
    for q in ["lung", "hart", "livr", "xyz", "lun", "brain"]:
        best, best_i = -1.0, 0
        for i, c in enumerate(candidates):
            r = SequenceMatcher(None, c, q).ratio()
            if r > best:
                best, best_i = r, i
        assert native.closest_index(q, candidates) == best_i, q


@requires_native
def test_native_viterbi_matches_python():
    from multimodalpromptretrieval_tpu.text.spm import (
        T5SentencePieceTokenizer,
        normalize,
        viterbi_encode,
    )

    corpus = ["what shape is shown in the image", "the lung is irregular",
              "is there a circle", "answer the Shape question"]
    tok = T5SentencePieceTokenizer.from_corpus(corpus, extra_ids=4)
    assert tok._native is not None and tok._native.available
    texts = corpus + ["unseen words xylophone", "answer: yes",
                      "what color is the cross?", "ü unicode ✓ test"]
    for t in texts:
        norm = normalize(t)
        assert tok._native.encode(norm) == viterbi_encode(tok.vocab, norm), t


@requires_native
def test_tokenizer_uses_native_and_roundtrips():
    from multimodalpromptretrieval_tpu.text.spm import (
        T5SentencePieceTokenizer,
    )

    corpus = ["the quick brown fox", "jumps over the lazy dog"]
    tok_native = T5SentencePieceTokenizer.from_corpus(corpus)
    tok_py = T5SentencePieceTokenizer.from_corpus(corpus)
    tok_py._native = None
    for t in ["the quick dog", "lazy fox jumps", "brown"]:
        assert tok_native.encode(t) == tok_py.encode(t)
        assert tok_native.decode(tok_native.encode(t)) == t


@requires_native
def test_dataset_closest_label_uses_native(tmp_path):
    import json
    import os

    from multimodalpromptretrieval_tpu.data.datasets import SLAKEDataset

    entries = [
        {"qid": i, "img_name": "x.png", "question": "q", "answer": a,
         "q_lang": "en", "content_type": "T", "answer_type": "open"}
        for i, a in enumerate(["lung", "heart", "liver"])
    ]
    with open(tmp_path / "train.json", "w") as f:
        json.dump(entries, f)
    ds = SLAKEDataset("train", str(tmp_path))
    ds.add_labels({"lung": 0, "heart": 1, "liver": 2})
    assert ds.get_closest_label("lun") == 0
    assert ds.get_closest_label("hart") == 1


@requires_native
def test_native_bpe_matches_python():
    """C++ CLIP-BPE fast path == Python reference on a merged vocab,
    including regex corner cases; non-ASCII / '&' / special literals must
    fall back (return None)."""
    import random
    import string

    from multimodalpromptretrieval_tpu.text.clip_bpe import (
        CLIPBPETokenizer,
        bytes_to_unicode,
    )

    base = list(bytes_to_unicode().values())
    merges = [("t", "h"), ("th", "e</w>"), ("i", "s</w>"), ("a", "n"),
              ("an", "d</w>"), ("l", "u"), ("lu", "n"), ("lun", "g</w>"),
              ("r", "i"), ("ri", "g"), ("rig", "h"), ("righ", "t</w>"),
              ("x", "-"), ("'", "s</w>"), (".", "."), ("..", ".</w>")]
    vocab = base + [v + "</w>" for v in base]
    vocab += ["".join(m) for m in merges]
    vocab += ["<|startoftext|>", "<|endoftext|>"]
    tok = CLIPBPETokenizer(vocab, merges)
    assert tok._native.available

    cases = [
        "What organ is shown in the x-ray?", "the lung's right side",
        "don't we'll it's they're we've he'd", "a 23 4", "  TABS\t and\n",
        "'x '' ... (left) --", "th the thethe lung righteous",
    ]
    rng = random.Random(7)
    for _ in range(500):
        cases.append("".join(
            rng.choice(string.printable[:95]) for _ in range(
                rng.randint(0, 40))))
    for t in cases:
        if "&" in t or "<|" in t:
            continue
        got = tok._native.encode(t)
        assert got is not None, t
        assert got == tok._encode_py(t), repr(t)

    for t in ["café", "a&b", "<|endoftext|>", "x & y"]:
        assert tok._native.encode(t) is None
        # tokenizer-level encode still works via the Python fallback
        assert tok.encode(t) == tok._encode_py(t)
