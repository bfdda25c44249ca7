"""Batched host tokenization (native batch entries + table decode).

The serving host path tokenizes/detokenizes a full 512-row chunk per
dispatch; these paths (spm.encode_rows, the clip tokenize batch fast
path, the surface-table decode, batching.pad_rows) must be bit-identical
to the per-row reference implementations they accelerate.
"""

import numpy as np
import pytest

from multimodalpromptretrieval_tpu.data.batching import pad_ids, pad_rows
from multimodalpromptretrieval_tpu.text import clip_bpe, spm


@pytest.fixture(scope="module")
def tok():
    corpus = ["is this a lung?", "what organ is shown?",
              "does the image show a heart?",
              "I believe the answer is certainly lung",
              "Answer the open question: what shape?"]
    vocab = spm.UnigramVocab.build_toy(corpus * 20, max_words=4000)
    t = spm.T5SentencePieceTokenizer(vocab, extra_ids=4)
    t.add_tokens(["[itk]"])
    return t


TEXTS = [
    "Answer the open question: what shape is the kidney?",
    "is this a lung? I believe the answer is certainly lung",
    "",
    "unicode: héllo ☂ test",
    "with added [itk] token inside",
    "<extra_id_0> sentinel start",
    "x" * 600,  # truncation territory
]


@pytest.mark.parametrize("add_eos", [True, False])
@pytest.mark.parametrize("max_length", [None, 16])
def test_encode_rows_matches_encode(tok, add_eos, max_length):
    rows, lens = tok.encode_rows(TEXTS, add_eos=add_eos,
                                 max_length=max_length)
    for i, t in enumerate(TEXTS):
        ref = tok.encode(t, add_eos=add_eos, max_length=max_length)
        assert rows[i, :lens[i]].tolist() == ref, (i, t)
        # padding region is pad_id
        assert (rows[i, lens[i]:] == tok.pad_id).all()


def test_nul_byte_encodes_like_python_viterbi(tok):
    """Embedded NUL bytes must not truncate the native path (the
    single-string entry now uses the explicit-length span API): encode,
    encode_rows, and the pure-Python Viterbi all agree."""
    text = "is this\x00a lung?"
    native = tok._native
    try:
        tok._native = None
        py = tok.encode(text)
    finally:
        tok._native = native
    assert tok.encode(text) == py
    rows, lens = tok.encode_rows([text])
    assert rows[0, :lens[0]].tolist() == py


def test_encode_rows_python_fallback_matches(tok):
    """With the native encoder disabled, encode_rows must produce the
    same rows through the pure-Python path."""
    native = tok._native
    ref_rows, ref_lens = tok.encode_rows(TEXTS, max_length=32)
    try:
        tok._native = None
        rows, lens = tok.encode_rows(TEXTS, max_length=32)
    finally:
        tok._native = native
    assert (ref_lens == lens).all()
    for i in range(len(TEXTS)):
        assert rows[i, :lens[i]].tolist() == ref_rows[i, :lens[i]].tolist()


def test_batch_encode_matches_per_row(tok):
    ids, mask = tok.batch_encode(TEXTS, max_length=32)
    for i, t in enumerate(TEXTS):
        ref = tok.encode(t, max_length=32)
        assert ids[i, :len(ref)].tolist() == ref
        assert mask[i].sum() == len(ref)
    ids2, mask2 = tok.batch_encode(TEXTS, max_length=32, pad_to=40)
    assert ids2.shape == (len(TEXTS), 40)
    np.testing.assert_array_equal(ids2[:, :ids.shape[1]] * mask2[:, :ids.shape[1]],
                                  ids * mask)


def _decode_reference(tk, ids, skip):
    """The original per-id decode loop, kept verbatim as the oracle."""
    parts = []
    for i in ids:
        i = int(i)
        if i in tk._added_rev:
            t = tk._added_rev[i]
            if skip and t.startswith("<extra_id_"):
                continue
            parts.append(t)
            continue
        if i >= tk.base_size:
            continue
        piece, _, ptype = tk.vocab.pieces[i]
        if skip and ptype in (spm.PIECE_CONTROL, spm.PIECE_UNKNOWN):
            continue
        parts.append(piece)
    return "".join(parts).replace(spm._SPACE, " ").strip()


@pytest.mark.parametrize("skip", [True, False])
def test_table_decode_matches_reference_loop(tok, skip):
    rng = np.random.default_rng(0)
    size = len(tok) + 5  # include out-of-range ids
    for _ in range(100):
        row = rng.integers(0, size, size=12)
        assert tok.decode(row, skip) == _decode_reference(tok, row, skip)


def test_decode_table_invalidated_by_add_tokens():
    vocab = spm.UnigramVocab.build_toy(["a b c"] * 3, max_words=50)
    t = spm.T5SentencePieceTokenizer(vocab)
    t.decode([1])  # builds the table
    t.add_tokens(["[new]"])
    nid = t.added["[new]"]
    assert t.decode([nid]) == "[new]"


def test_clip_tokenize_batch_matches_per_row():
    ct = clip_bpe.CLIPBPETokenizer.build_toy()
    qs = ["is this a lung?", "what's in the image?", "héllo ☂", "a & b",
          "x" * 400, "", "THE CT scan SHOWS ...", "a&b mixed with plain"]
    ref = np.stack([ct.tokenize([q])[0] for q in qs])
    got = ct.tokenize(qs)
    np.testing.assert_array_equal(ref, got)


def test_pad_rows_matches_pad_ids(tok):
    rows, lens = tok.encode_rows(TEXTS, max_length=32)
    as_lists = [rows[i, :lens[i]].tolist() for i in range(len(TEXTS))]
    for width in (8, 20, 64):
        ref_ids, ref_mask = pad_ids(as_lists, width)
        ids, mask = pad_rows(rows, lens, width)
        np.testing.assert_array_equal(ref_ids, ids)
        np.testing.assert_array_equal(ref_mask, mask)


def test_native_bpe_batch_fallback_rows():
    """lens == -1 rows (non-ASCII / '&') are the exact rows the per-row
    native encode rejects."""
    ct = clip_bpe.CLIPBPETokenizer.build_toy()
    if not ct._native.available:
        pytest.skip("native library unavailable")
    qs = ["plain ascii", "héllo", "a & b", "fine again"]
    _, lens = ct._native.encode_batch(qs, cap=64)
    assert (lens < 0).tolist() == [ct._native.encode(q) is None
                                   for q in qs]
