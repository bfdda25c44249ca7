"""Tokenizer semantics: unigram Viterbi, T5 conventions, CLIP BPE framing."""

import struct

import numpy as np

from multimodalpromptretrieval_tpu.text.clip_bpe import CLIPBPETokenizer
from multimodalpromptretrieval_tpu.text.spm import (
    PIECE_CONTROL,
    PIECE_NORMAL,
    PIECE_UNKNOWN,
    T5SentencePieceTokenizer,
    UnigramVocab,
    normalize,
    viterbi_encode,
)

CORPUS = [
    "what organ is shown in the image?",
    "is the lung healthy?",
    "which part of the body does this image belong to?",
    "what modality is used to take this image?",
    "the answer is lung",
]


def _toy():
    return T5SentencePieceTokenizer.from_corpus(CORPUS, extra_ids=4)


def test_normalize():
    assert normalize("hello  world") == "▁hello▁world"
    assert normalize(" x ") == "▁x"


def test_viterbi_prefers_words_over_chars():
    vocab = UnigramVocab.build_toy(CORPUS)
    ids = viterbi_encode(vocab, normalize("the lung"))
    pieces = [vocab.pieces[i][0] for i in ids]
    assert pieces == ["▁the", "▁lung"]


def test_roundtrip():
    tok = _toy()
    for text in CORPUS:
        ids = tok.encode(text)
        assert ids[-1] == tok.eos_id
        assert tok.decode(ids) == text


def test_unseen_words_fall_back_to_chars():
    tok = _toy()
    text = "xylophone cardiomegaly"
    assert tok.decode(tok.encode(text)) == text


def test_added_token_and_ids():
    tok = _toy()
    n = len(tok)
    assert tok.add_tokens(["[itk]"]) == 1
    assert len(tok) == n + 1
    itk = tok.convert_tokens_to_ids("[itk]")
    ids = tok.encode("[itk] the lung")
    assert ids[0] == itk
    # adding again is a no-op (HF semantics)
    assert tok.add_tokens(["[itk]"]) == 0


def test_extra_ids_count_down_from_top():
    tok = _toy()
    assert tok.added["<extra_id_0>"] == tok.base_size + 3
    assert tok.added["<extra_id_3>"] == tok.base_size


def test_truncation_and_padding():
    tok = _toy()
    ids, mask = tok.batch_encode(["is the lung healthy?", "what"], max_length=4)
    assert ids.shape == mask.shape == (2, 4)
    assert mask[0].sum() == 4          # truncated to max_length
    assert mask[1].sum() < 4
    assert ids[1, mask[1].sum():].tolist() == [tok.pad_id] * int(
        (1 - mask[1]).sum())
    ids2, _ = tok.batch_encode(["what"], max_length=16, pad_to=10)
    assert ids2.shape == (1, 10)


def test_batch_decode_skips_specials():
    tok = _toy()
    ids, _ = tok.batch_encode(["the lung"], max_length=16, pad_to=8)
    assert tok.batch_decode(ids) == ["the lung"]


def test_spm_protobuf_roundtrip():
    """Serialize a ModelProto by hand and parse it back."""
    def varint(n):
        out = b""
        while True:
            b7 = n & 0x7F
            n >>= 7
            out += bytes([b7 | (0x80 if n else 0)])
            if not n:
                return out

    def piece(s, score, ptype):
        body = b"\x0a" + varint(len(s.encode())) + s.encode()
        body += b"\x15" + struct.pack("<f", score)
        body += b"\x18" + varint(ptype)
        return b"\x0a" + varint(len(body)) + body

    blob = (piece("<pad>", 0.0, PIECE_CONTROL)
            + piece("</s>", 0.0, PIECE_CONTROL)
            + piece("<unk>", 0.0, PIECE_UNKNOWN)
            + piece("▁the", -2.5, PIECE_NORMAL)
            + piece("▁lung", -3.5, PIECE_NORMAL)
            + piece("t", -9.0, PIECE_NORMAL)
            + piece("▁", -9.0, PIECE_NORMAL))
    vocab = UnigramVocab.from_model_proto(blob)
    assert [p for p, _, _ in vocab.pieces][:3] == ["<pad>", "</s>", "<unk>"]
    assert vocab.pieces[3][1] == -2.5
    tok = T5SentencePieceTokenizer(vocab)
    assert tok.pad_id == 0 and tok.eos_id == 1 and tok.unk_id == 2
    ids = tok.encode("the lung", add_eos=False)
    assert [vocab.pieces[i][0] for i in ids] == ["▁the", "▁lung"]


def test_clip_toy_framing():
    tok = CLIPBPETokenizer.build_toy()
    arr = tok.tokenize(["is the lung healthy?", "what"])
    assert arr.shape == (2, 77)
    assert (arr[:, 0] == tok.sot).all()
    for row in arr:
        nz = row[row != 0]
        assert nz[-1] == tok.eot
    # EOT is the max id -> argmax pooling hits it (CLIP text pooling contract)
    assert arr.argmax(1)[0] == (arr[0] != 0).sum() - 1
    assert tok.decode(arr[0]) == "is the lung healthy ?"


def test_clip_bpe_merges():
    """A real merge table is honored (merge 'l u' then 'lu ng</w>')."""
    base = list(__import__(
        "multimodalpromptretrieval_tpu.text.clip_bpe",
        fromlist=["bytes_to_unicode"]).bytes_to_unicode().values())
    merges = [("l", "u"), ("lu", "ng</w>"), ("n", "g</w>")]
    vocab = base + [v + "</w>" for v in base] + ["".join(m) for m in merges]
    vocab += ["<|startoftext|>", "<|endoftext|>"]
    tok = CLIPBPETokenizer(vocab, merges)
    ids = tok.encode("lung")
    pieces = [tok.decoder[i] for i in ids]
    assert pieces == ["lung</w>"]
    assert tok.decode(tok.tokenize("lung")[0]) == "lung"


def test_clip_truncate():
    tok = CLIPBPETokenizer.build_toy(context_length=8)
    arr = tok.tokenize(["a very long question that exceeds the context"])
    assert arr.shape == (1, 8)
    assert arr[0, -1] == tok.eot


def test_empty_and_whitespace_inputs():
    tok = _toy()
    assert tok.encode("", add_eos=False) == []
    assert tok.encode("") == [tok.eos_id]
    ids = tok.encode("   ")  # collapses to the bare dummy prefix
    assert ids[-1] == tok.eos_id
    assert tok.decode(ids) == ""
    ids2, mask2 = tok.batch_encode(["", "the"], max_length=8)
    assert mask2[0].sum() >= 1  # at least the EOS survives


def test_batch_encode_fixed_width():
    tok = _toy()
    ids, mask = tok.batch_encode(["the lung", "x"], max_length=16, pad_to=10)
    assert ids.shape == (2, 10) and mask.shape == (2, 10)


def test_clip_tokenize_empty_string():
    from multimodalpromptretrieval_tpu.text.clip_bpe import CLIPBPETokenizer

    t = CLIPBPETokenizer.build_toy(context_length=8)
    out = t.tokenize([""])
    assert out.shape == (1, 8)
    assert out[0, 0] == t.sot and out[0, 1] == t.eot


def test_truncation_keeps_eos():
    """HF truncation removes CONTENT tokens and then appends EOS, so a
    truncated sequence still ends with EOS (transformers 4.57 behavior:
    tokenizer(..., truncation=True, max_length=N) -> N-1 content + eos)."""
    tok = _toy()
    full = tok.encode("is the lung healthy or not healthy", add_eos=True)
    assert len(full) > 5
    ids = tok.encode("is the lung healthy or not healthy", max_length=5)
    assert len(ids) == 5
    assert ids[-1] == tok.eos_id
    assert ids[:4] == full[:4]
    # without EOS the cut is a plain prefix
    ids2 = tok.encode("is the lung healthy or not healthy", add_eos=False,
                      max_length=5)
    assert ids2 == full[:5]


def test_clip_decode_keeps_bang_token():
    """BPE id 0 is the real token '!' — decode must not drop it (only the
    zero PADDING after the EOT is padding)."""
    tok = CLIPBPETokenizer.build_toy(context_length=16)
    arr = tok.tokenize(["hi!"])
    assert 0 in arr[0]  # '!' tokenizes through id 0
    assert "!" in tok.decode(arr[0])


def test_truncate_text_ids_keeps_eot_with_bang():
    """truncate_text_ids must size rows by the LAST nonzero (the EOT), not
    the nonzero COUNT — id 0 ('!') inside the text must not shorten the
    window past the EOT column."""
    import numpy as np

    from multimodalpromptretrieval_tpu.models.clip import truncate_text_ids

    tok = CLIPBPETokenizer.build_toy(context_length=32)
    arr = tok.tokenize(["hi ! ! ! ! ! ! ! !"])
    cut = truncate_text_ids(arr, multiple=1)
    row = np.asarray(cut)[0]
    assert row[-1] == tok.eot  # EOT survives as the last column
