"""Real-asset wire-format validation for the host tokenizers (VERDICT r1
next-step #7).

No genuine ``spiece.model`` / ``bpe_simple_vocab_16e6.txt.gz`` ships in this
environment, so these tests construct byte-exact replicas of the REAL wire
formats — a full sentencepiece ModelProto with trainer_spec /
normalizer_spec / precompiled_charsmap / unknown fields / omitted proto2
defaults (sentencepiece_model.proto), and a CLIP merges file with the
version header line the upstream loader skips — and assert the loaders
reproduce known-good encodings. Any wire-format deviation (field skipping,
default piece type, score decoding) or Viterbi-tie deviation fails here.
"""

import gzip
import struct

import numpy as np

from multimodalpromptretrieval_tpu.text.clip_bpe import (
    CLIPBPETokenizer,
    bytes_to_unicode,
)
from multimodalpromptretrieval_tpu.text.spm import (
    PIECE_CONTROL,
    PIECE_NORMAL,
    PIECE_UNKNOWN,
    T5SentencePieceTokenizer,
    UnigramVocab,
)


# -- protobuf wire helpers ----------------------------------------------------

def _varint(n: int) -> bytes:
    out = b""
    while True:
        b7 = n & 0x7F
        n >>= 7
        out += bytes([b7 | (0x80 if n else 0)])
        if not n:
            return out


def _tag(fieldno: int, wire: int) -> bytes:
    return _varint((fieldno << 3) | wire)


def _ld(fieldno: int, payload: bytes) -> bytes:   # length-delimited
    return _tag(fieldno, 2) + _varint(len(payload)) + payload


def _piece(s: str, score: float, ptype=None) -> bytes:
    """SentencePiece submessage; type omitted for NORMAL like real files
    (proto2 default — sentencepiece_model.proto: type defaults to NORMAL)."""
    body = _ld(1, s.encode("utf-8"))
    body += _tag(2, 5) + struct.pack("<f", score)
    if ptype is not None:
        body += _tag(3, 0) + _varint(ptype)
    return _ld(1, body)


def _t5_like_model_proto() -> bytes:
    """A ModelProto with the full field population of a real T5
    spiece.model: trainer_spec (field 2), normalizer_spec (field 3, incl.
    precompiled_charsmap bytes), interleaved with the pieces, plus an
    unknown field and a fixed64 field the parser must skip."""
    trainer = (_ld(1, b"corpus.txt")            # input
               + _tag(3, 0) + _varint(1)        # model_type = UNIGRAM
               + _tag(4, 0) + _varint(11))      # vocab_size
    normalizer = (_ld(1, b"nmt_nfkc")
                  + _ld(2, bytes(range(64)))    # precompiled_charsmap blob
                  + _tag(3, 0) + _varint(1))    # add_dummy_prefix
    blob = b""
    blob += _ld(2, trainer)                     # trainer_spec FIRST
    blob += _piece("<pad>", 0.0, PIECE_CONTROL)
    blob += _piece("</s>", 0.0, PIECE_CONTROL)
    blob += _piece("<unk>", 0.0, PIECE_UNKNOWN)
    blob += _ld(3, normalizer)                  # normalizer mid-stream
    blob += _piece("▁the", -3.0)
    blob += _piece("▁cat", -4.0)
    # tie construction: "▁ca"+"t" and "▁c"+"at" both score -9.0 for "▁cat"
    # when "▁cat" is absent from the path (see tie test below)
    blob += _piece("▁ca", -4.5)
    blob += _piece("▁c", -4.5)
    blob += _piece("at", -4.5)
    blob += _piece("t", -4.5)
    blob += _piece("he", -6.0)
    blob += _piece("▁", -8.0)
    blob += _tag(99, 0) + _varint(7)            # unknown varint field
    blob += _tag(98, 1) + struct.pack("<d", 1.5)  # unknown fixed64 field
    blob += _ld(5, b"\x0a\x03abc")              # denormalizer_spec
    return blob


def test_spiece_real_wire_format(tmp_path):
    path = tmp_path / "spiece.model"
    path.write_bytes(_t5_like_model_proto())
    tok = T5SentencePieceTokenizer.from_spiece_model(str(path), extra_ids=0)
    vocab = tok.vocab
    # pieces parsed in order, with trainer/normalizer/unknown fields skipped
    assert [p for p, _, _ in vocab.pieces] == [
        "<pad>", "</s>", "<unk>", "▁the", "▁cat", "▁ca",
        "▁c", "at", "t", "he", "▁"]
    # omitted type field decodes as NORMAL; control/unknown kept
    assert vocab.pieces[3][2] == PIECE_NORMAL
    assert vocab.pieces[0][2] == PIECE_CONTROL
    assert vocab.pieces[2][2] == PIECE_UNKNOWN
    # 32-bit float scores decode exactly
    assert vocab.pieces[4][1] == -4.0
    assert tok.pad_id == 0 and tok.eos_id == 1 and tok.unk_id == 2

    # known-good encoding: whole-word pieces win ("the cat" -> ▁the ▁cat ...)
    ids = tok.encode("the cat", add_eos=True)
    assert [vocab.pieces[i][0] for i in ids[:-1]] == ["▁the",
                                                      "▁cat"]
    assert ids[-1] == tok.eos_id


def test_spiece_hf_extra_ids_layout(tmp_path):
    """HF T5 convention: 100 <extra_id_N> sentinels counting DOWN from the
    top of the vocab (T5Tokenizer docs; convert.resize semantics)."""
    path = tmp_path / "spiece.model"
    path.write_bytes(_t5_like_model_proto())
    tok = T5SentencePieceTokenizer.from_spiece_model(str(path),
                                                     extra_ids=100)
    n = len(tok.vocab.pieces)
    assert len(tok) == n + 100
    assert tok.convert_tokens_to_ids("<extra_id_0>") == n + 99
    assert tok.convert_tokens_to_ids("<extra_id_99>") == n


def test_viterbi_tie_matches_sentencepiece_rule(tmp_path):
    """sentencepiece's Viterbi updates on STRICTLY greater scores
    (unigram model.cc), so among equal-score segmentations the one whose
    final piece starts earliest (i.e. the longest final piece) wins.
    "▁ca"+"t" and "▁c"+"at" both sum to -9.0 for the string "▁cat" —
    the winner must be ▁c + at (final piece "at" starts earlier)."""
    path = tmp_path / "spiece.model"
    path.write_bytes(_t5_like_model_proto())
    tok = T5SentencePieceTokenizer.from_spiece_model(str(path), extra_ids=0)
    # drop "▁cat" from the lattice by encoding a string where it cannot
    # apply as a whole: use "cat" -> normalized "▁cat"... instead remove
    # the whole-word winner via a fresh vocab without it
    pieces = [p for p in tok.vocab.pieces if p[0] != "▁cat"]
    vocab = UnigramVocab(pieces)
    tok2 = T5SentencePieceTokenizer(vocab)
    ids = tok2.encode("cat", add_eos=False)
    assert [vocab.pieces[i][0] for i in ids] == ["▁c", "at"]


# -- CLIP merges file ---------------------------------------------------------

def _clip_merges_file(path, gz=False):
    """Real bpe_simple_vocab_16e6.txt layout: a version header line the
    upstream loader skips (SimpleTokenizer: merges = ...split('\\n');
    merges[1:...]), then one merge pair per line."""
    content = "#version: 0.2\n" + "\n".join([
        "l u", "lu n", "lun g</w>",   # builds "lung</w>"
        "t h", "th e</w>",            # builds "the</w>"
        "i s</w>",
    ]) + "\n"
    if gz:
        with gzip.open(path, "wt", encoding="utf-8") as f:
            f.write(content)
    else:
        with open(path, "w", encoding="utf-8") as f:
            f.write(content)


def test_clip_merges_real_layout(tmp_path):
    path = str(tmp_path / "bpe_vocab.txt")
    _clip_merges_file(path)
    tok = CLIPBPETokenizer.from_merges_file(path, context_length=16)
    base = list(bytes_to_unicode().values())
    # vocab layout parity with clip.simple_tokenizer: 256 bytes, 256
    # byte</w>, merges in order, SOT, EOT
    assert tok.encoder[base[0]] == 0
    assert tok.encoder[base[0] + "</w>"] == 256
    assert tok.encoder["lu"] == 512        # merges start right after bytes
    assert tok.encoder["lung</w>"] == 514
    assert tok.encoder["<|startoftext|>"] == 518
    assert tok.encoder["<|endoftext|>"] == 519
    assert tok.eot == len(tok.encoder) - 1

    # known-good encoding: merges apply by rank; unknown words fall back
    # to byte-level pieces
    ids = tok.tokenize("the lung is")[0]
    toks = [tok.decoder[i] for i in ids if i not in (0,)]
    assert toks[0] == "<|startoftext|>"
    assert toks[1:4] == ["the</w>", "lung</w>", "is</w>"]
    assert toks[4] == "<|endoftext|>"
    # framing: SOT ... EOT then zero padding, fixed width
    assert ids.shape == (16,)
    assert ids[0] == tok.sot


def test_clip_merges_gzip_loads_identically(tmp_path):
    p1 = str(tmp_path / "bpe_vocab.txt")
    p2 = str(tmp_path / "bpe_vocab.txt.gz")
    _clip_merges_file(p1)
    _clip_merges_file(p2, gz=True)
    t1 = CLIPBPETokenizer.from_merges_file(p1)
    t2 = CLIPBPETokenizer.from_merges_file(p2)
    q = "is there a lung in the image?"
    np.testing.assert_array_equal(t1.tokenize(q), t2.tokenize(q))


def test_spiece_config_hook_loads_real_wire(tmp_path):
    """The experiment config key ``spiece_model`` must load the real-format
    file (T5VisionModel.py:57 uses the HF tokenizer the same way)."""
    path = tmp_path / "spiece.model"
    path.write_bytes(_t5_like_model_proto())
    tok = T5SentencePieceTokenizer.from_spiece_model(str(path))
    tok.add_tokens(["[itk]"])
    assert tok.convert_tokens_to_ids("[itk]") == len(tok) - 1
