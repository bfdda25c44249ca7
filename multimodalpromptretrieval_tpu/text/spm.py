"""SentencePiece unigram tokenizer: protobuf loader + Viterbi encoder.

The reference tokenizes with HF ``T5Tokenizer`` (sentencepiece C++ under the
hood, architectures/T5VisionModel.py:57,161-167,223-225). This module
re-implements the unigram-LM encoding path natively:

  * a minimal wire-format parser for the ``ModelProto`` protobuf (we only
    need the ``pieces`` field: piece string, score, type);
  * Viterbi segmentation over a piece trie (optionally accelerated by the
    C++ encoder in multimodalpromptretrieval_tpu/native);
  * T5 conventions: NFKC-ish normalization, whitespace collapsing, the ▁
    escape + dummy prefix, byte/char unk fallback, EOS append, 100
    ``<extra_id_N>`` sentinels, user-added tokens (the reference adds
    "[itk]", T5VisionModel.py:58).

Caveat (documented, not hidden): full sentencepiece parity additionally
applies a precompiled normalization charsmap; we approximate it with
``unicodedata.normalize("NFKC")``, which is an exact match for the ASCII
questions in SLAKE/VQA-RAD (all lowercased by the data layer).
"""

from __future__ import annotations

import struct
import unicodedata
from dataclasses import dataclass, field
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

_SPACE = "▁"  # ▁


# ---------------------------------------------------------------------------
# Minimal protobuf wire parsing (ModelProto.pieces only)
# ---------------------------------------------------------------------------


def _read_varint(buf: bytes, pos: int) -> Tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _parse_fields(buf: bytes):
    """Yields (field_number, wire_type, value) over a protobuf message."""
    pos = 0
    n = len(buf)
    while pos < n:
        tag, pos = _read_varint(buf, pos)
        fieldno, wire = tag >> 3, tag & 7
        if wire == 0:  # varint
            val, pos = _read_varint(buf, pos)
        elif wire == 1:  # 64-bit
            val = buf[pos:pos + 8]
            pos += 8
        elif wire == 2:  # length-delimited
            ln, pos = _read_varint(buf, pos)
            val = buf[pos:pos + ln]
            pos += ln
        elif wire == 5:  # 32-bit
            val = buf[pos:pos + 4]
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wire}")
        yield fieldno, wire, val


# SentencePiece piece types (sentencepiece_model.proto)
PIECE_NORMAL = 1
PIECE_UNKNOWN = 2
PIECE_CONTROL = 3
PIECE_USER_DEFINED = 4
PIECE_BYTE = 6
PIECE_UNUSED = 5


@dataclass
class UnigramVocab:
    """pieces[i] = (surface, log-prob score, piece type)."""

    pieces: List[Tuple[str, float, int]]
    _trie: Dict[str, dict] = field(default_factory=dict, repr=False)
    _piece_to_id: Dict[str, int] = field(default_factory=dict, repr=False)
    # lowest normal-piece score; the vocab is immutable after construction,
    # so computed once here instead of per viterbi_encode call
    min_score: float = field(default=-10.0, repr=False)

    def __post_init__(self):
        self._piece_to_id = {}
        for i, (p, _, _) in enumerate(self.pieces):
            self._piece_to_id.setdefault(p, i)
        normal = [s for _, s, t in self.pieces if t == PIECE_NORMAL]
        self.min_score = min(normal) if normal else -10.0
        # char trie: node = {char: node, ...; None: piece_id at terminal}
        self._trie = {}
        for i, (p, _, t) in enumerate(self.pieces):
            if t in (PIECE_CONTROL, PIECE_UNKNOWN, PIECE_UNUSED):
                continue
            node = self._trie
            for ch in p:
                node = node.setdefault(ch, {})
            node.setdefault(None, i)

    @property
    def unk_id(self) -> int:
        for i, (_, _, t) in enumerate(self.pieces):
            if t == PIECE_UNKNOWN:
                return i
        return 2

    def piece_to_id(self, piece: str) -> Optional[int]:
        return self._piece_to_id.get(piece)

    @staticmethod
    def from_model_proto(data: bytes) -> "UnigramVocab":
        pieces = []
        for fieldno, wire, val in _parse_fields(data):
            if fieldno == 1 and wire == 2:  # repeated SentencePiece
                piece, score, ptype = "", 0.0, PIECE_NORMAL
                for f2, w2, v2 in _parse_fields(val):
                    if f2 == 1:
                        piece = v2.decode("utf-8")
                    elif f2 == 2:
                        score = struct.unpack("<f", v2)[0]
                    elif f2 == 3:
                        ptype = v2
                pieces.append((piece, score, ptype))
        if not pieces:
            raise ValueError("no pieces found: not a sentencepiece model?")
        return UnigramVocab(pieces)

    @staticmethod
    def from_file(path: str) -> "UnigramVocab":
        with open(path, "rb") as f:
            return UnigramVocab.from_model_proto(f.read())

    @staticmethod
    def build_toy(
        corpus: Iterable[str],
        max_words: int = 4000,
        specials: Sequence[str] = ("<pad>", "</s>", "<unk>"),
    ) -> "UnigramVocab":
        """Hermetic test/synthetic-data vocab: specials + corpus words + chars.

        Word pieces carry log-frequency scores so Viterbi prefers whole
        words; single characters are the fallback (score floor), so any
        input string is always encodable.
        """
        from collections import Counter

        words: Counter = Counter()
        chars: set = set()
        for line in corpus:
            norm = normalize(line)
            for w in norm.split(_SPACE):
                if w:
                    words[_SPACE + w] += 1
            chars.update(norm)
        total = sum(words.values()) or 1
        pieces: List[Tuple[str, float, int]] = []
        for i, s in enumerate(specials):
            t = PIECE_UNKNOWN if s == "<unk>" else PIECE_CONTROL
            pieces.append((s, 0.0, t))
        import math

        for w, c in words.most_common(max_words):
            pieces.append((w, math.log(c / total), PIECE_NORMAL))
        seen = {p for p, _, _ in pieces}
        import string

        fallback_chars = chars | {_SPACE} | set(
            string.ascii_lowercase + string.digits + string.punctuation)
        for ch in sorted(fallback_chars):
            if ch not in seen:
                pieces.append((ch, -12.0, PIECE_NORMAL))
        return UnigramVocab(pieces)


def normalize(text: str) -> str:
    """T5 spm normalization: NFKC, collapse whitespace, ▁-escape, dummy prefix."""
    text = unicodedata.normalize("NFKC", text)
    text = " ".join(text.split())  # remove_extra_whitespaces
    text = text.replace(" ", _SPACE)
    if not text.startswith(_SPACE):
        text = _SPACE + text  # add_dummy_prefix
    return text


def normalize_continuation(text: str) -> str:
    """:func:`normalize` minus the dummy prefix — for text that attaches
    directly to the end of an already-tokenized string (device-side prompt
    construction splices pre-tokenized hint continuations after the
    question, serve.MPRServer)."""
    text = unicodedata.normalize("NFKC", text)
    text = " ".join(text.split())
    return text.replace(" ", _SPACE)


def viterbi_encode(vocab: UnigramVocab, normalized: str,
                   unk_penalty: float = 10.0) -> List[int]:
    """Best unigram segmentation (max sum of piece scores).

    Matches sentencepiece's unigram model exactly, including the post-hoc
    rule that CONTIGUOUS UNKNOWN pieces fuse into a single unk id
    (sentencepiece unigram_model.cc Encode; HF tokenizers' ``fuse_unk``
    replicates the same rule) — validated against the Rust ``tokenizers``
    Unigram oracle in tests/test_tokenizer_oracle.py.
    """
    n = len(normalized)
    if n == 0:
        return []
    NEG = float("-inf")
    best = [NEG] * (n + 1)
    back: List[Tuple[int, int]] = [(-1, -1)] * (n + 1)
    best[0] = 0.0
    unk_score = vocab.min_score - unk_penalty
    unk_id = vocab.unk_id
    trie = vocab._trie
    pieces = vocab.pieces
    for i in range(n):
        if best[i] == NEG:
            continue
        node = trie
        j = i
        while j < n:
            node = node.get(normalized[j])
            if node is None:
                break
            j += 1
            pid = node.get(None)
            if pid is not None:
                sc = best[i] + pieces[pid][1]
                if sc > best[j]:
                    best[j] = sc
                    back[j] = (i, pid)
        # unk fallback: single char
        sc = best[i] + unk_score
        if sc > best[i + 1]:
            best[i + 1] = sc
            back[i + 1] = (i, unk_id)
    # backtrack (output reversed; fuse runs of unk — sentencepiece rule)
    out: List[int] = []
    j = n
    while j > 0:
        i, pid = back[j]
        if not (pid == unk_id and out and out[-1] == unk_id):
            out.append(pid)
        j = i
    out.reverse()
    return out


class T5SentencePieceTokenizer:
    """HF T5Tokenizer semantics over a UnigramVocab.

    ids: pad=0, eos=1, unk=2 for real T5 models (positions taken from the
    vocab's control pieces); ``extra_ids`` sentinels occupy the tail like HF;
    ``add_tokens`` appends new ids (the reference adds "[itk]",
    T5VisionModel.py:58-61).
    """

    def __init__(self, vocab: UnigramVocab, extra_ids: int = 0,
                 use_native: bool = True):
        self.vocab = vocab
        self.base_size = len(vocab.pieces)
        self.extra_ids = extra_ids
        self._native = None
        if use_native:
            try:
                from multimodalpromptretrieval_tpu.native import NativeViterbi

                nv = NativeViterbi(vocab.pieces)
                if nv.available:
                    self._native = nv
            except Exception:
                self._native = None
        self.added: Dict[str, int] = {}
        for i in range(extra_ids):
            # HF maps <extra_id_0> to the LAST id (base+extra-1), counting down
            self.added[f"<extra_id_{i}>"] = self.base_size + extra_ids - 1 - i
        self._added_rev = {v: k for k, v in self.added.items()}
        self.pad_id = self._control_id("<pad>", 0)
        self.eos_id = self._control_id("</s>", 1)
        self.unk_id = vocab.unk_id

    def _control_id(self, piece: str, default: int) -> int:
        pid = self.vocab.piece_to_id(piece)
        return default if pid is None else pid

    # -- vocabulary management ------------------------------------------------

    def __len__(self) -> int:
        return self.base_size + self.extra_ids + \
            len([t for t, i in self.added.items()
                 if i >= self.base_size + self.extra_ids])

    def add_tokens(self, tokens: Sequence[str]) -> int:
        added = 0
        for t in tokens:
            if t not in self.added and self.vocab.piece_to_id(t) is None:
                new_id = len(self)
                self.added[t] = new_id
                self._added_rev[new_id] = t
                added += 1
        if added and hasattr(self, "_bigrams"):
            del self._bigrams  # boundary_safe must see the new tokens
        if added:
            self._surface_tables = None  # decode tables must see them too
        return added

    def convert_tokens_to_ids(self, token: str) -> int:
        if token in self.added:
            return self.added[token]
        pid = self.vocab.piece_to_id(token)
        return self.unk_id if pid is None else pid

    @staticmethod
    def from_spiece_model(path: str, extra_ids: int = 100
                          ) -> "T5SentencePieceTokenizer":
        return T5SentencePieceTokenizer(UnigramVocab.from_file(path),
                                        extra_ids=extra_ids)

    @staticmethod
    def from_corpus(corpus: Iterable[str], extra_ids: int = 0,
                    max_words: int = 4000) -> "T5SentencePieceTokenizer":
        return T5SentencePieceTokenizer(
            UnigramVocab.build_toy(corpus, max_words=max_words),
            extra_ids=extra_ids)

    # -- encode / decode ------------------------------------------------------

    def encode(self, text: str, add_eos: bool = True,
               max_length: Optional[int] = None) -> List[int]:
        """Tokenize one string. Added tokens split the text first (HF
        semantics for added tokens), the rest goes through Viterbi."""
        ids: List[int] = []
        for chunk, tok_id in self._split_added(text):
            if tok_id is not None:
                ids.append(tok_id)
            elif self._native is not None:
                ids.extend(self._native.encode(normalize(chunk)))
            else:
                ids.extend(viterbi_encode(self.vocab, normalize(chunk)))
        if add_eos:
            ids.append(self.eos_id)
        if max_length is not None and len(ids) > max_length:
            # HF truncation removes CONTENT tokens and appends the special
            # tokens afterwards, so a truncated sequence still ends with
            # EOS (verified against transformers 4.57: tokenizer(...,
            # truncation=True, max_length=N) -> N-1 content ids + [eos])
            ids = (ids[:max_length - 1] + [self.eos_id] if add_eos
                   else ids[:max_length])
        return ids

    def encode_continuation(self, text: str) -> List[int]:
        """Tokenize ``text`` as a CONTINUATION of an earlier string: no
        dummy ▁ prefix, no EOS.

        Exactness contract: when :meth:`boundary_safe` holds for the
        junction characters,

            encode(a + b) == encode(a, add_eos=False)
                             + encode_continuation(b) + [eos]

        because a forced Viterbi cut at the junction makes the unigram DP
        factorize into the two independent sub-problems. Used to
        pre-tokenize retrieval-hint strings into a device-resident table
        (retrieval/hints.py) so serving can splice prompts in-graph.
        """
        norm = normalize_continuation(text)
        if self._native is not None:
            return list(self._native.encode(norm))
        return viterbi_encode(self.vocab, norm)

    def _internal_bigrams(self) -> set:
        """All adjacent character pairs occurring INSIDE a matchable vocab
        piece or an added token (length >= 2). A junction whose character
        pair is not in this set forces a Viterbi segmentation cut there."""
        if not hasattr(self, "_bigrams"):
            grams = set()
            for p, _, t in self.vocab.pieces:
                if t in (PIECE_CONTROL, PIECE_UNKNOWN, PIECE_UNUSED):
                    continue  # never matched by the trie
                for i in range(len(p) - 1):
                    grams.add(p[i:i + 2])
            for tok in self.added:
                for i in range(len(tok) - 1):
                    grams.add(tok[i:i + 2])
            self._bigrams = grams
        return self._bigrams

    def _single_char_pieces(self) -> set:
        """Characters that have their own single-character matchable piece
        (such a char is never emitted as unk — see :meth:`boundary_safe`)."""
        if not hasattr(self, "_singles"):
            self._singles = {p for p, _, t in self.vocab.pieces
                             if len(p) == 1 and t not in
                             (PIECE_CONTROL, PIECE_UNKNOWN, PIECE_UNUSED)}
        return self._singles

    def concat_safe(self, text: str, next_char: str) -> bool:
        """True iff ``encode(text + b) == encode(text, add_eos=False) +
        encode_continuation(b) + [eos]`` for any continuation ``b``
        starting with ``next_char``.

        Prompt-level conditions on top of :meth:`boundary_safe`:

        * ``text`` must not end in (NFKC-)whitespace — :func:`normalize`
          strips a trailing space from the standalone encode that the
          full-string encode would keep as a ▁ before the continuation;
        * ``text`` must not end with an added token — ``_split_added``
          starts a fresh chunk after it, so the continuation would get a
          dummy ▁ prefix in the full-string encode.
        """
        if not text:
            return False
        nf = unicodedata.normalize("NFKC", text)
        if not nf or nf[-1].isspace():
            return False
        for t in self.added:
            if text.endswith(t):
                return False
        return self.boundary_safe(normalize(text)[-1:], next_char)

    def boundary_safe(self, prev_char: str, next_char: str) -> bool:
        """True iff concatenating two strings whose (normalized) junction
        characters are ``prev_char``/``next_char`` tokenizes identically to
        tokenizing the parts separately (see :meth:`encode_continuation`).

        Three conditions: the pair must survive NFKC unchanged (no
        composition across the junction — covers combining marks and
        Hangul jamo), neither side may be whitespace (the collapse step
        acts across the junction), and no matchable piece may contain the
        pair internally (else Viterbi could lay a piece across the cut).
        """
        if not prev_char or not next_char:
            return False
        pair = prev_char + next_char
        if unicodedata.normalize("NFKC", pair) != pair:
            return False
        if prev_char.isspace() or next_char.isspace():
            return False
        # unk-fusion guard: contiguous unk pieces fuse into ONE id
        # (sentencepiece rule, see viterbi_encode), so a junction where
        # BOTH characters might be emitted as unk could merge across the
        # cut. A char with its own single-char matchable piece is never
        # unk in an optimal path (unk_score = min_normal - penalty is
        # strictly worse), so one such side suffices.
        singles = self._single_char_pieces()
        if prev_char not in singles and next_char not in singles:
            return False
        return pair not in self._internal_bigrams()

    def _split_added(self, text: str):
        if not self.added:
            yield text, None
            return
        # longest-first added-token split
        toks = sorted(self.added, key=len, reverse=True)
        rest = text
        while rest:
            hit, pos = None, len(rest)
            for t in toks:
                p = rest.find(t)
                if p != -1 and p < pos:
                    hit, pos = t, p
            if hit is None:
                yield rest, None
                return
            if pos:
                yield rest[:pos], None
            yield hit, self.added[hit]
            rest = rest[pos + len(hit):]

    def encode_rows(self, texts: Sequence[str], add_eos: bool = True,
                    max_length: Optional[int] = None):
        """Batch tokenize -> ``(ids, lens)``: int32 (N, W) padded with
        pad_id to the batch longest, int32 (N,) valid counts. Rows are
        identical to :meth:`encode` (same added-token splitting, EOS and
        EOS-preserving truncation rules).

        Fast path: ONE native call encodes every row with no added
        tokens (``mpr_spm_encode_batch`` writes straight into the numpy
        matrix — the serving host path tokenizes 512 prompts per chunk,
        where per-call ctypes + list building cost ~2x the Viterbi DP
        itself). Rows containing added tokens, and everything when the
        native library is unavailable, go through :meth:`encode`.
        """
        import numpy as np

        n = len(texts)
        fallback: dict = {}
        norms: List[str] = []
        if self._native is not None:
            for i, t in enumerate(texts):
                parts = list(self._split_added(t)) if self.added else \
                    [(t, None)]
                if len(parts) == 1 and parts[0][1] is None:
                    norms.append(normalize(parts[0][0]))
                else:
                    norms.append("")
                    fallback[i] = self.encode(t, add_eos=add_eos,
                                              max_length=max_length)
        else:
            for i, t in enumerate(texts):
                fallback[i] = self.encode(t, add_eos=add_eos,
                                          max_length=max_length)
            norms = [""] * n
        if len(fallback) < n:
            mat, lens = self._native.encode_batch(norms)
        else:
            mat = np.zeros((n, 1), np.int32)
            lens = np.zeros(n, np.int32)
        lens = lens.astype(np.int32)
        if add_eos:
            # append EOS: grow one column if any full row needs it
            if mat.shape[1] < int(lens.max(initial=0)) + 1:
                mat = np.pad(mat, ((0, 0), (0, 1)))
            mat[np.arange(n), lens] = self.eos_id
            lens = lens + 1
        if max_length is not None:
            over = lens > max_length
            if add_eos and over.any():
                # HF truncation: drop CONTENT ids, keep the trailing EOS
                mat[over, max_length - 1] = self.eos_id
            lens = np.minimum(lens, max_length)
        width = max(int(lens.max(initial=0)), 1)
        for i, row in fallback.items():
            width = max(width, len(row))
        if mat.shape[1] < width:
            mat = np.pad(mat, ((0, 0), (0, width - mat.shape[1])))
        ids = mat[:, :width].copy()
        for i, row in fallback.items():
            ids[i, :len(row)] = row
            lens[i] = len(row)
        # pad tail with pad_id
        ids[np.arange(width)[None, :] >= lens[:, None]] = self.pad_id
        return ids, lens

    def batch_encode(self, texts: Sequence[str], max_length: int,
                     pad_to: Optional[int] = None):
        """Returns (ids, mask) as int32 numpy arrays.

        ``pad_to=None`` pads to the batch longest (HF padding="longest");
        a fixed ``pad_to`` gives XLA static shapes (bucketed batching).
        """
        from multimodalpromptretrieval_tpu.data.batching import pad_rows

        rows, lens = self.encode_rows(texts, max_length=max_length)
        width = pad_to if pad_to is not None else max(int(
            lens.max(initial=1)), 1)
        # the reference pipeline pads with 0 (HF pad token for T5);
        # masked positions never reach the model either way
        return pad_rows(rows, lens, width, pad_id=self.pad_id)

    def _id_surface(self, i: int, skip_special_tokens: bool) -> str:
        """Decoded surface of one id ('' when skipped) — the per-id
        branch of the original decode loop, kept as the single source of
        truth for the precomputed table below."""
        if i in self._added_rev:
            tok = self._added_rev[i]
            if skip_special_tokens and tok.startswith("<extra_id_"):
                return ""
            return tok
        if i >= self.base_size or i < 0:
            return ""
        piece, _, ptype = self.vocab.pieces[i]
        if skip_special_tokens and ptype in (PIECE_CONTROL, PIECE_UNKNOWN):
            return ""
        return piece

    def _surface_table(self, skip_special_tokens: bool) -> List[str]:
        """id -> surface string lookup list (lazily built per flag;
        invalidated by add_tokens). Decoding a 512-row serve chunk
        through per-id dict checks cost ~11 ms/chunk on the host path —
        a flat list index is ~5x cheaper."""
        tables = getattr(self, "_surface_tables", None)
        if tables is None:
            tables = self._surface_tables = {}
        key = bool(skip_special_tokens)
        if key not in tables:
            size = max([self.base_size + self.extra_ids]
                       + [i + 1 for i in self._added_rev])
            tables[key] = [self._id_surface(i, key) for i in range(size)]
        return tables[key]

    def decode(self, ids: Iterable[int], skip_special_tokens: bool = True
               ) -> str:
        table = self._surface_table(skip_special_tokens)
        size = len(table)
        if hasattr(ids, "tolist"):
            ids = ids.tolist()
        text = "".join([table[i] for i in ids if 0 <= i < size])
        return text.replace(_SPACE, " ").strip()

    def batch_decode(self, batch_ids, skip_special_tokens: bool = True
                     ) -> List[str]:
        return [self.decode(row, skip_special_tokens) for row in batch_ids]
