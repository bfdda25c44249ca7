"""Device-side prompt construction: pre-tokenized retrieval-hint tables.

The retrieval corpus is frozen at server-build time, so every hint string
the pipeline can ever produce — ``"I believe the answer is {bucket} {ans}"``
over the corpus' distinct answers × six quantifier buckets (or the
``"The most frequent answer is {ans}"`` form) — can be tokenized ONCE into
a device-resident id table. Serving then runs retrieval → majority vote →
hint splice → T5 encode → greedy decode inside a single jit: no index
fetch, no host re-tokenization in the request loop.

Token parity is exact, not approximate: hints are tokenized with
``T5SentencePieceTokenizer.encode_continuation`` and the fast path only
engages when ``boundary_safe`` proves the Viterbi segmentation factorizes
at the question→hint junction (serve.MPRServer checks per request).

Reference semantics reproduced in-graph (dataset/VQAFeatureDataset.py:
187-246): majority vote with first-retrieved tie-breaking, certainty =
maxcount/k, quantifier bucket ``int(certainty * 5)`` (the integer form
``(maxcount * 5) // k`` is exactly equal for every maxcount <= k <= 64 —
verified exhaustively against the Python float expression), and the hint
appended directly after the question with no separator (quirk #12).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np
import jax.numpy as jnp

from multimodalpromptretrieval_tpu.retrieval.index import (
    QUANTIFIER_BUCKETS,
    RetrievalIndex,
)


@dataclass
class HintTables:
    """Device-resident hint tokenization of a frozen retrieval corpus.

    ``aid[j]``      — dense answer id of corpus entry ``j`` (first-occurrence
                      order, so smaller aid == earlier first retrieval rank
                      is NOT implied; ordering is corpus order).
    ``hint_ids``    — (R, H) int32 continuation token ids, row
                      ``aid * 6 + bucket`` (quantifier) or ``aid`` (plain).
    ``hint_len``    — (R,) int32 valid lengths.
    ``first_char``  — the (normalized) first character every hint starts
                      with ("I" or "T"), for the per-request boundary check.
    ``use_quantifier`` — which prompt form the table encodes.
    """

    aid: jnp.ndarray
    hint_ids: jnp.ndarray
    hint_len: jnp.ndarray
    first_char: str
    use_quantifier: bool

    @property
    def max_hint_len(self) -> int:
        return int(self.hint_ids.shape[1])


def hint_strings(answer: str, use_quantifier: bool) -> List[str]:
    """The hint strings entry ``answer`` can produce (one per bucket, or a
    single plain form) — exactly the reference's format strings
    (dataset/VQAFeatureDataset.py:227-230)."""
    if use_quantifier:
        return [f"I believe the answer is {b} {answer}"
                for b in QUANTIFIER_BUCKETS]
    return [f"The most frequent answer is {answer}"]


def build_hint_tables(index: RetrievalIndex, tokenizer,
                      use_quantifier: bool = True) -> Optional[HintTables]:
    """Tokenize every possible hint over ``index``'s answers.

    Returns None (fast path unavailable) if any answer contains a
    user-added token (the full-string encoder would split on it) or any
    hint's internal junctions are not boundary-safe — the host path then
    serves those corpora instead.
    """
    answers = index.answers
    first: dict = {}
    for a in answers:
        first.setdefault(a, len(first))
    distinct = list(first)
    added = list(getattr(tokenizer, "added", {}))
    rows: List[List[int]] = []
    for a in distinct:
        for h in hint_strings(a, use_quantifier):
            # the full-string encoder splits on added tokens anywhere in
            # the hint (answer text AND template words), which
            # encode_continuation does not — check the whole string
            if any(tok in h for tok in added):
                return None
            rows.append(tokenizer.encode_continuation(h))
    if not rows:
        return None
    H = max(len(r) for r in rows)
    if H == 0:
        return None
    ids = np.zeros((len(rows), H), np.int32)
    lens = np.zeros((len(rows),), np.int32)
    for i, r in enumerate(rows):
        ids[i, :len(r)] = r
        lens[i] = len(r)
    aid = np.asarray([first[a] for a in answers], np.int32)
    return HintTables(
        aid=jnp.asarray(aid), hint_ids=jnp.asarray(ids),
        hint_len=jnp.asarray(lens),
        first_char=hint_strings(distinct[0], use_quantifier)[0][0],
        use_quantifier=use_quantifier)


@dataclass
class DraftTables:
    """Per-answer token drafts for hint-draft speculative decode
    (models/t5.t5_spec_greedy_decode).

    Row ``a`` holds ``tokenizer.encode(answer_a)`` — the label tokenization
    the model was trained on (train/experiment.py), incl. the trailing
    EOS — zero-padded to the table width. Indexed by the SAME dense
    answer id as :class:`HintTables` (first-occurrence order over
    ``index.answers``), so the majority-vote winner selects its draft with
    one gather. Draft quality only affects speed, never outputs.
    """

    ids: jnp.ndarray   # (n_distinct_answers, A) int32
    len: jnp.ndarray   # (n_distinct_answers,) int32


def build_draft_tables(index: RetrievalIndex, tokenizer,
                       max_length: int = 20) -> Optional[DraftTables]:
    """Tokenize every distinct corpus answer into a draft row."""
    first: dict = {}
    for a in index.answers:
        first.setdefault(a, len(first))
    if not first:
        return None
    rows = [tokenizer.encode(a, max_length=max_length) for a in first]
    A = max(1, max(len(r) for r in rows))
    ids = np.zeros((len(rows), A), np.int32)
    lens = np.zeros((len(rows),), np.int32)
    for i, r in enumerate(rows):
        ids[i, :len(r)] = r
        lens[i] = len(r)
    return DraftTables(ids=jnp.asarray(ids), len=jnp.asarray(lens))


def vote_rows(aid_k: jnp.ndarray, use_quantifier: bool) -> jnp.ndarray:
    """In-graph majority vote over the top-k answer ids -> hint-table rows.

    ``aid_k``: (B, k) int32 dense answer ids in retrieval-rank order.
    Winner = the answer whose FIRST retrieval rank is smallest among those
    attaining the maximal count (``max(counts, key=counts.get)`` over a
    dict built in retrieval order — reference tie-breaking, see
    retrieval/index.majority_vote). Bucket = (maxcount * 5) // k.
    """
    k = aid_k.shape[1]
    eq = (aid_k[:, :, None] == aid_k[:, None, :])          # (B, k, k)
    counts = jnp.sum(eq, axis=2).astype(jnp.int32)         # (B, k)
    ranks = jnp.arange(k, dtype=jnp.int32)
    # first retrieval rank of each position's answer
    first_rank = jnp.min(
        jnp.where(eq, ranks[None, None, :], k), axis=2)    # (B, k)
    maxc = jnp.max(counts, axis=1, keepdims=True)          # (B, 1)
    pos = jnp.argmin(
        jnp.where(counts == maxc, first_rank, k), axis=1)  # (B,)
    winner = jnp.take_along_axis(aid_k, pos[:, None], axis=1)[:, 0]
    if not use_quantifier:
        return winner
    bucket = (maxc[:, 0] * 5) // k
    return winner * len(QUANTIFIER_BUCKETS) + bucket


def splice_hints(q_ids: jnp.ndarray, q_len: jnp.ndarray,
                 h_ids: jnp.ndarray, h_len: jnp.ndarray,
                 eos_id: int, pad_id: int = 0
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Build the full prompt rows ``[question ‖ hint ‖ EOS ‖ pad]``.

    ``q_ids``: (B, W) question-prefix ids padded to the final static width
    (no EOS); ``h_ids``: (B, H) gathered hint rows. Rows that overflow W
    are truncated the way ``text/spm.encode(..., max_length=W)`` truncates
    (HF semantics, verified vs transformers 4.57: content tokens are
    dropped and the row still ENDS WITH EOS), so the result is identical
    to host-side ``encode(question + hint, max_length=W)`` + ``pad_ids``
    under the boundary contract — including prompts at the
    max_source_length cap.
    """
    W = q_ids.shape[1]
    j = jnp.arange(W, dtype=jnp.int32)[None, :]
    ql = q_len[:, None].astype(jnp.int32)
    hl = h_len[:, None].astype(jnp.int32)
    off = j - ql                                           # (B, W)
    H = h_ids.shape[1]
    hr = jnp.take_along_axis(
        h_ids, jnp.clip(off, 0, H - 1), axis=1)            # (B, W)
    # EOS lands after the hint, or at W-1 when question+hint overflow the
    # width (content truncation keeps the trailing EOS)
    eos_pos = jnp.minimum(ql + hl, W - 1)                  # (B, 1)
    content = jnp.where(off < 0, q_ids, hr)
    ids = jnp.where(j < eos_pos, content,
                    jnp.where(j == eos_pos, jnp.int32(eos_id),
                              jnp.int32(pad_id)))
    mask = (j <= eos_pos).astype(jnp.int32)
    return ids, mask
