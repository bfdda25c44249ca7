"""Device-side prompt construction (retrieval/hints.py + serve fast path).

The fast path pre-tokenizes every possible retrieval hint into a
device-resident table and splices prompts in-graph; these tests pin its
exactness contract against the host pipeline at every level: continuation
tokenization, in-graph majority vote / quantifier bucketing, the splice
itself, and full MPRServer answers."""

import os

import numpy as np
import pytest

from multimodalpromptretrieval_tpu.data.synthetic import (
    generate_synthetic_slake,
    synthetic_config,
)
from multimodalpromptretrieval_tpu.retrieval.hints import (
    build_hint_tables,
    hint_strings,
    splice_hints,
    vote_rows,
)
from multimodalpromptretrieval_tpu.retrieval.index import (
    majority_vote,
    quantifier_bucket,
    QUANTIFIER_BUCKETS,
)
from multimodalpromptretrieval_tpu.serve import MPRServer
from multimodalpromptretrieval_tpu.text import spm
from multimodalpromptretrieval_tpu.train.experiment import Experiment


# ---------------------------------------------------------------------------
# Continuation tokenization
# ---------------------------------------------------------------------------


def _toy_tokenizer(extra_pieces=()):
    corpus = ["is this a lung?", "what organ is shown?",
              "i believe the answer is certainly lung"]
    vocab = spm.UnigramVocab.build_toy(corpus)
    if extra_pieces:
        vocab = spm.UnigramVocab(
            list(vocab.pieces)
            + [(p, -1.0, spm.PIECE_NORMAL) for p in extra_pieces])
    return spm.T5SentencePieceTokenizer(vocab)


def test_continuation_concat_exactness():
    tok = _toy_tokenizer()
    cases = [
        ("Answer the open question: is this a lung?",
         "I believe the answer is certainly lung"),
        ("what organ is shown?", "The most frequent answer is heart"),
        ("no question mark here", "I believe the answer is maybe x"),
    ]
    for a, b in cases:
        assert tok.boundary_safe(spm.normalize(a)[-1:],
                                 spm.normalize_continuation(b)[:1])
        whole = tok.encode(a + b)
        split = (tok.encode(a, add_eos=False) + tok.encode_continuation(b)
                 + [tok.eos_id])
        assert whole == split, (a, b)


def test_boundary_unsafe_when_piece_spans_junction():
    tok = _toy_tokenizer(extra_pieces=["?I"])
    assert not tok.boundary_safe("?", "I")
    # the safe cases stay safe
    assert tok.boundary_safe("g", "I")


def test_boundary_unsafe_on_whitespace_and_combining():
    tok = _toy_tokenizer()
    assert not tok.boundary_safe(" ", "I")
    assert not tok.boundary_safe("?", " ")
    assert not tok.boundary_safe("", "I")
    assert not tok.boundary_safe("e", "́")  # combining acute


def test_added_token_bigrams_block_boundary():
    tok = _toy_tokenizer()
    assert tok.boundary_safe("t", "k")
    tok.add_tokens(["[itk]"])
    assert not tok.boundary_safe("t", "k")  # "tk" now inside an added token


# ---------------------------------------------------------------------------
# In-graph vote + bucket vs the host oracle
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("k", [1, 2, 3, 5, 15])
def test_vote_rows_matches_majority_vote(k):
    rng = np.random.default_rng(k)
    answers = [f"ans{i}" for i in range(6)]
    aid_k = rng.integers(0, len(answers), size=(64, k)).astype(np.int32)
    rows = np.asarray(vote_rows(aid_k, use_quantifier=True))
    plain = np.asarray(vote_rows(aid_k, use_quantifier=False))
    for b in range(aid_k.shape[0]):
        pred, certainty = majority_vote([answers[j] for j in aid_k[b]])
        want_aid = answers.index(pred)
        want_bucket = QUANTIFIER_BUCKETS.index(quantifier_bucket(certainty))
        assert rows[b] == want_aid * 6 + want_bucket, (b, aid_k[b])
        assert plain[b] == want_aid


def test_vote_rows_tie_breaks_by_first_retrieval_rank():
    # [b, a, b, a]: both reach count 2; 'b' was retrieved first -> wins
    aid_k = np.asarray([[1, 0, 1, 0], [2, 2, 0, 0]], np.int32)
    plain = np.asarray(vote_rows(aid_k, use_quantifier=False))
    assert plain.tolist() == [1, 2]


# ---------------------------------------------------------------------------
# Splice vs host-side padding
# ---------------------------------------------------------------------------


def test_splice_matches_host_concat():
    from multimodalpromptretrieval_tpu.data.batching import pad_ids

    rng = np.random.default_rng(0)
    W, H, eos = 24, 6, 1
    # overflow cases included: q_len 20+h6, 23+h1, 24 (q alone fills W) —
    # HF truncation drops CONTENT tokens and keeps the trailing EOS
    # (text/spm.encode, verified vs transformers 4.57)
    q_rows = [list(rng.integers(2, 50, size=n)) for n in (3, 10, 20, 23, 24)]
    h_rows = [list(rng.integers(2, 50, size=n)) for n in (4, 6, 6, 1, 2)]
    q_ids, _ = pad_ids(q_rows, W)
    h_ids, _ = pad_ids(h_rows, H)
    q_len = np.asarray([len(r) for r in q_rows], np.int32)
    h_len = np.asarray([len(r) for r in h_rows], np.int32)
    ids, mask = splice_hints(q_ids, q_len, h_ids, h_len, eos)
    # host reference: encode(question + hint, max_length=W) semantics
    want_rows = [q + h + [eos] if len(q) + len(h) + 1 <= W
                 else (q + h)[:W - 1] + [eos]
                 for q, h in zip(q_rows, h_rows)]
    want_ids, want_mask = pad_ids(want_rows, W)
    np.testing.assert_array_equal(np.asarray(ids), want_ids)
    np.testing.assert_array_equal(np.asarray(mask), want_mask)


# ---------------------------------------------------------------------------
# End-to-end: fast path == host path
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module", params=[1, 3])
def trained(tmp_path_factory, request):
    k = request.param
    root = str(tmp_path_factory.mktemp(f"fast{k}"))
    generate_synthetic_slake(os.path.join(root, "SLAKE"), n_train=16,
                             n_validate=8, n_test=8, image_size=32, seed=0)
    cfg = synthetic_config(root, batch_size=4, epochs=1, image_size=32,
                           retrieval=True, k=k)
    cfg["clip_overrides"]["image_resolution"] = 32
    cfg["clip_overrides"]["patch_size"] = 16
    cfg["cache_retrieval"] = False
    paths = dict(log_root=os.path.join(root, "logs"),
                 model_root=os.path.join(root, "models"))
    exp = Experiment(cfg, train_mode=True, quiet=True, **paths)
    exp.train()
    return Experiment(cfg, train_mode=False, quiet=True, **paths)


def test_fastpath_answers_match_host_path(trained):
    fast = MPRServer(trained, prompt_fastpath=True)
    host = MPRServer(trained, prompt_fastpath=False)
    entries = (trained.dataset_test.entries * 2)[:9]
    images = np.stack([trained.images[e["image_name"]] for e in entries])
    questions = [e["question"] for e in entries]
    tasks = [e["task"] for e in entries]
    ids = [e["image_name"] for e in entries]
    a_fast = fast.answer(images, questions, tasks, image_ids=ids)
    a_host = host.answer(images, questions, tasks, image_ids=ids)
    assert a_fast == a_host
    # the fast path actually engaged (tables built, fused step compiled)
    assert fast._hint_tables not in (None, False)
    assert fast._fused_predict is not None
    assert host._fused_predict is None


def test_fastpath_matches_host_at_max_source_length(trained):
    """Questions whose prompt overflows max_source_length must still be
    answered identically by the fused and host paths: both truncate
    content and keep the trailing EOS (regression — splice_hints used to
    pass full-width rows through with NO EOS)."""
    fast = MPRServer(trained, prompt_fastpath=True)
    host = MPRServer(trained, prompt_fastpath=False)
    entries = trained.dataset_test.entries[:3]
    images = np.stack([trained.images[e["image_name"]] for e in entries])
    # overflow 64 source tokens by a wide margin; ends mid-question so
    # the junction is still boundary-safe (no trailing whitespace)
    questions = [(e["question"] + " ") * 12 + e["question"]
                 for e in entries]
    tasks = [e["task"] for e in entries]
    ids = [e["image_name"] for e in entries]
    W = trained.model_cfg.max_source_length
    assert any(len(trained.tokenizer.encode(
        f"Answer the {t} question: " + q, add_eos=False)) >= W
        for q, t in zip(questions, tasks))
    a_fast = fast.answer(images, questions, tasks, image_ids=ids)
    a_host = host.answer(images, questions, tasks, image_ids=ids)
    assert a_fast == a_host
    assert fast._fused_predict is not None  # fast path engaged


def test_fastpath_hint_table_covers_all_hints(trained):
    """Every hint string the host pipeline can emit is a row of the table,
    tokenized identically to host-side continuation encoding."""
    tok = trained.tokenizer
    ht = build_hint_tables(trained.retrieval_index, tok,
                           use_quantifier=trained.use_quantifier)
    assert ht is not None
    first: dict = {}
    for a in trained.retrieval_index.answers:
        first.setdefault(a, len(first))
    for ans, aid in first.items():
        for b, hint in enumerate(hint_strings(ans, trained.use_quantifier)):
            row = aid * 6 + b if trained.use_quantifier else aid
            want = tok.encode_continuation(hint)
            got = np.asarray(ht.hint_ids[row])[:int(ht.hint_len[row])]
            assert got.tolist() == want


def test_fastpath_rebuilds_tables_after_index_extend(trained):
    """Extending the retrieval corpus after the hint tables were built
    must rebuild them (a stale aid table would silently clip gathers)."""
    from multimodalpromptretrieval_tpu.retrieval.index import RetrievalIndex

    orig = trained.retrieval_index
    dup = RetrievalIndex(
        np.asarray(orig.embeddings), list(orig.answers),
        {k: list(v) for k, v in orig.question_info.items()},
        orig.is_training_phase, orig.retrieval_k, orig.topk_impl)
    trained.retrieval_index = dup
    try:
        fast = MPRServer(trained, prompt_fastpath=True)
        host = MPRServer(trained, prompt_fastpath=False)
        entries = trained.dataset_test.entries[:5]
        images = np.stack([trained.images[e["image_name"]]
                           for e in entries])
        questions = [e["question"] for e in entries]
        tasks = [e["task"] for e in entries]
        ids = [e["image_name"] for e in entries]
        fast.answer(images, questions, tasks, image_ids=ids)
        n_before = fast._hint_tables.aid.shape[0]

        extra = RetrievalIndex(
            np.asarray(orig.embeddings)[:3],
            ["zebra crossing", "xylophone", "quokka"],
            {k: list(v)[:3] for k, v in orig.question_info.items()},
            orig.is_training_phase, orig.retrieval_k, orig.topk_impl)
        dup.extend(extra)
        a_fast = fast.answer(images, questions, tasks, image_ids=ids)
        a_host = host.answer(images, questions, tasks, image_ids=ids)
        assert a_fast == a_host
        assert fast._hint_tables.aid.shape[0] == len(dup) > n_before
    finally:
        trained.retrieval_index = orig


# ---------------------------------------------------------------------------
# Review fixes: prompt-level exactness conditions (concat_safe)
# ---------------------------------------------------------------------------


def test_concat_safe_rejects_trailing_whitespace_and_added_tokens():
    tok = _toy_tokenizer()
    assert tok.concat_safe("is this a lung?", "I")
    # trailing whitespace: full-string encode keeps a separator the
    # standalone encode strips
    assert not tok.concat_safe("is this a lung? ", "I")
    assert not tok.concat_safe("is this a lung? ", "I")  # NBSP
    assert not tok.concat_safe("is this a lung? ", "I")  # thin space
    assert not tok.concat_safe("", "I")
    # prompt ending with an added token: the continuation would start a
    # fresh chunk (dummy prefix) in the full-string encode
    tok.add_tokens(["[itk]"])
    assert not tok.concat_safe("what is this [itk]", "I")
    assert tok.concat_safe("is this a lung?", "I")


def test_concat_safe_matches_actual_encode_on_edge_prompts():
    """For every prompt concat_safe accepts, the split encode must equal
    the whole-string encode; for the rejected edge prompts, it diverges
    (documenting why the guard exists)."""
    tok = _toy_tokenizer()
    tok.add_tokens(["[itk]"])
    hint = "I believe the answer is certainly lung"
    cont = tok.encode_continuation(hint)
    for p in ["is this a lung?", "what organ is shown?",
              "Answer the open question: is this a lung?"]:
        assert tok.concat_safe(p, "I")
        assert tok.encode(p + hint) == (tok.encode(p, add_eos=False)
                                        + cont + [tok.eos_id])
    for p in ["is this a lung? ", "what is this [itk]"]:
        assert not tok.concat_safe(p, "I")
        assert tok.encode(p + hint) != (tok.encode(p, add_eos=False)
                                        + cont + [tok.eos_id])


def test_fastpath_falls_back_on_unsafe_questions(trained):
    """A single trailing-whitespace question must push the whole call to
    the host pipeline, with identical answers."""
    fast = MPRServer(trained, prompt_fastpath=True)
    host = MPRServer(trained, prompt_fastpath=False)
    entries = trained.dataset_test.entries[:4]
    images = np.stack([trained.images[e["image_name"]] for e in entries])
    questions = [e["question"] for e in entries]
    questions[2] = questions[2] + " "  # unsafe junction
    tasks = [e["task"] for e in entries]
    ids = [e["image_name"] for e in entries]
    a_fast = fast.answer(images, questions, tasks, image_ids=ids)
    a_host = host.answer(images, questions, tasks, image_ids=ids)
    assert a_fast == a_host
    assert fast._fused_predict is None  # fused step never engaged


def test_hint_tables_invalidated_by_tokenizer_mutation(trained):
    """Adding a token AFTER the tables were built must invalidate them —
    the cached rows were tokenized under the old vocabulary."""
    fast = MPRServer(trained, prompt_fastpath=True)
    assert fast._ensure_hint_tables() is not None
    tok = trained.tokenizer
    added_before = dict(tok.added)
    tok.add_tokens(["answer"])  # appears in the hint template text
    try:
        assert fast._ensure_hint_tables() is None  # rebuild attempted, bails
    finally:
        for t in list(tok.added):
            if t not in added_before:
                del tok._added_rev[tok.added.pop(t)]
        if hasattr(tok, "_bigrams"):
            del tok._bigrams
    assert fast._ensure_hint_tables() is not None  # and recovers


def test_hint_tables_unavailable_when_added_token_in_template(trained):
    """An added token matching hint-template text ('answer') defeats
    continuation tokenization — the builder must bail to the host path."""
    tok = trained.tokenizer
    added_before = dict(tok.added)
    tok.add_tokens(["answer"])
    try:
        ht = build_hint_tables(trained.retrieval_index, tok,
                               use_quantifier=trained.use_quantifier)
        assert ht is None
    finally:
        for t in list(tok.added):
            if t not in added_before:
                del tok._added_rev[tok.added.pop(t)]
        if hasattr(tok, "_bigrams"):
            del tok._bigrams


def test_fused_step_rebuilt_when_k_changes(trained):
    """The fused serve step captures k/use_quantifier/skip_first at trace
    time; changing the experiment's retrieval config must rebuild it (a
    stale step would silently retrieve with the old settings)."""
    server = MPRServer(trained, prompt_fastpath=True)
    entries = trained.dataset_test.entries[:4]
    images = np.stack([trained.images[e["image_name"]] for e in entries])
    qs = [e["question"] for e in entries]
    ts = [e["task"] for e in entries]
    ids = [e["image_name"] for e in entries]
    server.answer(images, qs, ts, image_ids=ids)
    key0 = server._fused_key
    assert key0 is not None
    old_k = trained.k
    try:
        trained.k = 1 if old_k != 1 else 2
        changed = server.answer(images, qs, ts, image_ids=ids)
        assert server._fused_key != key0
        fresh = MPRServer(trained, prompt_fastpath=True).answer(
            images, qs, ts, image_ids=ids)
        assert changed == fresh
    finally:
        trained.k = old_k


def test_continuation_exactness_fuzz():
    """Fuzz the exactness contract the fused serve path rests on: for ANY
    (prompt, hint) pair whose junction boundary_safe accepts,
    encode(prompt + hint) MUST equal the spliced
    encode(prompt) + encode_continuation(hint) + [eos]. Random strings
    over a mixed alphabet (letters, digits, punctuation, spaces) drive
    both the accept and reject branches; the accept branch is verified
    exactly, and at least a handful of each must occur."""
    import random

    rng = random.Random(7)
    corpus = ["is this a lung?", "what organ is shown?", "x-ray or ct?",
              "i believe the answer is certainly lung",
              "the most frequent answer is 2 kidneys!"]
    vocab = spm.UnigramVocab.build_toy(corpus)
    tok = spm.T5SentencePieceTokenizer(vocab)
    alphabet = "abcdefghij 0123456789?!.,:-'()/"
    n_safe = n_unsafe = 0
    for _ in range(400):
        a = "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 24)))
        b = "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 16)))
        # the production gate: serve checks concat_safe(prompt,
        # hint's RAW first char) — hints.py first_char (serve.py submit)
        if tok.concat_safe(a, b[0]):
            n_safe += 1
            whole = tok.encode(a + b)
            split = (tok.encode(a, add_eos=False)
                     + tok.encode_continuation(b) + [tok.eos_id])
            assert whole == split, (a, b)
        else:
            n_unsafe += 1
    assert n_safe >= 20 and n_unsafe >= 20, (n_safe, n_unsafe)


def test_length_sort_answers_match_unsorted(trained):
    """MPRServer(length_sort=True): answer-length-aware chunk composition
    re-orders rows across chunk boundaries (retrieval pre-pass predicts
    answer lengths) but must return identical answers in the CALLER'S
    order — the AnswerHandle unsorts exactly once, including across
    repeated result() calls and the pipelined submit path."""
    sorted_srv = MPRServer(trained, length_sort=True, pipeline_depth=2)
    base = MPRServer(trained)
    # 11 rows over batch_size=4 chunks -> the sort actually re-chunks
    entries = (trained.dataset_test.entries * 2)[:11]
    images = np.stack([trained.images[e["image_name"]] for e in entries])
    questions = [e["question"] for e in entries]
    tasks = [e["task"] for e in entries]
    ids = [e["image_name"] for e in entries]
    a_sorted = sorted_srv.answer(images, questions, tasks, image_ids=ids)
    a_base = base.answer(images, questions, tasks, image_ids=ids)
    assert a_sorted == a_base
    assert sorted_srv._fused_predict is not None  # fast path engaged
    # result() twice: the unsort must not be applied twice
    h = sorted_srv.submit(images, questions, tasks, image_ids=ids)
    assert h.result() == a_base
    assert h.result() == a_base
    # pipelined: two requests in flight, both unsorted correctly
    h1 = sorted_srv.submit(images, questions, tasks, image_ids=ids)
    h2 = sorted_srv.submit(images, list(reversed(questions)),
                           list(reversed(tasks)),
                           image_ids=list(reversed(ids)))
    assert h1.result() == a_base
    assert h2.result() == list(reversed(a_base))


def test_spec_decode_answers_match_lockstep(trained):
    """MPRServer(spec_decode=4): hint-draft speculative decode through the
    fused step returns identical answers to the lockstep fast path (and
    builds its draft tables)."""
    spec = MPRServer(trained, spec_decode=4)
    base = MPRServer(trained)
    entries = (trained.dataset_test.entries * 2)[:10]
    images = np.stack([trained.images[e["image_name"]] for e in entries])
    questions = [e["question"] for e in entries]
    tasks = [e["task"] for e in entries]
    ids = [e["image_name"] for e in entries]
    a_spec = spec.answer(images, questions, tasks, image_ids=ids)
    a_base = base.answer(images, questions, tasks, image_ids=ids)
    assert a_spec == a_base
    assert spec._draft_tables is not None
    assert spec._fused_predict is not None
    # draft rows are the label tokenization of the distinct corpus answers
    n_distinct = len({a for a in trained.retrieval_index.answers})
    assert spec._draft_tables.ids.shape[0] == n_distinct
