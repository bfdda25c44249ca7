"""Retrieval-diagnostic determinism (train/metrics.py).

The reference computes the "most common retrieved answer" as
``max(set(ra), key=ra.count)`` (main.py:283); set iteration order is
PYTHONHASHSEED-randomized, so on count ties the reported reliance
percentages differed between two runs of the same evaluation. The rebuild
breaks ties by FIRST RETRIEVAL RANK (the same rule the prompt-vote uses,
retrieval/index.majority_vote) — these tests pin that rule.
"""

from multimodalpromptretrieval_tpu.train.metrics import (
    TestMetrics as Metrics,
)


def _diag(ra, gt="a", pred="x"):
    m = Metrics(retrieval_k=len(ra))
    m.add_retrieval_diagnostics(pred, {"answer": gt, "question_type": "qt"},
                                ra, ["qt"] * len(ra))
    return m


def test_tied_vote_goes_to_first_retrieval_rank():
    # counts tie 1-1: the first-retrieved answer ("b") must win, so gt
    # ("a") does NOT match — regardless of string hash order
    m = _diag(["b", "a"], gt="a")
    assert m.full_retrieval_reliance_gt == 0
    m2 = _diag(["a", "b"], gt="a")
    assert m2.full_retrieval_reliance_gt == 1


def test_majority_beats_rank_order():
    # a clear majority wins wherever it appears
    m = _diag(["b", "a", "a"], gt="a")
    assert m.full_retrieval_reliance_gt == 1


def test_tie_rule_matches_prompt_vote():
    from multimodalpromptretrieval_tpu.retrieval.index import majority_vote

    for ra in (["b", "a"], ["a", "b"], ["c", "b", "b", "a", "a"]):
        winner, _ = majority_vote(ra)
        m = _diag(list(ra), gt=winner)
        assert m.full_retrieval_reliance_gt == 1
