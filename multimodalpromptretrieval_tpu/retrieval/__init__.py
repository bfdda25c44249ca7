"""Device-resident multimodal retrieval index."""

from multimodalpromptretrieval_tpu.retrieval.index import (  # noqa: F401
    RetrievalIndex,
    majority_vote,
    QUANTIFIER_BUCKETS,
)
