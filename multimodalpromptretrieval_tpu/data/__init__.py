"""Host-side data layer: SLAKE / VQA_RAD / ROCO parsing and batching."""

from multimodalpromptretrieval_tpu.data.datasets import (  # noqa: F401
    VQADataset,
    SLAKEDataset,
    VQARADDataset,
    ROCODataset,
    create_ans2label,
    load_dataset,
)
