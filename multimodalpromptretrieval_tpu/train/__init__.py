"""Train/eval driver: jitted steps, metrics, checkpointing, CLI backend."""

from multimodalpromptretrieval_tpu.train.optim import (  # noqa: F401
    ReduceLROnPlateau,
    adamw_init,
    adamw_update,
)
from multimodalpromptretrieval_tpu.train.metrics import TestMetrics  # noqa: F401
from multimodalpromptretrieval_tpu.train.checkpoint import (  # noqa: F401
    load_checkpoint,
    save_checkpoint,
)
