"""Compute kernels: Pallas TPU kernels with lax reference fallbacks."""

from multimodalpromptretrieval_tpu.ops.layers import (  # noqa: F401
    rms_norm,
    layer_norm,
    dense,
    quick_gelu,
)
from multimodalpromptretrieval_tpu.ops.attention import multi_head_attention  # noqa: F401
from multimodalpromptretrieval_tpu.ops.topk import l2_topk  # noqa: F401
