"""Device-mesh parallelism: sharding rules + collective retrieval.

The reference is single-GPU (SURVEY.md §2c: no torch.distributed anywhere);
the distribution story here is TPU-first — a ``jax.sharding.Mesh`` with a
batch-sharded train step (XLA inserts the psum grad all-reduce over ICI) and
an index-sharded retrieval query with an all-gather top-k merge.
"""

from multimodalpromptretrieval_tpu.parallel.mesh import (  # noqa: F401
    get_mesh,
    batch_sharding,
    replicated,
    make_train_step,
    make_predict_step,
    make_eval_loss_step,
    shard_params,
    shard_batch,
)
from multimodalpromptretrieval_tpu.parallel.retrieval import (  # noqa: F401
    sharded_l2_topk,
)
from multimodalpromptretrieval_tpu.parallel import multihost  # noqa: F401
