"""Device-mesh parallelism utilities (data-parallel over ICI).

Replaces the reference's DDP/NCCL machinery (reference:
sleap_nn/training/model_trainer.py:1670-1739, SURVEY §2.11) with
single-controller JAX sharding: a 1-D ``data`` mesh, batches sharded on the
leading axis, parameters replicated; XLA inserts the gradient all-reduce.
Multi-host extends the same mesh over DCN via ``jax.distributed.initialize``.
"""

from sleap_nn_tpu.parallel.distributed import (
    barrier,
    initialize_distributed,
    is_multiprocess,
    local_batch_size,
    make_global_batch,
    process_count,
    process_index,
)
from sleap_nn_tpu.parallel.mesh import (
    get_mesh,
    replicate,
    shard_batch,
    shard_batch_spec,
)

__all__ = [
    "barrier",
    "get_mesh",
    "initialize_distributed",
    "is_multiprocess",
    "local_batch_size",
    "make_global_batch",
    "process_count",
    "process_index",
    "replicate",
    "shard_batch",
    "shard_batch_spec",
]
