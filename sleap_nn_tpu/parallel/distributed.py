"""Multi-host (multi-process) initialization and data feeding.

Parity target: the reference's DDP/multi-GPU launch path (reference
sleap_nn/training/model_trainer.py Lightning `devices`/`num_nodes` +
torchrun env wiring) — re-expressed the JAX way: one process per host,
``jax.distributed.initialize`` to join the cluster, a GLOBAL
``jax.sharding.Mesh`` over every process's devices, and
``jax.make_array_from_process_local_data`` to assemble global batches from
host-local shards. Collectives ride ICI/DCN via XLA — there is no NCCL/MPI
analog to manage.

Launch contract (mirrors torchrun's env style):
    SLEAP_NN_TPU_COORDINATOR=host0:8476 \
    SLEAP_NN_TPU_NUM_PROCESSES=4 \
    SLEAP_NN_TPU_PROCESS_ID=<0..3> python -m sleap_nn_tpu.cli train ...

On Cloud TPU pods all three are auto-detected by JAX and
``initialize_distributed()`` needs no arguments.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np

_INITIALIZED = False


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Join a multi-process JAX cluster; safe no-op for single-process runs.

    Args resolve from ``SLEAP_NN_TPU_COORDINATOR`` /
    ``SLEAP_NN_TPU_NUM_PROCESSES`` / ``SLEAP_NN_TPU_PROCESS_ID`` when not
    given. On TPU pod slices JAX auto-detects everything, so setting ONLY
    the coordinator env (or nothing at all under the TPU runtime) works.

    Returns True when a multi-process runtime was initialized.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return jax.process_count() > 1

    coordinator_address = coordinator_address or os.environ.get(
        "SLEAP_NN_TPU_COORDINATOR"
    )
    if num_processes is None:
        env = os.environ.get("SLEAP_NN_TPU_NUM_PROCESSES")
        num_processes = int(env) if env else None
    if process_id is None:
        env = os.environ.get("SLEAP_NN_TPU_PROCESS_ID")
        process_id = int(env) if env else None

    if coordinator_address is None and num_processes is None:
        # Single-host launch (or TPU-pod auto-detection was not requested):
        # nothing to initialize.
        return False

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    _INITIALIZED = True
    return jax.process_count() > 1


def is_multiprocess() -> bool:
    """Whether this runtime spans multiple JAX processes (hosts)."""
    return jax.process_count() > 1


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def local_batch_size(global_batch_size: int) -> int:
    """This process's slice of the global batch (must divide evenly)."""
    n = jax.process_count()
    if global_batch_size % n:
        raise ValueError(
            f"global batch {global_batch_size} must divide evenly across "
            f"{n} processes."
        )
    return global_batch_size // n


def make_global_batch(host_batch: dict, mesh, axis: str = "data") -> dict:
    """Assemble a GLOBAL sharded batch from this process's local arrays.

    Each process passes its local slice (``local_batch_size`` rows); the
    returned jax.Arrays are globally shaped with the leading axis sharded
    over the whole mesh. Single-process this reduces to a plain sharded
    device_put, so callers can use it unconditionally.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    batch_spec = NamedSharding(mesh, P(axis))
    repl_spec = NamedSharding(mesh, P())

    def put(x):
        x = np.asarray(x)
        if x.ndim == 0:
            return jax.device_put(x, repl_spec)
        return jax.make_array_from_process_local_data(batch_spec, x)

    return jax.tree_util.tree_map(put, host_batch)


def sync_cache_fill_status(local_error: "Exception | None" = None) -> None:
    """Agree on cache-fill success across processes (reference
    tests/test_parallel_caching.py DistSyncCacheFill).

    Every process calls this after filling its data cache. If ANY process
    failed, every process raises — the failing one with its original error,
    the others with a generic message — instead of the healthy ranks
    deadlocking at the first collective of the training loop.

    Single-process: re-raises the local error or no-ops.
    """
    if jax.process_count() <= 1:
        if local_error is not None:
            raise local_error
        return
    import numpy as np
    from jax.experimental import multihost_utils

    flags = multihost_utils.process_allgather(
        np.asarray([0 if local_error is None else 1], np.int32)
    ).reshape(-1)
    if local_error is not None:
        raise local_error
    failed = [i for i, f in enumerate(flags.tolist()) if f]
    if failed:
        raise RuntimeError(
            f"Data-cache fill failed on process(es) {failed}; aborting on "
            "all ranks to avoid a collective deadlock. See the failing "
            "rank's log for the original error."
        )


def barrier(name: str = "sleap_nn_tpu_barrier"):
    """Block until every process reaches this point (multi-host sync).

    Used at checkpoint/save boundaries so non-zero processes don't race
    ahead of process 0's filesystem writes. No-op single-process.
    """
    if jax.process_count() <= 1:
        return
    # A tiny all-reduce is the portable JAX barrier (the documented
    # recipe; multihost_utils.sync_global_devices wraps the same idea).
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)
