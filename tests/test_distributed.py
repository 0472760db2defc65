"""Multi-host plumbing tests on the virtual 8-device CPU mesh.

True multi-process can't run in one pytest process; these cover the
single-process contracts (no-op init, batch math, global-batch assembly
equivalence) that the multi-host path shares.
"""

import jax
import numpy as np
import pytest

from sleap_nn_tpu.parallel import (
    barrier,
    get_mesh,
    initialize_distributed,
    is_multiprocess,
    local_batch_size,
    make_global_batch,
    process_count,
    process_index,
    shard_batch,
)


def test_initialize_noop_single_host(monkeypatch):
    monkeypatch.delenv("SLEAP_NN_TPU_COORDINATOR", raising=False)
    monkeypatch.delenv("SLEAP_NN_TPU_NUM_PROCESSES", raising=False)
    assert initialize_distributed() is False
    assert not is_multiprocess()
    assert process_count() == 1
    assert process_index() == 0


def test_local_batch_size_math():
    assert local_batch_size(32) == 32  # single process: whole batch
    # Division check fires on indivisible batches in multi-process runs;
    # single-process any batch divides by 1.
    assert local_batch_size(7) == 7


def test_make_global_batch_matches_shard_batch():
    mesh = get_mesh()
    n = len(jax.devices())
    batch = {
        "frames": np.arange(n * 4 * 6, dtype=np.float32).reshape(n * 4, 6),
        "step": np.float32(3.0),
    }
    a = shard_batch(batch, mesh)
    b = make_global_batch(batch, mesh)
    np.testing.assert_array_equal(np.asarray(a["frames"]), np.asarray(b["frames"]))
    assert float(b["step"]) == 3.0
    # Global shape preserved; leading axis sharded over the mesh.
    assert b["frames"].shape == (n * 4, 6)
    assert len(b["frames"].sharding.device_set) == n


def test_barrier_noop_single_host():
    barrier("unit-test")  # must not raise or block


def test_sharded_train_math_on_mesh():
    """A mean over the sharded batch axis (XLA inserts the all-reduce) is
    exact against numpy."""
    import jax.numpy as jnp

    mesh = get_mesh()
    n = len(jax.devices())
    x = np.arange(n * 2 * 3, dtype=np.float32).reshape(n * 2, 3)
    gx = make_global_batch({"x": x}, mesh)["x"]
    got = float(jax.jit(jnp.mean)(gx))
    assert got == pytest.approx(float(x.mean()))


def test_sync_cache_fill_single_process_reraises():
    from sleap_nn_tpu.parallel.distributed import sync_cache_fill_status

    err = RuntimeError("disk full")
    with pytest.raises(RuntimeError, match="disk full"):
        sync_cache_fill_status(err)
    sync_cache_fill_status(None)  # success is a no-op


def test_sync_cache_fill_distributed_remote_failure(monkeypatch):
    """A healthy rank raises a generic error when another rank failed."""
    import numpy as np

    import sleap_nn_tpu.parallel.distributed as dist_mod

    monkeypatch.setattr(dist_mod.jax, "process_count", lambda: 2)

    class _MH:
        @staticmethod
        def process_allgather(x):
            return np.asarray([[0], [1]], np.int32)  # rank 1 failed

    monkeypatch.setattr(
        "jax.experimental.multihost_utils.process_allgather",
        _MH.process_allgather,
    )
    with pytest.raises(RuntimeError, match=r"process\(es\) \[1\]"):
        dist_mod.sync_cache_fill_status(None)


def test_sync_cache_fill_distributed_local_failure_keeps_original(monkeypatch):
    import numpy as np

    import sleap_nn_tpu.parallel.distributed as dist_mod

    monkeypatch.setattr(dist_mod.jax, "process_count", lambda: 2)
    monkeypatch.setattr(
        "jax.experimental.multihost_utils.process_allgather",
        lambda x: np.asarray([[1], [0]], np.int32),
    )
    with pytest.raises(OSError, match="cannot write"):
        dist_mod.sync_cache_fill_status(OSError("cannot write"))


def test_sync_cache_fill_distributed_all_succeed_noop(monkeypatch):
    import numpy as np

    import sleap_nn_tpu.parallel.distributed as dist_mod

    monkeypatch.setattr(dist_mod.jax, "process_count", lambda: 2)
    monkeypatch.setattr(
        "jax.experimental.multihost_utils.process_allgather",
        lambda x: np.asarray([[0], [0]], np.int32),
    )
    dist_mod.sync_cache_fill_status(None)
