"""Mesh construction + sharding helpers."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def get_mesh(
    num_devices: Optional[int] = None, devices: Optional[Sequence] = None, axis: str = "data"
) -> Mesh:
    """1-D data-parallel mesh over the available (or given) devices."""
    if devices is None:
        devices = jax.devices()
        if num_devices is not None:
            devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis,))


def shard_batch_spec(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Sharding for batch arrays: leading axis split across the mesh."""
    return NamedSharding(mesh, P(axis))


def replicate(mesh: Mesh) -> NamedSharding:
    """Sharding for replicated arrays (params, opt state)."""
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh, axis: str = "data") -> dict:
    """Device-put a host batch with the leading axis sharded over the mesh.

    Multi-process runtimes route through
    :func:`sleap_nn_tpu.parallel.distributed.make_global_batch`: each host
    contributes its local rows and the result is a globally-shaped sharded
    array (the JAX multi-host data-feeding contract).
    """
    if jax.process_count() > 1:
        from sleap_nn_tpu.parallel.distributed import make_global_batch

        return make_global_batch(batch, mesh, axis=axis)
    spec = shard_batch_spec(mesh, axis)

    def put(x):
        x = np.asarray(x)
        if x.ndim == 0:
            return jax.device_put(x, replicate(mesh))
        return jax.device_put(x, spec)

    return jax.tree_util.tree_map(put, batch)
