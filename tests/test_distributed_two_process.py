"""REAL 2-process distributed run: jax.distributed over localhost.

Spawns two Python subprocesses that join one JAX cluster via the package's
env contract (SLEAP_NN_TPU_COORDINATOR/_NUM_PROCESSES/_PROCESS_ID), build a
global mesh over 2x2 virtual CPU devices, assemble global batches with
``make_global_batch`` from per-process local shards, run two jitted
data-parallel SGD steps, and assert the replicated params come out
BIT-IDENTICAL across processes. This covers the actual initialization and
addressable-device arithmetic that mocked tests cannot
(reference analog: the DDP respawn/barrier protocol, SURVEY §2.11).
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

WORKER = r'''
import os, sys
sys.path.insert(0, os.environ["REPO_ROOT"])
import numpy as np

# sitecustomize pre-imports jax pinned to the axon TPU tunnel; the env var
# alone is too late — switch the platform via config before first use.
import jax
jax.config.update("jax_platforms", "cpu")

from sleap_nn_tpu.parallel.distributed import (
    barrier, initialize_distributed, is_multiprocess, local_batch_size,
    make_global_batch, process_count, process_index,
)

assert initialize_distributed() is True, "env contract did not initialize"
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

assert is_multiprocess() and process_count() == 2
pid = process_index()
assert len(jax.local_devices()) == 2 and len(jax.devices()) == 4

from sleap_nn_tpu.parallel.mesh import get_mesh, shard_batch

mesh = get_mesh()
assert mesh.devices.size == 4

GLOBAL_BATCH = 8
local_bs = local_batch_size(GLOBAL_BATCH)
assert local_bs == 4

# Deterministic per-process data: process p owns rows [p*4, p*4+4).
full_x = np.arange(GLOBAL_BATCH, dtype=np.float32).reshape(GLOBAL_BATCH, 1)
full_y = 3.0 * full_x + 1.0
local = {"x": full_x[pid * local_bs:(pid + 1) * local_bs],
         "y": full_y[pid * local_bs:(pid + 1) * local_bs]}

params = {"w": jnp.zeros((1, 1)), "b": jnp.zeros((1,))}
repl = NamedSharding(mesh, P())
params = jax.device_put(params, repl)

def loss_fn(p, batch):
    pred = batch["x"] @ p["w"] + p["b"]
    return jnp.mean((pred - batch["y"]) ** 2)

@jax.jit
def step(p, batch):
    g = jax.grad(loss_fn)(p, batch)
    return jax.tree_util.tree_map(lambda a, b: a - 0.01 * b, p, g)

for _ in range(2):
    gb = shard_batch(local, mesh)  # routes through make_global_batch
    assert gb["x"].shape == (GLOBAL_BATCH, 1)  # globally shaped
    params = step(params, gb)

barrier("test_sync")
out = np.concatenate([np.asarray(params["w"]).ravel(),
                      np.asarray(params["b"]).ravel()])
np.save(os.environ["OUT_PATH"], out)
print("WORKER_OK", pid, out.tolist())
'''


def test_two_process_params_bit_identical(tmp_path):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    procs = []
    outs = []
    for pid in range(2):
        out_path = tmp_path / f"params_{pid}.npy"
        outs.append(out_path)
        env = dict(os.environ)
        env.update(
            REPO_ROOT=str(Path(__file__).resolve().parents[1]),
            OUT_PATH=str(out_path),
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=2",
            SLEAP_NN_TPU_COORDINATOR=f"localhost:{port}",
            SLEAP_NN_TPU_NUM_PROCESSES="2",
            SLEAP_NN_TPU_PROCESS_ID=str(pid),
        )
        procs.append(subprocess.Popen(
            [sys.executable, "-c", WORKER], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        ))
    results = [p.communicate(timeout=280) for p in procs]
    for p, (out, err) in zip(procs, results):
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        assert "WORKER_OK" in out
    a = np.load(outs[0])
    b = np.load(outs[1])
    np.testing.assert_array_equal(a, b)  # bit-identical across processes
    # And the params actually moved (two real SGD steps happened).
    assert np.abs(a).sum() > 0
