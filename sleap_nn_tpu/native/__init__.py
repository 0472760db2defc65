"""Native (C++) runtime components, bound via ctypes.

The compute path is jax/XLA/Pallas; these are the HOST-side hot loops that
sit at the device->host boundary — currently the bottom-up PAF grouping
stage (per-edge Hungarian + greedy instance union), mirroring where the
reference keeps native code under torch/scipy (reference
sleap_nn/inference/ops/paf.py:500-820 runs scipy's C solver per edge plus
a Python union loop; here the whole per-sample stage is one C++ call).

The shared library builds on demand with the baked-in g++ (no pybind11 in
this environment — plain C ABI + ctypes). When no compiler is available
the callers fall back to the scipy/numpy implementation, so the package
stays pure-Python-functional.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional

import numpy as np

_HERE = Path(__file__).parent
_SRC = _HERE / "paf_group.cpp"
_LIB = _HERE / "_paf_group.so"
_lock = threading.Lock()
_lib = None
_load_failed = False


def _build() -> bool:
    """Compile the shared library if missing/stale. Returns success."""
    try:
        if _LIB.exists() and _LIB.stat().st_mtime >= _SRC.stat().st_mtime:
            return True
        cmd = [
            "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
            str(_SRC), "-o", str(_LIB),
        ]
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded native library, building it on first use; None on failure."""
    global _lib, _load_failed
    if _lib is not None:
        return _lib
    if _load_failed or os.environ.get("SLEAP_NN_TPU_NO_NATIVE"):
        return None
    with _lock:
        if _lib is not None:
            return _lib
        if not _build():
            _load_failed = True
            return None
        try:
            lib = ctypes.CDLL(str(_LIB))
        except OSError:
            _load_failed = True
            return None
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        lib.paf_group_sample.restype = ctypes.c_int
        lib.paf_group_sample.argtypes = [
            f32p, ctypes.c_int, ctypes.c_int,          # scores, n_edges, k
            i32p, i32p, ctypes.c_int,                  # edge_src, edge_dst, n_nodes
            i32p, ctypes.c_float, ctypes.c_int,        # order, min_line, min_peaks
            i32p, i32p, i32p, i32p, f32p, i32p,        # outputs
        ]
        _lib = lib
        return _lib


def paf_group_sample_native(
    scores: np.ndarray,
    edge_inds,
    sorted_edge_inds,
    n_nodes: int,
    min_line_scores: float,
    min_instance_peaks: int,
):
    """One sample's dense PAF grouping in C++.

    Args:
        scores: ``(n_edges, K, K)`` float32 with -inf at invalid pairs.

    Returns:
        ``(assign (n_nodes, K) int32 instance ids (-1 none), connections
        {edge: [(src, dst, score), ...]}, n_instances)`` — or ``None`` when
        the native library is unavailable (callers fall back to scipy).
    """
    lib = get_lib()
    if lib is None:
        return None
    scores = np.ascontiguousarray(scores, np.float32)
    n_edges, k = scores.shape[0], scores.shape[1]
    edge_src = np.ascontiguousarray([e[0] for e in edge_inds], np.int32)
    edge_dst = np.ascontiguousarray([e[1] for e in edge_inds], np.int32)
    order = np.ascontiguousarray(sorted_edge_inds, np.int32)

    assign = np.empty((n_nodes, k), np.int32)
    cap = max(1, n_edges * k)
    c_edge = np.empty(cap, np.int32)
    c_src = np.empty(cap, np.int32)
    c_dst = np.empty(cap, np.int32)
    c_score = np.empty(cap, np.float32)
    n_conns = np.zeros(1, np.int32)

    n_inst = lib.paf_group_sample(
        scores.reshape(-1), n_edges, k, edge_src, edge_dst, n_nodes,
        order, float(min_line_scores), int(min_instance_peaks),
        assign.reshape(-1), c_edge, c_src, c_dst, c_score, n_conns,
    )
    nc = int(n_conns[0])
    connections = {}
    for i in range(nc):
        connections.setdefault(int(c_edge[i]), []).append(
            (int(c_src[i]), int(c_dst[i]), float(c_score[i]))
        )
    return assign, connections, int(n_inst)
