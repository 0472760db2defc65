"""Native (C++) PAF grouping: build, parity vs the scipy path, speed.

The partition of peaks into instances must be identical between the C++
library and the Python reference implementation (instance ORDER may
differ; comparisons are order-insensitive).
"""

import numpy as np
import pytest

from sleap_nn_tpu.inference.paf_grouping import (
    assign_connections_to_instances,
    make_predicted_instances,
    match_candidates_dense,
    toposort_edges,
)
from sleap_nn_tpu.native import get_lib, paf_group_sample_native


def _python_group(scores, edge_inds, sorted_order, n_nodes, min_line, min_peaks):
    matches = match_candidates_dense(scores, min_line)
    connections = {}
    for e, s, d, sc in matches:
        connections.setdefault(e, []).append((s, d, sc))
    assignments = assign_connections_to_instances(
        connections, edge_inds, sorted_order,
        min_instance_peaks=min_peaks, n_nodes=n_nodes,
    )
    return connections, assignments


def _random_scores(rng, n_edges, k, p_valid=0.5):
    s = rng.normal(0.3, 0.4, (n_edges, k, k)).astype(np.float32)
    mask = rng.random((n_edges, k, k)) < p_valid
    s[~mask] = -np.inf
    return s


def _partition(assignments):
    """Canonical order-insensitive view: frozensets of peak ids."""
    groups = {}
    for pid, inst in assignments.items():
        groups.setdefault(inst, set()).add(pid)
    return {frozenset(g) for g in groups.values()}


def test_native_library_builds():
    lib = get_lib()
    assert lib is not None, "g++ build of the native grouping library failed"


@pytest.mark.parametrize("seed", range(8))
def test_native_matches_python_partition(seed):
    rng = np.random.default_rng(seed)
    n_nodes, k = 5, 8
    edge_inds = [(0, 1), (1, 2), (1, 3), (3, 4)]
    order = toposort_edges(edge_inds)
    scores = _random_scores(rng, len(edge_inds), k)

    conns_py, assign_py = _python_group(scores, edge_inds, order, n_nodes,
                                        0.25, 0)
    native = paf_group_sample_native(scores, edge_inds, order, n_nodes,
                                     0.25, 0)
    assert native is not None
    assign_c, conns_c, n_inst = native

    # Connections identical (Hungarian optimum is unique up to ties; the
    # score SETS per edge must match even if tied slots differ).
    for e in set(conns_py) | set(conns_c):
        py_scores = sorted(round(s, 4) for _, _, s in conns_py.get(e, []))
        c_scores = sorted(round(s, 4) for _, _, s in conns_c.get(e, []))
        assert py_scores == pytest.approx(c_scores), f"edge {e}"

    # Instance partition identical.
    assign_c_dict = {
        (nd, sl): int(assign_c[nd, sl])
        for nd in range(n_nodes) for sl in range(k) if assign_c[nd, sl] >= 0
    }
    assert _partition(assign_py) == _partition(assign_c_dict)
    assert n_inst == len({v for v in assign_py.values()})


def test_native_min_instance_peaks_filter():
    rng = np.random.default_rng(3)
    n_nodes, k = 4, 6
    edge_inds = [(0, 1), (1, 2), (2, 3)]
    order = toposort_edges(edge_inds)
    scores = _random_scores(rng, len(edge_inds), k, p_valid=0.3)
    base = paf_group_sample_native(scores, edge_inds, order, n_nodes, 0.25, 0)
    strict = paf_group_sample_native(scores, edge_inds, order, n_nodes, 0.25, 4)
    assert strict[2] <= base[2]
    # Every surviving instance has >= 4 peaks.
    assign = strict[0]
    ids, counts = np.unique(assign[assign >= 0], return_counts=True)
    assert (counts >= 4).all()


def test_native_empty_scores():
    edge_inds = [(0, 1)]
    scores = np.full((1, 4, 4), -np.inf, np.float32)
    out = paf_group_sample_native(scores, edge_inds, (0,), 2, 0.25, 0)
    assign, conns, n = out
    assert n == 0 and not conns and (assign == -1).all()


def test_group_sample_end_to_end_uses_native():
    """PAFScorer.group_sample produces valid instances via the native path."""
    from sleap_nn_tpu.inference.paf_grouping import PAFScorer

    rng = np.random.default_rng(5)
    scorer = PAFScorer(part_names=["a", "b", "c"], edges=[("a", "b"), ("b", "c")])
    k = 6
    peaks = rng.uniform(0, 100, (3, k, 2)).astype(np.float32)
    vals = rng.random((3, k)).astype(np.float32)
    scores = _random_scores(rng, 2, k)
    pts, pvals, inst_scores = scorer.group_sample(peaks, vals, scores)
    assert pts.ndim == 3 and pts.shape[1:] == (3, 2)
    assert pvals.shape == pts.shape[:2]
    assert inst_scores.shape == (pts.shape[0],)
    # Every emitted instance has at least one visible node.
    if len(pts):
        assert (~np.isnan(pts[:, :, 0])).any(axis=1).all()


def test_native_faster_than_scipy_loop():
    """The one-call C++ stage beats per-edge scipy round-trips."""
    import time

    rng = np.random.default_rng(0)
    n_nodes, k = 15, 20
    edge_inds = [(i, i + 1) for i in range(14)]
    order = toposort_edges(edge_inds)
    samples = [_random_scores(rng, len(edge_inds), k) for _ in range(20)]

    paf_group_sample_native(samples[0], edge_inds, order, n_nodes, 0.25, 0)
    t0 = time.perf_counter()
    for s in samples:
        paf_group_sample_native(s, edge_inds, order, n_nodes, 0.25, 0)
    t_native = time.perf_counter() - t0

    t0 = time.perf_counter()
    for s in samples:
        _python_group(s, edge_inds, order, n_nodes, 0.25, 0)
    t_python = time.perf_counter() - t0
    # Not a strict perf gate (CI noise) — just require non-regression.
    assert t_native < t_python * 1.5, (t_native, t_python)
