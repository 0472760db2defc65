"""PAF grouping host-side matrix: matching, union-find assembly, instance
scores, toposort, edge cases.

Reference scenario source: tests/inference/test_paf_grouping.py (matching
per edge, greedy instance assembly case analysis ops/paf.py:705-820,
min_instance_peaks filtering, multi-component skeletons).
"""

from __future__ import annotations

import numpy as np
import pytest

from sleap_nn_tpu.inference.paf_grouping import (
    assign_connections_to_instances,
    make_predicted_instances,
    match_candidates_dense,
    toposort_edges,
)


NEG = -np.inf


def scores_matrix(n_edges, k, entries):
    s = np.full((n_edges, k, k), NEG)
    for (e, i, j), v in entries.items():
        s[e, i, j] = v
    return s


# ── match_candidates_dense ───────────────────────────────────────────────────


def test_match_unique_best_assignment():
    s = scores_matrix(1, 2, {(0, 0, 0): 0.9, (0, 0, 1): 0.3,
                             (0, 1, 0): 0.2, (0, 1, 1): 0.8})
    got = match_candidates_dense(s)
    assert sorted(got) == [(0, 0, 0, 0.9), (0, 1, 1, 0.8)]


def test_match_hungarian_resolves_conflicts_globally():
    # greedy would take (0,0)=0.9 and strand slot 1; optimal is 0.8+0.85.
    s = scores_matrix(1, 2, {(0, 0, 0): 0.9, (0, 0, 1): 0.8,
                             (0, 1, 0): 0.85})
    got = match_candidates_dense(s, min_line_scores=0.0)
    pairs = {(m[1], m[2]) for m in got}
    assert pairs == {(0, 1), (1, 0)}


def test_match_min_line_scores_filters():
    s = scores_matrix(1, 2, {(0, 0, 0): 0.9, (0, 1, 1): 0.1})
    got = match_candidates_dense(s, min_line_scores=0.25)
    assert got == [(0, 0, 0, 0.9)]


def test_match_empty_edge_skipped():
    s = scores_matrix(2, 2, {(1, 0, 0): 0.5})
    got = match_candidates_dense(s)
    assert got == [(1, 0, 0, 0.5)]


def test_match_rectangular_validity():
    # only one valid dst slot
    s = scores_matrix(1, 3, {(0, 0, 2): 0.6, (0, 1, 2): 0.7})
    got = match_candidates_dense(s)
    assert got == [(0, 1, 2, 0.7)]


# ── assign_connections_to_instances ──────────────────────────────────────────

EDGES3 = [(0, 1), (1, 2)]  # chain a->b->c


def test_assign_chain_single_instance():
    conns = {0: [(0, 0, 0.9)], 1: [(0, 0, 0.8)]}
    a = assign_connections_to_instances(conns, EDGES3, toposort_edges(EDGES3))
    assert len(set(a.values())) == 1
    assert set(a) == {(0, 0), (1, 0), (2, 0)}


def test_assign_two_parallel_instances():
    conns = {0: [(0, 0, 0.9), (1, 1, 0.9)], 1: [(0, 0, 0.8), (1, 1, 0.8)]}
    a = assign_connections_to_instances(conns, EDGES3, toposort_edges(EDGES3))
    assert len(set(a.values())) == 2
    inst_of = lambda node, slot: a[(node, slot)]
    assert inst_of(0, 0) == inst_of(1, 0) == inst_of(2, 0)
    assert inst_of(0, 1) == inst_of(1, 1) == inst_of(2, 1)
    assert inst_of(0, 0) != inst_of(0, 1)


def test_assign_merges_disjoint_fragments():
    """Edge 1 seen before edge 0 joins two fragments without node clash."""
    conns = {1: [(0, 0, 0.9)], 0: [(0, 0, 0.8)]}
    order = toposort_edges(EDGES3)
    a = assign_connections_to_instances(conns, EDGES3, order)
    assert len(set(a.values())) == 1


def test_assign_min_instance_peaks_int():
    conns = {0: [(0, 0, 0.9)]}  # 2-node fragment in a 3-node skeleton
    a = assign_connections_to_instances(conns, EDGES3, toposort_edges(EDGES3),
                                        min_instance_peaks=3, n_nodes=3)
    assert a == {}


def test_assign_min_instance_peaks_fraction():
    conns = {0: [(0, 0, 0.9)], 1: [(0, 0, 0.9)]}
    a = assign_connections_to_instances(conns, EDGES3, toposort_edges(EDGES3),
                                        min_instance_peaks=0.9, n_nodes=3)
    assert len(a) == 3  # 3 peaks >= ceil-ish 0.9*3
    # fractional thresholds truncate: int(0.9*3)=2, so a 2-peak fragment
    # survives (reference ops/paf.py int conversion semantics)
    a2 = assign_connections_to_instances({0: [(1, 1, 0.9)]}, EDGES3,
                                         toposort_edges(EDGES3),
                                         min_instance_peaks=0.9, n_nodes=3)
    assert len(a2) == 2


def test_toposort_orders_from_root():
    edges = [(1, 2), (0, 1)]  # given out of order
    order = toposort_edges(edges)
    assert order[0] == 1  # edge (0,1) from the root comes first
    assert set(order) == {0, 1}


def test_toposort_cyclic_graph_falls_back_to_input_order():
    edges = [(0, 1), (1, 0)]
    assert toposort_edges(edges) == (0, 1)


# ── make_predicted_instances ─────────────────────────────────────────────────


def test_make_instances_collects_points_and_scores():
    grouped_peaks = np.zeros((3, 2, 2), np.float32)
    grouped_peaks[0, 0] = [1, 1]
    grouped_peaks[1, 0] = [2, 2]
    grouped_peaks[2, 0] = [3, 3]
    grouped_vals = np.full((3, 2), 0.5, np.float32)
    conns = {0: [(0, 0, 0.9)], 1: [(0, 0, 0.8)]}
    a = assign_connections_to_instances(conns, EDGES3, (0, 1))
    pts, vals, scores = make_predicted_instances(
        grouped_peaks, grouped_vals, conns, a, EDGES3, n_nodes=3)
    assert pts.shape == (1, 3, 2)
    np.testing.assert_allclose(pts[0], [[1, 1], [2, 2], [3, 3]])
    np.testing.assert_allclose(vals[0], 0.5)
    assert np.isclose(scores[0], 0.9 + 0.8)


def test_make_instances_partial_instance_nan_pads():
    grouped_peaks = np.zeros((3, 2, 2), np.float32)
    grouped_peaks[0, 1] = [5, 5]
    grouped_peaks[1, 1] = [6, 6]
    grouped_vals = np.full((3, 2), 0.4, np.float32)
    conns = {0: [(1, 1, 0.7)]}
    a = assign_connections_to_instances(conns, EDGES3, (0, 1))
    pts, vals, scores = make_predicted_instances(
        grouped_peaks, grouped_vals, conns, a, EDGES3, n_nodes=3)
    assert pts.shape[0] == 1
    np.testing.assert_allclose(pts[0, 0], [5, 5])
    assert np.isnan(pts[0, 2]).all()  # node c missing


def test_make_instances_empty_assignments():
    pts, vals, scores = make_predicted_instances(
        np.zeros((3, 2, 2), np.float32), np.zeros((3, 2), np.float32),
        {}, {}, EDGES3, n_nodes=3)
    assert pts.shape == (0, 3, 2) and scores.shape == (0,)


def test_multi_component_skeleton_assembles_separately():
    """Disconnected skeleton (a-b, c-d): fragments never merge."""
    edges = [(0, 1), (2, 3)]
    conns = {0: [(0, 0, 0.9)], 1: [(0, 0, 0.9)]}
    a = assign_connections_to_instances(conns, edges, toposort_edges(edges))
    assert len(set(a.values())) == 2
