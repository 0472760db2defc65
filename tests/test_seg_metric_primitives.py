"""Segmentation-metric primitive scenario matrix.

Reference scenario source: tests/test_segmentation_eval.py — mask IoU /
boundary IoU / clDice behavior, dataset-relative size-bucket edges, VOC
AP-from-PR edge cases, and Hungarian mask matching optimality. Targets
sleap_nn_tpu/evaluation.py (parity: reference evaluation.py mask metrics).
"""

from __future__ import annotations

import numpy as np
import pytest

from sleap_nn_tpu.evaluation import (
    _ap_from_pr,
    _percentile_size_edges,
    _size_mask,
    boundary_iou,
    mask_cldice,
    mask_iou,
    match_masks,
)


def rect(h, w, y0, y1, x0, x1):
    m = np.zeros((h, w), bool)
    m[y0:y1, x0:x1] = True
    return m


# -- mask_iou -----------------------------------------------------------------


def test_mask_iou_identical_disjoint_partial():
    a = rect(32, 32, 0, 16, 0, 32)
    b = rect(32, 32, 16, 32, 0, 32)
    c = rect(32, 32, 8, 24, 0, 32)
    assert mask_iou(a, a) == 1.0
    assert mask_iou(a, b) == 0.0
    assert mask_iou(a, c) == pytest.approx((8 * 32) / (24 * 32))


def test_mask_iou_empty_masks():
    z = np.zeros((8, 8), bool)
    assert mask_iou(z, z) == 0.0
    assert mask_iou(z, rect(8, 8, 0, 4, 0, 4)) == 0.0


# -- match_masks --------------------------------------------------------------


def test_match_masks_hungarian_globally_optimal():
    # Greedy-by-first-row would pair gt0 with pr0 (IoU .52) and strand gt1;
    # the optimal pairing is gt0->pr1, gt1->pr0.
    gt0 = rect(32, 32, 0, 16, 0, 32)
    gt1 = rect(32, 32, 4, 20, 0, 32)
    pr0 = rect(32, 32, 6, 22, 0, 32)
    pr1 = rect(32, 32, 0, 15, 0, 32)
    pairs, fn, fp = match_masks([gt0, gt1], [pr0, pr1], iou_threshold=0.1)
    got = {(g, p) for g, p, _ in pairs}
    assert got == {(0, 1), (1, 0)}
    assert fn == [] and fp == []


def test_match_masks_below_threshold_unmatched():
    gt = rect(32, 32, 0, 8, 0, 8)
    pr = rect(32, 32, 24, 32, 24, 32)
    pairs, fn, fp = match_masks([gt], [pr], iou_threshold=0.5)
    assert pairs == [] and fn == [0] and fp == [0]


def test_match_masks_empty_sides():
    gt = rect(8, 8, 0, 4, 0, 4)
    pairs, fn, fp = match_masks([], [gt])
    assert pairs == [] and fn == [] and fp == [0]
    pairs, fn, fp = match_masks([gt], [])
    assert pairs == [] and fn == [0] and fp == []


# -- boundary_iou -------------------------------------------------------------


def test_boundary_iou_identical_is_one():
    m = rect(64, 64, 16, 48, 16, 48)
    assert boundary_iou(m, m) == pytest.approx(1.0)


def test_boundary_iou_shift_hurts_more_than_area_iou():
    # A 4-px shift of a large box keeps area IoU high but guts the thin
    # boundary-band overlap — the metric's reason to exist.
    a = rect(128, 128, 16, 112, 16, 112)
    b = rect(128, 128, 20, 116, 16, 112)
    assert mask_iou(a, b) > 0.85
    assert boundary_iou(a, b) < mask_iou(a, b) - 0.2


# -- mask_cldice --------------------------------------------------------------


def test_cldice_identical_is_one():
    m = rect(64, 64, 30, 34, 8, 56)  # a thick horizontal line
    assert mask_cldice(m, m) == pytest.approx(1.0)


def test_cldice_width_tolerant_vs_displacement():
    # Same centerline, doubled width: clDice stays ~1 (topology preserved).
    thin = rect(64, 64, 31, 33, 8, 56)
    thick = rect(64, 64, 29, 35, 8, 56)
    displaced = rect(64, 64, 45, 47, 8, 56)
    assert mask_cldice(thick, thin) > 0.9
    assert mask_cldice(displaced, thin) == pytest.approx(0.0)


def test_cldice_empty_masks():
    z = np.zeros((16, 16), bool)
    m = rect(16, 16, 4, 8, 4, 8)
    assert mask_cldice(z, m) == 0.0
    assert mask_cldice(z, z) == 0.0


# -- size buckets -------------------------------------------------------------


def test_percentile_size_edges_dataset_relative():
    areas = np.array([10.0, 20.0, 30.0, 40.0, 50.0, 60.0])
    edges = _percentile_size_edges(areas)
    assert edges[0] == pytest.approx(np.percentile(areas, 100 / 3.0))
    assert edges[1] == pytest.approx(np.percentile(areas, 200 / 3.0))
    # scaling the dataset scales the edges (unlike fixed COCO cutoffs)
    edges10 = _percentile_size_edges(areas * 10)
    np.testing.assert_allclose(edges10, np.asarray(edges) * 10)


def test_size_mask_buckets_partition():
    areas = np.array([5.0, 15.0, 25.0, 35.0, np.nan])
    edges = np.array([10.0, 30.0])
    buckets = [np.asarray(_size_mask(areas, i, edges)) for i in range(3)]
    assert buckets[0][:4].tolist() == [True, False, False, False]
    assert buckets[1][:4].tolist() == [False, True, True, False]
    assert buckets[2][:4].tolist() == [False, False, False, True]
    # every finite area lands in exactly one bucket
    total = sum(b[:4].astype(int) for b in buckets)
    assert total.tolist() == [1, 1, 1, 1]


# -- VOC AP from PR -----------------------------------------------------------


RT = np.linspace(0, 1, 101)


def test_ap_perfect_detection():
    ap, ar = _ap_from_pr(np.array([0.9, 0.8]), np.array([True, True]), 2, RT)
    assert ap == pytest.approx(1.0)
    assert ar == pytest.approx(1.0)


def test_ap_no_detections_is_zero():
    ap, ar = _ap_from_pr(np.array([]), np.array([], bool), 3, RT)
    assert ap == 0.0 and ar == 0.0


def test_ap_all_false_positives_is_zero():
    ap, ar = _ap_from_pr(np.array([0.9, 0.5]), np.array([False, False]), 2, RT)
    assert ap == 0.0 and ar == 0.0


def test_ap_ranking_matters():
    # TP ranked above FP scores better than FP ranked above TP.
    good, _ = _ap_from_pr(np.array([0.9, 0.1]), np.array([True, False]), 1, RT)
    bad, _ = _ap_from_pr(np.array([0.9, 0.1]), np.array([False, True]), 1, RT)
    assert good > bad


def test_ap_half_recall():
    ap, ar = _ap_from_pr(np.array([0.9]), np.array([True]), 2, RT)
    assert ar == pytest.approx(0.5)
    assert 0.5 <= ap <= 0.51  # precision 1 up to recall .5, 0 beyond
