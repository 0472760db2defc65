"""Postprocessing edge-case matrix: bbox/IoU/OKS primitives + NMS + pipeline.

Parity target: reference tests/inference/test_postprocessing.py —
TestComputeIOU / TestComputeOKS / TestNMSGreedy* / TestInstanceBbox /
filter-pipeline edge scenarios, re-expressed against this repo's
sleap_nn_tpu/inference/filters.py and tracking/utils.py primitives.
"""

from __future__ import annotations

import warnings

import numpy as np
import pytest

from sleap_nn_tpu.evaluation import compute_oks
from sleap_nn_tpu.inference.filters import (
    FilterConfig,
    FilterPipeline,
    suppress_overlapping,
)
from sleap_nn_tpu.io import PredictedInstance, Skeleton
from sleap_nn_tpu.tracking.utils import compute_iou, get_bbox

SKEL = Skeleton(nodes=["a", "b", "c"])


def _inst(pts, score=1.0, point_scores=None):
    pts = np.asarray(pts, float)
    if point_scores is None:
        point_scores = np.ones(len(pts))
    return PredictedInstance(points=pts, skeleton=Skeleton(
        nodes=[f"n{i}" for i in range(len(pts))]),
        point_scores=np.asarray(point_scores, float), score=score)


# ------------------------------------------------------------- compute_iou


def test_iou_identical_boxes():
    b = np.array([0.0, 0.0, 10.0, 10.0])
    assert compute_iou(b, b) == pytest.approx(1.0)


def test_iou_disjoint_boxes():
    assert compute_iou(np.array([0.0, 0.0, 5.0, 5.0]),
                       np.array([10.0, 10.0, 20.0, 20.0])) == 0.0


def test_iou_partial_overlap():
    # [0,0,10,10] vs [5,0,15,10]: inter 50, union 150.
    got = compute_iou(np.array([0.0, 0.0, 10.0, 10.0]),
                      np.array([5.0, 0.0, 15.0, 10.0]))
    assert got == pytest.approx(50.0 / 150.0)


def test_iou_zero_area_box_is_zero_not_nan():
    got = compute_iou(np.array([5.0, 5.0, 5.0, 5.0]),
                      np.array([5.0, 5.0, 5.0, 5.0]))
    assert got == 0.0


def test_iou_touching_edges_is_zero():
    assert compute_iou(np.array([0.0, 0.0, 5.0, 5.0]),
                       np.array([5.0, 0.0, 10.0, 5.0])) == 0.0


# ---------------------------------------------------------------- get_bbox


def test_bbox_valid_keypoints():
    b = get_bbox(_inst([[1.0, 2.0], [5.0, 7.0], [3.0, 4.0]]))
    np.testing.assert_allclose(b, [1.0, 2.0, 5.0, 7.0])


def test_bbox_ignores_nan_keypoints():
    b = get_bbox(_inst([[1.0, 2.0], [np.nan, np.nan], [5.0, 7.0]]))
    np.testing.assert_allclose(b, [1.0, 2.0, 5.0, 7.0])


def test_bbox_all_nan_is_nan():
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        b = get_bbox(_inst([[np.nan, np.nan], [np.nan, np.nan]]))
    assert np.all(np.isnan(b))


# ------------------------------------------------------------- compute_oks


def test_oks_identical_points_is_one():
    pts = np.array([[0.0, 0.0], [10.0, 0.0], [0.0, 10.0]])
    assert compute_oks(pts, pts)[0, 0] == pytest.approx(1.0)


def test_oks_distant_points_near_zero():
    gt = np.array([[0.0, 0.0], [10.0, 0.0], [0.0, 10.0]])
    pr = gt + 1000.0
    assert compute_oks(gt, pr)[0, 0] == pytest.approx(0.0, abs=1e-6)


def test_oks_nan_gt_node_excluded_from_mean():
    gt = np.array([[0.0, 0.0], [10.0, 0.0], [np.nan, np.nan]])
    pr = np.array([[0.0, 0.0], [10.0, 0.0], [500.0, 500.0]])
    # The nan GT node contributes neither a miss nor a hit.
    assert compute_oks(gt, pr)[0, 0] == pytest.approx(1.0)


def test_oks_nan_pr_node_scores_zero_for_that_node():
    gt = np.array([[0.0, 0.0], [10.0, 0.0]])
    pr = np.array([[0.0, 0.0], [np.nan, np.nan]])
    assert compute_oks(gt, pr)[0, 0] == pytest.approx(0.5)


def test_oks_matrix_shape_multi_instances():
    gt = np.stack([np.zeros((3, 2)), np.ones((3, 2))])
    pr = np.stack([np.zeros((3, 2)), np.ones((3, 2)), 2 * np.ones((3, 2))])
    assert compute_oks(gt, pr).shape == (2, 3)


def test_oks_explicit_scale_overrides_area():
    gt = np.array([[0.0, 0.0], [3.0, 0.0]])
    pr = np.array([[1.0, 0.0], [4.0, 0.0]])
    loose = compute_oks(gt, pr, scale=1e5)[0, 0]
    tight = compute_oks(gt, pr, scale=0.1)[0, 0]
    assert loose > 0.99
    assert tight < 0.1


# --------------------------------------------------- suppress_overlapping


def test_nms_empty_input():
    assert suppress_overlapping([], "iou", 0.5) == []


def test_nms_single_instance_kept():
    i = _inst([[0.0, 0.0], [10.0, 10.0]])
    assert suppress_overlapping([i], "iou", 0.5) == [i]


def test_nms_disjoint_keeps_all():
    a = _inst([[0.0, 0.0], [10.0, 10.0]])
    b = _inst([[100.0, 100.0], [110.0, 110.0]])
    assert len(suppress_overlapping([a, b], "iou", 0.5)) == 2


def test_nms_overlapping_removes_lower_score():
    hi = _inst([[0.0, 0.0], [10.0, 10.0]], score=0.9)
    lo = _inst([[1.0, 1.0], [11.0, 11.0]], score=0.4)
    kept = suppress_overlapping([lo, hi], "iou", 0.5)
    assert kept == [hi]


def test_nms_threshold_is_strict_greater():
    # IoU exactly == threshold must KEEP both (sim > threshold suppresses).
    a = _inst([[0.0, 0.0], [10.0, 10.0]], score=0.9)
    b = _inst([[5.0, 0.0], [15.0, 10.0]], score=0.5)
    iou = compute_iou(get_bbox(a), get_bbox(b))
    kept = suppress_overlapping([a, b], "iou", iou)
    assert len(kept) == 2
    kept = suppress_overlapping([a, b], "iou", iou - 1e-9)
    assert len(kept) == 1


def test_nms_order_is_by_score_not_input_order():
    # Three chained boxes: mid overlaps both ends; ends disjoint. The
    # highest-score mid is kept and suppresses both ends.
    left = _inst([[0.0, 0.0], [10.0, 10.0]], score=0.5)
    mid = _inst([[6.0, 0.0], [16.0, 10.0]], score=0.9)
    right = _inst([[12.0, 0.0], [22.0, 10.0]], score=0.4)
    kept = suppress_overlapping([left, right, mid], "iou", 0.2)
    assert kept == [mid]


def test_nms_oks_identical_instances_removes_lower_score():
    pts = np.array([[0.0, 0.0], [10.0, 0.0], [0.0, 10.0]])
    hi = _inst(pts, score=0.9)
    lo = _inst(pts.copy(), score=0.2)
    kept = suppress_overlapping([lo, hi], "oks", 0.8)
    assert kept == [hi]


def test_nms_oks_distant_instances_keeps_all():
    a = _inst(np.array([[0.0, 0.0], [10.0, 0.0], [0.0, 10.0]]))
    b = _inst(np.array([[500.0, 500.0], [510.0, 500.0], [500.0, 510.0]]))
    assert len(suppress_overlapping([a, b], "oks", 0.5)) == 2


def test_nms_invalid_method_raises():
    a = _inst([[0.0, 0.0], [10.0, 10.0]])
    b = _inst([[1.0, 1.0], [11.0, 11.0]])
    with pytest.raises(ValueError, match="Invalid overlap method"):
        suppress_overlapping([a, b], "euclidean", 0.5)


def test_pipeline_invalid_overlap_method_raises():
    a = _inst([[0.0, 0.0], [10.0, 10.0]])
    b = _inst([[1.0, 1.0], [11.0, 11.0]])
    pipe = FilterPipeline(FilterConfig(overlap_method="bogus"))
    with pytest.raises(ValueError, match="Invalid overlap method"):
        pipe.apply([a, b])


# ---------------------------------------------------------- FilterPipeline


def test_pipeline_empty_instances_unchanged():
    assert FilterPipeline(FilterConfig(min_instance_score=0.5)).apply([]) == []


def test_pipeline_disabled_config_passthrough():
    insts = [_inst([[0.0, 0.0], [1.0, 1.0]], score=0.01)]
    cfg = FilterConfig()
    assert not cfg.enabled()
    assert FilterPipeline(cfg).apply(insts) == insts


def test_pipeline_min_mean_node_score_all_nan_scores_drops():
    i = _inst([[0.0, 0.0], [1.0, 1.0]],
              point_scores=[np.nan, np.nan])
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        out = FilterPipeline(
            FilterConfig(min_mean_node_score=0.1)
        ).apply([i])
    assert out == []


def test_pipeline_nan_point_scores_do_not_crash_confidence_filter():
    i = _inst([[0.0, 0.0], [1.0, 1.0]], point_scores=[np.nan, 0.9])
    out = FilterPipeline(FilterConfig(min_node_confidence=0.5)).apply([i])
    # nan < 0.5 is False -> the nan-score node survives the comparison.
    assert len(out) == 1


def test_pipeline_combined_criteria_apply_in_sequence():
    # Confidence filter NaNs node 0 (score .2), then node-count drops it.
    i = _inst([[0.0, 0.0], [1.0, 1.0], [2.0, 2.0]],
              point_scores=[0.2, 0.9, 0.9])
    out = FilterPipeline(
        FilterConfig(min_node_confidence=0.5, min_node_count=3)
    ).apply([i])
    assert out == []
    j = _inst([[0.0, 0.0], [1.0, 1.0], [2.0, 2.0]],
              point_scores=[0.8, 0.9, 0.9])
    out = FilterPipeline(
        FilterConfig(min_node_confidence=0.5, min_node_count=3)
    ).apply([j])
    assert len(out) == 1


def test_pipeline_max_centroid_distance_keeps_higher_score():
    hi = _inst([[0.0, 0.0], [2.0, 2.0]], score=0.9)
    lo = _inst([[0.5, 0.5], [2.5, 2.5]], score=0.3)
    far = _inst([[100.0, 100.0], [102.0, 102.0]], score=0.5)
    out = FilterPipeline(
        FilterConfig(max_centroid_distance=5.0)
    ).apply([lo, hi, far])
    assert hi in out and far in out and lo not in out
