"""Evaluation edge cases: degenerate inputs, matching thresholds, metric
key-schema checks (reference sleap_nn/evaluation.py test coverage model).
"""

import numpy as np
import pytest

from sleap_nn_tpu.evaluation import (
    Evaluator,
    boundary_iou,
    compute_gt_centroids,
    compute_instance_area,
    compute_oks,
    find_frame_pairs,
    mask_cldice,
    mask_iou,
    match_centroids,
    match_instances,
    match_masks,
)
from sleap_nn_tpu.io import LabeledFrame, Labels, PredictedInstance, Instance, Skeleton

SKEL = Skeleton(nodes=["a", "b", "c"])


def _user(xy, off=((0, 0), (40, 0), (0, 40))):
    pts = np.asarray(xy, float) + np.asarray(off, float)
    return Instance(points=pts, skeleton=SKEL)


def _pred(xy, score=0.9, off=((0, 0), (40, 0), (0, 40))):
    pts = np.asarray(xy, float) + np.asarray(off, float)
    return PredictedInstance(points=pts, skeleton=SKEL,
                             point_scores=np.full(3, score), score=score)


def test_compute_instance_area_nan_rows():
    pts = np.array([[0, 0], [10, 0], [np.nan, np.nan]])
    area = compute_instance_area(pts[None])
    # Bbox of visible points only: 10 x ~0 -> area from the visible spread.
    assert np.isfinite(area).all()


def test_oks_all_nan_prediction_is_zero_or_nan_free():
    gt = np.array([[[0, 0], [4, 0], [0, 4]]], float)
    pr = np.full((1, 3, 2), np.nan)
    oks = compute_oks(gt, pr)
    assert not np.isnan(oks).any() or float(np.nan_to_num(oks)) == 0.0


def test_oks_scale_override_changes_score():
    gt = np.array([[[0, 0], [4, 0], [0, 4]]], float)  # small object
    pr = gt + 1.0
    small = float(compute_oks(gt, pr, scale=4.0)[0, 0])
    large = float(compute_oks(gt, pr, scale=400.0)[0, 0])
    assert large > small  # larger object scale forgives the same error


def test_find_frame_pairs_user_only_filter():
    lf_user = LabeledFrame(video=None, frame_idx=0,
                           instances=[_user([10, 10]), _pred([10, 10])])
    lf_pred_only = LabeledFrame(video=None, frame_idx=1,
                                instances=[_pred([20, 20])])
    gt = Labels([lf_user, lf_pred_only])
    pr = Labels([
        LabeledFrame(video=None, frame_idx=0, instances=[_pred([10, 10])]),
        LabeledFrame(video=None, frame_idx=1, instances=[_pred([20, 20])]),
    ])
    pairs = find_frame_pairs(gt, pr, user_labels_only=True)
    assert len(pairs) == 1  # frame 1 has no user instances
    pairs_all = find_frame_pairs(gt, pr, user_labels_only=False)
    assert len(pairs_all) == 2


def test_match_instances_threshold_gates_matches():
    lf_gt = LabeledFrame(video=None, frame_idx=0, instances=[_user([10, 10])])
    lf_pr = LabeledFrame(video=None, frame_idx=0, instances=[_pred([14, 14])])
    pos, fn = match_instances(lf_gt, lf_pr, threshold=0.0)
    assert len(pos) == 1 and len(fn) == 0
    # An impossible threshold turns it into a false negative.
    pos2, fn2 = match_instances(lf_gt, lf_pr, threshold=0.999999)
    assert len(pos2) == 0 and len(fn2) == 1


def test_evaluator_metrics_key_schema():
    """The metrics dict carries the reference's key families."""
    gt = Labels([LabeledFrame(video=None, frame_idx=i,
                              instances=[_user([10 + i, 10])]) for i in range(3)])
    pr = Labels([LabeledFrame(video=None, frame_idx=i,
                              instances=[_pred([10 + i, 10.5])]) for i in range(3)])
    ev = Evaluator(gt, pr)
    m = ev.evaluate()
    assert {"mOKS", "voc_metrics", "distance_metrics", "pck_metrics",
            "visibility_metrics"} <= set(m)
    assert "oks_voc.mAP" in m["voc_metrics"]
    assert "oks_voc.mAR" in m["voc_metrics"]
    assert {"avg", "p50", "p75", "p90", "p95", "p99"} <= set(m["distance_metrics"])
    assert m["mOKS"]["mOKS"] > 0.5
    vis = m["visibility_metrics"]
    assert vis["precision"] == pytest.approx(1.0)
    assert vis["recall"] == pytest.approx(1.0)


def test_evaluator_distance_values():
    gt = Labels([LabeledFrame(video=None, frame_idx=0, instances=[_user([10, 10])])])
    pr = Labels([LabeledFrame(video=None, frame_idx=0,
                              instances=[_pred([13, 14])])])  # exact (3, 4) offset
    m = Evaluator(gt, pr).evaluate()
    assert m["distance_metrics"]["avg"] == pytest.approx(5.0, abs=1e-6)


def test_centroid_matching_and_gt_centroids():
    lf = LabeledFrame(video=None, frame_idx=0,
                      instances=[_user([10, 10]), _user([50, 50])])
    labels = Labels([lf])
    cents = compute_gt_centroids(labels)  # {(video_id, frame_idx): (n, 2)}
    arr = next(iter(cents.values()))
    assert arr.shape == (2, 2)

    # anchor_part pins the centroid to node 'a' instead of the visible mean.
    cents_a = compute_gt_centroids(labels, anchor_part="a")
    arr_a = next(iter(cents_a.values()))
    assert not np.allclose(arr, arr_a)
    np.testing.assert_allclose(arr_a[0], [10, 10])

    pairs, fn, fp = match_centroids(
        np.array([[10.0, 10.0], [50.0, 50.0]]),
        np.array([[11.0, 10.0], [49.0, 50.0]]),
        threshold=5.0,
    )
    assert len(pairs) == 2 and not fn and not fp
    # Over-threshold predictions become FPs, the GT an FN.
    pairs2, fn2, fp2 = match_centroids(
        np.array([[10.0, 10.0]]), np.array([[100.0, 100.0]]), threshold=5.0
    )
    assert not pairs2 and fn2 == [0] and fp2 == [0]


def test_mask_iou_and_boundary_iou_degenerate():
    a = np.zeros((20, 20), bool)
    b = np.zeros((20, 20), bool)
    assert mask_iou(a, b) == 0.0  # both-empty: no union, IoU 0 by convention
    a[5:10, 5:10] = True
    assert mask_iou(a, b) == 0.0
    assert mask_iou(a, a) == 1.0
    assert boundary_iou(a, a) == pytest.approx(1.0)
    # clDice of identical masks is 1.
    assert mask_cldice(a, a) == pytest.approx(1.0)


def test_match_masks_hungarian_prefers_best_iou():
    def disk(cx, cy, r=4):
        yy, xx = np.mgrid[:32, :32]
        return (xx - cx) ** 2 + (yy - cy) ** 2 <= r * r

    gt = [disk(8, 8), disk(24, 24)]
    pr = [disk(23, 24), disk(9, 8)]  # swapped order, slight offsets
    pairs, fn, fp = match_masks(gt, pr, iou_threshold=0.3)
    got = {(g, p) for g, p, _ in pairs}
    assert got == {(0, 1), (1, 0)}
    assert not fn and not fp
    # Raising the threshold to 1.0 kills the imperfect matches.
    pairs2, fn2, fp2 = match_masks(gt, pr, iou_threshold=1.0)
    assert not pairs2 and fn2 == [0, 1] and fp2 == [0, 1]


def test_run_evaluation_semantic_mode(tmp_path):
    from sleap_nn_tpu.evaluation import run_evaluation
    from sleap_nn_tpu.io import SegmentationMask

    def frame(fill, fi=0):
        lf = LabeledFrame(video=None, frame_idx=fi, instances=[])
        m = np.zeros((32, 32), bool)
        m[8:24, 8:24] = fill
        lf.masks = [SegmentationMask(m, score=1.0)]
        return lf

    gt = Labels([frame(True)])
    pr = Labels([frame(True)])
    gt_p, pr_p = tmp_path / "gt.slp", tmp_path / "pr.slp"
    gt.save(str(gt_p))
    pr.save(str(pr_p))
    m = run_evaluation(str(gt_p), str(pr_p), match_method="semantic",
                       user_labels_only=False)
    flat = str(m)
    assert "iou" in flat.lower()


def test_metrics_npz_roundtrip(tmp_path):
    from sleap_nn_tpu.evaluation import load_metrics, save_metrics_npz

    metrics = {"mOKS": {"mOKS": 0.9}, "distance_metrics": {"avg": 1.5}}
    p = tmp_path / "m.npz"
    save_metrics_npz(metrics, p)
    back = load_metrics(p)
    flat = str(back)
    assert "0.9" in flat and "1.5" in flat
