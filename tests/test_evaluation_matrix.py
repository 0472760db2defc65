"""Evaluation metric edge matrix: matching, VOC, PCK, distance, detection,
mask and centroid modes.

Reference scenario sources: tests/test_evaluation.py in the reference
(multi-frame, multi-video pairing, unmatched FN/FP accounting, threshold
effects, metric value oracles).
"""

from __future__ import annotations

import numpy as np
import pytest

from sleap_nn_tpu.evaluation import (
    Evaluator,
    compute_instance_area,
    compute_oks,
    find_frame_pairs,
    load_metrics,
    match_instances,
    save_metrics_npz,
)
from sleap_nn_tpu.io import (
    Instance,
    LabeledFrame,
    Labels,
    PredictedInstance,
    Skeleton,
)
from sleap_nn_tpu.io.video import Video

SKEL = Skeleton(nodes=["a", "b", "c"])


def _gt(points):
    return Instance(points=np.asarray(points, float), skeleton=SKEL)


def _pr(points, score=1.0):
    return PredictedInstance(points=np.asarray(points, float), skeleton=SKEL,
                             point_scores=np.ones(3), score=score)


def tri(x, y, spread=10.0):
    return [[x, y], [x + spread, y], [x, y + spread]]


def paired_labels(frames_gt, frames_pr, video=None):
    """frames_*: dict frame_idx -> list of instances."""
    v = video or Video(filename="fake.mp4")
    gt = Labels([LabeledFrame(v, i, insts) for i, insts in frames_gt.items()])
    pr = Labels([LabeledFrame(v, i, insts) for i, insts in frames_pr.items()])
    pr.videos = gt.videos
    for lf in pr.labeled_frames:
        lf.video = gt.videos[0]
    return gt, pr


# ── frame pairing ────────────────────────────────────────────────────────────


def test_find_frame_pairs_skips_frames_without_user_instances():
    gt, pr = paired_labels(
        {0: [_gt(tri(10, 10))], 1: [_pr(tri(20, 20))]},  # frame 1 is pred-only
        {0: [_pr(tri(10, 10))], 1: [_pr(tri(20, 20))]},
    )
    pairs = find_frame_pairs(gt, pr, user_labels_only=True)
    assert len(pairs) == 1 and pairs[0][0].frame_idx == 0


def test_find_frame_pairs_user_labels_only_false_keeps_all():
    gt, pr = paired_labels(
        {0: [_gt(tri(10, 10))], 1: [_pr(tri(20, 20))]},
        {0: [_pr(tri(10, 10))], 1: [_pr(tri(20, 20))]},
    )
    pairs = find_frame_pairs(gt, pr, user_labels_only=False)
    assert len(pairs) == 2


def test_find_frame_pairs_unmatched_frames_dropped():
    gt, pr = paired_labels(
        {0: [_gt(tri(10, 10))], 5: [_gt(tri(10, 10))]},
        {0: [_pr(tri(10, 10))]},
    )
    pairs = find_frame_pairs(gt, pr)
    assert [p[0].frame_idx for p in pairs] == [0]


def test_find_frame_pairs_videos_paired_by_position():
    va, vb = Video(filename="a.mp4"), Video(filename="b.mp4")
    gt = Labels([
        LabeledFrame(va, 0, [_gt(tri(10, 10))]),
        LabeledFrame(vb, 0, [_gt(tri(50, 50))]),
    ])
    pr = Labels([
        LabeledFrame(gt.videos[0], 0, [_pr(tri(10, 10))]),
        LabeledFrame(gt.videos[1], 0, [_pr(tri(50, 50))]),
    ])
    pr.videos = gt.videos
    pairs = find_frame_pairs(gt, pr)
    assert len(pairs) == 2


# ── instance matching ────────────────────────────────────────────────────────


def test_match_instances_greedy_best_oks_first():
    gt, pr = paired_labels(
        {0: [_gt(tri(10, 10)), _gt(tri(100, 100))]},
        {0: [_pr(tri(100.5, 100.5), score=0.9), _pr(tri(10.2, 10.2), score=0.8)]},
    )
    pairs = find_frame_pairs(gt, pr)
    positives, fns = match_instances(pairs[0][0], pairs[0][1])
    assert len(positives) == 2 and not fns
    for gt_mi, pr_mi, oks in positives:
        d = np.nanmean(np.abs(gt_mi.instance.numpy() - pr_mi.instance.numpy()))
        assert d < 1.0  # matched to the nearby GT, not the far one
        assert oks > 0.3  # 0.5px offset at stddev 0.025


def test_match_instances_surplus_prediction_is_unmatched():
    gt, pr = paired_labels(
        {0: [_gt(tri(10, 10))]},
        {0: [_pr(tri(10, 10)), _pr(tri(200, 200), score=0.4)]},
    )
    ev = Evaluator(gt, pr)
    det = ev.detection_metrics()
    assert det["n_tp"] == 1
    assert det["n_fp"] == 1
    assert det["n_fn"] == 0


def test_match_instances_missed_gt_is_false_negative():
    gt, pr = paired_labels(
        {0: [_gt(tri(10, 10)), _gt(tri(120, 120))]},
        {0: [_pr(tri(10, 10))]},
    )
    det = Evaluator(gt, pr).detection_metrics()
    assert det["n_fn"] == 1
    assert np.isclose(det["recall"], 0.5)
    assert np.isclose(det["precision"], 1.0)


def test_match_threshold_rejects_weak_matches():
    gt, pr = paired_labels(
        {0: [_gt(tri(10, 10))]},
        {0: [_pr(tri(18, 18))]},  # far: tiny OKS
    )
    ev_loose = Evaluator(gt, pr, match_threshold=0)
    ev_tight = Evaluator(gt, pr, match_threshold=0.9)
    assert ev_loose.detection_metrics()["n_tp"] == 1
    tight = ev_tight.detection_metrics()
    assert tight["n_tp"] == 0
    assert tight["n_fn"] == 1 and tight["n_fp"] == 1


# ── metric value oracles ─────────────────────────────────────────────────────


def test_moks_perfect_prediction_is_one():
    gt, pr = paired_labels({0: [_gt(tri(10, 10))]}, {0: [_pr(tri(10, 10))]})
    m = Evaluator(gt, pr).mOKS()
    assert np.isclose(m["mOKS"], 1.0)


def test_distance_metrics_known_offsets():
    gt, pr = paired_labels(
        {0: [_gt(tri(10, 10))]},
        {0: [_pr((np.asarray(tri(10, 10)) + [3.0, 4.0]).tolist())]},
    )
    d = Evaluator(gt, pr).distance_metrics()
    assert np.isclose(d["avg"], 5.0)
    assert np.isclose(d["p50"], 5.0) and np.isclose(d["p95"], 5.0)


def test_distance_metrics_mixed_offsets_percentiles():
    pts = np.asarray(tri(10, 10))
    moved = pts.copy()
    moved[0] += [1.0, 0.0]   # dist 1
    moved[1] += [0.0, 2.0]   # dist 2
    moved[2] += [3.0, 0.0]   # dist 3
    gt, pr = paired_labels({0: [_gt(pts)]}, {0: [_pr(moved)]})
    d = Evaluator(gt, pr).distance_metrics()
    assert np.isclose(d["avg"], 2.0)
    assert np.isclose(d["p50"], 2.0)
    assert d["p90"] > d["p50"]


def test_pck_thresholds_monotone():
    pts = np.asarray(tri(10, 10))
    gt, pr = paired_labels({0: [_gt(pts)]}, {0: [_pr(pts + [4.0, 0.0])]})
    pck = Evaluator(gt, pr).pck_metrics()
    # offsets of 4 px: below every threshold < 4, above every threshold >= 5
    assert np.isclose(pck["PCK@5"], 1.0)
    assert np.isclose(pck["PCK@10"], 1.0)
    assert 0 < pck["mPCK"] < 1  # thresholds 1..3 fail, 5..10 pass


def test_visibility_metrics_counts():
    pts = np.asarray(tri(10, 10))
    pr_pts = pts.copy()
    pr_pts[2] = np.nan  # one visible GT node missed
    gt, pr = paired_labels({0: [_gt(pts)]}, {0: [_pr(pr_pts)]})
    vis = Evaluator(gt, pr).visibility_metrics()
    assert np.isclose(vis["recall"], 2.0 / 3.0)
    assert np.isclose(vis["precision"], 1.0)


def test_voc_map_perfect_is_one():
    gt, pr = paired_labels(
        {i: [_gt(tri(10 + i, 10))] for i in range(4)},
        {i: [_pr(tri(10 + i, 10))] for i in range(4)},
    )
    voc = Evaluator(gt, pr).voc_metrics(match_score_by="oks")
    assert np.isclose(voc["oks_voc.mAP"], 1.0, atol=1e-6)
    assert np.isclose(voc["oks_voc.mAR"], 1.0, atol=1e-6)


def test_unmatchable_prediction_counts_as_fp_not_in_voc():
    """A prediction with ~zero OKS to any GT is a false positive; VOC mAP
    ranks only matched detections (reference voc_metrics contract)."""
    gt, pr = paired_labels(
        {0: [_gt(tri(10, 10))]},
        {0: [_pr(tri(10, 10), score=0.9),
             _pr(tri(200, 200), score=0.95)]},
    )
    ev = Evaluator(gt, pr)
    det = ev.detection_metrics()
    assert det["n_tp"] == 1 and det["n_fp"] == 1
    voc = ev.voc_metrics(match_score_by="oks")
    assert np.isclose(voc["oks_voc.mAP"], 1.0, atol=1e-6)


def test_oks_scale_override_changes_similarity():
    pts = np.asarray(tri(10, 10))
    gt, pr = paired_labels({0: [_gt(pts)]}, {0: [_pr(pts + [2.0, 0.0])]})
    loose = Evaluator(gt, pr, oks_scale=10000.0).mOKS()["mOKS"]
    tight = Evaluator(gt, pr, oks_scale=10.0).mOKS()["mOKS"]
    assert loose > tight


def test_oks_stddev_override_changes_similarity():
    pts = np.asarray(tri(10, 10))
    gt, pr = paired_labels({0: [_gt(pts)]}, {0: [_pr(pts + [2.0, 0.0])]})
    fine = Evaluator(gt, pr, oks_stddev=0.01).mOKS()["mOKS"]
    coarse = Evaluator(gt, pr, oks_stddev=0.2).mOKS()["mOKS"]
    assert coarse > fine


# ── centroid mode ────────────────────────────────────────────────────────────


def test_centroid_mode_matches_by_distance():
    gt, pr = paired_labels(
        {0: [_gt(tri(10, 10)), _gt(tri(100, 100))]},
        {0: [_pr(tri(11, 11)), _pr(tri(99, 99))]},
    )
    ev = Evaluator(gt, pr, match_method="centroid")
    out = ev.evaluate()
    det = out["detection_metrics"]
    assert det["n_tp"] == 2
    assert np.isclose(det["precision"], 1.0) and np.isclose(det["recall"], 1.0)
    assert out["distance_metrics"]["avg"] < 2.0


def test_centroid_mode_distant_prediction_unmatched():
    gt, pr = paired_labels(
        {0: [_gt(tri(10, 10))]},
        {0: [_pr(tri(300, 300))]},
    )
    det = Evaluator(gt, pr, match_method="centroid").evaluate()["detection_metrics"]
    assert det["n_tp"] == 0
    assert det["n_fp"] == 1 and det["n_fn"] == 1


def test_centroid_mode_anchor_part():
    # anchor on node 'a': centroid = first keypoint, not the mean.
    pts_gt = tri(10, 10)
    pts_pr = (np.asarray(tri(10, 10)) + [[0, 0], [30, 30], [30, 30]]).tolist()
    gt, pr = paired_labels({0: [_gt(pts_gt)]}, {0: [_pr(pts_pr)]})
    det = Evaluator(gt, pr, match_method="centroid",
                    anchor_part="a").evaluate()["detection_metrics"]
    assert det["n_tp"] == 1  # anchors coincide exactly


# ── npz round trip ───────────────────────────────────────────────────────────


def test_metrics_npz_roundtrip_flattened_keys(tmp_path):
    gt, pr = paired_labels({0: [_gt(tri(10, 10))]}, {0: [_pr(tri(10, 10))]})
    metrics = Evaluator(gt, pr).evaluate()
    p = tmp_path / "m.npz"
    save_metrics_npz(metrics, p)
    loaded = load_metrics(p)
    assert np.isclose(float(loaded["mOKS.mOKS"]), 1.0)
    assert "voc_metrics.oks_voc.mAP" in loaded
    assert "distance_metrics.avg" in loaded
    assert "pck_metrics.mPCK" in loaded


# ── primitives ───────────────────────────────────────────────────────────────


def test_compute_instance_area_bbox_product():
    pts = np.array([[0.0, 0.0], [4.0, 0.0], [0.0, 3.0]])
    assert np.isclose(compute_instance_area(pts)[0], 12.0)


def test_compute_instance_area_ignores_nan():
    pts = np.array([[0.0, 0.0], [4.0, 0.0], [np.nan, np.nan], [0.0, 3.0]])
    assert np.isclose(compute_instance_area(pts)[0], 12.0)


def test_compute_oks_matrix_shape_and_permutation():
    g = np.stack([tri(0, 0), tri(100, 100)]).astype(float)
    p = np.stack([tri(100, 100), tri(0, 0)]).astype(float)
    oks = compute_oks(g, p)
    assert oks.shape == (2, 2)
    assert np.isclose(oks[0, 1], 1.0) and np.isclose(oks[1, 0], 1.0)
    assert oks[0, 0] < 0.01 and oks[1, 1] < 0.01


def test_compute_oks_noncocoeval_normalization():
    g = np.array([tri(0, 0)], float)
    p = g + [3.0, 0.0]
    area = compute_instance_area(g[0])[0]
    expect = np.exp(-9.0 / (0.025**2 * 2 * (area + np.spacing(1)) ** 2))
    got = compute_oks(g, p, use_cocoeval=False)
    np.testing.assert_allclose(got, [[expect]], rtol=1e-6)


def test_compute_oks_all_gt_missing_gives_nan():
    g = np.full((1, 3, 2), np.nan)
    p = np.array([tri(0, 0)], float)
    with np.errstate(invalid="ignore", divide="ignore"):
        oks = compute_oks(g, p)
    assert not np.isfinite(oks).any() or np.isnan(oks).all()
