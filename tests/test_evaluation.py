"""Evaluation metric tests."""

import numpy as np
import pytest

from sleap_nn_tpu.evaluation import (
    Evaluator,
    compute_instance_area,
    compute_oks,
    find_frame_pairs,
    match_instances,
    run_evaluation,
    save_metrics_npz,
    load_metrics,
)
from sleap_nn_tpu.io import (
    Instance,
    LabeledFrame,
    Labels,
    PredictedInstance,
    Skeleton,
    load_slp,
)


def test_compute_oks_perfect_and_known():
    gt = np.array([[[0.0, 0.0], [10.0, 10.0]]])
    oks = compute_oks(gt, gt.copy())
    np.testing.assert_allclose(oks, [[1.0]])

    # Known displacement: cocoeval normalization.
    pr = gt + np.array([3.0, 4.0])  # distance^2 = 25 per node
    area = 100.0  # bbox 10x10
    stddev = 0.025
    norm = (2 * stddev) ** 2 * 2 * (area + np.spacing(1))
    expected = np.exp(-25.0 / norm)
    oks = compute_oks(gt, pr)
    np.testing.assert_allclose(oks, [[expected]], rtol=1e-6)


def test_compute_oks_missing_points():
    gt = np.array([[[0.0, 0.0], [10.0, 10.0], [np.nan, np.nan]]])
    pr = np.array([[[0.0, 0.0], [10.0, 10.0], [5.0, 5.0]]])
    # Missing GT node is excluded; prediction there is ignored.
    np.testing.assert_allclose(compute_oks(gt, pr), [[1.0]])
    # Missing prediction counts as miss (ks=0 for that node).
    pr2 = np.array([[[0.0, 0.0], [np.nan, np.nan], [np.nan, np.nan]]])
    np.testing.assert_allclose(compute_oks(gt, pr2), [[0.5]])


def make_pair_labels(gt_pts, pr_pts, scores=None):
    skel = Skeleton(nodes=[f"n{i}" for i in range(gt_pts.shape[1])])
    gt_insts = [Instance(points=p, skeleton=skel) for p in gt_pts]
    pr_insts = [
        PredictedInstance(
            points=p,
            skeleton=skel,
            point_scores=np.ones(len(skel)),
            score=(scores[i] if scores is not None else 1.0),
        )
        for i, p in enumerate(pr_pts)
    ]
    from sleap_nn_tpu.io.video import Video

    v = Video(filename="fake.mp4")
    gt = Labels([LabeledFrame(v, 0, gt_insts)])
    pr = Labels([LabeledFrame(v, 0, pr_insts)])
    pr.videos = gt.videos
    pr.labeled_frames[0].video = gt.videos[0]
    return gt, pr


def test_evaluator_perfect_predictions():
    gt_pts = np.array(
        [[[0.0, 0.0], [20.0, 20.0]], [[100.0, 100.0], [130.0, 140.0]]]
    )
    gt, pr = make_pair_labels(gt_pts, gt_pts.copy())
    ev = Evaluator(gt, pr)
    m = ev.evaluate()
    assert m["mOKS"]["mOKS"] == pytest.approx(1.0)
    assert m["voc_metrics"]["oks_voc.mAP"] == pytest.approx(1.0)
    assert m["voc_metrics"]["oks_voc.mAR"] == pytest.approx(1.0)
    assert m["distance_metrics"]["avg"] == pytest.approx(0.0)
    assert m["pck_metrics"]["mPCK"] == pytest.approx(1.0)
    assert m["visibility_metrics"]["precision"] == pytest.approx(1.0)


def test_evaluator_false_negative_and_match():
    gt_pts = np.array(
        [[[0.0, 0.0], [20.0, 20.0]], [[100.0, 100.0], [130.0, 140.0]]]
    )
    pr_pts = gt_pts[:1] + 1.0  # only one instance predicted, 1px off
    gt, pr = make_pair_labels(gt_pts, pr_pts)
    ev = Evaluator(gt, pr)
    assert len(ev.positive_pairs) == 1
    assert len(ev.false_negatives) == 1
    m = ev.evaluate()
    assert m["distance_metrics"]["avg"] == pytest.approx(np.sqrt(2), rel=1e-5)
    # Recall capped at 0.5 because of the FN.
    assert m["voc_metrics"]["oks_voc.mAR"] <= 0.5 + 1e-6


def test_greedy_matching_prefers_higher_scores():
    gt_pts = np.array([[[0.0, 0.0], [10.0, 10.0]]])
    # Two predictions on the same GT; higher score should win the match.
    pr_pts = np.stack([gt_pts[0] + 0.5, gt_pts[0]])
    gt, pr = make_pair_labels(gt_pts, pr_pts, scores=[0.9, 0.1])
    ev = Evaluator(gt, pr)
    assert len(ev.positive_pairs) == 1
    assert len(ev.false_positives) == 1
    # The matched prediction is the 0.9-score (offset) one.
    matched_pr = ev.positive_pairs[0][1].instance
    assert matched_pr.score == pytest.approx(0.9)


def test_centroid_match_method():
    gt_pts = np.array([[[0.0, 0.0], [20.0, 20.0]]])
    pr_pts = np.array([[[11.0, 11.0]]])  # centroid-ish prediction, 1 node
    skel1 = Skeleton(nodes=["centroid"])
    from sleap_nn_tpu.io.video import Video

    v = Video(filename="fake.mp4")
    gt = Labels([LabeledFrame(v, 0, [Instance(points=p, skeleton=Skeleton(["a", "b"])) for p in gt_pts])])
    pr = Labels(
        [LabeledFrame(v, 0, [PredictedInstance(points=p, skeleton=skel1, score=1.0) for p in pr_pts])]
    )
    pr.videos = gt.videos
    pr.labeled_frames[0].video = gt.videos[0]
    ev = Evaluator(gt, pr, match_method="centroid", match_threshold=50.0)
    m = ev.evaluate()
    assert m["detection_metrics"]["n_tp"] == 1
    assert m["detection_metrics"]["avg"] == pytest.approx(np.sqrt(2), rel=1e-4)


def test_run_evaluation_roundtrip(tmp_path):
    gt_pts = np.array([[[0.0, 0.0], [20.0, 20.0]]])
    gt, pr = make_pair_labels(gt_pts, gt_pts + 0.5)
    mp = tmp_path / "metrics.npz"
    metrics = run_evaluation(gt, pr, save_metrics=str(mp))
    assert metrics["mOKS"]["mOKS"] == pytest.approx(np.exp(-0.25), rel=1e-3)
    loaded = load_metrics(mp)
    assert "mOKS.mOKS" in loaded
    assert float(loaded["mOKS.mOKS"]) == pytest.approx(metrics["mOKS"]["mOKS"])


def test_run_evaluation_empty_predictions():
    gt_pts = np.array([[[0.0, 0.0], [20.0, 20.0]]])
    gt, _ = make_pair_labels(gt_pts, gt_pts)
    empty = Labels([])
    assert run_evaluation(gt, empty) is None


def _mk_mask(h, w, y0, y1, x0, x1):
    m = np.zeros((h, w), dtype=bool)
    m[y0:y1, x0:x1] = True
    return m


def test_mask_pq_and_per_size_and_map():
    """PQ, fragmentation, per-size buckets, and COCO mask mAP on synthetic masks.

    One perfectly-matched GT, one missed GT (FN), one spurious pred (FP):
    sq = 1.0 (the one TP is exact), rq = 1/(1+0.5+0.5) = 0.5, pq = 0.5.
    """
    from sleap_nn_tpu.evaluation import Evaluator
    from sleap_nn_tpu.io.model import LabeledFrame, Labels, SegmentationMask, Skeleton
    from sleap_nn_tpu.io.video import Video

    skel = Skeleton(nodes=["a"])
    video = Video(filename="fake.mp4")

    gt_masks = [
        SegmentationMask(_mk_mask(64, 64, 4, 20, 4, 20)),     # matched
        SegmentationMask(_mk_mask(64, 64, 40, 60, 40, 60)),   # missed
    ]
    pr_masks = [
        SegmentationMask(_mk_mask(64, 64, 4, 20, 4, 20), score=0.9),   # TP
        SegmentationMask(_mk_mask(64, 64, 28, 34, 2, 8), score=0.3),   # FP
    ]
    lf_gt = LabeledFrame(video=video, frame_idx=0, instances=[], masks=gt_masks)
    lf_pr = LabeledFrame(video=video, frame_idx=0, instances=[], masks=pr_masks)
    gt = Labels(labeled_frames=[lf_gt], videos=[video], skeletons=[skel])
    pr = Labels(labeled_frames=[lf_pr], videos=[video], skeletons=[skel])

    ev = Evaluator(gt, pr, match_method="mask", user_labels_only=False)
    m = ev.mask_metrics()
    assert m["n_matched"] == 1 and m["n_fp"] == 1 and m["n_fn"] == 1
    np.testing.assert_allclose(m["sq"], 1.0)
    np.testing.assert_allclose(m["rq"], 0.5)
    np.testing.assert_allclose(m["pq"], 0.5)
    np.testing.assert_allclose(m["mean_iou_all_gt"], 0.5)
    assert m["oversegmentation"] == 0 and m["undersegmentation"] == 0
    ps = m["per_size"]
    assert ps["scheme"] == "percentile"
    total = sum(ps[k]["n_gt"] for k in ("small", "medium", "large"))
    assert total == 2
    coco_total = sum(ps["coco"][k]["n_gt"] for k in ("small", "medium", "large"))
    assert coco_total == 2

    v = ev.mask_voc_metrics()
    assert v["mask_voc.n_gt"] == 2
    # The TP is exact (IoU 1.0): at every threshold precision at rank 1 is 1,
    # recall tops out at 0.5 -> AP 51/101 x ... compute the oracle directly:
    # interpolated precision is 1.0 up to recall 0.5 (51 of 101 points).
    np.testing.assert_allclose(v["mask_voc.AP50"], 51 / 101, atol=1e-6)
    np.testing.assert_allclose(v["mask_voc.mAP"], 51 / 101, atol=1e-6)
    np.testing.assert_allclose(v["mask_voc.AR"], 0.5, atol=1e-6)


def test_mask_fragmentation_counts():
    """A GT split across two predictions counts as oversegmentation."""
    from sleap_nn_tpu.evaluation import Evaluator
    from sleap_nn_tpu.io.model import LabeledFrame, Labels, SegmentationMask, Skeleton
    from sleap_nn_tpu.io.video import Video

    skel = Skeleton(nodes=["a"])
    video = Video(filename="fake.mp4")
    gt_masks = [SegmentationMask(_mk_mask(64, 64, 10, 30, 10, 50))]
    pr_masks = [
        SegmentationMask(_mk_mask(64, 64, 10, 30, 10, 30), score=0.8),
        SegmentationMask(_mk_mask(64, 64, 10, 30, 30, 50), score=0.7),
    ]
    lf_gt = LabeledFrame(video=video, frame_idx=0, instances=[], masks=gt_masks)
    lf_pr = LabeledFrame(video=video, frame_idx=0, instances=[], masks=pr_masks)
    gt = Labels(labeled_frames=[lf_gt], videos=[video], skeletons=[skel])
    pr = Labels(labeled_frames=[lf_pr], videos=[video], skeletons=[skel])
    ev = Evaluator(gt, pr, match_method="mask", user_labels_only=False)
    m = ev.mask_metrics()
    assert m["oversegmentation"] == 1
    assert m["undersegmentation"] == 0
