"""Mask-mode evaluation scenario matrix.

Parity target: reference tests/test_segmentation_eval.py run_evaluation
mask scenarios — disjoint predictions, threshold sensitivity, FP-only
frames, partial recall, miss-penalized IoU, eroded AP ordering,
undersegmentation, no-GT emptiness — against
sleap_nn_tpu/evaluation.py Evaluator(match_method="mask").
"""

from __future__ import annotations

import numpy as np
import pytest

from sleap_nn_tpu.evaluation import Evaluator
from sleap_nn_tpu.io.model import LabeledFrame, Labels, SegmentationMask, Skeleton
from sleap_nn_tpu.io.video import Video

SKEL = Skeleton(nodes=["a"])
VID = Video(filename="fake.mp4")


def _mask(y0, y1, x0, x1, h=64, w=64):
    m = np.zeros((h, w), bool)
    m[y0:y1, x0:x1] = True
    return m


def _pair(gt_frame_masks, pr_frame_masks):
    """Per-frame mask lists -> (gt Labels, pr Labels)."""
    gt_lfs, pr_lfs = [], []
    for fi, (gms, pms) in enumerate(zip(gt_frame_masks, pr_frame_masks)):
        gt_lfs.append(LabeledFrame(video=VID, frame_idx=fi, instances=[],
                                   masks=[SegmentationMask(m) for m in gms]))
        pr_lfs.append(LabeledFrame(video=VID, frame_idx=fi, instances=[],
                                   masks=[SegmentationMask(m, score=s)
                                          for m, s in pms]))
    gt = Labels(gt_lfs, videos=[VID], skeletons=[SKEL])
    pr = Labels(pr_lfs, videos=[VID], skeletons=[SKEL])
    return gt, pr


def _ev(gt, pr, **kw):
    return Evaluator(gt, pr, match_method="mask", user_labels_only=False, **kw)


def test_perfect_prediction_pq_one():
    g = _mask(4, 20, 4, 20)
    gt, pr = _pair([[g]], [[(g, 0.9)]])
    m = _ev(gt, pr).mask_metrics()
    assert m["n_matched"] == 1 and m["n_fp"] == 0 and m["n_fn"] == 0
    assert m["pq"] == pytest.approx(1.0)
    assert m["mean_iou_all_gt"] == pytest.approx(1.0)


def test_disjoint_prediction_all_fp_fn():
    gt, pr = _pair([[_mask(4, 20, 4, 20)]], [[(_mask(40, 60, 40, 60), 0.9)]])
    m = _ev(gt, pr).mask_metrics()
    assert m["n_matched"] == 0 and m["n_fp"] == 1 and m["n_fn"] == 1
    assert m["pq"] == 0.0


def test_partial_overlap_respects_match_threshold():
    g = _mask(0, 16, 0, 16)
    p = _mask(0, 16, 8, 24)  # IoU = 8/24 = 1/3
    gt, pr = _pair([[g]], [[(p, 0.9)]])
    loose = Evaluator(
        Labels(gt.labeled_frames, videos=[VID], skeletons=[SKEL]), pr,
        match_method="mask", user_labels_only=False, match_threshold=0.2,
    ).mask_metrics()
    strict = Evaluator(
        gt, pr, match_method="mask", user_labels_only=False,
        match_threshold=0.5,
    ).mask_metrics()
    assert loose["n_matched"] == 1
    assert strict["n_matched"] == 0 and strict["n_fp"] == 1


def test_fp_only_frame_counts_fps():
    # Frame 0 has GT+match; frame 1 has predictions but NO GT.
    g = _mask(4, 20, 4, 20)
    gt, pr = _pair([[g], []], [[(g, 0.9)], [(_mask(2, 8, 2, 8), 0.7)]])
    m = _ev(gt, pr).mask_metrics()
    assert m["n_matched"] == 1
    assert m["n_fp"] == 1
    assert m["n_fn"] == 0


def test_partial_recall_two_gt_one_found():
    g1, g2 = _mask(4, 20, 4, 20), _mask(40, 60, 40, 60)
    gt, pr = _pair([[g1, g2]], [[(g1, 0.9)]])
    m = _ev(gt, pr).mask_metrics()
    assert m["n_matched"] == 1 and m["n_fn"] == 1
    assert m["rq"] == pytest.approx(2 / 3)  # tp / (tp + 0.5fp + 0.5fn)


def test_miss_penalized_mean_iou():
    # mean_iou_all_gt averages over ALL GT: a miss contributes 0.
    g1, g2 = _mask(4, 20, 4, 20), _mask(40, 60, 40, 60)
    gt, pr = _pair([[g1, g2]], [[(g1, 0.9)]])
    m = _ev(gt, pr).mask_metrics()
    assert m["mean_iou_all_gt"] == pytest.approx(0.5)


def test_voc_ap50_ge_ap75_on_eroded_prediction():
    g = _mask(8, 40, 8, 40)  # 32x32
    eroded = _mask(10, 38, 10, 38)  # 28x28 inside: IoU ~0.766
    gt, pr = _pair([[g]], [[(eroded, 0.9)]])
    v = _ev(gt, pr).mask_voc_metrics()
    assert v["mask_voc.AP50"] >= v["mask_voc.AP75"]
    assert v["mask_voc.AP50"] > 0.0
    assert v["mask_voc.AP75"] > 0.0  # 0.766 passes the 0.75 threshold
    # A heavier erosion fails AP75 but keeps AP50.
    tiny = _mask(14, 34, 14, 34)  # 20x20: IoU ~0.39 -> fails both
    gt2, pr2 = _pair([[g]], [[(tiny, 0.9)]])
    v2 = _ev(gt2, pr2).mask_voc_metrics()
    assert v2["mask_voc.AP50"] == 0.0


def test_voc_score_ranking_matters():
    # Correct mask with LOW score after a high-score FP drops precision.
    g = _mask(4, 20, 4, 20)
    fp = _mask(40, 60, 40, 60)
    gt_a, pr_a = _pair([[g]], [[(g, 0.9), (fp, 0.1)]])
    gt_b, pr_b = _pair([[g]], [[(g, 0.1), (fp, 0.9)]])
    ap_good = _ev(gt_a, pr_a).mask_voc_metrics()["mask_voc.AP50"]
    ap_bad = _ev(gt_b, pr_b).mask_voc_metrics()["mask_voc.AP50"]
    assert ap_good > ap_bad


def test_undersegmentation_two_gt_one_pred():
    g1 = _mask(10, 30, 10, 30)
    g2 = _mask(10, 30, 30, 50)
    merged = _mask(10, 30, 10, 50)
    gt, pr = _pair([[g1, g2]], [[(merged, 0.9)]])
    m = _ev(gt, pr).mask_metrics()
    assert m["undersegmentation"] == 1
    assert m["oversegmentation"] == 0


def test_no_gt_masks_yields_empty_or_zero_metrics():
    gt, pr = _pair([[]], [[(_mask(4, 20, 4, 20), 0.9)]])
    m = _ev(gt, pr).mask_metrics()
    assert m["n_matched"] == 0 and m["n_fn"] == 0 and m["n_fp"] == 1
    v = _ev(gt, pr).mask_voc_metrics()
    assert v["mask_voc.n_gt"] == 0


def test_predicted_instance_masks_not_counted_as_gt():
    # GT frames carrying PREDICTED masks only must not create GT entries
    # when user_labels_only=True semantics apply at the mask level.
    g = _mask(4, 20, 4, 20)
    gt, pr = _pair([[g]], [[(g, 0.9)]])
    m = _ev(gt, pr).mask_metrics()
    base_gt = m["n_matched"] + m["n_fn"]
    assert base_gt == 1
