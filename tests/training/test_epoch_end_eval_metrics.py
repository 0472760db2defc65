"""Scenario matrix for EpochEndEvaluationCallback._evaluate metric math.

Parity target: the reference epoch-end evaluation callback suites
(reference tests/training/test_callbacks.py — TestEpochEndEvaluationCallback
build_pred_labels / log_metrics scenarios and TestCentroidEvaluationCallback
compute_metrics FP/FN/offset/NaN scenarios), re-expressed against this
repo's single unified callback (sleap_nn_tpu/training/callbacks.py:203).
Each test fabricates a trainer whose model emits canned confmaps so the
expected metric values are known in closed form.
"""

from __future__ import annotations

import numpy as np
import pytest

import sleap_nn_tpu.data.pipeline as pipeline_mod
from sleap_nn_tpu.training.callbacks import EpochEndEvaluationCallback


class _Head:
    def __init__(self, name, output_stride=1):
        self.name = name
        self.output_stride = output_stride


class _Model:
    """Fake flax-like model: ignores the image, returns canned outputs."""

    def __init__(self, heads, outputs):
        self.heads = heads
        self._outputs = outputs

    def apply(self, params, image):
        return self._outputs


class _Trainer:
    def __init__(self, model_type, model, batches):
        self.ctx = None
        self.model_type = model_type
        self.model = model
        self.params = None
        self.val_loader = batches


@pytest.fixture(autouse=True)
def _passthrough_render(monkeypatch):
    """make_render_fn -> identity: the batch IS the processed sample."""
    monkeypatch.setattr(
        pipeline_mod, "make_render_fn", lambda ctx, train: (lambda b: b)
    )


def _onehot_cms(shape, peaks):
    """Confmaps (B, H, W, C) with 1.0 at each (b, y, x, c) peak."""
    cms = np.zeros(shape, np.float32)
    for b, y, x, c in peaks:
        cms[b, y, x, c] = 1.0
    return cms


def _cb(trainer, **kw):
    return EpochEndEvaluationCallback(trainer, **kw)


# ---------------------------------------------------------------- confmaps


def test_single_instance_perfect_peaks_give_moks_one_dist_zero():
    gt = np.array([[[4.0, 3.0], [10.0, 7.0]]], np.float32)  # (B=1, N=2, 2)
    cms = _onehot_cms((1, 16, 16, 2), [(0, 3, 4, 0), (0, 7, 10, 1)])
    model = _Model([_Head("ConfmapsHead", 1)], {"ConfmapsHead": cms})
    tr = _Trainer(
        "single_instance",
        model,
        [{"image": np.zeros((1, 4, 4, 1), np.float32), "instances": gt,
          "batch_mask": np.array([True])}],
    )
    out = _cb(tr)._evaluate(tr)
    assert out["val/mOKS"] == pytest.approx(1.0, abs=1e-6)
    assert out["val/dist.avg"] == pytest.approx(0.0, abs=1e-3)


def test_single_instance_offset_peaks_reported_in_dist_avg():
    gt = np.array([[[4.0, 3.0], [10.0, 7.0]]], np.float32)
    # Both peaks shifted +2 in x -> mean pixel error 2.
    cms = _onehot_cms((1, 16, 16, 2), [(0, 3, 6, 0), (0, 7, 12, 1)])
    model = _Model([_Head("ConfmapsHead", 1)], {"ConfmapsHead": cms})
    tr = _Trainer(
        "single_instance",
        model,
        [{"image": np.zeros((1, 4, 4, 1), np.float32), "instances": gt,
          "batch_mask": np.array([True])}],
    )
    out = _cb(tr)._evaluate(tr)
    assert out["val/dist.avg"] == pytest.approx(2.0, abs=1e-3)
    assert out["val/mOKS"] < 1.0


def test_output_stride_scales_peak_coordinates_to_image_space():
    # Peak at grid (x=5, y=2) with stride 2 -> image point (10, 4).
    gt = np.array([[[10.0, 4.0]]], np.float32)
    cms = _onehot_cms((1, 8, 8, 1), [(0, 2, 5, 0)])
    model = _Model([_Head("ConfmapsHead", 2)], {"ConfmapsHead": cms})
    tr = _Trainer(
        "single_instance",
        model,
        [{"image": np.zeros((1, 4, 4, 1), np.float32), "instances": gt,
          "batch_mask": np.array([True])}],
    )
    out = _cb(tr)._evaluate(tr)
    assert out["val/dist.avg"] == pytest.approx(0.0, abs=1e-3)


def test_batch_mask_excludes_padded_rows_from_metrics():
    gt = np.stack(
        [np.array([[4.0, 3.0]], np.float32),
         np.array([[0.0, 0.0]], np.float32)]  # padded row: way off
    )
    cms = _onehot_cms((2, 16, 16, 1), [(0, 3, 4, 0), (1, 9, 9, 0)])
    model = _Model([_Head("ConfmapsHead", 1)], {"ConfmapsHead": cms})
    tr = _Trainer(
        "single_instance",
        model,
        [{"image": np.zeros((2, 4, 4, 1), np.float32), "instances": gt,
          "batch_mask": np.array([True, False])}],
    )
    out = _cb(tr)._evaluate(tr)
    # Only the real row contributes: perfect match.
    assert out["val/dist.avg"] == pytest.approx(0.0, abs=1e-3)
    assert out["val/mOKS"] == pytest.approx(1.0, abs=1e-6)


def test_multi_instance_gt_picks_best_instance_by_oks():
    # 4D GT (B, I, N, 2): prediction sits exactly on instance 1.
    gt = np.array(
        [[[[1.0, 1.0], [2.0, 1.0]],
          [[8.0, 9.0], [12.0, 9.0]]]], np.float32
    )
    cms = _onehot_cms((1, 16, 16, 2), [(0, 9, 8, 0), (0, 9, 12, 1)])
    model = _Model([_Head("ConfmapsHead", 1)], {"ConfmapsHead": cms})
    tr = _Trainer(
        "centered_instance",
        model,
        [{"image": np.zeros((1, 4, 4, 1), np.float32), "instances": gt,
          "batch_mask": np.array([True])}],
    )
    out = _cb(tr)._evaluate(tr)
    assert out["val/mOKS"] == pytest.approx(1.0, abs=1e-6)
    assert out["val/dist.avg"] == pytest.approx(0.0, abs=1e-3)


def test_multi_instance_all_nan_rows_are_skipped():
    gt = np.full((1, 2, 2, 2), np.nan, np.float32)
    cms = _onehot_cms((1, 16, 16, 2), [(0, 9, 8, 0), (0, 9, 12, 1)])
    model = _Model([_Head("ConfmapsHead", 1)], {"ConfmapsHead": cms})
    tr = _Trainer(
        "centered_instance",
        model,
        [{"image": np.zeros((1, 4, 4, 1), np.float32), "instances": gt,
          "batch_mask": np.array([True])}],
    )
    out = _cb(tr)._evaluate(tr)
    assert "val/mOKS" not in out and "val/dist.avg" not in out


def test_nan_gt_nodes_excluded_from_dist_avg():
    # Node 1 is invisible (NaN): dist.avg must only average node 0.
    gt = np.array([[[4.0, 3.0], [np.nan, np.nan]]], np.float32)
    cms = _onehot_cms((1, 16, 16, 2), [(0, 3, 4, 0), (0, 9, 9, 1)])
    model = _Model([_Head("ConfmapsHead", 1)], {"ConfmapsHead": cms})
    tr = _Trainer(
        "single_instance",
        model,
        [{"image": np.zeros((1, 4, 4, 1), np.float32), "instances": gt,
          "batch_mask": np.array([True])}],
    )
    out = _cb(tr)._evaluate(tr)
    assert out["val/dist.avg"] == pytest.approx(0.0, abs=1e-3)


def test_no_confmap_head_returns_empty():
    model = _Model([_Head("PartAffinityFieldsHead", 1)], {})
    tr = _Trainer("bottomup", model, [])
    assert _cb(tr)._evaluate(tr) == {}


def test_unknown_model_type_returns_empty():
    cms = _onehot_cms((1, 8, 8, 1), [(0, 2, 2, 0)])
    model = _Model([_Head("ConfmapsHead", 1)], {"ConfmapsHead": cms})
    tr = _Trainer(
        "bottomup",
        model,
        [{"image": np.zeros((1, 4, 4, 1), np.float32),
          "instances": np.zeros((1, 1, 2), np.float32),
          "batch_mask": np.array([True])}],
    )
    assert _cb(tr)._evaluate(tr) == {}


# ---------------------------------------------------------------- centroid


def _centroid_trainer(gt_centroids, peak_coords, batch_mask=None, hw=32):
    b = gt_centroids.shape[0]
    cms = _onehot_cms((b, hw, hw, 1), [(i, y, x, 0) for i, y, x in peak_coords])
    model = _Model([_Head("CentroidConfmapsHead", 1)],
                   {"CentroidConfmapsHead": cms})
    if batch_mask is None:
        batch_mask = np.ones(b, bool)
    return _Trainer(
        "centroid",
        model,
        [{"image": np.zeros((b, 4, 4, 1), np.float32),
          "centroids": gt_centroids, "batch_mask": batch_mask}],
    )


def test_centroid_perfect_detection_f1_one():
    gt = np.array([[[4.0, 3.0], [20.0, 25.0]]], np.float32)  # (B, M, 2)
    tr = _centroid_trainer(gt, [(0, 3, 4), (0, 25, 20)])
    out = _cb(tr, match_threshold=5.0)._evaluate(tr)
    assert out["val/detection.f1"] == pytest.approx(1.0)
    assert out["val/dist.avg"] == pytest.approx(0.0, abs=1e-3)


def test_centroid_false_positive_lowers_precision():
    gt = np.array([[[4.0, 3.0], [np.nan, np.nan]]], np.float32)
    # Two peaks but one GT: precision 1/2, recall 1 -> f1 = 2/3.
    tr = _centroid_trainer(gt, [(0, 3, 4), (0, 25, 20)])
    out = _cb(tr, match_threshold=5.0)._evaluate(tr)
    assert out["val/detection.f1"] == pytest.approx(2.0 / 3.0)


def test_centroid_false_negative_lowers_recall():
    gt = np.array([[[4.0, 3.0], [20.0, 25.0]]], np.float32)
    # One peak for two GT: precision 1, recall 1/2 -> f1 = 2/3.
    tr = _centroid_trainer(gt, [(0, 3, 4)])
    out = _cb(tr, match_threshold=5.0)._evaluate(tr)
    assert out["val/detection.f1"] == pytest.approx(2.0 / 3.0)


def test_centroid_match_beyond_threshold_counts_fp_and_fn():
    gt = np.array([[[4.0, 3.0]]], np.float32)
    tr = _centroid_trainer(gt, [(0, 30, 30)])  # far away
    out = _cb(tr, match_threshold=5.0)._evaluate(tr)
    assert out["val/detection.f1"] == 0.0
    assert "val/dist.avg" not in out


def test_centroid_offset_within_threshold_contributes_distance():
    gt = np.array([[[4.0, 3.0]]], np.float32)
    tr = _centroid_trainer(gt, [(0, 3, 7)])  # +3 px in x
    out = _cb(tr, match_threshold=5.0)._evaluate(tr)
    assert out["val/detection.f1"] == pytest.approx(1.0)
    assert out["val/dist.avg"] == pytest.approx(3.0, abs=1e-2)


def test_centroid_no_peaks_and_no_gt_emits_no_f1():
    gt = np.full((1, 1, 2), np.nan, np.float32)
    tr = _centroid_trainer(gt, [])
    out = _cb(tr, match_threshold=5.0)._evaluate(tr)
    assert "val/detection.f1" not in out


def test_centroid_multi_batch_accumulates_counts():
    # Batch row 0: perfect; row 1: one FN. precision 2/2, recall 2/3.
    gt = np.stack([
        np.array([[4.0, 3.0], [np.nan, np.nan]], np.float32),
        np.array([[4.0, 3.0], [20.0, 25.0]], np.float32),
    ])
    tr = _centroid_trainer(gt, [(0, 3, 4), (1, 3, 4)])
    out = _cb(tr, match_threshold=5.0)._evaluate(tr)
    p, r = 1.0, 2.0 / 3.0
    assert out["val/detection.f1"] == pytest.approx(2 * p * r / (p + r))


# ------------------------------------------------------------ segmentation


def _seg_trainer(logits, gt_mask, batch_mask=None, mtype="semantic_segmentation"):
    b = logits.shape[0]
    model = _Model([_Head("SegmentationHead", 1)], {"SegmentationHead": logits})
    if batch_mask is None:
        batch_mask = np.ones(b, bool)
    return _Trainer(
        mtype, model,
        [{"image": np.zeros((b, 4, 4, 1), np.float32),
          "segmentation": gt_mask, "batch_mask": batch_mask}],
    )


def test_segmentation_perfect_mask_iou_one():
    gt = np.zeros((1, 8, 8, 1), np.float32)
    gt[0, 2:5, 2:5, 0] = 1.0
    logits = np.where(gt > 0, 10.0, -10.0).astype(np.float32)
    tr = _seg_trainer(logits, gt)
    assert _cb(tr)._evaluate(tr)["val/fg_iou"] == pytest.approx(1.0)


def test_segmentation_half_overlap_iou():
    gt = np.zeros((1, 8, 8, 1), np.float32)
    gt[0, 0:4, :, 0] = 1.0  # top half (32 px)
    logits = np.full((1, 8, 8, 1), -10.0, np.float32)
    logits[0, 2:6, :, 0] = 10.0  # middle band (32 px), overlap 16
    tr = _seg_trainer(logits, gt)
    assert _cb(tr)._evaluate(tr)["val/fg_iou"] == pytest.approx(16.0 / 48.0)


def test_segmentation_empty_union_reports_zero():
    gt = np.zeros((1, 8, 8, 1), np.float32)
    logits = np.full((1, 8, 8, 1), -10.0, np.float32)
    tr = _seg_trainer(logits, gt)
    assert _cb(tr)._evaluate(tr)["val/fg_iou"] == 0.0


def test_segmentation_batch_mask_excludes_padded_rows():
    gt = np.zeros((2, 8, 8, 1), np.float32)
    gt[0, 2:5, 2:5, 0] = 1.0
    logits = np.where(gt > 0, 10.0, -10.0).astype(np.float32)
    logits[1] = 10.0  # padded row would wreck IoU if counted
    tr = _seg_trainer(logits, gt, batch_mask=np.array([True, False]))
    assert _cb(tr)._evaluate(tr)["val/fg_iou"] == pytest.approx(1.0)


@pytest.mark.parametrize(
    "mtype", ["bottomup_segmentation", "centered_instance_segmentation"]
)
def test_segmentation_family_routing(mtype):
    gt = np.zeros((1, 8, 8, 1), np.float32)
    gt[0, 1:3, 1:3, 0] = 1.0
    logits = np.where(gt > 0, 10.0, -10.0).astype(np.float32)
    tr = _seg_trainer(logits, gt, mtype=mtype)
    assert _cb(tr)._evaluate(tr)["val/fg_iou"] == pytest.approx(1.0)


# ------------------------------------------------------------- lifecycle


def test_on_epoch_end_merges_metrics_into_logs(monkeypatch):
    tr = _Trainer("single_instance", _Model([], {}), [])
    cb = _cb(tr, frequency=1)
    monkeypatch.setattr(cb, "_evaluate", lambda trainer: {"val/mOKS": 0.5})
    logs = {"val/loss": 1.0}
    cb.on_epoch_end(tr, 0, logs)
    assert logs == {"val/loss": 1.0, "val/mOKS": 0.5}
