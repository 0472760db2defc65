"""Stride-encoded mask scenario matrix (reference issue #618).

Parity target: reference tests/inference/test_segmentation_stride_encoding.py
— masks persist at model (output-stride) resolution with a mask-px -> image-px
``scale`` factor; every consumer decodes: eval compares in image pixels,
polygon lifting multiplies coordinates, ``min_mask_area`` stays an
ORIGINAL-image-pixel floor converted (ceil) to grid units, and the .slp
round-trip carries the factor. Re-expressed against this repo's
``SegmentationMask.scale`` / ``decode`` (io/model.py), the slp mask
extension (io/slp.py), scale-aware eval decode (evaluation.py
``_decode_frame_masks``), and the bottom-up finalize floor conversion
(inference/segmentation.py).
"""

from __future__ import annotations

from types import SimpleNamespace

import numpy as np
import pytest

from sleap_nn_tpu.evaluation import Evaluator, _decode_frame_masks, _pad_mask_to
from sleap_nn_tpu.inference.segmentation import (
    BottomUpSegmentationLayer,
    mask_cleanup,
)
from sleap_nn_tpu.io import load_slp
from sleap_nn_tpu.io.model import (
    LabeledFrame,
    Labels,
    SegmentationMask,
    Skeleton,
)
from sleap_nn_tpu.io.video import Video

SKEL = Skeleton(nodes=["a"])
VID = Video(filename="fake.mp4")


def _blob(h, w, y0, y1, x0, x1):
    m = np.zeros((h, w), bool)
    m[y0:y1, x0:x1] = True
    return m


# ─── SegmentationMask.decode ─────────────────────────────────────────────


def test_default_scale_is_identity():
    sm = SegmentationMask(_blob(8, 8, 2, 6, 2, 6))
    assert sm.scale == 1.0
    np.testing.assert_array_equal(sm.decode(), sm.mask)


def test_decode_scale2_matches_kron_oracle():
    base = _blob(8, 8, 2, 6, 1, 5)
    sm = SegmentationMask(base, scale=2.0)
    oracle = np.kron(base, np.ones((2, 2), bool))
    np.testing.assert_array_equal(sm.decode(), oracle)


def test_decode_out_hw_crops_and_pads():
    base = _blob(4, 4, 0, 4, 0, 4)
    sm = SegmentationMask(base, scale=2.0)  # decodes to 8x8 all-True
    out = sm.decode(out_hw=(10, 6))
    assert out.shape == (10, 6)
    assert out[:8, :6].all()
    assert not out[8:, :].any()  # bottom padding stays empty


def test_image_area_scale_aware():
    sm = SegmentationMask(_blob(8, 8, 0, 2, 0, 2), scale=4.0)
    assert sm.area == 4  # grid pixels
    assert sm.image_area == pytest.approx(4 * 16.0)  # 4 px * 4^2


def test_decode_fractional_scale_rounds_extent():
    sm = SegmentationMask(_blob(10, 10, 0, 10, 0, 10), scale=1.5)
    assert sm.decode().shape == (15, 15)


# ─── slp round-trip ──────────────────────────────────────────────────────


def test_slp_roundtrip_preserves_scale(tmp_path):
    lf = LabeledFrame(video=VID, frame_idx=0, instances=[])
    lf.masks = [SegmentationMask(_blob(16, 16, 2, 10, 2, 10), score=0.7,
                                 scale=4.0)]
    labels = Labels([lf], videos=[VID], skeletons=[SKEL])
    p = tmp_path / "enc.slp"
    labels.save(str(p))
    back = load_slp(str(p))
    (sm,) = back.labeled_frames[0].masks
    assert sm.scale == 4.0
    assert sm.mask.shape == (16, 16)  # stored at stride resolution
    np.testing.assert_array_equal(sm.mask, lf.masks[0].mask)


def test_slp_roundtrip_default_scale_one(tmp_path):
    lf = LabeledFrame(video=VID, frame_idx=0, instances=[])
    lf.masks = [SegmentationMask(_blob(8, 8, 0, 4, 0, 4))]
    labels = Labels([lf], videos=[VID], skeletons=[SKEL])
    p = tmp_path / "plain.slp"
    labels.save(str(p))
    (sm,) = load_slp(str(p)).labeled_frames[0].masks
    assert sm.scale == 1.0


def test_stride_encoding_shrinks_payload(tmp_path):
    """The point of #618: a stride-s mask stores ~s^2 fewer bits."""
    # Large enough that the packbits payload dwarfs fixed HDF5 overhead.
    full = _blob(1024, 1024, 128, 896, 128, 896)
    grid = full[::4, ::4]

    def size_of(mask, scale):
        lf = LabeledFrame(video=VID, frame_idx=0, instances=[])
        lf.masks = [SegmentationMask(mask, scale=scale)]
        p = tmp_path / f"sz_{scale}.slp"
        Labels([lf], videos=[VID], skeletons=[SKEL]).save(str(p))
        return p.stat().st_size

    # Compare payload growth over an empty baseline rather than absolute
    # file sizes (HDF5 carries fixed structural overhead).
    lf0 = LabeledFrame(video=VID, frame_idx=0, instances=[])
    p0 = tmp_path / "empty.slp"
    Labels([lf0], videos=[VID], skeletons=[SKEL]).save(str(p0))
    base = p0.stat().st_size
    assert (size_of(grid, 4.0) - base) * 4 < (size_of(full, 1.0) - base)


# ─── scale-aware eval ────────────────────────────────────────────────────


def _eval_pair(gt_masks, pr_masks):
    gt_lf = LabeledFrame(video=VID, frame_idx=0, instances=[], masks=gt_masks)
    pr_lf = LabeledFrame(video=VID, frame_idx=0, instances=[], masks=pr_masks)
    gt = Labels([gt_lf], videos=[VID], skeletons=[SKEL])
    pr = Labels([pr_lf], videos=[VID], skeletons=[SKEL])
    return Evaluator(gt, pr, match_method="mask", user_labels_only=False)


def test_eval_matches_stride_encoded_prediction_to_full_res_gt():
    """A grid-res prediction of the same blob must match IoU ~1.0 — without
    scale-aware decode the evaluator would crop the GT to the grid extent
    and compare the wrong region."""
    gt_full = _blob(64, 64, 16, 48, 16, 48)
    pred_grid = gt_full[::2, ::2]  # exact stride-2 encoding
    ev = _eval_pair(
        [SegmentationMask(gt_full)],
        [SegmentationMask(pred_grid, score=0.9, scale=2.0)],
    )
    assert len(ev.positive_pairs) == 1
    (_, _, iou) = ev.mask_pairs[0]
    assert iou > 0.95


def test_eval_unscaled_grid_mask_would_not_match():
    """Control for the scenario above: the SAME grid mask claiming scale=1
    occupies the top-left quarter in image coords and must NOT match."""
    gt_full = _blob(64, 64, 16, 48, 16, 48)
    pred_grid = gt_full[::2, ::2]
    ev = _eval_pair(
        [SegmentationMask(gt_full)],
        [SegmentationMask(pred_grid, score=0.9, scale=1.0)],
    )
    assert len(ev.positive_pairs) == 0


def test_eval_mixed_scales_in_one_frame():
    """Image-res and stride-encoded predictions coexist per frame."""
    gt_a = _blob(64, 64, 0, 16, 0, 16)
    gt_b = _blob(64, 64, 40, 60, 40, 60)
    pr_a = SegmentationMask(gt_a, score=0.8)  # image-res
    pr_b = SegmentationMask(gt_b[::4, ::4], score=0.7, scale=4.0)
    ev = _eval_pair(
        [SegmentationMask(gt_a), SegmentationMask(gt_b)], [pr_a, pr_b]
    )
    assert len(ev.positive_pairs) == 2


def test_decode_frame_masks_handles_plain_arrays():
    frame = SimpleNamespace(masks=[np.ones((4, 4), bool)])
    (m,) = _decode_frame_masks(frame)
    assert m.shape == (4, 4) and m.dtype == np.bool_


def test_pad_mask_to_noop_when_already_canvas():
    m = np.ones((4, 4), bool)
    assert _pad_mask_to(m, 4, 4) is m


# ─── min_mask_area unit conversion (bottom-up finalize) ──────────────────


def _finalize(min_mask_area, grid_mask, stride=2, pre_scale=1.0, eff=1.0):
    """Drive BottomUpSegmentationLayer.finalize with a synthetic device dict."""
    fake = SimpleNamespace(
        min_mask_area=min_mask_area,
        seg_output_stride=stride,
        pre=SimpleNamespace(scale=pre_scale),
        full_res_masks=False,
        merge_fragments=False,
        do_mask_cleanup=False,
    )
    k, h, w = 1, grid_mask.shape[0], grid_mask.shape[1]
    dev = {
        "instance_masks": grid_mask[None, None].astype(bool),
        "center_valid": np.ones((1, k), bool),
        "centers": np.zeros((1, k, 2), np.float32),
        "center_vals": np.ones((1, k), np.float32),
        "eff_scale": np.asarray([eff], np.float32),
    }
    return BottomUpSegmentationLayer.finalize(fake, dev)


def test_min_mask_area_is_image_pixel_floor():
    # 5 grid px at stride 2 = 20 image px >= 16 -> survives.
    survive = np.zeros((8, 8), bool)
    survive[0, :5] = True
    out = _finalize(16, survive)
    assert len(out["pred_masks"][0]) == 1
    # 3 grid px = 12 image px < 16 -> dropped AND its center invalidated.
    drop = np.zeros((8, 8), bool)
    drop[0, :3] = True
    out = _finalize(16, drop)
    assert len(out["pred_masks"][0]) == 0
    assert out["centroid_valid"].sum() == 0


def test_min_mask_area_floor_uses_ceil_not_round():
    # floor=18 image px at stride 2 -> grid floor ceil(18/4)=5 (round would
    # give 4, letting a 16-image-px mask through).
    four_px = np.zeros((8, 8), bool)
    four_px[0, :4] = True  # 16 image px < 18
    assert len(_finalize(18, four_px)["pred_masks"][0]) == 0
    five_px = np.zeros((8, 8), bool)
    five_px[0, :5] = True  # 20 image px >= 18
    assert len(_finalize(18, five_px)["pred_masks"][0]) == 1


def test_finalized_masks_carry_grid_scale():
    m = np.zeros((8, 8), bool)
    m[:4, :4] = True
    out = _finalize(1, m, stride=4, pre_scale=0.5)
    (sm,) = out["pred_masks"][0]
    assert sm.scale == pytest.approx(8.0)  # stride 4 / scale 0.5
    assert out["mask_scale"] == pytest.approx(8.0)


def test_mask_cleanup_radius0_pure_component_filter():
    """radius=0 must be exactly keep-largest + area floor (byte-identical
    reference contract)."""
    m = np.zeros((16, 16), bool)
    m[2:10, 2:10] = True  # big component
    m[14, 14] = True  # speckle
    out = mask_cleanup(m, min_area=4, radius=0)
    expected = np.zeros((16, 16), bool)
    expected[2:10, 2:10] = True
    np.testing.assert_array_equal(out, expected)
