"""SAM prompt builders + segmentation host-function matrix.

Reference scenario sources: tests/inference/sam/test_prompts.py and
tests/inference/test_segmentation.py host-side helpers (mask cleanup,
polygon extraction, upsampling, offset grouping edge cases).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pytest

from sleap_nn_tpu.inference.sam.prompts import (
    BOX_MARGIN_MIN,
    box_prompt,
    centroid_prompt,
    keypoint_box,
    pose_prompt,
    prompt_for_instance,
    visible_keypoints,
)
from sleap_nn_tpu.inference.segmentation import (
    group_instances_from_offsets,
    mask_cleanup,
    mask_to_polygon,
    upsample_mask,
)


# ── SAM prompts ──────────────────────────────────────────────────────────────


def test_visible_keypoints_filters_nan():
    pts = np.array([[1.0, 2.0], [np.nan, 3.0], [4.0, 5.0]])
    got = visible_keypoints(pts)
    np.testing.assert_allclose(got, [[1, 2], [4, 5]])
    assert visible_keypoints(None).shape == (0, 2)


def test_keypoint_box_margin_floor_for_degenerate_point():
    box = keypoint_box(np.array([[50.0, 50.0]]), (200, 200))
    x0, y0, x1, y1 = box
    assert x1 - x0 >= 2 * BOX_MARGIN_MIN - 1e-6
    assert y1 - y0 >= 2 * BOX_MARGIN_MIN - 1e-6


def test_keypoint_box_clamped_to_image():
    box = keypoint_box(np.array([[2.0, 2.0], [10.0, 10.0]]), (64, 64))
    assert box[0] >= 0 and box[1] >= 0
    assert box[2] <= 63 and box[3] <= 63


def test_pose_prompt_points_and_box():
    kps = np.array([[10.0, 20.0], [30.0, 40.0], [np.nan, np.nan]])
    p = pose_prompt(kps, (200, 200))
    assert p.point_coords.shape == (2, 2)
    assert (p.point_labels == 1).all()
    assert p.box is not None and p.mode == "pose"


def test_pose_prompt_no_visible_raises():
    with pytest.raises(ValueError, match="visible"):
        pose_prompt(np.full((3, 2), np.nan), (64, 64))


def test_centroid_prompt_single_point_no_box():
    p = centroid_prompt(np.array([30.0, 40.0]), (100, 100))
    assert p.point_coords.shape == (1, 2)
    assert p.box is None
    assert p.reject_box is not None


def test_box_prompt_no_points():
    p = box_prompt(np.array([[10.0, 10.0], [50.0, 60.0]]), (200, 200))
    assert p.point_coords is None and p.point_labels is None
    assert p.box is not None and p.mode == "box"


def test_prompt_dispatch_pose_falls_back_to_centroid():
    p = prompt_for_instance("pose", (100, 100),
                            keypoints=np.full((3, 2), np.nan),
                            centroid=np.array([10.0, 10.0]))
    assert p.mode == "centroid"
    np.testing.assert_allclose(p.point_coords, [[10, 10]])


def test_prompt_dispatch_centroid_from_keypoint_mean():
    p = prompt_for_instance("centroid", (100, 100),
                            keypoints=np.array([[0.0, 0.0], [10.0, 10.0]]))
    np.testing.assert_allclose(p.point_coords, [[5, 5]])


def test_prompt_dispatch_unknown_mode_raises():
    with pytest.raises(ValueError, match="Unknown prompt mode"):
        prompt_for_instance("magic", (10, 10), keypoints=np.zeros((1, 2)))


def test_prompt_dispatch_nothing_to_prompt_raises():
    with pytest.raises(ValueError):
        prompt_for_instance("pose", (10, 10))


# ── segmentation host helpers ────────────────────────────────────────────────


def test_mask_cleanup_keeps_largest_component():
    m = np.zeros((20, 20), bool)
    m[2:10, 2:10] = True   # big blob
    m[15:17, 15:17] = True  # small blob
    out = mask_cleanup(m, min_area=4)
    assert out[5, 5] and not out[15, 15]


def test_mask_cleanup_min_area_drops_all():
    m = np.zeros((10, 10), bool)
    m[4:6, 4:6] = True  # area 4
    assert mask_cleanup(m, min_area=16).sum() == 0


def test_mask_cleanup_fill_holes():
    m = np.zeros((16, 16), bool)
    m[4:12, 4:12] = True
    m[7:9, 7:9] = False  # interior hole
    out = mask_cleanup(m, min_area=4, fill_holes=True)
    assert out[7, 7]


def test_mask_cleanup_radius_despeckles():
    m = np.zeros((32, 32), bool)
    m[8:24, 8:24] = True
    m[0, 0] = True  # speck joined? no - separate component
    m[16, 0] = True
    out = mask_cleanup(m, min_area=4, radius=2)
    assert out[16, 16]
    assert not out[0, 0] and not out[16, 0]


def test_mask_to_polygon_square():
    m = np.zeros((32, 32), bool)
    m[8:24, 8:24] = True
    poly = mask_to_polygon(m, epsilon_frac=0.02)
    assert poly is not None and poly.shape[1] == 2
    assert 3 <= len(poly) <= 8  # simplified square
    assert poly[:, 0].min() >= 7 and poly[:, 0].max() <= 24


def test_mask_to_polygon_scale_applies():
    m = np.zeros((16, 16), bool)
    m[4:12, 4:12] = True
    poly = mask_to_polygon(m, epsilon_frac=0.0, scale=2.0)
    assert poly[:, 0].max() >= 20  # grid 11 * 2


def test_mask_to_polygon_empty_none():
    assert mask_to_polygon(np.zeros((8, 8), bool)) is None


def test_upsample_mask_nearest_and_crop():
    m = np.zeros((3, 4), bool)
    m[1, 2] = True
    up = upsample_mask(m, 2, (5, 7))
    assert up.shape == (5, 7)
    assert up[2, 4] and up[3, 5]
    assert not up[0, 0]


def test_offset_grouping_assigns_pixels_to_nearest_voted_center():
    fg = np.zeros((1, 8, 8, 1), np.float32)
    fg[0, 2:6, 2:6] = 1.0
    offsets = np.zeros((1, 8, 8, 2), np.float32)  # pixels vote their own spot
    centers = jnp.asarray([[[4.0 * 2, 4.0 * 2], [100.0, 100.0]]])
    valid = jnp.asarray([[True, False]])
    inst = np.asarray(group_instances_from_offsets(
        jnp.asarray(fg), jnp.asarray(offsets), centers, valid,
        output_stride=2, max_center_dist=64.0))
    assert inst.shape == (1, 2, 8, 8)
    assert inst[0, 0, 3, 3]
    assert inst[0, 1].sum() == 0  # invalid center gets nothing


def test_offset_grouping_max_center_dist_gates():
    fg = np.ones((1, 8, 8, 1), np.float32)
    offsets = np.zeros((1, 8, 8, 2), np.float32)
    centers = jnp.asarray([[[0.0, 0.0]]])
    valid = jnp.asarray([[True]])
    inst = np.asarray(group_instances_from_offsets(
        jnp.asarray(fg), jnp.asarray(offsets), centers, valid,
        output_stride=2, max_center_dist=3.0))
    # only pixels whose voted position is within 3 px of (0,0)
    assert inst[0, 0, 0, 0]
    assert not inst[0, 0, 7, 7]


def test_offset_grouping_distance_gate_alpha_strips_strays():
    fg = np.zeros((1, 16, 16, 1), np.float32)
    fg[0, 2:6, 2:6] = 1.0     # compact blob near center
    fg[0, 14, 14] = 1.0       # stray far pixel
    offsets = np.zeros((1, 16, 16, 2), np.float32)
    centers = jnp.asarray([[[8.0, 8.0]]])
    valid = jnp.asarray([[True]])
    loose = np.asarray(group_instances_from_offsets(
        jnp.asarray(fg), jnp.asarray(offsets), centers, valid,
        output_stride=2, max_center_dist=64.0))
    gated = np.asarray(group_instances_from_offsets(
        jnp.asarray(fg), jnp.asarray(offsets), centers, valid,
        output_stride=2, max_center_dist=64.0, distance_gate_alpha=1.5))
    assert loose[0, 0, 14, 14]
    assert not gated[0, 0, 14, 14]
    assert gated[0, 0, 4, 4]


def test_sam_legacy_backend_registered_with_actionable_error(tmp_path):
    """The segment-anything (SAM1 native) backend is registered; without the
    package it raises guidance, mirroring the reference's lazy wrapper.
    A missing/non-local checkpoint errors FIRST with usage guidance."""
    from sleap_nn_tpu.inference.sam import MASK_BACKENDS, get_mask_backend

    assert "sam_legacy" in MASK_BACKENDS
    with pytest.raises(ValueError, match="LOCAL"):
        get_mask_backend("sam_legacy", sam_model_id="/no/ckpt.pth")
    ckpt = tmp_path / "sam_vit_h.pth"
    ckpt.write_bytes(b"stub")
    with pytest.raises(ImportError, match="segment-anything"):
        get_mask_backend("sam_legacy", sam_model_id=str(ckpt))


def test_sam_legacy_backend_mask_protocol(monkeypatch, tmp_path):
    """With a stubbed segment_anything module, the backend encodes once per
    frame and picks candidates like the HF path."""
    import sys
    import types

    calls = {"set_image": 0, "predict": 0}

    class StubPredictor:
        def __init__(self, sam):
            pass

        def set_image(self, rgb):
            calls["set_image"] += 1

        def predict(self, multimask_output=True, point_coords=None,
                    point_labels=None, box=None):
            calls["predict"] += 1
            h = w = 32
            cands = np.zeros((3, h, w), bool)
            cands[0, 2:6, 2:6] = True     # small, inside reject box
            cands[1] = True               # whole-frame (rejected by area)
            cands[2, 20:30, 20:30] = True
            return cands, np.array([0.9, 0.95, 0.5]), None

    mod = types.ModuleType("segment_anything")
    mod.SamPredictor = StubPredictor
    mod.sam_model_registry = {
        "vit_h": lambda checkpoint: types.SimpleNamespace(
            to=lambda d: types.SimpleNamespace(eval=lambda: None))}
    monkeypatch.setitem(sys.modules, "segment_anything", mod)

    from sleap_nn_tpu.inference.sam.backends import SamLegacyBackend
    from sleap_nn_tpu.inference.sam.prompts import prompt_for_instance

    fake = tmp_path / "sam_vit_h_stub.pth"
    fake.write_bytes(b"stub")
    be = SamLegacyBackend.from_checkpoint(str(fake))
    img = np.zeros((32, 32, 1), np.uint8)
    p = prompt_for_instance("pose", (32, 32),
                            keypoints=np.array([[3.0, 3.0], [5.0, 5.0]]))
    masks, scores = be.masks(img, [p, p])
    assert calls["set_image"] == 1      # one encode per frame
    assert calls["predict"] == 2        # one decode per prompt
    assert len(masks) == 2
    # the small in-box candidate wins over the higher-scoring whole-frame one
    assert masks[0][3, 3] and masks[0].sum() < 100
