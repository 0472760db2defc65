"""Segmentation inference knob tests: center NMS kernel, distance gate,
mask cleanup radius, polygon output, full-res masks, ROI/centroid io.

Reference parity targets: cli.py:2467 (center_nms_kernel), :2497
(distance_gate_alpha), :2485 (mask_cleanup_radius), :2588 (mask_output),
:2576 (full_res_masks), :2376 (centroid_output).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from sleap_nn_tpu.inference.segmentation import (
    group_instances_from_offsets,
    mask_cleanup,
    mask_to_polygon,
)
from sleap_nn_tpu.ops.peaks import find_local_peaks, nms_max_pool


def test_center_nms_kernel_merges_nearby_peaks():
    # Two maxima 2 px apart: kernel=3 keeps both, kernel=5 keeps one.
    hm = np.zeros((1, 16, 16, 1), np.float32)
    hm[0, 8, 6, 0] = 1.0
    hm[0, 8, 8, 0] = 0.9
    _, _, _, valid3 = find_local_peaks(jnp.asarray(hm), threshold=0.2, max_peaks=5)
    _, _, _, valid5 = find_local_peaks(
        jnp.asarray(hm), threshold=0.2, max_peaks=5, nms_kernel=5
    )
    assert int(valid3.sum()) == 2
    assert int(valid5.sum()) == 1


def test_nms_kernel_validation():
    with pytest.raises(ValueError, match="odd"):
        nms_max_pool(jnp.zeros((1, 8, 8, 1)), kernel=4)


def test_distance_gate_alpha_drops_stray_pixels():
    # One detected center with a compact blob voting for it, plus a stray
    # far-away pixel that also (wrongly) votes for the same center.
    h = w = 32
    fg = np.zeros((1, h, w, 1), np.float32)
    offsets = np.zeros((1, h, w, 2), np.float32)
    # Compact 5x5 blob around (16, 16) in grid coords.
    fg[0, 14:19, 14:19, 0] = 1.0
    # Stray pixel at (2, 2) with a zero (noisy) offset: its VOTED position
    # stays at (2, 2), far from the assigned center — the gate's target case.
    fg[0, 2, 2, 0] = 1.0
    stride = 2
    center_xy = 16 * stride + stride / 2.0
    centers = np.array([[[center_xy, center_xy]]], np.float32)
    valid = np.array([[True]])

    no_gate = np.asarray(group_instances_from_offsets(
        jnp.asarray(fg), jnp.asarray(offsets), jnp.asarray(centers),
        jnp.asarray(valid), output_stride=stride, max_center_dist=200.0,
    ))
    gated = np.asarray(group_instances_from_offsets(
        jnp.asarray(fg), jnp.asarray(offsets), jnp.asarray(centers),
        jnp.asarray(valid), output_stride=stride, max_center_dist=200.0,
        distance_gate_alpha=1.5,
    ))
    assert no_gate[0, 0, 2, 2]  # stray included without the gate
    assert not gated[0, 0, 2, 2]  # gate drops it
    assert gated[0, 0, 16, 16]  # blob core survives


def test_mask_cleanup_radius_and_fill_holes():
    m = np.zeros((40, 40), bool)
    m[10:30, 10:30] = True
    m[18:22, 18:22] = False  # interior hole
    m[2, 2] = True  # speck
    out = mask_cleanup(m, min_area=4, radius=1, fill_holes=True)
    assert out[20, 20]  # hole filled
    assert not out[2, 2]  # speck removed (not the largest CC)
    # open->close shaves the 4 square corners with a radius-1 disk.
    assert out.sum() >= 20 * 20 - 8

    # Without fill_holes the hole persists.
    out2 = mask_cleanup(m, min_area=4)
    assert not out2[20, 20]


def test_mask_to_polygon_square():
    m = np.zeros((30, 30), bool)
    m[5:20, 8:24] = True
    poly = mask_to_polygon(m, epsilon_frac=0.02)
    assert poly is not None
    assert len(poly) == 4  # simplified rectangle
    xs, ys = poly[:, 0], poly[:, 1]
    assert xs.min() == pytest.approx(8, abs=1) and xs.max() == pytest.approx(23, abs=1)
    assert ys.min() == pytest.approx(5, abs=1) and ys.max() == pytest.approx(19, abs=1)
    # Scale maps grid -> image px.
    poly2 = mask_to_polygon(m, epsilon_frac=0.02, scale=2.0)
    assert poly2[:, 0].max() == pytest.approx(2 * xs.max())
    # Empty mask -> None.
    assert mask_to_polygon(np.zeros((10, 10), bool)) is None


def test_roi_and_centroid_slp_roundtrip(tmp_path):
    from sleap_nn_tpu.io import (
        LabeledFrame,
        Labels,
        PredictedCentroid,
        PredictedROI,
        SegmentationMask,
        Track,
        load_slp,
    )

    t = Track("track_0")
    lf = LabeledFrame(video=None, frame_idx=0, instances=[])
    m = np.zeros((20, 20), bool)
    m[5:15, 5:15] = True
    lf.masks = [SegmentationMask(m, score=0.7, track=t)]
    lf.rois = [PredictedROI(np.array([[5, 5], [14, 5], [14, 14], [5, 14]]),
                            score=0.7, track=t)]
    lf.centroids = [PredictedCentroid(np.array([9.5, 9.5]), score=0.8, track=t)]
    labels = Labels([lf])
    labels.tracks = [t]
    out = tmp_path / "rois.slp"
    labels.save(str(out))

    back = load_slp(str(out))
    lf2 = back.labeled_frames[0]
    assert len(lf2.rois) == 1 and len(lf2.centroids) == 1
    np.testing.assert_allclose(lf2.rois[0].points,
                               [[5, 5], [14, 5], [14, 14], [5, 14]])
    assert lf2.rois[0].score == pytest.approx(0.7)
    assert lf2.rois[0].track is not None and lf2.rois[0].track.name == "track_0"
    np.testing.assert_allclose(lf2.centroids[0].point, [9.5, 9.5])
    assert lf2.centroids[0].score == pytest.approx(0.8)
    # ROI polygon area (shoelace) matches the square.
    assert lf2.rois[0].area == pytest.approx(81.0)


def test_filter_fraction_and_mean_score():
    from sleap_nn_tpu.inference.filters import FilterConfig, FilterPipeline
    from sleap_nn_tpu.io import PredictedInstance, Skeleton

    skel = Skeleton(nodes=["a", "b", "c", "d"])

    def inst(n_visible, scores):
        pts = np.full((4, 2), np.nan)
        pts[:n_visible] = 1.0
        return PredictedInstance(points=pts, skeleton=skel,
                                 point_scores=np.asarray(scores, float), score=0.9)

    good = inst(4, [0.9, 0.9, 0.9, 0.9])
    sparse = inst(1, [0.9, 0, 0, 0])
    weak = inst(4, [0.1, 0.1, 0.1, 0.1])

    out = FilterPipeline(FilterConfig(min_visible_node_fraction=0.5)).apply(
        [good, sparse, weak])
    assert sparse not in out and good in out and weak in out

    out = FilterPipeline(FilterConfig(min_mean_node_score=0.5)).apply(
        [good, sparse, weak])
    assert weak not in out and good in out
