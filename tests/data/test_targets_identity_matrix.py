"""Target-rendering + identity matrix: segmentation targets, centroids,
crops, class vectors/maps, peak->class assignment.

Reference scenario sources: tests/data/test_segmentation_maps.py,
test_instance_centroids.py, test_instance_cropping.py, test_identity.py,
tests/inference/test_identity.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sleap_nn_tpu.data.identity import make_class_maps, make_class_vectors
from sleap_nn_tpu.data.instance_centroids import (
    find_points_mean,
    generate_centroids,
)
from sleap_nn_tpu.data.instance_cropping import (
    compute_augmentation_padding,
    find_instance_crop_size,
)
from sleap_nn_tpu.data.segmentation_maps import (
    compute_mask_centroids,
    generate_center_heatmap,
    generate_center_offsets,
    generate_foreground_mask,
    render_masks_from_instances,
)
from sleap_nn_tpu.inference.identity import (
    get_class_inds_from_vectors,
    group_class_peaks,
)


# ── centroids ────────────────────────────────────────────────────────────────


def test_points_mean_ignores_nan():
    pts = jnp.array([[0.0, 0.0], [4.0, 4.0], [jnp.nan, jnp.nan]])
    np.testing.assert_allclose(np.asarray(find_points_mean(pts)), [2.0, 2.0])


def test_points_mean_all_nan_is_nan():
    pts = jnp.full((3, 2), jnp.nan)
    assert np.isnan(np.asarray(find_points_mean(pts))).all()


def test_generate_centroids_anchor_node():
    inst = jnp.array([[[1.0, 1.0], [9.0, 9.0]]])
    anchored = generate_centroids(inst, anchor_ind=1)
    np.testing.assert_allclose(np.asarray(anchored)[0], [9.0, 9.0])


def test_generate_centroids_anchor_missing_falls_back_to_mean():
    inst = jnp.array([[[1.0, 1.0], [jnp.nan, jnp.nan], [3.0, 3.0]]])
    got = generate_centroids(inst, anchor_ind=1)
    np.testing.assert_allclose(np.asarray(got)[0], [2.0, 2.0])


# ── crop sizing ──────────────────────────────────────────────────────────────


def test_find_instance_crop_size_covers_bbox_and_rounds_to_stride():
    from sleap_nn_tpu.io import Instance, LabeledFrame, Labels, Skeleton

    skel = Skeleton(nodes=["a", "b"])
    inst = Instance(points=np.array([[0.0, 0.0], [50.0, 30.0]]), skeleton=skel)
    labels = Labels([LabeledFrame(None, 0, [inst])], skeletons=[skel])
    size = find_instance_crop_size(labels, maximum_stride=16)
    assert size >= 50 and size % 16 == 0


def test_find_instance_crop_size_min_floor():
    from sleap_nn_tpu.io import Instance, LabeledFrame, Labels, Skeleton

    skel = Skeleton(nodes=["a", "b"])
    inst = Instance(points=np.array([[0.0, 0.0], [4.0, 4.0]]), skeleton=skel)
    labels = Labels([LabeledFrame(None, 0, [inst])], skeletons=[skel])
    size = find_instance_crop_size(labels, min_crop_size=96, maximum_stride=16)
    assert size >= 96


def test_augmentation_padding_grows_with_rotation():
    p0 = compute_augmentation_padding(100, rotation_max=0.0, scale_max=1.0)
    p45 = compute_augmentation_padding(100, rotation_max=45.0, scale_max=1.0)
    assert p0 == 0 and p45 > 0
    # >=45 degrees caps the expansion at sqrt(2)
    assert compute_augmentation_padding(100, rotation_max=90.0) == p45


# ── class vectors / maps ─────────────────────────────────────────────────────


def test_make_class_vectors_onehot_and_untracked():
    v = np.asarray(make_class_vectors(jnp.array([1, -1, 0]), 3))
    np.testing.assert_array_equal(v[0], [0, 1, 0])
    np.testing.assert_array_equal(v[1], [0, 0, 0])  # untracked row all-zero
    np.testing.assert_array_equal(v[2], [1, 0, 0])


def test_make_class_maps_gated_by_confmaps():
    from sleap_nn_tpu.ops.confmaps import make_confmaps
    from sleap_nn_tpu.ops.grid import make_grid_vectors

    pts = jnp.array([[[[4.0, 4.0]], [[12.0, 12.0]]]])  # (1, 2 inst, 1 node, 2)
    xv, yv = make_grid_vectors(16, 16, 1)
    cms = make_confmaps(pts, xv, yv, sigma=1.5)  # (1, 2, 16, 16, 1)
    maps = make_class_maps(cms, jnp.array([[0, 1]]), 2, threshold=0.2)
    m = np.asarray(maps)[0]
    assert m.shape == (16, 16, 2)
    assert m[4, 4, 0] > 0.9 and m[4, 4, 1] < 0.1  # instance 0 is class 0
    assert m[12, 12, 1] > 0.9 and m[12, 12, 0] < 0.1


# ── segmentation targets ─────────────────────────────────────────────────────


def _two_blob_masks():
    masks = np.zeros((1, 2, 16, 16), np.float32)
    masks[0, 0, 2:6, 2:6] = 1.0
    masks[0, 1, 10:14, 10:14] = 1.0
    valid = np.array([[True, True]])
    return jnp.asarray(masks), jnp.asarray(valid)


def test_foreground_mask_union_at_stride():
    masks, valid = _two_blob_masks()
    fg = np.asarray(generate_foreground_mask(masks, valid, output_stride=2))
    assert fg.shape == (1, 8, 8, 1)
    assert fg[0, 2, 2, 0] == 1.0 and fg[0, 6, 6, 0] == 1.0
    assert fg[0, 4, 4, 0] == 0.0


def test_foreground_mask_invalid_rows_excluded():
    masks, _ = _two_blob_masks()
    fg = np.asarray(generate_foreground_mask(
        masks, jnp.array([[True, False]]), output_stride=2))
    assert fg[0, 6, 6, 0] == 0.0


def test_foreground_maxpool_keeps_thin_structures():
    masks = np.zeros((1, 1, 8, 8), np.float32)
    masks[0, 0, 3, :] = 1.0  # 1-px line: 25% cell coverage at stride 2
    valid = jnp.array([[True]])
    strict = np.asarray(generate_foreground_mask(jnp.asarray(masks), valid, 2))
    loose = np.asarray(generate_foreground_mask(jnp.asarray(masks), valid, 2,
                                                maxpool=True))
    assert strict.sum() == 0.0
    assert loose.sum() > 0


def test_mask_centroids_center_of_mass():
    masks, valid = _two_blob_masks()
    cents = np.asarray(compute_mask_centroids(masks, valid))
    np.testing.assert_allclose(cents[0, 0], [3.5, 3.5])
    np.testing.assert_allclose(cents[0, 1], [11.5, 11.5])


def test_mask_centroids_invalid_nan():
    masks, _ = _two_blob_masks()
    cents = np.asarray(compute_mask_centroids(masks, jnp.array([[True, False]])))
    assert np.isnan(cents[0, 1]).all()


def test_center_heatmap_peaks_at_mask_centers():
    masks, valid = _two_blob_masks()
    hm = np.asarray(generate_center_heatmap(masks, valid, output_stride=2,
                                            sigma=1.5))
    assert hm.shape == (1, 8, 8, 1)
    flat = hm[0, :, :, 0]
    top2 = np.argsort(flat.ravel())[-2:]
    ys, xs = np.unravel_index(top2, flat.shape)
    got = sorted(zip(xs.tolist(), ys.tolist()))
    assert got[0] in [(1, 1), (2, 2)]
    assert got[1] in [(5, 5), (6, 6)]


def test_center_offsets_point_toward_center():
    masks, valid = _two_blob_masks()
    off, weight = generate_center_offsets(masks, valid, output_stride=1)
    off = np.asarray(off)
    assert off.shape[-1] == 2
    assert np.asarray(weight)[0, 3, 3, 0] > 0  # fg pixel weighted
    # pixel left of blob-0 center: positive dx toward center
    assert off[0, 3, 2, 0] > 0
    # pixel right of center: negative dx
    assert off[0, 3, 5, 0] < 0
    # background pixels carry zero offsets
    assert np.allclose(off[0, 8, 8], 0.0)


def test_render_masks_capsule_around_edges():
    inst = jnp.array([[[4.0, 8.0], [12.0, 8.0]]])  # horizontal edge
    m = np.asarray(render_masks_from_instances(
        inst, (16, 16), edge_inds=jnp.array([[0, 1]]), radius=2.0))
    assert m.shape == (1, 16, 16)
    assert m[0, 8, 8]  # on the edge
    assert m[0, 8, 4] and m[0, 8, 12]  # endpoints
    assert not m[0, 1, 1]  # far corner


def test_render_masks_nan_instance_empty():
    inst = jnp.full((1, 2, 2), jnp.nan)
    m = np.asarray(render_masks_from_instances(
        inst, (8, 8), edge_inds=jnp.array([[0, 1]]), radius=2.0))
    assert m.sum() == 0


# ── peak -> class assignment ─────────────────────────────────────────────────


def test_group_class_peaks_hungarian_per_node():
    # 2 peaks of the same (sample, node); class probs clearly separable.
    probs = np.array([[0.9, 0.1], [0.2, 0.8]])
    peak_inds, class_inds = group_class_peaks(
        probs, np.array([0, 0]), np.array([0, 0]), n_samples=1, n_channels=1)
    got = dict(zip(peak_inds.tolist(), class_inds.tolist()))
    assert got == {0: 0, 1: 1}


def test_group_class_peaks_drops_non_best_assignments():
    """Hungarian may match a peak to a class that is not its argmax; those
    assignments are dropped (reference ops/identity.py keep-best filter)."""
    probs = np.array([[0.9, 0.5], [0.8, 0.1]])
    peak_inds, class_inds = group_class_peaks(
        probs, np.array([0, 0]), np.array([0, 0]), n_samples=1, n_channels=1)
    got = dict(zip(peak_inds.tolist(), class_inds.tolist()))
    # optimal total assigns peak0->c1 (0.5), peak1->c0 (0.8); peak0's match
    # is not its best class, so only peak1 survives.
    assert got == {1: 0}


def test_group_class_peaks_channels_independent():
    probs = np.array([[0.9, 0.1], [0.9, 0.1]])
    peak_inds, class_inds = group_class_peaks(
        probs, np.array([0, 0]), np.array([0, 1]), n_samples=1, n_channels=2)
    got = dict(zip(peak_inds.tolist(), class_inds.tolist()))
    assert got == {0: 0, 1: 0}  # different nodes: no competition


def test_get_class_inds_from_vectors_argmax_unique():
    probs = np.array([[0.9, 0.1], [0.3, 0.7]])
    inds, scores = get_class_inds_from_vectors(probs)
    np.testing.assert_array_equal(inds, [0, 1])
    np.testing.assert_allclose(scores, [0.9, 0.7])
