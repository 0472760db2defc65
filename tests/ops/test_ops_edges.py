"""Ops edge cases: border crops, NaN instance flows, degenerate edges,
grid vector contracts (reference sleap_nn data/inference ops test model).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from sleap_nn_tpu.ops import (
    crop_bboxes,
    distance_to_edge,
    find_global_peaks,
    find_local_peaks,
    get_edge_points,
    make_centered_bboxes,
    make_confmaps,
    make_edge_maps,
    make_grid_vectors,
    make_multi_confmaps,
    make_pafs,
)


def test_make_grid_vectors_stride():
    xv, yv = make_grid_vectors(16, 24, output_stride=2)
    assert xv.shape == (12,) and yv.shape == (8,)
    np.testing.assert_allclose(np.asarray(xv)[:3], [0, 2, 4])


def test_make_centered_bboxes_centering():
    c = jnp.asarray([[10.0, 20.0]])
    bb = np.asarray(make_centered_bboxes(c, 5, 5))[0]
    # bbox spans [y1, x1, y2, x2]-style corners centered on the point.
    assert bb.min() >= 7.0 and bb.max() <= 23.0


def test_crop_bboxes_border_clamps_or_pads():
    """Crops near the image border return the correct in-bounds pixels."""
    img = jnp.arange(8 * 8, dtype=jnp.float32).reshape(1, 8, 8, 1)
    # Crop centered at the corner (0, 0).
    bb = make_centered_bboxes(jnp.asarray([[0.0, 0.0]]), 3, 3)
    crop = np.asarray(crop_bboxes(img, bb, jnp.asarray([0]), 3, 3))[0, ..., 0]
    assert crop.shape == (3, 3)
    # Center pixel of the crop must be the image's (0, 0) value.
    assert crop[1, 1] == 0.0


def test_confmaps_nan_instance_renders_zero():
    xv, yv = make_grid_vectors(16, 16, 1)
    pts = jnp.asarray([[[np.nan, np.nan]]])  # (1 instance, 1 node, 2)
    cm = np.asarray(make_confmaps(pts[0], xv, yv, sigma=2.0))
    assert np.nanmax(cm) == 0.0
    assert not np.isnan(cm).any()


def test_confmaps_peak_at_point():
    xv, yv = make_grid_vectors(32, 32, 1)
    pts = jnp.asarray([[10.0, 20.0]])  # node at x=10, y=20
    cm = np.asarray(make_confmaps(pts, xv, yv, sigma=1.5))
    c = cm[..., 0]
    iy, ix = np.unravel_index(np.argmax(c), c.shape)
    assert (ix, iy) == (10, 20)
    assert c[iy, ix] == pytest.approx(1.0, abs=1e-5)


def test_multi_confmaps_max_reduction():
    xv, yv = make_grid_vectors(32, 32, 1)
    pts = jnp.asarray([
        [[[10.0, 10.0]]],
        [[[20.0, 20.0]]],
    ]).reshape(1, 2, 1, 2)  # (B=1, I=2, N=1, 2)
    cm = np.asarray(make_multi_confmaps(pts, xv, yv, sigma=2.0))[0, ..., 0]
    assert cm[10, 10] == pytest.approx(1.0, abs=1e-5)
    assert cm[20, 20] == pytest.approx(1.0, abs=1e-5)


def test_distance_to_edge_on_segment():
    # Point ON the segment -> distance 0; point off to the side -> its
    # perpendicular distance squared.
    pts = jnp.asarray([[5.0, 0.0], [5.0, 3.0]])  # query points
    src = jnp.asarray([[0.0, 0.0]])
    dst = jnp.asarray([[10.0, 0.0]])
    d2 = np.asarray(distance_to_edge(pts, src, dst))
    assert d2[0, 0] == pytest.approx(0.0, abs=1e-6)
    assert d2[1, 0] == pytest.approx(9.0, abs=1e-5)


def test_edge_maps_zero_length_edge_no_nan():
    """A degenerate (zero-length) edge must not emit NaNs."""
    xv, yv = make_grid_vectors(16, 16, 1)
    src = jnp.asarray([[8.0, 8.0]])
    dst = jnp.asarray([[8.0, 8.0]])  # same point
    em = np.asarray(make_edge_maps(xv, yv, src, dst, sigma=2.0))
    assert not np.isnan(em).any()


def test_pafs_unit_vector_direction():
    xv, yv = make_grid_vectors(32, 32, 1)
    src = jnp.asarray([[8.0, 16.0]])
    dst = jnp.asarray([[24.0, 16.0]])  # pure +x edge
    pafs = np.asarray(make_pafs(xv, yv, src, dst, sigma=2.0))
    # (H, W, 1_edge, 2): x component ~1 on the midline, y ~0.
    mid = pafs[16, 16, 0]
    assert mid[0] == pytest.approx(1.0, abs=1e-3)
    assert mid[1] == pytest.approx(0.0, abs=1e-3)


def test_get_edge_points_indexing():
    pts = jnp.asarray([
        [[0.0, 0], [1, 1], [2, 2]],
    ])  # (1 instance, 3 nodes, 2)
    edges = jnp.asarray([[0, 1], [1, 2]])
    src, dst = get_edge_points(pts, edges)
    np.testing.assert_allclose(np.asarray(src)[0, 0], [0, 0])
    np.testing.assert_allclose(np.asarray(dst)[0, 1], [2, 2])


def test_find_global_peaks_all_below_threshold():
    cms = jnp.full((2, 16, 16, 3), 0.05)
    pts, vals = find_global_peaks(cms, threshold=0.2)
    assert np.isnan(np.asarray(pts)).all()
    assert (np.asarray(vals) == 0).all()


def test_find_local_peaks_empty_map():
    cms = jnp.zeros((1, 16, 16, 2))
    pts, vals, ch, valid = find_local_peaks(cms, threshold=0.1, max_peaks=10)
    assert not np.asarray(valid).any()
    assert np.isnan(np.asarray(pts)).all()
    assert (np.asarray(ch) == -1).all()


def test_find_local_peaks_border_peak():
    """A maximum at the image border is still found (padding is -inf)."""
    cms = np.zeros((1, 16, 16, 1), np.float32)
    cms[0, 0, 0, 0] = 1.0
    pts, vals, ch, valid = find_local_peaks(jnp.asarray(cms), threshold=0.5,
                                            max_peaks=4)
    assert np.asarray(valid)[0, 0]
    np.testing.assert_allclose(np.asarray(pts)[0, 0], [0, 0])


def test_integral_refinement_pulls_toward_mass():
    """An asymmetric blob pulls the refined peak off the integer argmax."""
    from sleap_nn_tpu.ops import make_grid_vectors

    xv, yv = make_grid_vectors(32, 32, 1)
    pts = jnp.asarray([[15.6, 15.0]])
    cm = make_confmaps(pts, xv, yv, sigma=2.0)[None]
    rough, _ = find_global_peaks(cm, threshold=0.1)
    refined, _ = find_global_peaks(cm, threshold=0.1, refinement="integral")
    # Rough is integer (16); refined moves toward the true 15.6.
    assert abs(float(refined[0, 0, 0]) - 15.6) < abs(float(rough[0, 0, 0]) - 15.6)


def test_find_local_peaks_more_peaks_than_slots():
    """More true maxima than max_peaks -> highest-valued ones kept."""
    cms = np.zeros((1, 32, 32, 1), np.float32)
    vals_in = [0.9, 0.8, 0.7, 0.6, 0.5]
    for i, v in enumerate(vals_in):
        cms[0, 4 + 5 * i, 4 + 5 * i, 0] = v
    pts, vals, ch, valid = find_local_peaks(jnp.asarray(cms), threshold=0.1,
                                            max_peaks=3)
    got = sorted(np.asarray(vals)[0][np.asarray(valid)[0]], reverse=True)
    assert got == pytest.approx([0.9, 0.8, 0.7])
