"""Tests for peak finding + crop ops."""

import jax
import jax.numpy as jnp
import numpy as np

from sleap_nn_tpu.ops import (
    crop_bboxes,
    find_global_peaks,
    find_global_peaks_rough,
    find_local_peaks,
    find_local_peaks_rough,
    integral_regression,
    make_centered_bboxes,
    make_confmaps,
    make_grid_vectors,
    nms_max_pool,
)


def render_cms(points, H=32, W=32, sigma=1.5):
    """(B, n_nodes, 2) -> (B, H, W, n_nodes) confmaps."""
    xv, yv = make_grid_vectors(H, W, 1)
    return make_confmaps(jnp.asarray(points, jnp.float32), xv, yv, sigma)


def test_nms_max_pool_marks_local_maxima():
    cms = render_cms(np.array([[[10.0, 12.0], [25.0, 5.0]]]))
    peaks = np.asarray((cms > nms_max_pool(cms)))
    ys, xs, cs = np.where(peaks[0])
    assert set(zip(xs.tolist(), ys.tolist(), cs.tolist())) == {(10, 12, 0), (25, 5, 1)}


def test_find_global_peaks_rough():
    pts = np.array([[[10.3, 12.8], [25.0, 5.0]], [[3.0, 3.0], [np.nan, np.nan]]])
    cms = render_cms(pts)
    points, vals = find_global_peaks_rough(cms, threshold=0.1)
    assert points.shape == (2, 2, 2)
    np.testing.assert_array_equal(np.asarray(points[0, 0]), [10, 13])
    np.testing.assert_array_equal(np.asarray(points[0, 1]), [25, 5])
    np.testing.assert_array_equal(np.asarray(points[1, 0]), [3, 3])
    assert np.isnan(np.asarray(points[1, 1])).all()
    assert np.asarray(vals)[1, 1] == 0.0
    assert np.asarray(vals)[0, 0] > 0.9


def test_find_global_peaks_integral_subpixel():
    pts = np.array([[[10.3, 12.8]]])
    cms = render_cms(pts)
    points, vals = find_global_peaks(cms, threshold=0.1, refinement="integral")
    xy = np.asarray(points[0, 0])
    # Sub-pixel refinement should land within ~0.1 px of the true position.
    np.testing.assert_allclose(xy, [10.3, 12.8], atol=0.15)


def test_refine_global_peaks_windowed_rounds_noninteger_rough():
    """Non-integer rough peaks are snapped to the pixel grid before windowing.

    Pins the guard: passing refined/scaled (fractional) peaks must give the
    same answer as passing their rounded integer locations, never a silently
    shifted window.
    """
    from sleap_nn_tpu.ops.peaks import refine_global_peaks_windowed

    pts = np.array([[[10.3, 12.8], [25.0, 5.0]]])
    cms = render_cms(pts)
    fractional = jnp.asarray([[[10.4, 12.6], [24.9, 5.2]]])
    integer = jnp.round(fractional)
    out_frac = np.asarray(refine_global_peaks_windowed(cms, fractional))
    out_int = np.asarray(refine_global_peaks_windowed(cms, integer))
    np.testing.assert_allclose(out_frac, out_int, atol=1e-6)
    # And the refined result still lands near the true subpixel location.
    np.testing.assert_allclose(out_frac[0, 0], [10.3, 12.8], atol=0.15)
    # NaN rows still pass through.
    nan_rough = jnp.asarray([[[np.nan, np.nan], [25.0, 5.0]]])
    out_nan = np.asarray(refine_global_peaks_windowed(cms, nan_rough))
    assert np.isnan(out_nan[0, 0]).all()


def test_find_global_peaks_jit_and_nan_passthrough():
    pts = np.array([[[10.3, 12.8], [np.nan, np.nan]]])
    cms = render_cms(pts)
    f = jax.jit(lambda c: find_global_peaks(c, threshold=0.1, refinement="integral"))
    points, vals = f(cms)
    assert np.isnan(np.asarray(points[0, 1])).all()
    np.testing.assert_allclose(np.asarray(points[0, 0]), [10.3, 12.8], atol=0.15)


def test_find_local_peaks_rough_topk_contract():
    pts = np.array([[[10.0, 12.0], [25.0, 5.0]], [[3.0, 3.0], [20.0, 20.0]]])
    cms = render_cms(pts)
    points, vals, channels, valid = find_local_peaks_rough(cms, threshold=0.2, max_peaks=8)
    assert points.shape == (2, 8, 2)
    assert valid.dtype == bool
    v = np.asarray(valid)
    assert v[0].sum() == 2 and v[1].sum() == 2
    got = {
        (int(x), int(y), int(c))
        for (x, y), c, ok in zip(np.asarray(points[0]), np.asarray(channels[0]), v[0])
        if ok
    }
    assert got == {(10, 12, 0), (25, 5, 1)}
    # Values sorted descending among valid slots.
    vv = np.asarray(vals[0])[v[0]]
    assert (np.diff(vv) <= 1e-6).all()
    # Invalid slots: NaN points, 0 vals, -1 channels.
    assert np.isnan(np.asarray(points[0])[~v[0]]).all()
    assert (np.asarray(channels[0])[~v[0]] == -1).all()


def test_find_local_peaks_integral():
    pts = np.array([[[10.4, 12.6], [25.2, 5.1]]])
    cms = render_cms(pts)
    points, vals, channels, valid = find_local_peaks(
        cms, threshold=0.2, refinement="integral", max_peaks=4
    )
    v = np.asarray(valid[0])
    got = np.asarray(points[0])[v]
    ch = np.asarray(channels[0])[v]
    by_ch = {int(c): g for c, g in zip(ch, got)}
    np.testing.assert_allclose(by_ch[0], [10.4, 12.6], atol=0.15)
    np.testing.assert_allclose(by_ch[1], [25.2, 5.1], atol=0.15)


def test_find_local_peaks_no_peaks():
    cms = jnp.zeros((1, 16, 16, 2))
    points, vals, channels, valid = find_local_peaks(cms, threshold=0.2, max_peaks=4)
    assert not np.asarray(valid).any()
    assert np.isnan(np.asarray(points)).all()


def test_make_centered_bboxes():
    bb = np.asarray(make_centered_bboxes(jnp.array([[10.0, 20.0]]), 5, 5))
    np.testing.assert_allclose(bb[0, 0], [8, 18])  # top-left
    np.testing.assert_allclose(bb[0, 2], [12, 22])  # bottom-right


def test_crop_bboxes_center_and_oob():
    img = jnp.arange(16 * 16, dtype=jnp.float32).reshape(1, 16, 16, 1)
    bb = make_centered_bboxes(jnp.array([[8.0, 8.0], [0.0, 0.0]]), 5, 5)
    crops = np.asarray(crop_bboxes(img, bb, jnp.array([0, 0]), 5, 5))
    assert crops.shape == (2, 5, 5, 1)
    # Center crop: value at crop center == image[8, 8].
    assert crops[0, 2, 2, 0] == 8 * 16 + 8
    # Corner crop: out-of-bounds zero-padded.
    assert crops[1, 0, 0, 0] == 0.0
    assert crops[1, 2, 2, 0] == 0.0 * 16 + 0


def test_crop_bboxes_nan_gives_zeros():
    img = jnp.ones((1, 16, 16, 1))
    bb = make_centered_bboxes(jnp.array([[jnp.nan, jnp.nan]]), 5, 5)
    crops = np.asarray(crop_bboxes(img, bb, jnp.array([0]), 5, 5))
    assert (crops == 0).all()


def test_integral_regression_centroid():
    # A symmetric blob centered at (2, 2) in a 5x5 patch -> offsets (0, 0).
    gv = jnp.arange(5, dtype=jnp.float32) - 2.0
    xx, yy = jnp.meshgrid(gv, gv)
    blob = jnp.exp(-(xx**2 + yy**2) / 2.0)[None]
    dx, dy = integral_regression(blob, gv, gv)
    np.testing.assert_allclose([float(dx[0]), float(dy[0])], [0, 0], atol=1e-6)
    # All-zero crop -> 0 offset, not NaN.
    dx0, dy0 = integral_regression(jnp.zeros((1, 5, 5)), gv, gv)
    assert float(dx0[0]) == 0.0 and not np.isnan(float(dy0[0]))
