"""Edge-case matrix for the core device ops (peaks / confmaps / PAFs /
grids / crops).

Reference scenario sources: tests/inference/test_peak_finding.py,
tests/data/test_confidence_maps.py, tests/data/test_edge_maps.py — ported
as behavior classes (every test asserts values, not just shapes).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pytest

from sleap_nn_tpu.data.normalization import (
    apply_channel_config,
    ensure_grayscale,
    ensure_rgb,
    normalize_image,
)
from sleap_nn_tpu.data.resizing import (
    apply_pad_to_stride,
    apply_resizer,
    apply_sizematcher,
    find_padding_for_stride,
    resize_image,
)
from sleap_nn_tpu.ops.confmaps import (
    generate_confmaps,
    generate_multiconfmaps,
    make_confmaps,
    make_multi_confmaps,
)
from sleap_nn_tpu.ops.crops import crop_bboxes, make_centered_bboxes
from sleap_nn_tpu.ops.edge_maps import (
    distance_to_edge,
    get_edge_points,
    make_multi_pafs,
    make_pafs,
)
from sleap_nn_tpu.ops.grid import gaussian_pdf, make_grid_vectors
from sleap_nn_tpu.ops.peaks import (
    find_global_peaks,
    find_global_peaks_rough,
    find_local_peaks,
    find_local_peaks_rough,
    integral_regression,
    nms_max_pool,
    refine_peaks_integral,
)


def _cm_with_peak(h=16, w=16, c=1, x=5, y=7, val=1.0):
    cm = np.zeros((1, h, w, c), np.float32)
    cm[0, y, x, 0] = val
    return cm


# ── nms_max_pool ─────────────────────────────────────────────────────────────


def test_nms_pool_isolated_peak_is_strict_max():
    cm = _cm_with_peak()
    pooled = np.asarray(nms_max_pool(jnp.asarray(cm)))
    assert (cm > pooled)[0, 7, 5, 0]
    assert (cm > pooled).sum() == 1


def test_nms_pool_plateau_is_not_strict_max():
    cm = np.zeros((1, 8, 8, 1), np.float32)
    cm[0, 3:5, 3:5, 0] = 1.0  # 2x2 plateau: no pixel strictly exceeds hood
    pooled = np.asarray(nms_max_pool(jnp.asarray(cm)))
    assert (cm > pooled).sum() == 0


def test_nms_pool_corner_peak_detected():
    cm = np.zeros((1, 8, 8, 1), np.float32)
    cm[0, 0, 0, 0] = 0.9
    pooled = np.asarray(nms_max_pool(jnp.asarray(cm)))
    assert (cm > pooled)[0, 0, 0, 0]


def test_nms_pool_kernel5_merges_close_peaks():
    cm = np.zeros((1, 10, 10, 1), np.float32)
    cm[0, 4, 4, 0] = 1.0
    cm[0, 4, 6, 0] = 0.8  # 2 px away: separate at k=3, suppressed at k=5
    k3 = np.asarray(nms_max_pool(jnp.asarray(cm), kernel=3))
    k5 = np.asarray(nms_max_pool(jnp.asarray(cm), kernel=5))
    assert (cm > k3).sum() == 2
    assert (cm > k5).sum() == 1


def test_nms_pool_rejects_even_or_small_kernel():
    cm = jnp.zeros((1, 8, 8, 1))
    with pytest.raises(ValueError):
        nms_max_pool(cm, kernel=4)
    with pytest.raises(ValueError):
        nms_max_pool(cm, kernel=1)


def test_nms_pool_channels_independent():
    cm = np.zeros((1, 8, 8, 2), np.float32)
    cm[0, 2, 2, 0] = 1.0
    cm[0, 2, 2, 1] = 0.5
    pooled = np.asarray(nms_max_pool(jnp.asarray(cm)))
    assert (cm > pooled)[0, 2, 2, 0] and (cm > pooled)[0, 2, 2, 1]


# ── global peaks ─────────────────────────────────────────────────────────────


def test_global_rough_exact_coords_and_vals():
    cm = _cm_with_peak(x=5, y=7, val=0.9)
    pts, vals = find_global_peaks_rough(jnp.asarray(cm), threshold=0.1)
    assert np.allclose(np.asarray(pts)[0, 0], [5, 7])
    assert np.isclose(float(vals[0, 0]), 0.9)


def test_global_rough_below_threshold_nan():
    cm = _cm_with_peak(val=0.05)
    pts, vals = find_global_peaks_rough(jnp.asarray(cm), threshold=0.1)
    assert np.isnan(np.asarray(pts)[0, 0]).all()
    assert float(vals[0, 0]) == 0.0


def test_global_rough_per_channel_independent():
    cm = np.zeros((1, 12, 12, 2), np.float32)
    cm[0, 2, 3, 0] = 0.8
    cm[0, 9, 10, 1] = 0.6
    pts, vals = find_global_peaks_rough(jnp.asarray(cm), threshold=0.1)
    assert np.allclose(np.asarray(pts)[0, 0], [3, 2])
    assert np.allclose(np.asarray(pts)[0, 1], [10, 9])


def test_global_integral_refines_toward_mass():
    # Peak at 8 with a heavy right neighbor pulls x_hat right of 8.
    cm = np.zeros((1, 16, 16, 1), np.float32)
    cm[0, 8, 8, 0] = 1.0
    cm[0, 8, 9, 0] = 0.5
    pts, _ = find_global_peaks(jnp.asarray(cm), threshold=0.1,
                               refinement="integral")
    x = float(np.asarray(pts)[0, 0, 0])
    assert 8.0 < x < 9.0
    y = float(np.asarray(pts)[0, 0, 1])
    assert abs(y - 8.0) < 1e-5


def test_global_integral_symmetric_mass_stays_put():
    cm = np.zeros((1, 16, 16, 1), np.float32)
    cm[0, 8, 8, 0] = 1.0
    cm[0, 8, 7, 0] = cm[0, 8, 9, 0] = 0.4
    cm[0, 7, 8, 0] = cm[0, 9, 8, 0] = 0.4
    pts, _ = find_global_peaks(jnp.asarray(cm), threshold=0.1,
                               refinement="integral")
    assert np.allclose(np.asarray(pts)[0, 0], [8, 8], atol=1e-5)


def test_global_no_refinement_returns_integer_coords():
    cm = _cm_with_peak(x=3, y=4)
    pts, _ = find_global_peaks(jnp.asarray(cm), threshold=0.1, refinement=None)
    assert np.array_equal(np.asarray(pts)[0, 0], [3, 4])


def test_global_peaks_batch_rows_independent():
    cm = np.zeros((2, 8, 8, 1), np.float32)
    cm[0, 1, 2, 0] = 0.9
    cm[1, 6, 5, 0] = 0.7
    pts, vals = find_global_peaks_rough(jnp.asarray(cm), threshold=0.1)
    assert np.allclose(np.asarray(pts)[:, 0], [[2, 1], [5, 6]])


# ── local peaks ──────────────────────────────────────────────────────────────


def test_local_rough_topk_sorted_descending():
    cm = np.zeros((1, 20, 20, 1), np.float32)
    for i, v in enumerate([0.9, 0.7, 0.5]):
        cm[0, 3 + 5 * i, 3, 0] = v
    pts, vals, ch, valid = find_local_peaks_rough(jnp.asarray(cm),
                                                  threshold=0.2, max_peaks=5)
    v = np.asarray(vals)[0]
    assert np.allclose(v[:3], [0.9, 0.7, 0.5])
    assert valid[0, :3].all() and not valid[0, 3:].any()
    assert np.isnan(np.asarray(pts)[0, 3:]).all()
    assert np.asarray(ch)[0, 3] == -1


def test_local_rough_threshold_excludes_weak_peaks():
    cm = np.zeros((1, 12, 12, 1), np.float32)
    cm[0, 2, 2, 0] = 0.9
    cm[0, 8, 8, 0] = 0.15
    _, vals, _, valid = find_local_peaks_rough(jnp.asarray(cm), threshold=0.2)
    assert int(valid.sum()) == 1
    assert np.isclose(float(vals[0, 0]), 0.9)


def test_local_peaks_channel_inds_correct():
    cm = np.zeros((1, 12, 12, 3), np.float32)
    cm[0, 2, 2, 1] = 0.9
    cm[0, 8, 8, 2] = 0.5
    _, _, ch, valid = find_local_peaks_rough(jnp.asarray(cm), threshold=0.2)
    assert list(np.asarray(ch)[0, :2]) == [1, 2]


def test_local_peaks_max_peaks_truncates_lowest():
    cm = np.zeros((1, 24, 24, 1), np.float32)
    vals_in = [0.9, 0.8, 0.7, 0.6]
    for i, v in enumerate(vals_in):
        cm[0, 3 + 5 * i, 3, 0] = v
    _, vals, _, valid = find_local_peaks_rough(jnp.asarray(cm),
                                               threshold=0.2, max_peaks=2)
    assert int(valid.sum()) == 2
    assert np.allclose(np.asarray(vals)[0, :2], [0.9, 0.8])


def test_local_peaks_max_peaks_larger_than_grid_pads():
    cm = _cm_with_peak(h=4, w=4, x=1, y=2, val=0.9)
    pts, vals, ch, valid = find_local_peaks_rough(jnp.asarray(cm),
                                                  threshold=0.2, max_peaks=100)
    assert pts.shape == (1, 100, 2)
    assert int(valid.sum()) == 1


def test_local_integral_refinement_keeps_invalid_nan():
    cm = _cm_with_peak(val=0.9)
    pts, _, _, valid = find_local_peaks(jnp.asarray(cm), threshold=0.2,
                                        refinement="integral", max_peaks=4)
    assert valid[0, 0] and not valid[0, 1]
    assert np.isnan(np.asarray(pts)[0, 1]).all()
    assert np.isfinite(np.asarray(pts)[0, 0]).all()


def test_local_peaks_return_rough_integer_positions():
    cm = np.zeros((1, 16, 16, 1), np.float32)
    cm[0, 8, 8, 0] = 1.0
    cm[0, 8, 9, 0] = 0.5
    pts, _, _, _, rough = find_local_peaks(
        jnp.asarray(cm), threshold=0.2, refinement="integral",
        max_peaks=2, return_rough=True,
    )
    assert np.allclose(np.asarray(rough)[0, 0], [8, 8])
    assert float(np.asarray(pts)[0, 0, 0]) > 8.0


def test_local_peaks_empty_map_all_invalid():
    cm = jnp.zeros((2, 8, 8, 2))
    pts, vals, ch, valid = find_local_peaks_rough(cm, threshold=0.1)
    assert not bool(valid.any())
    assert np.isnan(np.asarray(pts)).all()
    assert float(jnp.sum(vals)) == 0.0


# ── integral regression primitives ───────────────────────────────────────────


def test_integral_regression_centroid_of_mass():
    crop = np.zeros((1, 5, 5), np.float32)
    crop[0, 2, 3] = 1.0
    gv = np.arange(5, dtype=np.float32) - 2.0
    x, y = integral_regression(jnp.asarray(crop), jnp.asarray(gv), jnp.asarray(gv))
    assert np.isclose(float(x[0]), 1.0) and np.isclose(float(y[0]), 0.0)


def test_integral_regression_zero_crop_gives_zero_not_nan():
    crop = jnp.zeros((1, 5, 5))
    gv = jnp.arange(5, dtype=jnp.float32) - 2.0
    x, y = integral_regression(crop, gv, gv)
    assert float(x[0]) == 0.0 and float(y[0]) == 0.0


def test_refine_peaks_integral_nan_rows_pass_through():
    cms = jnp.zeros((1, 8, 8, 1))
    rough = jnp.array([[jnp.nan, jnp.nan]])
    out = refine_peaks_integral(cms, rough, jnp.array([0]), jnp.array([0]))
    assert np.isnan(np.asarray(out)).all()


# ── confmaps ─────────────────────────────────────────────────────────────────


def test_make_confmaps_peak_value_one_at_point():
    xv, yv = make_grid_vectors(16, 16, 1)
    pts = jnp.array([[4.0, 6.0]])
    cm = np.asarray(make_confmaps(pts, xv, yv, sigma=1.5))
    assert cm.shape == (16, 16, 1)
    assert np.isclose(cm[6, 4, 0], 1.0)
    assert cm.argmax() == (6 * 16 + 4)


def test_make_confmaps_gaussian_falloff_value():
    xv, yv = make_grid_vectors(16, 16, 1)
    cm = np.asarray(make_confmaps(jnp.array([[8.0, 8.0]]), xv, yv, sigma=2.0))
    assert np.isclose(cm[8, 10, 0], np.exp(-4 / (2 * 4)), atol=1e-6)


def test_make_confmaps_nan_node_renders_zero_channel():
    xv, yv = make_grid_vectors(8, 8, 1)
    pts = jnp.array([[2.0, 2.0], [jnp.nan, jnp.nan]])
    cm = np.asarray(make_confmaps(pts, xv, yv, sigma=1.0))
    assert cm[..., 1].sum() == 0.0
    assert cm[..., 0].max() > 0.9


def test_make_confmaps_offgrid_point_still_renders():
    xv, yv = make_grid_vectors(8, 8, 1)
    cm = np.asarray(make_confmaps(jnp.array([[-3.0, 4.0]]), xv, yv, sigma=2.0))
    assert cm[4, 0, 0] > cm[4, 4, 0] > 0.0


def test_make_multi_confmaps_max_reduces_instances():
    xv, yv = make_grid_vectors(12, 12, 1)
    pts = jnp.array([[[2.0, 2.0]], [[9.0, 9.0]]])  # 2 instances, 1 node
    cm = np.asarray(make_multi_confmaps(pts, xv, yv, sigma=1.0))
    assert cm.shape == (12, 12, 1)
    assert np.isclose(cm[2, 2, 0], 1.0) and np.isclose(cm[9, 9, 0], 1.0)


def test_make_multi_confmaps_nan_instance_free():
    xv, yv = make_grid_vectors(12, 12, 1)
    pts = jnp.array([[[2.0, 2.0]], [[jnp.nan, jnp.nan]]])
    with_pad = np.asarray(make_multi_confmaps(pts, xv, yv, sigma=1.0))
    without = np.asarray(make_multi_confmaps(pts[:1], xv, yv, sigma=1.0))
    np.testing.assert_allclose(with_pad, without)


def test_generate_confmaps_sigma_scales_with_stride():
    pts = jnp.array([[8.0, 8.0]])
    cm1 = np.asarray(generate_confmaps(pts, (32, 32), sigma=1.5, output_stride=1))
    cm2 = np.asarray(generate_confmaps(pts, (32, 32), sigma=1.5, output_stride=2))
    assert cm1.shape == (32, 32, 1) and cm2.shape == (16, 16, 1)
    # stride-2 map at grid cell (4,4)=px(8,8) is the peak
    assert np.isclose(cm2[4, 4, 0], 1.0)
    # sigma is interpreted in OUTPUT-GRID units: effective image-px spread
    # is sigma*stride, so the value 2 image-px away follows that Gaussian.
    assert np.isclose(cm2[4, 5, 0], np.exp(-4 / (2 * 3.0**2)), atol=1e-6)
    assert np.isclose(cm1[8, 10, 0], np.exp(-4 / (2 * 1.5**2)), atol=1e-6)


def test_generate_multiconfmaps_centroid_mode_single_channel():
    pts = jnp.array([[[4.0, 4.0], [10.0, 10.0]]])  # (1, 2 inst, 2)
    cm = np.asarray(generate_multiconfmaps(pts, (16, 16), sigma=1.5,
                                           output_stride=2, is_centroids=True))
    assert cm.shape == (1, 8, 8, 1)
    assert np.isclose(cm[0, 2, 2, 0], 1.0) and np.isclose(cm[0, 5, 5, 0], 1.0)


def test_confmap_peak_roundtrip_through_finder():
    """Render at a subpixel point, find peak with integral refinement."""
    xv, yv = make_grid_vectors(24, 24, 1)
    true = [11.3, 7.6]
    cm = make_confmaps(jnp.array([true]), xv, yv, sigma=2.0)[None]
    pts, _ = find_global_peaks(cm, threshold=0.1, refinement="integral")
    assert np.allclose(np.asarray(pts)[0, 0], true, atol=0.35)


# ── PAFs / edge maps ─────────────────────────────────────────────────────────


def test_distance_to_edge_on_segment_zero():
    d = distance_to_edge(jnp.array([2.0, 0.0]),
                         jnp.array([[0.0, 0.0]]), jnp.array([[4.0, 0.0]]))
    assert np.isclose(float(d[0]), 0.0)


def test_distance_to_edge_clamps_to_segment_ends():
    # Point beyond the destination: distance to the ENDPOINT, not the line.
    d = distance_to_edge(jnp.array([6.0, 0.0]),
                         jnp.array([[0.0, 0.0]]), jnp.array([[4.0, 0.0]]))
    assert np.isclose(float(d[0]), 4.0)  # (6-4)^2


def test_distance_to_edge_perpendicular():
    d = distance_to_edge(jnp.array([2.0, 3.0]),
                         jnp.array([[0.0, 0.0]]), jnp.array([[4.0, 0.0]]))
    assert np.isclose(float(d[0]), 9.0)


def test_make_pafs_unit_vector_along_edge():
    xv, yv = make_grid_vectors(12, 12, 1)
    src = jnp.array([[2.0, 6.0]])
    dst = jnp.array([[10.0, 6.0]])
    pafs = np.asarray(make_pafs(xv, yv, src, dst, sigma=2.0))
    assert pafs.shape == (12, 12, 1, 2)
    assert np.isclose(pafs[6, 6, 0, 0], 1.0, atol=1e-5)  # x-component on edge
    assert np.isclose(pafs[6, 6, 0, 1], 0.0, atol=1e-5)


def test_make_pafs_diagonal_unit_norm():
    xv, yv = make_grid_vectors(12, 12, 1)
    pafs = np.asarray(make_pafs(xv, yv, jnp.array([[2.0, 2.0]]),
                                jnp.array([[8.0, 8.0]]), sigma=2.0))
    vec = pafs[5, 5, 0]
    assert np.isclose(np.linalg.norm(vec), 1.0, atol=1e-4)
    assert np.isclose(vec[0], vec[1], atol=1e-5)


def test_make_multi_pafs_opposing_edges_cancel():
    """Two instances with opposite edge directions sum toward zero."""
    xv, yv = make_grid_vectors(12, 12, 1)
    srcs = jnp.array([[[[2.0, 6.0]]], [[[10.0, 6.0]]]])  # (2 inst, 1 edge, 2)
    dsts = jnp.array([[[[10.0, 6.0]]], [[[2.0, 6.0]]]])
    pafs = np.asarray(make_multi_pafs(xv, yv, srcs[:, 0], dsts[:, 0], sigma=2.0))
    assert np.allclose(pafs[6, 6, 0], [0.0, 0.0], atol=1e-5)


def test_make_multi_pafs_nan_instance_contributes_zero():
    xv, yv = make_grid_vectors(10, 10, 1)
    srcs = jnp.array([[[2.0, 5.0]], [[jnp.nan, jnp.nan]]])
    dsts = jnp.array([[[8.0, 5.0]], [[jnp.nan, jnp.nan]]])
    two = np.asarray(make_multi_pafs(xv, yv, srcs, dsts, sigma=2.0))
    one = np.asarray(make_multi_pafs(xv, yv, srcs[:1], dsts[:1], sigma=2.0))
    np.testing.assert_allclose(two, one)


def test_get_edge_points_gathers_by_skeleton():
    inst = jnp.array([[0.0, 0.0], [1.0, 1.0], [2.0, 2.0]])
    edges = jnp.array([[0, 1], [1, 2]])
    src, dst = get_edge_points(inst, edges)
    assert np.allclose(np.asarray(src), [[0, 0], [1, 1]])
    assert np.allclose(np.asarray(dst), [[1, 1], [2, 2]])


# ── grid / gaussian ──────────────────────────────────────────────────────────


def test_make_grid_vectors_stride_spacing():
    xv, yv = make_grid_vectors(16, 24, 4)
    assert xv.shape == (6,) and yv.shape == (4,)
    assert np.allclose(np.asarray(xv), [0, 4, 8, 12, 16, 20])


def test_gaussian_pdf_unnormalized_peak_one():
    assert float(gaussian_pdf(jnp.array(0.0), 2.0)) == 1.0
    assert np.isclose(float(gaussian_pdf(jnp.array(2.0), 2.0)), np.exp(-0.5))


# ── crops ────────────────────────────────────────────────────────────────────


def test_make_centered_bboxes_span_inclusive():
    boxes = np.asarray(make_centered_bboxes(jnp.array([[10.0, 20.0]]), 5, 5))
    assert np.allclose(boxes[0, 0], [8, 18])   # top-left
    assert np.allclose(boxes[0, 2], [12, 22])  # bottom-right


def test_crop_bboxes_extracts_expected_window():
    img = np.arange(100, dtype=np.float32).reshape(1, 10, 10, 1)
    boxes = make_centered_bboxes(jnp.array([[4.0, 4.0]]), 3, 3)
    crop = np.asarray(crop_bboxes(jnp.asarray(img), boxes, jnp.array([0]), 3, 3))
    np.testing.assert_allclose(crop[0, ..., 0], img[0, 3:6, 3:6, 0])


def test_crop_bboxes_out_of_bounds_zero_padded():
    img = np.ones((1, 8, 8, 1), np.float32)
    boxes = make_centered_bboxes(jnp.array([[0.0, 0.0]]), 5, 5)
    crop = np.asarray(crop_bboxes(jnp.asarray(img), boxes, jnp.array([0]), 5, 5))
    assert crop[0, 0, 0, 0] == 0.0  # off-image corner
    assert crop[0, 2, 2, 0] == 1.0  # center on-image


def test_crop_bboxes_nan_center_zero_crop():
    img = jnp.ones((1, 8, 8, 1))
    boxes = make_centered_bboxes(jnp.array([[jnp.nan, jnp.nan]]), 4, 4)
    crop = np.asarray(crop_bboxes(img, boxes, jnp.array([0]), 4, 4))
    assert crop.sum() == 0.0


def test_crop_bboxes_sample_inds_route_sources():
    imgs = np.stack([np.full((6, 6, 1), i, np.float32) for i in range(3)])
    boxes = make_centered_bboxes(jnp.array([[3.0, 3.0]] * 2), 2, 2)
    crop = np.asarray(crop_bboxes(jnp.asarray(imgs), boxes,
                                  jnp.array([2, 0]), 2, 2))
    assert crop[0].max() == 2.0 and crop[1].max() == 0.0


# ── resizing / normalization ─────────────────────────────────────────────────


def test_find_padding_for_stride_values():
    assert find_padding_for_stride(30, 32, 16) == (2, 0)
    assert find_padding_for_stride(32, 32, 16) == (0, 0)
    assert find_padding_for_stride(1, 1, 8) == (7, 7)


def test_apply_pad_to_stride_pads_bottom_right_zeros():
    img = jnp.ones((1, 30, 31, 1))
    out = np.asarray(apply_pad_to_stride(img, 16))
    assert out.shape == (1, 32, 32, 1)
    assert out[0, 31, 0, 0] == 0.0 and out[0, 0, 31, 0] == 0.0
    assert out[0, 29, 30, 0] == 1.0


def test_resize_image_rounds_target_shape():
    img = jnp.ones((1, 30, 50, 1))
    out = resize_image(img, 0.5)
    assert out.shape == (1, 15, 25, 1)
    out2 = resize_image(img, 0.33)
    assert out2.shape == (1, 10, 16, 1)  # round(9.9)=10, round(16.5)=16


def test_apply_resizer_scales_instances_with_image():
    img = jnp.ones((1, 20, 20, 1))
    inst = jnp.array([[10.0, 8.0]])
    out_img, out_inst = apply_resizer(img, inst, scale=0.5)
    assert out_img.shape == (1, 10, 10, 1)
    assert np.allclose(np.asarray(out_inst), [[5.0, 4.0]])


def test_apply_sizematcher_aspect_preserving_and_pad():
    img = jnp.ones((1, 100, 200, 1))
    out, eff = apply_sizematcher(img, max_height=50, max_width=50)
    assert out.shape == (1, 50, 50, 1)
    assert np.isclose(eff, 0.25)  # width binds
    # sizematch pad rows are zeros (bottom)
    assert float(out[0, 49, 0, 0]) == 0.0
    assert np.isclose(float(out[0, 24, 0, 0]), 1.0, atol=1e-5)


def test_apply_sizematcher_single_dim_cap():
    img = jnp.ones((1, 100, 200, 1))
    out, eff = apply_sizematcher(img, max_height=50, max_width=None)
    assert np.isclose(eff, 0.5)
    assert out.shape == (1, 50, 200, 1)


def test_apply_sizematcher_noop_when_equal():
    img = jnp.ones((1, 64, 64, 1))
    out, eff = apply_sizematcher(img, 64, 64)
    assert eff == 1.0 and out.shape == img.shape


def test_normalize_image_uint8_to_unit_float():
    img = jnp.array([[[[0], [255], [128]]]], dtype=jnp.uint8)
    out = np.asarray(normalize_image(img))
    assert out.dtype == np.float32
    assert np.allclose(out.ravel(), [0.0, 1.0, 128 / 255])


def test_ensure_rgb_replicates_gray():
    img = jnp.full((1, 4, 4, 1), 0.5)
    out = ensure_rgb(img)
    assert out.shape == (1, 4, 4, 3)
    assert np.allclose(np.asarray(out), 0.5)


def test_ensure_grayscale_itu601_weights():
    img = jnp.zeros((1, 1, 1, 3)).at[0, 0, 0].set(jnp.array([1.0, 0.0, 0.0]))
    out = float(ensure_grayscale(img)[0, 0, 0, 0])
    assert np.isclose(out, 0.2989, atol=1e-4)


def test_apply_channel_config_idempotent_on_matching():
    rgb = jnp.ones((1, 4, 4, 3))
    gray = jnp.ones((1, 4, 4, 1))
    assert apply_channel_config(rgb, True, False).shape[-1] == 3
    assert apply_channel_config(gray, False, True).shape[-1] == 1
    assert apply_channel_config(gray, True, False).shape[-1] == 3
    assert apply_channel_config(rgb, False, True).shape[-1] == 1
