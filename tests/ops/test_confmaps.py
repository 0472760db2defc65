"""Tests for confmap/PAF target rendering vs numpy oracles of the reference math."""

import numpy as np
import jax.numpy as jnp

from sleap_nn_tpu.ops import (
    make_confmaps,
    make_grid_vectors,
    make_multi_confmaps,
    make_multi_pafs,
    make_pafs,
    distance_to_edge,
    get_edge_points,
)
from sleap_nn_tpu.ops.confmaps import generate_confmaps, generate_multiconfmaps
from sleap_nn_tpu.ops.edge_maps import generate_pafs


def oracle_confmap(points, H, W, sigma, stride=1):
    """Reference math: exp(-((xv-x)^2+(yv-y)^2)/(2 sigma^2)), NaN -> 0."""
    xv = np.arange(0, W, stride, dtype=np.float32)
    yv = np.arange(0, H, stride, dtype=np.float32)
    cms = np.zeros((len(yv), len(xv), len(points)), dtype=np.float32)
    for k, (x, y) in enumerate(points):
        if np.isnan(x) or np.isnan(y):
            continue
        g = np.exp(-((xv[None] - x) ** 2 + (yv[:, None] - y) ** 2) / (2 * sigma**2))
        cms[..., k] = g
    return cms


def test_make_grid_vectors():
    xv, yv = make_grid_vectors(8, 12, output_stride=2)
    np.testing.assert_array_equal(np.asarray(xv), np.arange(0, 12, 2))
    np.testing.assert_array_equal(np.asarray(yv), np.arange(0, 8, 2))


def test_make_confmaps_matches_oracle():
    pts = np.array([[3.2, 5.7], [10.0, 2.0], [np.nan, np.nan]], np.float32)
    xv, yv = make_grid_vectors(16, 16, 1)
    cm = np.asarray(make_confmaps(jnp.array(pts), xv, yv, sigma=2.0))
    oracle = oracle_confmap(pts, 16, 16, 2.0)
    np.testing.assert_allclose(cm, oracle, atol=1e-5)
    assert cm.shape == (16, 16, 3)
    # Peak at the keypoint location.
    assert cm[6, 3, 0] == cm[..., 0].max()
    # NaN node renders zero.
    assert cm[..., 2].max() == 0.0


def test_make_multi_confmaps_max_reduce():
    pts = np.array(
        [
            [[2.0, 2.0], [10.0, 10.0]],
            [[2.0, 3.0], [np.nan, np.nan]],
            [[np.nan, np.nan], [np.nan, np.nan]],  # padded instance
        ],
        np.float32,
    )
    xv, yv = make_grid_vectors(16, 16, 1)
    cm = np.asarray(make_multi_confmaps(jnp.array(pts), xv, yv, sigma=1.5))
    o = np.maximum(
        oracle_confmap(pts[0], 16, 16, 1.5), oracle_confmap(pts[1], 16, 16, 1.5)
    )
    np.testing.assert_allclose(cm, o, atol=1e-5)


def test_generate_confmaps_stride_sigma_scaling():
    pts = jnp.array([[[8.0, 8.0], [4.0, 12.0]]])  # (1, n_nodes, 2)
    cm = generate_confmaps(pts, img_hw=(16, 16), sigma=1.5, output_stride=2)
    assert cm.shape == (1, 8, 8, 2)
    # reference: sigma scaled by stride, grid coords in image space.
    o = oracle_confmap(np.array([[8.0, 8.0], [4.0, 12.0]]), 16, 16, 3.0, stride=2)
    np.testing.assert_allclose(np.asarray(cm[0]), o, atol=1e-5)


def test_generate_multiconfmaps_centroids():
    pts = jnp.array([[[4.0, 4.0], [12.0, 12.0]]])  # (1, n_inst, 2)
    cm = generate_multiconfmaps(pts, img_hw=(16, 16), sigma=1.5, output_stride=1, is_centroids=True)
    assert cm.shape == (1, 16, 16, 1)
    assert np.asarray(cm)[0, 4, 4, 0] > 0.99
    assert np.asarray(cm)[0, 12, 12, 0] > 0.99


def oracle_dist_to_edge(p, src, dst):
    d = dst - src
    L = max((d**2).sum(), 1.0)
    t = np.clip(((p - src) @ d) / L, 0, 1)
    proj = src + t * d
    return ((p - proj) ** 2).sum()


def test_distance_to_edge():
    src = jnp.array([[0.0, 0.0]])
    dst = jnp.array([[10.0, 0.0]])
    pts = jnp.array([[5.0, 3.0], [-2.0, 0.0], [12.0, 1.0]])
    d = np.asarray(distance_to_edge(pts, src, dst))
    exp = [
        oracle_dist_to_edge(np.array([5.0, 3.0]), np.zeros(2), np.array([10.0, 0.0])),
        oracle_dist_to_edge(np.array([-2.0, 0.0]), np.zeros(2), np.array([10.0, 0.0])),
        oracle_dist_to_edge(np.array([12.0, 1.0]), np.zeros(2), np.array([10.0, 0.0])),
    ]
    np.testing.assert_allclose(d[:, 0], exp, atol=1e-6)


def test_make_pafs_unit_vectors():
    xv, yv = make_grid_vectors(16, 16, 1)
    src = jnp.array([[2.0, 8.0]])
    dst = jnp.array([[14.0, 8.0]])
    pafs = np.asarray(make_pafs(xv, yv, src, dst, sigma=1.0))
    assert pafs.shape == (16, 16, 1, 2)
    # On the edge line the vector is the unit x direction.
    np.testing.assert_allclose(pafs[8, 8, 0], [1.0, 0.0], atol=1e-5)
    # Off the tube it decays to ~0.
    assert abs(pafs[0, 8, 0, 0]) < 1e-5


def test_make_multi_pafs_sums_and_ignores_nan():
    xv, yv = make_grid_vectors(16, 16, 1)
    src = jnp.array([[[2.0, 8.0]], [[np.nan, np.nan]]])  # (2 inst, 1 edge, 2)
    dst = jnp.array([[[14.0, 8.0]], [[np.nan, np.nan]]])
    pafs = np.asarray(make_multi_pafs(xv, yv, src, dst, sigma=1.0))
    assert pafs.shape == (16, 16, 1, 2)
    assert not np.isnan(pafs).any()
    np.testing.assert_allclose(pafs[8, 8, 0], [1.0, 0.0], atol=1e-5)

    # Two overlapping identical instances sum to 2x.
    src2 = jnp.array([[[2.0, 8.0]], [[2.0, 8.0]]])
    dst2 = jnp.array([[[14.0, 8.0]], [[14.0, 8.0]]])
    pafs2 = np.asarray(make_multi_pafs(xv, yv, src2, dst2, sigma=1.0))
    np.testing.assert_allclose(pafs2[8, 8, 0], [2.0, 0.0], atol=1e-5)


def test_get_edge_points():
    inst = jnp.arange(12, dtype=jnp.float32).reshape(2, 3, 2)  # 2 inst, 3 nodes
    edge_inds = jnp.array([[0, 1], [1, 2]])
    src, dst = get_edge_points(inst, edge_inds)
    assert src.shape == (2, 2, 2)
    np.testing.assert_array_equal(np.asarray(src[0, 0]), [0, 1])
    np.testing.assert_array_equal(np.asarray(dst[0, 1]), [4, 5])


def test_generate_pafs_flatten_order():
    inst = jnp.array([[[4.0, 4.0], [12.0, 4.0], [12.0, 12.0]]])  # (1, 3 nodes, 2)
    edge_inds = jnp.array([[0, 1], [1, 2]])
    pafs = generate_pafs(inst, img_hw=(16, 16), edge_inds=edge_inds, sigma=1.5, output_stride=1)
    assert pafs.shape == (16, 16, 4)  # [e0x, e0y, e1x, e1y]
    # Edge 0 is horizontal: x component strong, y ~ 0 along its line.
    assert np.asarray(pafs)[4, 8, 0] > 0.9
    assert abs(np.asarray(pafs)[4, 8, 1]) < 1e-4
    # Edge 1 is vertical at x=12.
    assert np.asarray(pafs)[8, 12, 3] > 0.9


def test_generate_pafs_out_of_image_filter():
    # An instance fully outside the grid must contribute nothing.
    inst = jnp.array(
        [
            [[4.0, 4.0], [12.0, 4.0]],
            [[-5.0, -5.0], [-1.0, -1.0]],
        ]
    )
    edge_inds = jnp.array([[0, 1]])
    pafs = generate_pafs(inst, img_hw=(16, 16), edge_inds=edge_inds, sigma=1.0, output_stride=1)
    single = generate_pafs(inst[:1], img_hw=(16, 16), edge_inds=edge_inds, sigma=1.0, output_stride=1)
    np.testing.assert_allclose(np.asarray(pafs), np.asarray(single), atol=1e-6)
