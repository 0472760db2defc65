"""PAF/edge-map rendering vs the reference's hardcoded expectations
(reference tests/data/test_edge_maps.py) — same math, channel-last layout.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from sleap_nn_tpu.ops import (
    distance_to_edge,
    make_edge_maps,
    make_grid_vectors,
    make_pafs,
)

SRC = np.array([[1, 0.5], [0, 0]], np.float32)
DST = np.array([[1, 1.5], [2, 2]], np.float32)


def _grid_points(xv, yv):
    gx, gy = np.meshgrid(np.asarray(xv), np.asarray(yv))
    return jnp.asarray(np.stack([gx, gy], axis=-1).reshape(-1, 2))


def test_distance_to_edge_reference_values():
    xv, yv = make_grid_vectors(3, 3, 1)
    pts = _grid_points(xv, yv)
    d2 = np.asarray(distance_to_edge(pts, jnp.asarray(SRC), jnp.asarray(DST)))
    d2 = d2.reshape(3, 3, 2)
    want = np.array([
        [[1.25, 0.0], [0.25, 0.5], [1.25, 2.0]],
        [[1.0, 0.5], [0.0, 0.0], [1.0, 0.5]],
        [[1.25, 2.0], [0.25, 0.5], [1.25, 0.0]],
    ])
    np.testing.assert_allclose(d2, want, atol=1e-6)


def test_make_edge_maps_reference_values():
    xv, yv = make_grid_vectors(3, 3, 1)
    em = np.asarray(make_edge_maps(xv, yv, jnp.asarray(SRC), jnp.asarray(DST),
                                   sigma=1.0))
    want = np.array([
        [[0.458, 1.000], [0.969, 0.882], [0.458, 0.135]],
        [[0.607, 0.882], [1.000, 1.000], [0.607, 0.882]],
        [[0.458, 0.135], [0.969, 0.882], [0.458, 1.000]],
    ])
    assert em.shape == want.shape, em.shape
    np.testing.assert_allclose(em, want, atol=1e-3)


def test_make_pafs_reference_values():
    xv, yv = make_grid_vectors(3, 3, 1)
    pafs = np.asarray(make_pafs(xv, yv, jnp.asarray(SRC), jnp.asarray(DST),
                                sigma=1.0))
    # Reference layout: (n_edges, 2{x,y}, H, W); ours is channel-last
    # (H, W, n_edges, 2).
    want_ref = np.array([
        [
            [[0.0, 0.0, 0.0], [0.0, 0.0, 0.0], [0.0, 0.0, 0.0]],
            [[0.4578, 0.9692, 0.4578], [0.6065, 1.0, 0.6065],
             [0.4578, 0.9692, 0.4578]],
        ],
        [
            [[0.7071, 0.6240, 0.0957], [0.6240, 0.7071, 0.6240],
             [0.0957, 0.6240, 0.7071]],
            [[0.7071, 0.6240, 0.0957], [0.6240, 0.7071, 0.6240],
             [0.0957, 0.6240, 0.7071]],
        ],
    ])
    got_ref_layout = np.transpose(pafs, (2, 3, 0, 1))  # -> (E, 2, H, W)
    np.testing.assert_allclose(got_ref_layout, want_ref, atol=1e-3)
