"""Pallas kernel parity tests (interpreter mode on CPU)."""

import jax.numpy as jnp
import numpy as np

from sleap_nn_tpu.ops import make_grid_vectors, make_multi_confmaps
from sleap_nn_tpu.ops.pallas_kernels import make_multi_confmaps_pallas


def test_pallas_confmaps_matches_xla():
    rng = np.random.default_rng(0)
    pts = rng.uniform(0, 60, (2, 3, 4, 2)).astype(np.float32)
    pts[0, 2] = np.nan  # padded instance
    pts[1, 1, 3] = np.nan  # missing node
    xv, yv = make_grid_vectors(64, 96, 1)

    ref = np.asarray(make_multi_confmaps(jnp.asarray(pts), xv, yv, sigma=3.0))
    out = np.asarray(
        make_multi_confmaps_pallas(jnp.asarray(pts), xv, yv, sigma=3.0, interpret=True)
    )
    assert out.shape == ref.shape == (2, 64, 96, 4)
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_pallas_confmaps_row_tiling():
    # Height not divisible by the tile -> cdiv grid + block clamping.
    pts = jnp.asarray(np.random.default_rng(1).uniform(0, 40, (1, 2, 2, 2)), jnp.float32)
    xv, yv = make_grid_vectors(50, 64, 1)
    ref = np.asarray(make_multi_confmaps(pts, xv, yv, sigma=2.0))
    out = np.asarray(
        make_multi_confmaps_pallas(pts, xv, yv, sigma=2.0, tile_h=16, interpret=True)
    )
    np.testing.assert_allclose(out, ref, atol=1e-6)
