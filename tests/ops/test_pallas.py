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


def test_pallas_nms_scores_matches_xla():
    """Kernel target #1: fused NMS+threshold == the XLA shift chain, exactly."""
    import numpy as np
    from sleap_nn_tpu.ops.pallas_kernels import nms_scores_pallas
    from sleap_nn_tpu.ops.peaks import nms_max_pool

    rng = np.random.default_rng(1)
    for (b, h, w, c, k, thr) in [(2, 64, 96, 3, 3, 0.2), (1, 100, 128, 1, 5, 0.1),
                                 (3, 160, 200, 2, 3, 0.0), (1, 33, 40, 4, 3, 0.5)]:
        cms = jnp.asarray(rng.random((b, h, w, c)), jnp.float32)
        want = jnp.where(
            (cms > nms_max_pool(cms, kernel=k)) & (cms > thr), cms, -jnp.inf
        )
        got = nms_scores_pallas(cms, thr, kernel=k, interpret=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_pallas_nms_row_tiling():
    """Internal row tiles (tile_h < H) keep halo handling exact."""
    import numpy as np
    from sleap_nn_tpu.ops.pallas_kernels import nms_scores_pallas
    from sleap_nn_tpu.ops.peaks import nms_max_pool

    rng = np.random.default_rng(2)
    cms = jnp.asarray(rng.random((1, 96, 64, 1)), jnp.float32)
    want = jnp.where(
        (cms > nms_max_pool(cms)) & (cms > 0.3), cms, -jnp.inf
    )
    got = nms_scores_pallas(cms, 0.3, tile_h=32, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_pallas_paf_sampler_matches_gather():
    """Kernel target #2: one-hot MXU sampling == the arbitrary-index gather."""
    import numpy as np
    from sleap_nn_tpu.ops.pallas_kernels import paf_line_samples_pallas

    rng = np.random.default_rng(3)
    b, hp, wp, e, m = 2, 48, 64, 3, 50
    pafs = jnp.asarray(rng.normal(size=(b, hp, wp, 2 * e)), jnp.float32)
    xs = jnp.asarray(rng.integers(0, wp, (b, e, m)), jnp.int32)
    ys = jnp.asarray(rng.integers(0, hp, (b, e, m)), jnp.int32)
    got = paf_line_samples_pallas(pafs, xs, ys, interpret=True)
    b_idx = np.arange(b)[:, None, None]
    e_idx = np.arange(e)[None, :, None]
    want_x = np.asarray(pafs)[b_idx, np.asarray(ys), np.asarray(xs), 2 * e_idx]
    want_y = np.asarray(pafs)[b_idx, np.asarray(ys), np.asarray(xs), 2 * e_idx + 1]
    np.testing.assert_allclose(np.asarray(got[:, :, 0]), want_x, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got[:, :, 1]), want_y, atol=1e-6)


def test_pallas_dispatch_find_local_peaks(monkeypatch):
    """SLEAP_NN_TPU_PALLAS=1 routes find_local_peaks through the kernel with
    identical results to the XLA path."""
    import numpy as np
    from sleap_nn_tpu.ops.peaks import find_local_peaks

    rng = np.random.default_rng(4)
    cms = jnp.asarray(rng.random((2, 80, 72, 3)), jnp.float32)
    base = find_local_peaks(cms, threshold=0.6, refinement="integral", max_peaks=20)
    monkeypatch.setenv("SLEAP_NN_TPU_PALLAS", "1")
    fast = find_local_peaks(cms, threshold=0.6, refinement="integral", max_peaks=20)
    for a, b_ in zip(base, fast):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), equal_nan=True, atol=1e-6
        )


def test_pallas_dispatch_paf_scores(monkeypatch):
    """SLEAP_NN_TPU_PALLAS=1 routes PAF line scoring through the kernel with
    identical scores to the XLA gather path."""
    import numpy as np
    from sleap_nn_tpu.inference.paf_grouping import score_paf_lines_dense

    rng = np.random.default_rng(5)
    b, hp, wp, n_nodes, k, e = 2, 32, 40, 3, 4, 2
    pafs = jnp.asarray(rng.normal(size=(b, hp, wp, 2 * e)), jnp.float32)
    peaks = jnp.asarray(rng.uniform(0, wp * 4, (b, n_nodes, k, 2)), jnp.float32)
    mask = jnp.asarray(rng.random((b, n_nodes, k)) > 0.3)
    edges = jnp.asarray([[0, 1], [1, 2]], jnp.int32)
    base = score_paf_lines_dense(pafs, peaks, mask, edges)
    monkeypatch.setenv("SLEAP_NN_TPU_PALLAS", "1")
    fast = score_paf_lines_dense(pafs, peaks, mask, edges)
    np.testing.assert_allclose(np.asarray(base), np.asarray(fast), atol=1e-5)
