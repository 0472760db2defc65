"""Tile-merger blend matrix: windows, overlap normalization, seams.

Parity target: reference sleap_nn/inference/tile_merger.py behaviors
(importance window modes, accumulate/normalize identity on constant
signals, seam continuity in overlaps, clip-at-border handling), against
sleap_nn_tpu/inference/tile_merger.py.
"""

from __future__ import annotations

import numpy as np
import pytest

from sleap_nn_tpu.inference.tile_merger import build_importance_window, merge_tiles


# -------------------------------------------------------- importance window


def test_gaussian_window_peaks_center_unity():
    w = np.asarray(build_importance_window((17, 17), "gaussian"))
    assert w.max() == pytest.approx(1.0, abs=1e-6)
    assert np.unravel_index(w.argmax(), w.shape) == (8, 8)
    # Monotone decay toward edges along the center row.
    row = w[8]
    assert np.all(np.diff(row[:9]) >= -1e-7)
    assert np.all(np.diff(row[8:]) <= 1e-7)


def test_pyramid_window_linear_ramp():
    w = np.asarray(build_importance_window((8, 8), "pyramid"))
    assert w.max() == pytest.approx(1.0)
    # Symmetric under flips.
    np.testing.assert_allclose(w, w[::-1], atol=1e-6)
    np.testing.assert_allclose(w, w[:, ::-1], atol=1e-6)


def test_constant_window_is_ones():
    w = np.asarray(build_importance_window((6, 9), "constant"))
    np.testing.assert_allclose(w, 1.0)


def test_unknown_window_mode_raises():
    with pytest.raises(ValueError, match="Unknown importance window"):
        build_importance_window((8, 8), "hann")


def test_window_floor_prevents_zero_weights():
    w = np.asarray(build_importance_window((64, 64), "gaussian",
                                           sigma_scale=0.02))
    assert w.min() >= 1e-3  # corners never hit zero -> no divide blowups


def test_sigma_scale_controls_spread():
    tight = np.asarray(build_importance_window((33, 33), "gaussian", 0.05))
    wide = np.asarray(build_importance_window((33, 33), "gaussian", 0.5))
    assert tight[16, 0] < wide[16, 0]


# --------------------------------------------------------------- merging


def _merge(tiles, origins, hw, mode="gaussian"):
    window = build_importance_window(tiles.shape[1:3], mode)
    return np.asarray(merge_tiles(
        np.asarray(tiles, np.float32), np.asarray(origins, np.int32),
        hw, window,
    ))


def test_single_tile_identity():
    rng = np.random.default_rng(0)
    tile = rng.uniform(size=(1, 16, 16, 2)).astype(np.float32)
    out = _merge(tile, [[0, 0]], (16, 16))
    np.testing.assert_allclose(out, tile[0], atol=1e-5)


@pytest.mark.parametrize("mode", ["gaussian", "pyramid", "constant"])
def test_constant_signal_recovered_exactly_in_overlap(mode):
    # Two overlapping tiles both reading the constant value 3 must merge
    # to exactly 3 everywhere (weights normalize out).
    tiles = np.full((2, 16, 16, 1), 3.0, np.float32)
    out = _merge(tiles, [[0, 0], [0, 8]], (16, 24), mode)
    np.testing.assert_allclose(out, 3.0, atol=1e-5)


def test_overlap_blends_toward_inner_tile():
    # Tile A reads 0, tile B reads 1; in B's center region the merged value
    # must be pulled toward 1 (B's window dominates there).
    tiles = np.stack([
        np.zeros((16, 16, 1), np.float32),
        np.ones((16, 16, 1), np.float32),
    ])
    out = _merge(tiles, [[0, 0], [0, 8]], (16, 24))
    assert out[8, 15, 0] > 0.5   # deep inside B
    assert out[8, 2, 0] < 0.2    # far from B
    # Weighted blend stays within the convex hull of inputs.
    assert out.min() >= -1e-6 and out.max() <= 1 + 1e-6


def test_seam_is_smooth_for_smooth_signal():
    # A linear ramp split into two tiles must merge back without a seam jump.
    ramp = np.tile(np.linspace(0, 1, 24, dtype=np.float32)[None, :, None],
                   (16, 1, 1))
    tiles = np.stack([ramp[:, :16], ramp[:, 8:]])
    out = _merge(tiles, [[0, 0], [0, 8]], (16, 24))
    np.testing.assert_allclose(out[:, :, 0], ramp[:, :, 0], atol=1e-4)
    d = np.abs(np.diff(out[8, :, 0]))
    assert d.max() < 0.06  # no seam discontinuity


def test_uncovered_canvas_stays_zero():
    tiles = np.ones((1, 8, 8, 1), np.float32)
    out = _merge(tiles, [[0, 0]], (16, 16))
    assert out[:8, :8].min() == pytest.approx(1.0)
    assert out[9:, 9:].max() == 0.0


def test_border_clipped_tile_does_not_wrap():
    # A tile whose extent passes the canvas edge clips there (index clamp),
    # never wrapping to the far side.
    tiles = np.ones((1, 8, 8, 1), np.float32)
    out = _merge(tiles, [[12, 12]], (16, 16))
    assert out[0, 0, 0] == 0.0
    assert out[15, 15, 0] == pytest.approx(1.0)
