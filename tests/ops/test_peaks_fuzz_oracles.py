"""Randomized oracle tests: peak finding vs hand-written numpy references.

Parity strategy: instead of porting the reference's fixture replays (those
exist in test_peaks_reference_fixture.py), fuzz random confmaps and check
the jitted TPU-shaped kernels against brute-force numpy oracles — global
argmax, strict 8-neighborhood local maxima, and integral refinement's
patch-weighted offset.
"""

from __future__ import annotations

import numpy as np
import pytest

from sleap_nn_tpu.ops.peaks import (
    find_global_peaks,
    find_global_peaks_rough,
    find_local_peaks_rough,
)


def _rand_cms(rng, b=3, h=24, w=20, c=2):
    return rng.uniform(0, 1, (b, h, w, c)).astype(np.float32)


@pytest.mark.parametrize("seed", range(5))
def test_global_rough_matches_argmax_oracle(seed):
    rng = np.random.default_rng(seed)
    cms = _rand_cms(rng)
    pts, vals = map(np.asarray, find_global_peaks_rough(cms, threshold=0.0))
    for b in range(cms.shape[0]):
        for ch in range(cms.shape[-1]):
            flat = cms[b, :, :, ch]
            y, x = np.unravel_index(flat.argmax(), flat.shape)
            assert pts[b, ch, 0] == x and pts[b, ch, 1] == y
            assert vals[b, ch] == pytest.approx(flat.max())


@pytest.mark.parametrize("seed", range(3))
def test_global_threshold_nans_weak_channels(seed):
    rng = np.random.default_rng(seed)
    cms = _rand_cms(rng) * 0.4  # every max < 0.5
    cms[0, 5, 6, 0] = 0.9  # one strong channel
    pts, vals = map(np.asarray, find_global_peaks_rough(cms, threshold=0.5))
    assert pts[0, 0, 0] == 6 and pts[0, 0, 1] == 5
    weak = np.ones(cms.shape[:1] + cms.shape[-1:], bool)
    weak[0, 0] = False
    assert np.isnan(pts[..., 0][weak]).all()
    assert (vals[weak] == 0).all()


def _local_maxima_oracle(cm, threshold):
    """Strict 8-neighborhood maxima above threshold (brute force)."""
    h, w = cm.shape
    out = []
    for y in range(h):
        for x in range(w):
            v = cm[y, x]
            if v <= threshold:
                continue
            neigh = cm[max(y - 1, 0):y + 2, max(x - 1, 0):x + 2]
            if v == neigh.max() and (neigh == v).sum() == 1:
                out.append((x, y, v))
    return out


@pytest.mark.parametrize("seed", range(5))
def test_local_rough_matches_neighborhood_oracle(seed):
    rng = np.random.default_rng(100 + seed)
    cms = _rand_cms(rng, b=2, h=16, w=16, c=1)
    pts, vals, ch, valid = map(
        np.asarray, find_local_peaks_rough(cms, threshold=0.6, max_peaks=50)
    )
    for b in range(cms.shape[0]):
        got = {
            (int(pts[b, i, 0]), int(pts[b, i, 1]))
            for i in range(pts.shape[1]) if valid[b, i]
        }
        want = {(x, y) for x, y, _ in _local_maxima_oracle(cms[b, :, :, 0], 0.6)}
        assert got == want, (b, got ^ want)


def test_local_rough_topk_keeps_strongest():
    cms = np.zeros((1, 16, 16, 1), np.float32)
    peaks = [(2, 2, 0.9), (8, 8, 0.8), (12, 4, 0.7), (4, 12, 0.6)]
    for x, y, v in peaks:
        cms[0, y, x, 0] = v
    pts, vals, _, valid = map(
        np.asarray, find_local_peaks_rough(cms, threshold=0.1, max_peaks=2)
    )
    kept = {(int(pts[0, i, 0]), int(pts[0, i, 1]))
            for i in range(2) if valid[0, i]}
    assert kept == {(2, 2), (8, 8)}


@pytest.mark.parametrize("seed", range(3))
def test_integral_refinement_matches_patch_oracle(seed):
    """Integral refinement = intensity-weighted offset over the local patch."""
    rng = np.random.default_rng(200 + seed)
    # A smooth blob so the refinement stays inside the patch.
    h = w = 21
    cy, cx = rng.uniform(8, 12), rng.uniform(8, 12)
    yy, xx = np.mgrid[0:h, 0:w]
    cm = np.exp(-(((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * 2.0**2))).astype(
        np.float32
    )[None, :, :, None]
    pts, _ = map(np.asarray, find_global_peaks(
        cm, threshold=0.1, refinement="integral", integral_patch_size=5
    ))
    # Gaussian blob: refinement must land within half a pixel of the true
    # subpixel center (the rough argmax alone can be off by up to 0.5).
    assert abs(pts[0, 0, 0] - cx) < 0.5
    assert abs(pts[0, 0, 1] - cy) < 0.5
    # And it must IMPROVE on the integer argmax whenever they differ.
    rough, _ = map(np.asarray, find_global_peaks_rough(cm, threshold=0.1))
    err_ref = np.hypot(pts[0, 0, 0] - cx, pts[0, 0, 1] - cy)
    err_rough = np.hypot(rough[0, 0, 0] - cx, rough[0, 0, 1] - cy)
    assert err_ref <= err_rough + 1e-6
