"""Tiling-primitive edge matrix.

Parity target: reference tests/data/test_tiling_primitives.py —
foreground-center NaN handling, draw_tile_origin slot/jitter/uniform
rules, extract_tile boundary cases, sampler block/epoch/DDP behavior —
against sleap_nn_tpu/data/tiling.py.
"""

from __future__ import annotations

import numpy as np
import pytest

from sleap_nn_tpu.data.tiling import (
    FrameGroupedTileSampler,
    draw_tile_origin,
    extract_tile,
    frame_foreground_centers,
    tile_sample_seed,
)


# ------------------------------------------------- frame_foreground_centers


def test_fg_centers_drop_instances_below_min_visible():
    inst = np.array([
        [[10.0, 10.0], [20.0, 20.0]],
        [[np.nan, np.nan], [30.0, 30.0]],   # only 1 visible point
    ])
    out = frame_foreground_centers(inst, min_visible_keypoints=2)
    assert out.shape == (1, 2)
    np.testing.assert_allclose(out[0], [15.0, 15.0])


def test_fg_centers_all_nan_gives_empty_with_shape():
    inst = np.full((2, 3, 2), np.nan)
    out = frame_foreground_centers(inst)
    assert out.shape == (0, 2)


def test_fg_centers_centroid_is_nanmean():
    inst = np.array([[[10.0, 0.0], [np.nan, np.nan], [20.0, 10.0]]])
    out = frame_foreground_centers(inst, min_visible_keypoints=1)
    np.testing.assert_allclose(out[0], [15.0, 5.0])


def test_fg_centers_min_visible_floor_is_one():
    inst = np.array([[[10.0, 10.0], [np.nan, np.nan]]])
    out = frame_foreground_centers(inst, min_visible_keypoints=0)
    assert out.shape == (1, 2)


# -------------------------------------------------------- draw_tile_origin


def _draw(centers, sample_k, rng=None, **kw):
    args = dict(
        frame_hw=(512, 512), tile_size=128, samples_per_frame=4,
        tile_fg_fraction=0.5, center_jitter=0.25,
        rng=rng or np.random.default_rng(0),
    )
    args.update(kw)
    return draw_tile_origin(np.asarray(centers, float).reshape(-1, 2),
                            sample_k=sample_k, **args)


def test_force_fg_slot_rule():
    """With fg_fraction=0.5 of 4 samples, slots 2-3 are fg-forced."""
    centers = [(256.0, 256.0)]
    for k in (2, 3):
        y0, x0 = _draw(centers, k, rng=np.random.default_rng(1),
                       center_jitter=0.0)
        # fg draw centers the tile on the instance.
        assert (y0, x0) == (256 - 64, 256 - 64)


def test_uniform_slots_stay_in_clamp_range():
    centers = [(256.0, 256.0)]
    for k in (0, 1):  # uniform slots
        for seed in range(5):
            y0, x0 = _draw(centers, k, rng=np.random.default_rng(seed))
            assert 0 <= y0 <= 512 - 128
            assert 0 <= x0 <= 512 - 128


def test_fg_draw_within_jitter_bound():
    centers = [(256.0, 256.0)]
    for seed in range(10):
        y0, x0 = _draw(centers, 3, rng=np.random.default_rng(seed),
                       center_jitter=0.25)
        # |origin - (center - tile/2)| <= jitter * tile/2 (+ rounding).
        assert abs(y0 - (256 - 64)) <= 0.25 * 64 + 1
        assert abs(x0 - (256 - 64)) <= 0.25 * 64 + 1


def test_pos_ratio_zero_forces_uniform():
    centers = [(256.0, 256.0)]
    draws = {
        _draw(centers, 3, rng=np.random.default_rng(s), pos_ratio=0.0,
              center_jitter=0.0)
        for s in range(8)
    }
    # A forced-fg draw with zero jitter would always be (192, 192);
    # pos_ratio=0 must fall back to uniform draws instead.
    assert len(draws) > 1


def test_empty_centers_forces_uniform():
    y0, x0 = _draw(np.zeros((0, 2)), 3)
    assert 0 <= y0 <= 512 - 128 and 0 <= x0 <= 512 - 128


def test_draw_deterministic_with_seeded_rng():
    centers = [(100.0, 200.0), (300.0, 400.0)]
    a = _draw(centers, 3, rng=np.random.default_rng(42))
    b = _draw(centers, 3, rng=np.random.default_rng(42))
    assert a == b


# ------------------------------------------------------------ extract_tile


def test_extract_interior_tile_byte_identical():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (64, 64, 1), np.uint8)
    inst = np.full((1, 2, 2), np.nan, np.float32)
    tile, _ = extract_tile(img, inst, (10, 20), 16)
    np.testing.assert_array_equal(tile, img[10:26, 20:36])


def test_extract_negative_origin_zero_pads_topleft():
    img = np.full((32, 32, 1), 7, np.uint8)
    inst = np.full((1, 1, 2), np.nan, np.float32)
    tile, _ = extract_tile(img, inst, (-8, -8), 16)
    assert (tile[:8, :, 0] == 0).all() and (tile[:, :8, 0] == 0).all()
    assert (tile[8:, 8:, 0] == 7).all()


def test_extract_overflow_origin_zero_pads_bottomright():
    img = np.full((32, 32, 1), 9, np.uint8)
    inst = np.full((1, 1, 2), np.nan, np.float32)
    tile, _ = extract_tile(img, inst, (24, 24), 16)
    assert (tile[:8, :8, 0] == 9).all()
    assert (tile[8:, :, 0] == 0).all() and (tile[:, 8:, 0] == 0).all()


def test_extract_fully_out_of_bounds_is_all_zero():
    img = np.full((32, 32, 1), 5, np.uint8)
    inst = np.full((1, 1, 2), np.nan, np.float32)
    tile, _ = extract_tile(img, inst, (100, 100), 16)
    assert (tile == 0).all()


def test_extract_shifts_instances_to_tile_frame_and_nans_oob():
    img = np.zeros((64, 64, 1), np.uint8)
    inst = np.array([[[25.0, 15.0], [60.0, 60.0]]], np.float32)
    tile, pts = extract_tile(img, inst, (10, 20), 16, min_visible_keypoints=1)
    np.testing.assert_allclose(pts[0, 0], [5.0, 5.0])
    assert np.isnan(pts[0, 1]).all()


def test_extract_min_visible_nans_whole_instance():
    img = np.zeros((64, 64, 1), np.uint8)
    inst = np.array([[[25.0, 15.0], [60.0, 60.0]]], np.float32)
    _, pts = extract_tile(img, inst, (10, 20), 16, min_visible_keypoints=2)
    assert np.isnan(pts).all()


# -------------------------------------------------------- tile_sample_seed


def test_seed_deterministic_and_varies_per_field():
    base = tile_sample_seed(1, "frame0", 0, 0)
    assert tile_sample_seed(1, "frame0", 0, 0) == base
    assert tile_sample_seed(2, "frame0", 0, 0) != base
    assert tile_sample_seed(1, "frame1", 0, 0) != base
    assert tile_sample_seed(1, "frame0", 1, 0) != base
    assert tile_sample_seed(1, "frame0", 0, 1) != base


# ---------------------------------------------------------------- sampler


def _blocks(pairs, samples_per_frame):
    """Group the (frame, k) stream into consecutive frame blocks."""
    out = []
    for i in range(0, len(pairs), samples_per_frame):
        chunk = pairs[i:i + samples_per_frame]
        assert len({f for f, _ in chunk}) == 1, "block split across frames"
        assert [k for _, k in chunk] == list(range(samples_per_frame))
        out.append(chunk[0][0])
    return out


def test_sampler_blocks_stay_contiguous_under_shuffle():
    s = FrameGroupedTileSampler(10, 3, shuffle=True, seed=7)
    pairs = list(s)
    frames = _blocks(pairs, 3)
    assert sorted(frames) == list(range(10))


def test_sampler_len_matches_iteration():
    s = FrameGroupedTileSampler(10, 3)
    assert len(list(s)) == len(s) == 30


def test_sampler_set_epoch_changes_order():
    s = FrameGroupedTileSampler(20, 2, shuffle=True, seed=0)
    s.set_epoch(0)
    first = list(s)
    s.set_epoch(1)
    second = list(s)
    assert first != second
    assert sorted(first) == sorted(second)


def test_sampler_no_shuffle_is_sequential():
    s = FrameGroupedTileSampler(4, 2, shuffle=False)
    assert _blocks(list(s), 2) == [0, 1, 2, 3]


def test_sampler_ddp_disjoint_and_covers_all_frames():
    n, spf, world = 10, 2, 3
    seen = []
    for rank in range(world):
        s = FrameGroupedTileSampler(n, spf, shuffle=True, seed=5,
                                    num_replicas=world, rank=rank)
        seen.append(set(_blocks(list(s), spf)))
    assert set().union(*seen) == set(range(n))
    for a in range(world):
        for b in range(a + 1, world):
            assert not (seen[a] & seen[b])
