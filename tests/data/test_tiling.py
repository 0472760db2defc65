"""Tiling primitives + tiled inference merging tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from sleap_nn_tpu.data.tiling import (
    FrameGroupedTileSampler,
    draw_tile_origin,
    extract_tile,
    frame_foreground_centers,
    generate_tile_grid,
    tile_sample_seed,
)
from sleap_nn_tpu.inference.tile_merger import build_importance_window, merge_tiles


def test_generate_tile_grid_covers_image():
    origins = generate_tile_grid((100, 150), tile_size=64, overlap=16, output_stride=4)
    assert all(y % 4 == 0 and x % 4 == 0 for y, x in origins)
    # Far edges covered up to the stride-snap remainder (< output_stride),
    # matching reference semantics (tiles never overrun the frame).
    ys = [y for y, _ in origins]
    xs = [x for _, x in origins]
    assert max(ys) + 64 >= 100 - 3 and max(ys) <= 100 - 64
    assert max(xs) + 64 >= 150 - 3 and max(xs) <= 150 - 64
    # Row-major ordering.
    assert origins == sorted(origins, key=lambda o: (o[0], o[1]))


def test_generate_tile_grid_small_image():
    assert generate_tile_grid((32, 32), tile_size=64, overlap=16, output_stride=4) == [(0, 0)]


def test_min_overlap_enforced():
    origins = generate_tile_grid((256, 256), 64, overlap=0, output_stride=2,
                                 min_overlap_fraction=0.5)
    ys = sorted({y for y, _ in origins})
    steps = np.diff(ys)
    assert (steps <= 32).all()  # step <= tile - 0.5*tile


def test_tile_sample_seed_deterministic():
    a = tile_sample_seed(1, "v0/f3", 2, 7)
    assert a == tile_sample_seed(1, "v0/f3", 2, 7)
    assert a != tile_sample_seed(1, "v0/f3", 2, 8)
    assert a != tile_sample_seed(1, "v0/f4", 2, 7)


def test_draw_tile_origin_fg_bias():
    centers = np.array([[100.0, 80.0]])
    rng = np.random.default_rng(0)
    # Foreground slot (last slot of 4 with fraction 0.5 -> slots 2,3 are fg).
    y0, x0 = draw_tile_origin(centers, (200, 200), 64, sample_k=3,
                              samples_per_frame=4, tile_fg_fraction=0.5,
                              center_jitter=0.0, rng=rng)
    assert (y0, x0) == (80 - 32, 100 - 32)
    # Background slot: uniform draw in-bounds.
    y0, x0 = draw_tile_origin(centers, (200, 200), 64, sample_k=0,
                              samples_per_frame=4, tile_fg_fraction=0.5,
                              center_jitter=0.0, rng=rng)
    assert 0 <= y0 <= 136 and 0 <= x0 <= 136


def test_extract_tile_padding_and_instances():
    img = np.arange(40 * 40 * 1, dtype=np.uint8).reshape(40, 40, 1)
    inst = np.array([[[10.0, 12.0], [35.0, 38.0]]])
    tile, pts = extract_tile(img, inst, (-8, 4), 32)
    assert tile.shape == (32, 32, 1)
    assert (tile[:8] == 0).all()  # zero-padded above frame
    np.testing.assert_array_equal(tile[8, 0], img[0, 4])
    # First point inside: shifted coords; second outside -> NaN.
    np.testing.assert_allclose(pts[0, 0], [6.0, 20.0])
    assert np.isnan(pts[0, 1]).all()


def test_extract_tile_min_visible():
    img = np.zeros((40, 40, 1), np.uint8)
    inst = np.array([[[2.0, 2.0], [200.0, 200.0]]])
    _, pts = extract_tile(img, inst, (0, 0), 32, min_visible_keypoints=2)
    assert np.isnan(pts).all()  # only 1 visible < 2 -> dropped entirely


def test_frame_grouped_sampler_sharding():
    s0 = FrameGroupedTileSampler(10, 3, seed=5, num_replicas=2, rank=0)
    s1 = FrameGroupedTileSampler(10, 3, seed=5, num_replicas=2, rank=1)
    s0.set_epoch(2)
    s1.set_epoch(2)
    i0, i1 = list(s0), list(s1)
    frames0 = {f for f, _ in i0}
    frames1 = {f for f, _ in i1}
    assert frames0 & frames1 == set()  # disjoint frame assignment
    assert frames0 | frames1 == set(range(10))
    # Each frame's tiles contiguous.
    ks = [k for _, k in i0[:3]]
    assert ks == [0, 1, 2]


def test_importance_window_modes():
    for mode in ("gaussian", "pyramid", "constant"):
        w = np.asarray(build_importance_window((16, 16), mode))
        assert w.shape == (16, 16)
        assert 0.9 <= w.max() <= 1.0  # even-sized windows have no exact center pixel
        assert w.min() >= 1e-3
    with pytest.raises(ValueError):
        build_importance_window((8, 8), "bogus")


def test_merge_tiles_constant_recovers_signal():
    # Two overlapping tiles of a constant field must merge back to it exactly.
    canvas_hw = (32, 48)
    field = np.random.default_rng(0).uniform(size=(32, 48, 2)).astype(np.float32)
    origins = [(0, 0), (0, 16), (0, 32 - 16)]
    th = tw = 32
    tiles = []
    ok_origins = [(0, 0), (0, 16)]
    tiles = np.stack([field[y:y+th, x:x+tw] for (y, x) in ok_origins])
    w = build_importance_window((th, tw), "gaussian")
    merged = np.asarray(merge_tiles(jnp.asarray(tiles), jnp.asarray(ok_origins), canvas_hw, w))
    np.testing.assert_allclose(merged, field, atol=1e-5)
