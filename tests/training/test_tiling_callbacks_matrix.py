"""Tiling primitives + training callbacks matrix.

Reference scenario sources: tests/data/test_tiling_primitives.py (grid
snapping, fg-biased draws, halo extraction OOB handling) and
tests/training/test_callbacks.py (CSV schema growth, early stopping,
evaluation cadence).
"""

from __future__ import annotations

import csv
from types import SimpleNamespace

import numpy as np
import pytest

from sleap_nn_tpu.data.tiling import (
    draw_tile_origin,
    extract_tile,
    frame_foreground_centers,
    generate_tile_grid,
    tile_sample_seed,
)
from sleap_nn_tpu.training.callbacks import (
    CSVLoggerCallback,
    EarlyStopping,
)


# ── tile grid ────────────────────────────────────────────────────────────────


def test_tile_grid_small_image_single_tile():
    assert generate_tile_grid((64, 64), tile_size=128, overlap=0,
                              output_stride=2) == [(0, 0)]


def test_tile_grid_covers_image_to_the_edge():
    grid = generate_tile_grid((200, 300), tile_size=128, overlap=16,
                              output_stride=2, max_stride=16)
    ys = sorted({y for y, _ in grid})
    xs = sorted({x for _, x in grid})
    assert ys[0] == 0 and xs[0] == 0
    # the last tile reaches the bottom/right edge
    assert ys[-1] + 128 >= 200 and xs[-1] + 128 >= 300
    # origins snapped to the output stride
    assert all(y % 2 == 0 and x % 2 == 0 for y, x in grid)


def test_tile_grid_row_major_order():
    grid = generate_tile_grid((256, 256), tile_size=128, overlap=0,
                              output_stride=2)
    assert grid[0] == (0, 0)
    assert grid[1][0] == 0  # second tile is in the first row


def test_tile_grid_min_overlap_fraction_binds():
    few = generate_tile_grid((512, 128), tile_size=128, overlap=0,
                             output_stride=2, min_overlap_fraction=0.0)
    more = generate_tile_grid((512, 128), tile_size=128, overlap=0,
                              output_stride=2, min_overlap_fraction=0.5)
    assert len(more) > len(few)


def test_tile_seed_deterministic_and_distinct():
    a = tile_sample_seed(7, "v0|f3", 0, 1)
    assert a == tile_sample_seed(7, "v0|f3", 0, 1)
    assert a != tile_sample_seed(7, "v0|f3", 1, 1)
    assert a != tile_sample_seed(7, "v0|f3", 0, 2)
    assert a != tile_sample_seed(8, "v0|f3", 0, 1)


def test_foreground_centers_visibility_threshold():
    inst = np.array([
        [[10.0, 10.0], [12.0, 12.0]],
        [[50.0, 50.0], [np.nan, np.nan]],
    ])
    both = frame_foreground_centers(inst, min_visible_keypoints=1)
    assert both.shape == (2, 2)
    strict = frame_foreground_centers(inst, min_visible_keypoints=2)
    assert strict.shape == (1, 2)
    np.testing.assert_allclose(strict[0], [11.0, 11.0])


def test_draw_tile_origin_fg_biased_centers_near_instance():
    rng = np.random.default_rng(0)
    centers = np.array([[100.0, 120.0]])
    ys, xs = [], []
    for k in range(20):
        y0, x0 = draw_tile_origin(centers, (512, 512), tile_size=64,
                                  sample_k=k, samples_per_frame=20,
                                  tile_fg_fraction=1.0, center_jitter=0.0,
                                  rng=rng)
        ys.append(y0)
        xs.append(x0)
    # fg_fraction 1.0, no jitter: every draw centers the tile on the instance
    assert set(ys) == {120 - 32} and set(xs) == {100 - 32}


def test_draw_tile_origin_uniform_when_no_centers():
    rng = np.random.default_rng(0)
    pts = {draw_tile_origin(np.zeros((0, 2)), (256, 256), 64, 0, 4, 1.0,
                            0.0, rng) for _ in range(10)}
    assert len(pts) > 3  # spread out


def test_extract_tile_interior_content_and_local_coords():
    img = np.arange(64 * 64, dtype=np.uint8).reshape(64, 64, 1)
    inst = np.array([[[20.0, 24.0], [60.0, 60.0]]])
    tile, pts = extract_tile(img, inst, (16, 16), 32)
    np.testing.assert_array_equal(tile[..., 0], img[16:48, 16:48, 0])
    np.testing.assert_allclose(pts[0, 0], [4.0, 8.0])  # shifted local
    assert np.isnan(pts[0, 1]).all()  # outside the tile


def test_extract_tile_negative_origin_zero_pads():
    img = np.full((32, 32, 1), 9, np.uint8)
    tile, _ = extract_tile(img, np.zeros((1, 1, 2)), (-8, -8), 16)
    assert tile[0, 0, 0] == 0  # padded corner
    assert tile[12, 12, 0] == 9  # real content


def test_extract_tile_min_visible_blanks_instance():
    img = np.zeros((64, 64, 1), np.uint8)
    inst = np.array([[[5.0, 5.0], [200.0, 200.0]]])  # 1 of 2 visible in tile
    _, pts = extract_tile(img, inst, (0, 0), 32, min_visible_keypoints=2)
    assert np.isnan(pts).all()


# ── callbacks ────────────────────────────────────────────────────────────────


def _trainer():
    return SimpleNamespace(should_stop=False)


def test_csv_logger_schema_grows_with_new_keys(tmp_path):
    p = tmp_path / "log.csv"
    cb = CSVLoggerCallback(p)
    t = _trainer()
    cb.on_epoch_end(t, 0, {"train/loss": 0.5})
    cb.on_epoch_end(t, 1, {"train/loss": 0.4, "val/oks": 0.9})
    rows = list(csv.DictReader(open(p)))
    assert rows[0]["epoch"] == "0"
    assert rows[0]["val/oks"] == ""   # backfilled empty for earlier epochs
    assert rows[1]["val/oks"] == "0.9"


def test_csv_logger_fixed_keys_stable(tmp_path):
    p = tmp_path / "log.csv"
    cb = CSVLoggerCallback(p, keys=["epoch", "train/loss"])
    cb.on_epoch_end(_trainer(), 0, {"train/loss": 0.5, "surprise": 1.0})
    header = open(p).readline().strip().split(",")
    assert header == ["epoch", "train/loss"]


def test_early_stopping_sets_should_stop_after_patience():
    cb = EarlyStopping(patience=2, min_delta=0.0)
    t = _trainer()
    cb.on_epoch_end(t, 0, {"val/loss": 1.0})
    cb.on_epoch_end(t, 1, {"val/loss": 1.0})
    assert not t.should_stop
    cb.on_epoch_end(t, 2, {"val/loss": 1.0})
    assert t.should_stop


def test_early_stopping_improvement_resets():
    cb = EarlyStopping(patience=2, min_delta=0.0)
    t = _trainer()
    cb.on_epoch_end(t, 0, {"val/loss": 1.0})
    cb.on_epoch_end(t, 1, {"val/loss": 1.0})
    cb.on_epoch_end(t, 2, {"val/loss": 0.5})  # improvement
    cb.on_epoch_end(t, 3, {"val/loss": 0.6})
    assert not t.should_stop


def test_early_stopping_min_delta_counts_tiny_gains_as_plateau():
    cb = EarlyStopping(patience=1, min_delta=0.1)
    t = _trainer()
    cb.on_epoch_end(t, 0, {"val/loss": 1.0})
    cb.on_epoch_end(t, 1, {"val/loss": 0.95})  # below min_delta: plateau
    assert t.should_stop


def test_early_stopping_disabled_never_stops():
    cb = EarlyStopping(patience=0, enabled=False)
    t = _trainer()
    for e in range(5):
        cb.on_epoch_end(t, e, {"val/loss": 1.0})
    assert not t.should_stop


def test_early_stopping_missing_monitor_ignored():
    cb = EarlyStopping(patience=1)
    t = _trainer()
    cb.on_epoch_end(t, 0, {"train/loss": 1.0})
    cb.on_epoch_end(t, 1, {"train/loss": 1.0})
    assert not t.should_stop


# ── export metadata ──────────────────────────────────────────────────────────


def test_export_metadata_json_roundtrip():
    from sleap_nn_tpu.export.exporter import ExportMetadata

    meta = ExportMetadata(
        model_type="single_instance", input_shape=(2, 64, 64, 1),
        input_dtype="uint8", output_names=("pred_keypoints",),
        artifact="model.stablehlo", artifact_sha256="ab" * 32,
        skeleton_nodes=("A", "B"), skeleton_edges=((0, 1),),
        peak_threshold=0.3,
    )
    again = ExportMetadata.from_json(meta.to_json())
    assert again.model_type == "single_instance"
    assert tuple(again.input_shape) == (2, 64, 64, 1)
    assert tuple(again.skeleton_nodes) == ("A", "B")
    assert again.peak_threshold == 0.3
