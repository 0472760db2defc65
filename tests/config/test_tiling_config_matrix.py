"""Tiling configuration + suggestion-math scenario matrix.

Reference scenario source: tests/config/test_tiling.py —
TilingConfig defaults/nesting, compute_backbone_context_margin,
compute_suggested_tile_size/overlap geometry rules. Targets
sleap_nn_tpu/config/data_config.py::TilingConfig and
config_generator/architecture_estimates.py (reference config/data_config.py:90,
config_generator :312/:344).
"""

from __future__ import annotations

import math

import pytest
pytestmark = pytest.mark.slow  # integration tier: real model builds / e2e flows


from sleap_nn_tpu.config.data_config import PreprocessingConfig, TilingConfig
from sleap_nn_tpu.config_generator import (
    compute_backbone_context_margin,
    compute_suggested_tile_overlap,
    compute_suggested_tile_size,
)
from sleap_nn_tpu.config_generator.architecture_estimates import (
    compute_receptive_field,
)


# -- TilingConfig schema ------------------------------------------------------


def test_tiling_defaults():
    t = TilingConfig()
    assert t.enabled is False
    assert t.tile_size is None and t.overlap is None
    assert t.min_overlap_fraction == 0.25
    assert t.blend == "gaussian"
    assert t.sigma_scale == 0.125
    assert t.accumulator_device == "auto"
    assert t.sampling == "foreground"
    assert t.tile_fg_fraction == 0.5
    assert t.min_visible_keypoints == 1
    assert t.full_frame_pass is False


def test_tiling_nested_on_preprocessing_default():
    p = PreprocessingConfig()
    assert isinstance(p.tiling, TilingConfig)
    assert p.tiling.enabled is False


def test_tiling_nested_factory_unique_per_instance():
    a, b = PreprocessingConfig(), PreprocessingConfig()
    a.tiling.tile_size = 256
    assert b.tiling.tile_size is None  # no shared mutable default


def test_tiling_all_valid_values_roundtrip():
    t = TilingConfig(enabled=True, tile_size=512, overlap=96,
                     min_overlap_fraction=0.3, blend="constant",
                     sigma_scale=0.2, tile_batch_size=4,
                     accumulator_device="cpu", cpu_thresh=0.5,
                     sampling="grid", tile_fg_fraction=0.8,
                     samples_per_frame=3, center_jitter=0.25,
                     min_visible_keypoints=2, steps_per_epoch=100,
                     full_frame_pass=True)
    assert t.tile_size == 512 and t.sampling == "grid"


# -- context margin -----------------------------------------------------------


def test_context_margin_is_half_receptive_field():
    for stride in (8, 16, 32):
        rf = compute_receptive_field(stride)
        assert compute_backbone_context_margin(stride) == rf // 2


def test_context_margin_grows_with_stride():
    margins = [compute_backbone_context_margin(s) for s in (8, 16, 32)]
    assert margins[0] < margins[1] < margins[2]


# -- suggested tile size ------------------------------------------------------


def test_tile_size_stride_aligned():
    for out_stride in (2, 4):
        size = compute_suggested_tile_size(90.0, max_stride=16,
                                           output_stride=out_stride)
        unit = max(16, out_stride)
        assert size % unit == 0


def test_tile_size_covers_object_plus_margin():
    bbox = 120.0
    size = compute_suggested_tile_size(bbox, max_stride=16, output_stride=2,
                                       max_tile=4096)
    margin = compute_backbone_context_margin(16)
    assert size >= 2.5 * bbox + 2 * margin


def test_tile_size_min_floor():
    size = compute_suggested_tile_size(4.0, max_stride=8, output_stride=2,
                                       min_tile=128)
    assert size >= 128


def test_tile_size_max_cap():
    size = compute_suggested_tile_size(5000.0, max_stride=16, output_stride=2,
                                       max_tile=1024)
    # capped then stride-aligned upward by at most one unit
    assert size <= 1024 + 16


def test_tile_size_monotonic_in_bbox():
    sizes = [compute_suggested_tile_size(b, 16, 2, max_tile=8192)
             for b in (50.0, 100.0, 200.0, 400.0)]
    assert sizes == sorted(sizes)
    assert sizes[0] < sizes[-1]


# -- suggested overlap --------------------------------------------------------


def test_overlap_covers_object_sigma_margin():
    bbox, sigma = 80.0, 5.0
    ov = compute_suggested_tile_overlap(bbox, max_stride=16, sigma=sigma)
    margin = compute_backbone_context_margin(16)
    assert ov >= bbox + 4 * sigma + margin - 1


def test_overlap_clamped_below_half_tile():
    ov = compute_suggested_tile_overlap(500.0, max_stride=16, tile_size=256)
    assert ov <= 128


def test_overlap_monotonic_in_bbox_until_clamp():
    ovs = [compute_suggested_tile_overlap(b, 16) for b in (40.0, 80.0, 160.0)]
    assert ovs == sorted(ovs) and ovs[0] < ovs[-1]


def test_tile_size_and_overlap_consistent_geometry():
    # A suggested (size, overlap) pair always leaves a positive stride.
    for bbox in (40.0, 120.0, 300.0):
        size = compute_suggested_tile_size(bbox, 16, 2)
        ov = compute_suggested_tile_overlap(bbox, 16, tile_size=size)
        assert 0 < ov < size


# ------------------------------------------- trainer geometry normalization


def _tiled_cfg(tmp_path, **tiling_over):
    from sleap_nn_tpu.config import TrainingJobConfig, apply_overrides
    from tests.fixture_utils import single_instance_fixture

    cfg = TrainingJobConfig()
    cfg.data_config.train_labels_path = [single_instance_fixture()]
    cfg.data_config.use_same_data_for_val = True
    cfg.data_config.use_augmentations_train = False
    cfg.data_config.preprocessing.scale = 0.5
    apply_overrides(cfg, {
        "model_config.backbone_config.unet.filters": 8,
        "model_config.backbone_config.unet.max_stride": 8,
        "model_config.backbone_config.unet.output_stride": 2,
        "model_config.head_configs.single_instance.confmaps.output_stride": 2,
        "data_config.preprocessing.tiling.enabled": True,
        **{f"data_config.preprocessing.tiling.{k}": v
           for k, v in tiling_over.items()},
    })
    cfg.trainer_config.max_epochs = 1
    cfg.trainer_config.save_ckpt = False
    cfg.trainer_config.enable_progress_bar = False
    return cfg


def _setup(cfg):
    from sleap_nn_tpu.training import ModelTrainer

    t = ModelTrainer.get_model_trainer_from_config(cfg)
    t.setup()
    return t


def test_tile_size_rounds_up_to_stride_and_warns(tmp_path, capsys):
    cfg = _tiled_cfg(tmp_path, tile_size=100, overlap=32)
    _setup(cfg)
    out = capsys.readouterr().out
    assert "rounded up to 104" in out
    assert cfg.data_config.preprocessing.tiling.tile_size == 104


def test_overlap_rounds_up_to_output_stride(tmp_path, capsys):
    cfg = _tiled_cfg(tmp_path, tile_size=128, overlap=33)
    _setup(cfg)
    assert cfg.data_config.preprocessing.tiling.overlap == 34
    assert "rounded up to 34" in capsys.readouterr().out


def test_overlap_raised_to_min_fraction_floor(tmp_path, capsys):
    cfg = _tiled_cfg(tmp_path, tile_size=128, overlap=4,
                     min_overlap_fraction=0.25)
    _setup(cfg)
    assert cfg.data_config.preprocessing.tiling.overlap == 32
    assert "min_overlap_fraction floor" in capsys.readouterr().out


def test_overlap_ge_tile_size_raises(tmp_path):
    import pytest

    cfg = _tiled_cfg(tmp_path, tile_size=64, overlap=64,
                     min_overlap_fraction=0.0)
    with pytest.raises(ValueError, match="smaller than"):
        _setup(cfg)


def test_tile_size_none_raises(tmp_path):
    import pytest

    cfg = _tiled_cfg(tmp_path, overlap=16)
    with pytest.raises(ValueError, match="tile_size"):
        _setup(cfg)


def test_valid_geometry_unchanged(tmp_path, capsys):
    cfg = _tiled_cfg(tmp_path, tile_size=128, overlap=32)
    _setup(cfg)
    t = cfg.data_config.preprocessing.tiling
    assert (t.tile_size, t.overlap) == (128, 32)
    assert "WARNING" not in capsys.readouterr().out
