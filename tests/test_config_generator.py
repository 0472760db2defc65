"""Config generator tests on the real fixture."""

import numpy as np
import pytest

from sleap_nn_tpu.config import verify_training_cfg, get_model_type_from_cfg
from sleap_nn_tpu.config_generator import (
    analyze_slp,
    compute_max_stride_for_animal_size,
    compute_receptive_field,
    compute_suggested_tile_overlap,
    compute_suggested_tile_size,
    estimate_memory,
    generate_config,
    recommend_config,
    recommend_pipeline,
)

FIXTURE = "/root/reference/tests/assets/datasets/minimal_instance.pkg.slp"


def test_analyze_slp():
    stats = analyze_slp(FIXTURE)
    assert stats.num_labeled_frames == 1
    assert stats.max_height == 384 and stats.max_width == 384
    assert stats.num_channels == 1
    assert stats.max_instances_per_frame == 2
    assert stats.node_names == ["A", "B"]
    assert stats.num_edges == 1
    assert stats.max_bbox_size > 0
    assert 0 <= stats.overlap_frequency <= 1


def test_recommend_pipeline_branches():
    stats = analyze_slp(FIXTURE)
    rec = recommend_pipeline(stats)
    assert rec.pipeline in ("topdown", "bottomup")  # 2 instances, untracked

    stats.max_instances_per_frame = 1
    assert recommend_pipeline(stats).pipeline == "single_instance"

    stats.max_instances_per_frame = 3
    stats.has_tracks = True
    stats.num_tracks = 3
    stats.overlap_frequency = 0.0
    assert recommend_pipeline(stats).pipeline == "multi_class_topdown"
    stats.overlap_frequency = 0.5
    assert recommend_pipeline(stats).pipeline == "multi_class_bottomup"


def test_receptive_field_math():
    # Canonical web-app formula: convs + the 2x2 pool per level
    # (ms=16 -> 1 + (4+1)*(1+2+4+8) = 76, the reference RF_TABLE value).
    assert compute_receptive_field(16) == 1 + 5 * (1 + 2 + 4 + 8)
    assert compute_max_stride_for_animal_size(60) == 16
    assert compute_max_stride_for_animal_size(10) == 8
    ts = compute_suggested_tile_size(80, 16, 2)
    assert ts % 16 == 0 and ts >= 128
    ov = compute_suggested_tile_overlap(80, 16, tile_size=ts)
    assert 0 < ov <= ts // 2


def test_estimate_memory():
    est = estimate_memory(384, 384, filters=16, max_stride=8, batch_size=4, num_frames=100)
    assert est.params_gb > 0
    assert est.activations_gb > 0
    assert est.total_device_gb == pytest.approx(
        est.params_gb + est.activations_gb + est.optimizer_gb
    )
    assert est.cache_bytes == 100 * 384 * 384 * 1


def test_generate_config_trains_verifiably(tmp_path):
    out = tmp_path / "auto.yaml"
    cfg = generate_config(FIXTURE, output_path=out, max_epochs=3)
    assert out.exists()
    verify_training_cfg(cfg)
    assert get_model_type_from_cfg(cfg) in (
        "centered_instance", "bottomup", "single_instance",
        "multi_class_topdown", "multi_class_bottomup",
    )
    # Generated head carries the dataset's skeleton.
    from sleap_nn_tpu.config.utils import get_head_config

    head = get_head_config(cfg)
    leaf = getattr(head, "confmaps", None)
    assert leaf is not None and leaf.part_names == ["A", "B"]
    assert cfg.trainer_config.max_epochs == 3
