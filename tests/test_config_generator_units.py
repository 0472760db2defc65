"""Config-generator unit tests: memory/param estimates, receptive field,
pipeline recommendation heuristics, TUI field plumbing.

Parity target: reference sleap_nn/config_generator/{memory,recommender,
architecture_estimates}.
"""

import dataclasses

import numpy as np
import pytest

from sleap_nn_tpu.config_generator import (
    DatasetStats,
    analyze_slp,
    compute_max_stride_for_animal_size,
    compute_receptive_field,
    compute_suggested_crop_size,
    estimate_memory,
    estimate_unet_params,
    recommend_config,
    recommend_default_max_stride,
    recommend_pipeline,
)

FIXTURE = "/root/reference/tests/assets/datasets/minimal_instance.pkg.slp"


def _stats(**over):
    base = dict(
        slp_path="x.slp", num_labeled_frames=100, num_videos=1,
        max_height=384, max_width=384, num_channels=1,
        max_instances_per_frame=2, avg_instances_per_frame=2.0,
        max_bbox_size=120.0, avg_bbox_size=100.0, avg_bbox_diagonal=140.0,
        num_nodes=5, num_edges=4, node_names=["a", "b", "c", "d", "e"],
        edges=[(0, 1), (1, 2), (2, 3), (3, 4)], has_tracks=False,
        num_tracks=0, estimated_total_bytes=10**8, overlap_frequency=0.0,
        node_visibility=1.0, view_type="top",
    )
    base.update(over)
    return DatasetStats(**base)


def test_receptive_field_grows_with_stride():
    rf8 = compute_receptive_field(8)
    rf32 = compute_receptive_field(32)
    assert rf32 > rf8 > 0


def test_max_stride_for_animal_size_monotone():
    s_small = compute_max_stride_for_animal_size(40.0)
    s_large = compute_max_stride_for_animal_size(300.0)
    assert s_large >= s_small
    # Always a power of two (UNet stride contract).
    assert s_small & (s_small - 1) == 0
    assert s_large & (s_large - 1) == 0


def test_crop_size_covers_rotated_bbox():
    base = compute_suggested_crop_size(100.0, max_stride=16)
    rotated = compute_suggested_crop_size(100.0, max_stride=16,
                                          rotation_max=45.0)
    assert rotated >= base
    assert base % 16 == 0 and rotated % 16 == 0
    # sqrt(2) diagonal bound at 45 degrees.
    assert rotated >= int(100.0 * np.sqrt(2) * 0.95)


def test_unet_param_estimate_scales_with_filters():
    small = estimate_unet_params(filters=16)
    big = estimate_unet_params(filters=64)
    assert big > small * 4  # conv params scale ~quadratically in width


def test_memory_estimate_fields_and_scaling():
    m1 = estimate_memory(384, 384, batch_size=4)
    m2 = estimate_memory(384, 384, batch_size=8)
    assert m1.params_gb > 0 and m1.activations_gb > 0
    assert m2.activations_gb > m1.activations_gb  # more batch -> more memory
    assert m2.params_gb == m1.params_gb  # params don't scale with batch


def test_recommend_pipeline_single_instance():
    rec = recommend_pipeline(_stats(max_instances_per_frame=1,
                                    avg_instances_per_frame=1.0))
    assert rec.pipeline == "single_instance"


def test_recommend_pipeline_multi_animal():
    rec = recommend_pipeline(_stats())
    assert rec.pipeline in ("topdown", "bottomup")
    assert rec.reason


def test_recommend_config_full_bundle():
    rec = recommend_config(_stats())
    assert rec.backbone in ("unet", "convnext", "swint")
    assert rec.sigma > 0
    assert 0 < rec.scale <= 1.0
    assert rec.batch_size >= 1
    assert rec.max_stride & (rec.max_stride - 1) == 0
    assert rec.summary()


def test_analyze_slp_real_fixture():
    stats = analyze_slp(FIXTURE)
    assert stats.num_labeled_frames == 1
    assert stats.max_height == 384 and stats.max_width == 384
    assert stats.num_nodes == 2
    assert stats.max_instances_per_frame == 2


def test_default_max_stride_scale_interaction():
    # Downscaled inputs shrink the animal, so the stride recommendation
    # shrinks with it.
    full = recommend_default_max_stride(200.0, scale=1.0)
    half = recommend_default_max_stride(200.0, scale=0.5)
    assert half <= full


def test_tui_fields_roundtrip(tmp_path):
    """TUI field editing flows into the saved YAML (multi-screen flow)."""
    from sleap_nn_tpu.config_generator.tui import (
        _analyze, _apply_and_save, _config_fields, _model_fields,
    )

    stats, rec = _analyze(FIXTURE)
    model_fields = _model_fields(rec)
    config_fields = _config_fields(FIXTURE, stats, rec)
    by_name = {f.name: f for f in model_fields + config_fields}
    assert by_name["pipeline"].value in ("topdown", "bottomup",
                                         "single_instance", "centroid")
    by_name["batch_size"].set_text("2")
    by_name["max_epochs"].set_text("7")
    by_name["output"].value = str(tmp_path / "tui.yaml")
    out = _apply_and_save(FIXTURE, stats, rec, model_fields, config_fields)
    import yaml

    cfg = yaml.safe_load(open(out))
    assert cfg["trainer_config"]["max_epochs"] == 7
    assert cfg["trainer_config"]["train_data_loader"]["batch_size"] == 2


def test_tui_field_invalid_input_rejected():
    from sleap_nn_tpu.config_generator.tui import _Field

    f = _Field("sigma", 2.5, caster=float)
    assert not f.set_text("not-a-number")
    assert f.value == 2.5
    assert f.set_text("3.5") and f.value == 3.5
    c = _Field("pipeline", "topdown", choices=["topdown", "bottomup"])
    c.cycle(1)
    assert c.value == "bottomup"
    c.cycle(1)
    assert c.value == "topdown"


def test_single_node_skeleton_recommends_centroid_pipeline():
    """1-node skeletons have no pose to estimate: detection IS the task
    (reference centroid-only pipeline recommendation)."""
    from sleap_nn_tpu.config_generator import recommend_pipeline
    from sleap_nn_tpu.config_generator.analyzer import DatasetStats

    stats = DatasetStats(slp_path="x", num_nodes=1,
                         max_instances_per_frame=3,
                         avg_instances_per_frame=3.0)
    rec = recommend_pipeline(stats)
    assert rec.pipeline == "centroid"
    # Multi-node data is unaffected by the single-node rule.
    multi = DatasetStats(slp_path="x", num_nodes=5,
                         max_instances_per_frame=3)
    assert recommend_pipeline(multi).pipeline != "centroid"


def test_centroid_pipeline_generates_single_centroid_head(tmp_path):
    from sleap_nn_tpu.config import get_model_type_from_cfg
    from sleap_nn_tpu.config_generator import (
        analyze_slp, generate_config, recommend_config,
    )

    FIXTURE = "/root/reference/tests/assets/datasets/minimal_instance.pkg.slp"
    stats = analyze_slp(FIXTURE)
    rec = recommend_config(stats)
    rec.pipeline.pipeline = "centroid"
    cfg = generate_config(FIXTURE, output_path=None, stats=stats,
                          recommendation=rec)
    assert get_model_type_from_cfg(cfg) == "centroid"
    hc = cfg.model_config.head_configs
    assert hc.centroid is not None
    assert hc.centered_instance is None
    # Full-resolution frames: no crop stage.
    assert not getattr(cfg.data_config.preprocessing, "crop_size", None)


def test_cli_config_pipeline_centroid_generates_valid_yaml(tmp_path):
    import yaml
    from click.testing import CliRunner

    from sleap_nn_tpu.cli import cli

    FIXTURE = "/root/reference/tests/assets/datasets/minimal_instance.pkg.slp"
    out = tmp_path / "auto.yaml"
    r = CliRunner().invoke(cli, ["config", FIXTURE, "--auto",
                                 "-o", str(out), "--pipeline", "centroid"])
    assert r.exit_code == 0, r.output
    d = yaml.safe_load(out.read_text())
    heads = {k: v for k, v in d["model_config"]["head_configs"].items() if v}
    assert list(heads) == ["centroid"]


def test_throughput_preset_recommended_and_applied():
    """The recommender emits the measured os4 throughput preset and
    `generate_config(preset="throughput")` applies its knobs."""
    from sleap_nn_tpu.config_generator import generate_config
    from sleap_nn_tpu.config_generator.recommender import (
        recommend_throughput_preset,
    )

    FIXTURE = "/root/reference/tests/assets/datasets/minimal_instance.pkg.slp"
    stats = analyze_slp(FIXTURE)
    rec = recommend_config(stats)
    assert rec.backbone == "unet"
    preset = rec.throughput_preset
    assert preset is not None
    assert preset["output_stride"] == 4
    assert preset["crop_size"] == 128
    assert "2,000 frames/s" in preset["note"]
    assert "throughput_preset" in rec.summary()
    # Scale caps the eval resolution at 384 px.
    big = dataclasses.replace(stats, max_height=1024, max_width=1024)
    p_big = recommend_throughput_preset(big, "topdown", "unet")
    assert abs(p_big["scale"] - 0.375) < 1e-6
    # Non-UNet backbones have no measured preset.
    assert recommend_throughput_preset(stats, "topdown", "convnext") is None

    cfg = generate_config(FIXTURE, output_path=None, stats=stats,
                          recommendation=rec, preset="throughput")
    assert cfg.model_config.backbone_config.unet.output_stride == 4
    assert cfg.data_config.preprocessing.crop_size == 128
    assert (cfg.model_config.head_configs.centered_instance
            .confmaps.output_stride == 4)
    # Quality stays untouched by default.
    cfg_q = generate_config(FIXTURE, output_path=None, stats=stats,
                            recommendation=rec)
    assert cfg_q.model_config.backbone_config.unet.output_stride == 2
    import pytest
    with pytest.raises(ValueError):
        generate_config(FIXTURE, output_path=None, stats=stats,
                        recommendation=rec, preset="nope")


def test_cli_config_generate_throughput_preset(tmp_path):
    import yaml
    from click.testing import CliRunner

    from sleap_nn_tpu.cli import cli

    FIXTURE = "/root/reference/tests/assets/datasets/minimal_instance.pkg.slp"
    out = tmp_path / "fast.yaml"
    r = CliRunner().invoke(cli, ["config-generate", FIXTURE, "-o", str(out),
                                 "--preset", "throughput"])
    assert r.exit_code == 0, r.output
    assert '"preset": "throughput"' in r.output
    d = yaml.safe_load(out.read_text())
    assert d["model_config"]["backbone_config"]["unet"]["output_stride"] == 4
    assert d["data_config"]["preprocessing"]["crop_size"] == 128


def test_cli_preset_respects_pipeline_override(tmp_path):
    """--pipeline + --preset: the preset's knobs are keyed to the SELECTED
    pipeline (crop_size only for topdown families), not the recommended
    one (code-review r5 finding)."""
    import yaml
    from click.testing import CliRunner

    from sleap_nn_tpu.cli import cli

    FIXTURE = "/root/reference/tests/assets/datasets/minimal_instance.pkg.slp"
    out = tmp_path / "si_fast.yaml"
    r = CliRunner().invoke(cli, ["config", FIXTURE, "--auto",
                                 "--pipeline", "single_instance",
                                 "--preset", "throughput", "-o", str(out)])
    assert r.exit_code == 0, r.output
    d = yaml.safe_load(out.read_text())
    assert d["model_config"]["backbone_config"]["unet"]["output_stride"] == 4
    # single_instance has no crop stage: the topdown-only knob must not leak.
    assert d["data_config"]["preprocessing"]["crop_size"] is None
