"""Config schema matrix: from_dict/to_yaml round trips, dotted overrides,
oneof resolution, model-dir resolution.

Reference scenario sources: tests/config/* (attrs schema validators, oneof
decorator, OmegaConf dotted overrides, config/utils resolution helpers).
"""

from __future__ import annotations

from pathlib import Path

import pytest
import yaml

from sleap_nn_tpu.config import TrainingJobConfig, apply_overrides
from sleap_nn_tpu.config.base import from_dict, load_yaml, save_yaml, to_dict, to_yaml
from sleap_nn_tpu.config.model_config import BackboneConfig, UNetConfig
from sleap_nn_tpu.config.utils import (
    get_backbone_type_from_cfg,
    get_model_type_from_cfg,
    resolve_model_dir,
)


def base_cfg(**over):
    cfg = TrainingJobConfig()
    apply_overrides(cfg, {
        "model_config.backbone_config.unet.filters": 8,
        "model_config.head_configs.single_instance.confmaps.output_stride": 2,
        **over,
    })
    return cfg


# ── from_dict / to_dict ──────────────────────────────────────────────────────


def test_from_dict_builds_nested_dataclasses():
    cfg = TrainingJobConfig.from_dict({
        "data_config": {"preprocessing": {"scale": 0.5}},
        "trainer_config": {"max_epochs": 7},
    })
    assert cfg.data_config.preprocessing.scale == 0.5
    assert cfg.trainer_config.max_epochs == 7


def test_from_dict_ignores_unknown_keys():
    cfg = TrainingJobConfig.from_dict({
        "data_config": {"preprocessing": {"scale": 0.5, "not_a_field": 1}},
        "mystery_section": {"x": 1},
    })
    assert cfg.data_config.preprocessing.scale == 0.5
    assert not hasattr(cfg, "mystery_section")


def test_from_dict_none_leaf_stays_none():
    cfg = TrainingJobConfig.from_dict({"data_config": {"augmentation_config": None}})
    assert cfg.data_config.augmentation_config is None


def test_to_dict_roundtrip_identity():
    cfg = base_cfg()
    cfg.trainer_config.max_epochs = 42
    d = to_dict(cfg)
    cfg2 = TrainingJobConfig.from_dict(d)
    assert to_dict(cfg2) == d


def test_yaml_roundtrip_through_file(tmp_path):
    cfg = base_cfg()
    cfg.data_config.train_labels_path = ["/a.slp", "/b.slp"]
    p = tmp_path / "c.yaml"
    save_yaml(cfg, p)
    cfg2 = load_yaml(TrainingJobConfig, p)
    assert cfg2.data_config.train_labels_path == ["/a.slp", "/b.slp"]
    assert cfg2.model_config.backbone_config.unet.filters == 8


def test_yaml_output_is_plain_data():
    text = to_yaml(base_cfg())
    parsed = yaml.safe_load(text)
    assert isinstance(parsed, dict)
    assert parsed["model_config"]["backbone_config"]["unet"]["filters"] == 8


# ── apply_overrides ──────────────────────────────────────────────────────────


def test_overrides_instantiate_null_intermediates():
    cfg = TrainingJobConfig()
    assert cfg.model_config.backbone_config.convnext is None
    apply_overrides(cfg, {"model_config.backbone_config.convnext.model_type": "tiny"})
    assert cfg.model_config.backbone_config.convnext.model_type == "tiny"


def test_overrides_yaml_typed_values():
    cfg = base_cfg()
    apply_overrides(cfg, {
        "data_config.preprocessing.scale": "0.25",      # -> float
        "trainer_config.max_epochs": "11",              # -> int
        "data_config.use_same_data_for_val": "true",    # -> bool
        "data_config.train_labels_path": "[/x.slp]",    # -> list
    })
    assert cfg.data_config.preprocessing.scale == 0.25
    assert cfg.trainer_config.max_epochs == 11
    assert cfg.data_config.use_same_data_for_val is True
    assert cfg.data_config.train_labels_path == ["/x.slp"]


def test_overrides_unknown_intermediate_rejected():
    with pytest.raises(AttributeError, match="Unknown config field"):
        apply_overrides(TrainingJobConfig(), {"model_config.backbone.x": 1})


def test_overrides_unknown_leaf_rejected():
    with pytest.raises(AttributeError, match="Unknown config field"):
        apply_overrides(TrainingJobConfig(), {"trainer_config.max_epoch": 3})


def test_overrides_on_loaded_yaml(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text("trainer_config:\n  max_epochs: 5\n")
    cfg = TrainingJobConfig.load_yaml(p, overrides={"trainer_config.max_epochs": 9})
    assert cfg.trainer_config.max_epochs == 9
    assert cfg.filename == str(p)


# ── oneof semantics ──────────────────────────────────────────────────────────


def test_backbone_oneof_which():
    bb = BackboneConfig(unet=UNetConfig())
    assert bb.which() == "unet"


def test_backbone_oneof_none_raises():
    with pytest.raises(ValueError, match="none"):
        BackboneConfig().which()


def test_backbone_oneof_multiple_raises():
    from sleap_nn_tpu.config.model_config import ConvNextConfig

    bb = BackboneConfig(unet=UNetConfig(), convnext=ConvNextConfig())
    with pytest.raises(ValueError, match="unet.*convnext|convnext.*unet"):
        bb.which()


def test_model_and_backbone_type_resolution():
    cfg = base_cfg()
    assert get_model_type_from_cfg(cfg) == "single_instance"
    assert get_backbone_type_from_cfg(cfg) == "unet"


@pytest.mark.parametrize("head_key,expected", [
    ("bottomup.confmaps.output_stride", "bottomup"),
    ("centroid.confmaps.output_stride", "centroid"),
    ("centered_instance.confmaps.output_stride", "centered_instance"),
    ("multi_class_bottomup.confmaps.output_stride", "multi_class_bottomup"),
    ("multi_class_topdown.confmaps.output_stride", "multi_class_topdown"),
    ("bottomup_segmentation.segmentation.output_stride", "bottomup_segmentation"),
    ("semantic_segmentation.segmentation.output_stride", "semantic_segmentation"),
])
def test_model_type_resolution_all_families(head_key, expected):
    cfg = TrainingJobConfig()
    apply_overrides(cfg, {
        "model_config.backbone_config.unet.filters": 8,
        f"model_config.head_configs.{head_key}": 2,
    })
    assert get_model_type_from_cfg(cfg) == expected


# ── model dir resolution ─────────────────────────────────────────────────────


def test_resolve_model_dir_accepts_dir_and_inner_file(tmp_path):
    d = tmp_path / "run"
    d.mkdir()
    (d / "training_config.yaml").write_text("{}")
    assert resolve_model_dir(d) == d
    assert resolve_model_dir(d / "training_config.yaml") == d
    (d / "best.ckpt").mkdir()
    assert resolve_model_dir(d / "best.ckpt") == d


def test_resolve_model_dir_missing_config_errors(tmp_path):
    with pytest.raises(FileNotFoundError, match="training_config"):
        resolve_model_dir(tmp_path)


def test_saved_config_loads_in_reference_shape(tmp_path):
    """The saved YAML uses the reference's three-section layout."""
    cfg = base_cfg()
    p = tmp_path / "training_config.yaml"
    cfg.save_yaml(p)
    raw = yaml.safe_load(p.read_text())
    assert set(raw) >= {"data_config", "model_config", "trainer_config"}
    assert "backbone_config" in raw["model_config"]
    assert "head_configs" in raw["model_config"]


def test_every_reference_config_loads_and_builds():
    """Sweep: every config the reference ships — modern YAML (1.x),
    legacy-model JSON, and raw SLEAP-v1 training_config.json — loads
    through ONE entry point (legacy schemas auto-route to the mapper) and
    builds a real model."""
    import glob

    from sleap_nn_tpu.config import (
        get_backbone_config,
        get_backbone_type_from_cfg,
        get_head_config,
        get_model_type_from_cfg,
    )
    from sleap_nn_tpu.models import Model

    paths = sorted(
        glob.glob("/root/reference/tests/assets/**/*config*.yaml", recursive=True)
    ) + sorted(
        glob.glob("/root/reference/tests/assets/**/*config*.json", recursive=True)
    )
    if not paths:
        pytest.skip("reference assets unavailable")
    assert len(paths) >= 30
    for p in paths:
        cfg = TrainingJobConfig.load_yaml(p)
        Model.from_config(
            get_backbone_type_from_cfg(cfg), get_backbone_config(cfg),
            get_head_config(cfg), get_model_type_from_cfg(cfg),
        )


def test_legacy_v1_json_autodetected():
    p = ("/root/reference/tests/assets/legacy_sleap_json_configs/"
         "topdown_training_config.json")
    import os

    if not os.path.exists(p):
        pytest.skip("reference assets unavailable")
    cfg = TrainingJobConfig.load_yaml(p)
    from sleap_nn_tpu.config import get_model_type_from_cfg

    # The fixture's "topdown" config is actually a multi-class topdown
    # (its heads dict sets multi_class_topdown with class_vectors).
    assert get_model_type_from_cfg(cfg) == "multi_class_topdown"


# ── YAML-1.1 scientific-notation stringification (review sweep finding) ──


def test_sci_notation_floats_coerced_from_yaml(tmp_path):
    """YAML 1.1 resolves '1e-06' (no dot) as a STRING; typed float fields
    must land as floats or arithmetic explodes mid-training."""
    src = TrainingJobConfig()
    p = tmp_path / "sci.yaml"
    p.write_text(
        "trainer_config:\n"
        "  optimizer:\n"
        "    lr: 1e-4\n"
        "  lr_scheduler:\n"
        "    reduce_lr_on_plateau:\n"
        "      threshold: 1e-06\n"
        "      min_lr: 1e-08\n"
    )
    cfg = TrainingJobConfig.load_yaml(p)
    assert cfg.trainer_config.optimizer.lr == 1e-4
    rop = cfg.trainer_config.lr_scheduler.reduce_lr_on_plateau
    assert rop.threshold == pytest.approx(1e-6)
    assert isinstance(rop.threshold, float)
    # min_lr is an Any-typed field (scalar or per-group list) — numeric
    # strings still convert.
    assert rop.min_lr == pytest.approx(1e-8)
    assert isinstance(rop.min_lr, float)


def test_apply_overrides_coerces_numeric_strings():
    from sleap_nn_tpu.config import apply_overrides

    cfg = TrainingJobConfig()
    apply_overrides(cfg, {
        "trainer_config.optimizer.lr": "1e-3",
        "trainer_config.max_epochs": "5",
        "trainer_config.save_ckpt": "true",
    })
    assert cfg.trainer_config.optimizer.lr == 1e-3
    assert cfg.trainer_config.max_epochs == 5
    assert cfg.trainer_config.save_ckpt is True


def test_non_numeric_strings_untouched():
    from sleap_nn_tpu.config import apply_overrides

    cfg = TrainingJobConfig()
    apply_overrides(cfg, {"trainer_config.run_name": "1e5_session"})
    assert cfg.trainer_config.run_name == "1e5_session"
