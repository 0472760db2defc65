"""Config system tests: load the REFERENCE fixture YAMLs unchanged."""

from pathlib import Path

import pytest

from sleap_nn_tpu.config import (
    TrainingJobConfig,
    apply_overrides,
    get_backbone_type_from_cfg,
    get_model_type_from_cfg,
    to_dict,
    verify_training_cfg,
)

REF_CKPTS = Path("/root/reference/tests/assets/model_ckpts")


@pytest.mark.parametrize(
    "ckpt,model_type",
    [
        ("minimal_instance_single_instance", "single_instance"),
        ("minimal_instance_centroid", "centroid"),
        ("minimal_instance_centered_instance", "centered_instance"),
        ("minimal_instance_bottomup", "bottomup"),
        ("minimal_instance_multiclass_bottomup", "multi_class_bottomup"),
        ("minimal_instance_multiclass_centered_instance", "multi_class_topdown"),
    ],
)
def test_load_reference_fixture_configs(ckpt, model_type):
    path = REF_CKPTS / ckpt / "training_config.yaml"
    if not path.exists():
        pytest.skip("fixture missing")
    cfg = TrainingJobConfig.load_yaml(path)
    assert get_model_type_from_cfg(cfg) == model_type
    assert get_backbone_type_from_cfg(cfg) == "unet"
    assert cfg.trainer_config.train_data_loader.batch_size >= 1
    assert cfg.data_config.preprocessing.scale > 0
    verify_training_cfg(cfg)


def test_roundtrip_yaml(tmp_path):
    path = REF_CKPTS / "minimal_instance_single_instance/training_config.yaml"
    cfg = TrainingJobConfig.load_yaml(path)
    out = tmp_path / "cfg.yaml"
    cfg.save_yaml(out)
    cfg2 = TrainingJobConfig.load_yaml(out)
    assert to_dict(cfg2.model_config) == to_dict(cfg.model_config)
    assert to_dict(cfg2.trainer_config) == to_dict(cfg.trainer_config)


def test_overrides():
    path = REF_CKPTS / "minimal_instance_single_instance/training_config.yaml"
    cfg = TrainingJobConfig.load_yaml(
        path,
        overrides={
            "trainer_config.max_epochs": "7",
            "model_config.backbone_config.unet.filters": "16",
            "data_config.preprocessing.scale": "0.25",
        },
    )
    assert cfg.trainer_config.max_epochs == 7
    assert cfg.model_config.backbone_config.unet.filters == 16
    assert cfg.data_config.preprocessing.scale == 0.25


def test_override_instantiates_null_nodes():
    cfg = TrainingJobConfig()
    assert cfg.model_config.backbone_config.unet is None
    apply_overrides(cfg, {"model_config.backbone_config.unet.filters": 8})
    assert cfg.model_config.backbone_config.unet.filters == 8


def test_oneof_enforcement():
    cfg = TrainingJobConfig()
    with pytest.raises(ValueError):
        verify_training_cfg(cfg)  # no backbone set
    apply_overrides(cfg, {"model_config.backbone_config.unet.filters": 8})
    with pytest.raises(ValueError):
        verify_training_cfg(cfg)  # no head set
    apply_overrides(
        cfg, {"model_config.head_configs.single_instance.confmaps.sigma": 5.0}
    )
    verify_training_cfg(cfg)


def test_unknown_keys_ignored(tmp_path):
    p = tmp_path / "extra.yaml"
    p.write_text(
        "data_config:\n  train_labels_path: [a.slp]\n  some_future_knob: 5\n"
        "model_config: {}\ntrainer_config: {}\n"
    )
    cfg = TrainingJobConfig.load_yaml(p)
    assert cfg.data_config.train_labels_path == ["a.slp"]
