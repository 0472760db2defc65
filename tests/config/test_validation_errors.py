"""Config-validation error paths (reference: tests/config/* error cases)."""

from __future__ import annotations

import pytest

from sleap_nn_tpu.config import TrainingJobConfig, apply_overrides
from sleap_nn_tpu.config.utils import (
    get_backbone_config,
    get_backbone_type_from_cfg,
    get_head_config,
    get_model_type_from_cfg,
)

from tests.fixture_utils import single_instance_fixture
FIXTURE = single_instance_fixture()


def base_cfg(**over):
    cfg = TrainingJobConfig()
    cfg.data_config.train_labels_path = [FIXTURE]
    cfg.data_config.use_same_data_for_val = True
    for k, v in over.items():
        apply_overrides(cfg, {k: v})
    return cfg


def test_no_backbone_set_errors():
    cfg = base_cfg(**{
        "model_config.head_configs.single_instance.confmaps.output_stride": 2,
    })
    with pytest.raises(ValueError, match="Exactly one backbone"):
        get_backbone_type_from_cfg(cfg)


def test_two_backbones_set_errors():
    cfg = base_cfg(**{
        "model_config.backbone_config.unet.filters": 8,
        "model_config.backbone_config.convnext.model_type": "tiny",
    })
    with pytest.raises(ValueError, match="Exactly one backbone"):
        get_backbone_type_from_cfg(cfg)


def test_no_head_set_errors():
    cfg = base_cfg(**{"model_config.backbone_config.unet.filters": 8})
    with pytest.raises(ValueError):
        get_model_type_from_cfg(cfg)


def test_strict_cli_override_rejects_unknown_key():
    cfg = TrainingJobConfig()
    with pytest.raises((KeyError, AttributeError, ValueError)):
        apply_overrides(cfg, {"model_config.backbone_config.unet.nonexistent_field": 1})


def test_bad_optimizer_name_errors(tmp_path):
    from sleap_nn_tpu.training import ModelTrainer

    cfg = base_cfg(**{
        "model_config.backbone_config.unet.filters": 8,
        "model_config.backbone_config.unet.max_stride": 8,
        "model_config.backbone_config.unet.output_stride": 2,
        "model_config.head_configs.single_instance.confmaps.output_stride": 2,
    })
    cfg.data_config.preprocessing.scale = 0.25
    cfg.trainer_config.optimizer_name = "sgd_with_typo"
    cfg.trainer_config.save_ckpt = False
    cfg.trainer_config.enable_progress_bar = False
    trainer = ModelTrainer.get_model_trainer_from_config(cfg)
    with pytest.raises(ValueError, match="[Uu]nsupported optimizer"):
        trainer.setup()


def test_head_stride_not_produced_by_backbone_errors():
    from sleap_nn_tpu.models import Model

    cfg = base_cfg(**{
        "model_config.backbone_config.unet.filters": 8,
        "model_config.backbone_config.unet.max_stride": 8,
        "model_config.backbone_config.unet.output_stride": 4,
        "model_config.head_configs.single_instance.confmaps.output_stride": 1,
    })
    with pytest.raises(ValueError, match="output_stride"):
        Model.from_config(
            "unet",
            get_backbone_config(cfg),
            get_head_config(cfg),
            get_model_type_from_cfg(cfg),
        )


def test_tiling_without_tile_size_errors():
    from sleap_nn_tpu.data.pipeline import TiledDataset

    cfg = base_cfg(**{"data_config.preprocessing.tiling.enabled": True})
    with pytest.raises(ValueError, match="tile_size"):
        TiledDataset(None, cfg.data_config.preprocessing.tiling)


def test_unknown_model_type_errors():
    from sleap_nn_tpu.models import Model

    with pytest.raises(ValueError, match="not a defined model type"):
        Model.from_config("unet", base_cfg(
            **{"model_config.backbone_config.unet.filters": 8}
        ).model_config.backbone_config.unet, {}, "not_a_type")


def test_unknown_backbone_errors():
    from sleap_nn_tpu.models.model import get_backbone

    with pytest.raises(KeyError, match="Unsupported backbone"):
        get_backbone("resnext", None)


def test_resume_from_missing_checkpoint_errors(tmp_path):
    from sleap_nn_tpu.training import ModelTrainer

    cfg = base_cfg(**{
        "model_config.backbone_config.unet.filters": 8,
        "model_config.backbone_config.unet.max_stride": 8,
        "model_config.backbone_config.unet.output_stride": 2,
        "model_config.head_configs.single_instance.confmaps.output_stride": 2,
    })
    cfg.data_config.preprocessing.scale = 0.25
    cfg.trainer_config.resume_ckpt_path = str(tmp_path / "nope.ckpt")
    cfg.trainer_config.save_ckpt = False
    cfg.trainer_config.enable_progress_bar = False
    trainer = ModelTrainer.get_model_trainer_from_config(cfg)
    with pytest.raises(Exception):
        with pytest.warns(UserWarning):
            trainer.setup()


def test_missing_labels_file_errors():
    cfg = base_cfg()
    cfg.data_config.train_labels_path = ["/nonexistent/labels.slp"]
    from sleap_nn_tpu.training import ModelTrainer

    with pytest.raises((FileNotFoundError, OSError, ValueError)):
        ModelTrainer.get_model_trainer_from_config(cfg).setup()


def test_yaml_roundtrip_preserves_overrides(tmp_path):
    cfg = base_cfg(**{
        "model_config.backbone_config.unet.filters": 24,
        "model_config.head_configs.single_instance.confmaps.sigma": 3.5,
    })
    path = tmp_path / "cfg.yaml"
    cfg.save_yaml(path)
    loaded = TrainingJobConfig.load_yaml(str(path))
    assert loaded.model_config.backbone_config.unet.filters == 24
    assert loaded.model_config.head_configs.single_instance.confmaps.sigma == 3.5
