"""Top-level training job config (parity: reference config/training_job_config.py:42)."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Optional

from sleap_nn_tpu.config.base import apply_overrides, from_dict, load_yaml, save_yaml, to_dict
from sleap_nn_tpu.config.data_config import DataConfig
from sleap_nn_tpu.config.model_config import ModelConfig
from sleap_nn_tpu.config.trainer_config import TrainerConfig


@dataclass
class TrainingJobConfig:
    """The {data_config, model_config, trainer_config} YAML container."""

    data_config: DataConfig = field(default_factory=DataConfig)
    model_config: ModelConfig = field(default_factory=ModelConfig)
    trainer_config: TrainerConfig = field(default_factory=TrainerConfig)
    name: Optional[str] = ""
    description: Optional[str] = ""
    sleap_nn_version: Optional[str] = None
    filename: Optional[str] = ""

    @classmethod
    def from_dict(cls, data: dict) -> "TrainingJobConfig":
        return from_dict(cls, data)

    @classmethod
    def load_yaml(cls, path, overrides: Optional[Dict] = None) -> "TrainingJobConfig":
        cfg = load_yaml(cls, path)
        cfg.filename = str(path)
        if overrides:
            apply_overrides(cfg, overrides)
        return cfg

    def to_dict(self) -> dict:
        return to_dict(self)

    def save_yaml(self, path):
        save_yaml(self, path)


def verify_training_cfg(cfg: TrainingJobConfig) -> TrainingJobConfig:
    """Fail-fast validation (reference: training_job_config.py:113-143).

    Requires exactly one backbone and one head leaf to be set; labels paths
    are validated later at trainer setup (the reference accepts configs with
    an empty train_labels_path at this stage — its fixtures do).
    """
    cfg.model_config.backbone_config.which()
    cfg.model_config.head_configs.which()
    if cfg.trainer_config.max_epochs <= 0:
        raise ValueError("trainer_config.max_epochs must be > 0.")
    if cfg.data_config.negative_loss_weight <= 0:
        # reference data_config.py:363 — attrs validators.gt(0)
        raise ValueError("data_config.negative_loss_weight must be > 0.")
    if getattr(cfg.model_config, "pre_trained_weights", None):
        raise ValueError(
            "model_config.pre_trained_weights (torchvision weight names) is "
            "not supported in this build: torchvision snapshots are not "
            "downloadable here. Use model_config.backbone_config.pretrained "
            "(a local HF snapshot) or "
            "model_config.pretrained_backbone_weights (a trained checkpoint) "
            "instead."
        )
    return cfg
