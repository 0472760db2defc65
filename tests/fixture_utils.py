"""Shared test-fixture derivations (plain functions, importable anywhere)."""

from __future__ import annotations

import os
import tempfile
from pathlib import Path

FIXTURE = "/root/reference/tests/assets/datasets/minimal_instance.pkg.slp"

_SINGLE_DIR = Path(tempfile.gettempdir()) / "sleap_nn_tpu_test_fixtures"


def single_instance_fixture() -> str:
    """A single-instance variant of the minimal fixture (first user instance
    per frame), built once per machine under /tmp.

    single_instance training now hard-errors on multi-instance frames
    (reference parity); training-path tests use this derivation instead.
    """
    out = _SINGLE_DIR / "minimal_single_instance.pkg.slp"
    if out.exists():
        return str(out)
    _SINGLE_DIR.mkdir(parents=True, exist_ok=True)
    from sleap_nn_tpu.io import load_slp

    labels = load_slp(FIXTURE)
    for lf in labels.labeled_frames:
        lf.instances = lf.user_instances[:1]
    tmp = out.with_suffix(".tmp.slp")
    labels.save(str(tmp), embed=True)
    os.replace(tmp, out)  # atomic: safe under parallel test processes
    return str(out)


def train_tiny_model(model_type: str, out_dir, epochs=80, **overrides):
    """Overfit a tiny UNet on the minimal fixture (shared train recipe).

    Used by the session-scoped trained-model fixtures in tests/conftest.py
    (one training per model type per SESSION, reused across test modules —
    retraining identical models per module dominated suite wall time).
    """
    from sleap_nn_tpu.config import TrainingJobConfig, apply_overrides
    from sleap_nn_tpu.training.model_trainer import ModelTrainer

    cfg = TrainingJobConfig()
    if model_type == "single_instance":
        # single_instance training hard-errors on multi-instance frames.
        cfg.data_config.train_labels_path = [single_instance_fixture()]
    else:
        cfg.data_config.train_labels_path = [FIXTURE]
    cfg.data_config.use_same_data_for_val = True
    cfg.data_config.use_augmentations_train = False
    cfg.data_config.preprocessing.scale = 0.5
    apply_overrides(cfg, {
        "model_config.backbone_config.unet.filters": 16,
        "model_config.backbone_config.unet.filters_rate": 1.5,
        "model_config.backbone_config.unet.max_stride": 8,
        "model_config.backbone_config.unet.output_stride": 2,
        f"model_config.head_configs.{model_type}.confmaps.output_stride": 2,
        f"model_config.head_configs.{model_type}.confmaps.sigma": 2.5,
    })
    if model_type == "bottomup":
        apply_overrides(cfg, {
            "model_config.head_configs.bottomup.pafs.output_stride": 4,
            "model_config.head_configs.bottomup.pafs.sigma": 10.0,
        })
    cfg.trainer_config.max_epochs = epochs
    cfg.trainer_config.min_train_steps_per_epoch = 1
    cfg.trainer_config.train_data_loader.batch_size = 1
    cfg.trainer_config.val_data_loader.batch_size = 1
    cfg.trainer_config.save_ckpt = True
    cfg.trainer_config.ckpt_dir = str(out_dir)
    cfg.trainer_config.run_name = model_type
    cfg.trainer_config.enable_progress_bar = False
    cfg.trainer_config.optimizer.lr = 2e-3
    cfg.trainer_config.early_stopping.stop_training_on_plateau = False
    for k, v in overrides.items():
        apply_overrides(cfg, {k: v})
    trainer = ModelTrainer.get_model_trainer_from_config(cfg)
    trainer.train()
    return str(Path(out_dir) / model_type)
