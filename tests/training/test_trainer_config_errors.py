"""Trainer-config validation / error matrix.

Reference scenario source: tests/training/test_model_trainer.py (1,779 LoC
of trainer-config edge cases) — every invalid configuration must fail fast
with an actionable message, and every boundary-valid one must pass.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pytest
pytestmark = pytest.mark.slow  # integration tier: real training loops / model builds / subprocesses


from sleap_nn_tpu.config import TrainingJobConfig, apply_overrides
from sleap_nn_tpu.config.training_job_config import verify_training_cfg
from sleap_nn_tpu.training import ModelTrainer

FIXTURE = "/root/reference/tests/assets/datasets/minimal_instance.pkg.slp"


def base_cfg(tmp_path=None, **over):
    from tests.fixture_utils import single_instance_fixture

    cfg = TrainingJobConfig()
    # base_cfg builds a single_instance head; that family now rejects
    # multi-instance frames, so use the single-instance fixture derivation.
    cfg.data_config.train_labels_path = [single_instance_fixture()]
    cfg.data_config.use_same_data_for_val = True
    cfg.data_config.use_augmentations_train = False
    cfg.data_config.preprocessing.scale = 0.25
    apply_overrides(cfg, {
        "model_config.backbone_config.unet.filters": 8,
        "model_config.backbone_config.unet.max_stride": 8,
        "model_config.backbone_config.unet.output_stride": 2,
        "model_config.head_configs.single_instance.confmaps.output_stride": 2,
        **over,
    })
    cfg.trainer_config.max_epochs = 1
    cfg.trainer_config.min_train_steps_per_epoch = 1
    cfg.trainer_config.train_data_loader.batch_size = 1
    cfg.trainer_config.val_data_loader.batch_size = 1
    cfg.trainer_config.save_ckpt = False
    cfg.trainer_config.enable_progress_bar = False
    if tmp_path is not None:
        cfg.trainer_config.save_ckpt = True
        cfg.trainer_config.ckpt_dir = str(tmp_path)
        cfg.trainer_config.run_name = "err_matrix"
    return cfg


# ── oneof / basic schema validation ──────────────────────────────────────────


def test_no_backbone_set_rejected():
    cfg = TrainingJobConfig()
    apply_overrides(cfg, {
        "model_config.head_configs.single_instance.confmaps.output_stride": 2,
    })
    with pytest.raises(ValueError, match="[Bb]ackbone"):
        verify_training_cfg(cfg)


def test_no_head_set_rejected():
    cfg = TrainingJobConfig()
    apply_overrides(cfg, {"model_config.backbone_config.unet.filters": 8})
    with pytest.raises(ValueError, match="head"):
        verify_training_cfg(cfg)


def test_two_backbones_rejected():
    cfg = base_cfg()
    apply_overrides(cfg, {
        "model_config.backbone_config.convnext.model_type": "tiny",
    })
    with pytest.raises(ValueError, match="[Ee]xactly one"):
        verify_training_cfg(cfg)


def test_two_heads_rejected():
    cfg = base_cfg()
    apply_overrides(cfg, {
        "model_config.head_configs.centroid.confmaps.output_stride": 2,
    })
    with pytest.raises(ValueError, match="[Ee]xactly one"):
        verify_training_cfg(cfg)


def test_nonpositive_max_epochs_rejected():
    cfg = base_cfg()
    cfg.trainer_config.max_epochs = 0
    with pytest.raises(ValueError, match="max_epochs"):
        verify_training_cfg(cfg)


def test_torchvision_pretrained_weights_rejected_with_guidance():
    cfg = base_cfg()
    cfg.model_config.pre_trained_weights = "ConvNeXt_Tiny_Weights"
    with pytest.raises(ValueError, match="pretrained"):
        verify_training_cfg(cfg)


def test_missing_train_labels_path_rejected():
    cfg = base_cfg()
    cfg.data_config.train_labels_path = None
    with pytest.raises(ValueError, match="train_labels_path"):
        ModelTrainer.get_model_trainer_from_config(cfg).setup()


def test_nonexistent_labels_file_errors():
    cfg = base_cfg()
    cfg.data_config.train_labels_path = ["/nonexistent/labels.slp"]
    with pytest.raises((FileNotFoundError, OSError, ValueError)):
        ModelTrainer.get_model_trainer_from_config(cfg).setup()


def test_non_power_of_two_output_stride_rejected():
    cfg = base_cfg(**{
        "model_config.head_configs.single_instance.confmaps.output_stride": 3,
    })
    with pytest.raises(ValueError, match="power"):
        ModelTrainer.get_model_trainer_from_config(cfg).setup()


def test_backbone_stride_coerced_down_to_finest_head():
    """check_output_strides LOWERS the backbone output stride to the finest
    head stride instead of erroring (reference config/utils.py:106)."""
    cfg = base_cfg(**{
        "model_config.backbone_config.unet.output_stride": 4,
        "model_config.head_configs.single_instance.confmaps.output_stride": 1,
    })
    t = ModelTrainer.get_model_trainer_from_config(cfg)
    assert cfg.model_config.backbone_config.unet.output_stride == 1


# ── optimizer / scheduler matrix ─────────────────────────────────────────────


def test_unsupported_optimizer_name_rejected():
    cfg = base_cfg()
    cfg.trainer_config.optimizer_name = "SGD"
    with pytest.raises(ValueError, match="optimizer"):
        ModelTrainer.get_model_trainer_from_config(cfg).setup()


def test_amsgrad_with_adamw_rejected():
    cfg = base_cfg()
    cfg.trainer_config.optimizer_name = "AdamW"
    cfg.trainer_config.optimizer.amsgrad = True
    with pytest.raises(ValueError, match="amsgrad"):
        ModelTrainer.get_model_trainer_from_config(cfg).setup()


def test_amsgrad_with_adam_accepted():
    cfg = base_cfg()
    cfg.trainer_config.optimizer.amsgrad = True
    t = ModelTrainer.get_model_trainer_from_config(cfg)
    t.setup()  # no raise


@pytest.mark.parametrize("leaf,fields", [
    ("step_lr", {"step_size": 2, "gamma": 0.5}),
    ("reduce_lr_on_plateau", {"factor": 0.5, "patience": 1}),
    ("cosine_annealing_warmup", {"warmup_epochs": 1}),
    ("linear_warmup_linear_decay", {"warmup_epochs": 1}),
])
def test_each_scheduler_leaf_builds(leaf, fields):
    cfg = base_cfg()
    for k, v in fields.items():
        apply_overrides(cfg, {f"trainer_config.lr_scheduler.{leaf}.{k}": v})
    t = ModelTrainer.get_model_trainer_from_config(cfg)
    t.setup()
    assert t.scheduler is not None
    # LR at epoch 0 is finite and positive
    lr0 = t.scheduler.lr_for_epoch(0) if hasattr(t.scheduler, "lr_for_epoch") \
        else cfg.trainer_config.optimizer.lr
    assert np.isfinite(lr0)


# ── dataset-level validation ─────────────────────────────────────────────────


def test_empty_dataset_rejected_with_clear_error(tmp_path):
    from sleap_nn_tpu.io import Labels, Skeleton
    from sleap_nn_tpu.io.slp import save_slp

    empty = tmp_path / "empty.slp"
    save_slp(empty, Labels(labeled_frames=[], videos=[],
                           skeletons=[Skeleton(nodes=["a", "b"])]))
    cfg = base_cfg()
    cfg.data_config.train_labels_path = [str(empty)]
    with pytest.raises(ValueError, match="empty|no usable|skeleton"):
        ModelTrainer.get_model_trainer_from_config(cfg).setup()


def test_tiled_training_rejected_for_crop_models():
    cfg = TrainingJobConfig()
    cfg.data_config.train_labels_path = [FIXTURE]
    cfg.data_config.use_same_data_for_val = True
    cfg.data_config.use_augmentations_train = False
    apply_overrides(cfg, {
        "model_config.backbone_config.unet.filters": 8,
        "model_config.backbone_config.unet.max_stride": 8,
        "model_config.backbone_config.unet.output_stride": 2,
        "model_config.head_configs.centered_instance.confmaps.output_stride": 2,
        "data_config.preprocessing.crop_size": 96,
        "data_config.preprocessing.tiling.enabled": True,
        "data_config.preprocessing.tiling.tile_size": 64,
    })
    cfg.trainer_config.max_epochs = 1
    cfg.trainer_config.save_ckpt = False
    with pytest.raises(ValueError, match="[Tt]iled"):
        ModelTrainer.get_model_trainer_from_config(cfg).setup()


def test_centroid_source_user_rejected():
    cfg = TrainingJobConfig()
    cfg.data_config.train_labels_path = [FIXTURE]
    cfg.data_config.use_same_data_for_val = True
    cfg.data_config.use_augmentations_train = False
    cfg.data_config.preprocessing.scale = 0.25
    apply_overrides(cfg, {
        "model_config.backbone_config.unet.filters": 8,
        "model_config.backbone_config.unet.max_stride": 8,
        "model_config.backbone_config.unet.output_stride": 2,
        "model_config.head_configs.centroid.confmaps.output_stride": 2,
        "model_config.head_configs.centroid.confmaps.centroid_source": "user",
    })
    cfg.trainer_config.max_epochs = 1
    cfg.trainer_config.save_ckpt = False
    with pytest.raises(ValueError, match="centroid_source"):
        ModelTrainer.get_model_trainer_from_config(cfg).setup()


# ── checkpoint / resume failure paths ────────────────────────────────────────


def _train_once(tmp_path, run_name="src", **over):
    cfg = base_cfg(**over)
    cfg.trainer_config.save_ckpt = True
    cfg.trainer_config.ckpt_dir = str(tmp_path)
    cfg.trainer_config.run_name = run_name
    t = ModelTrainer.get_model_trainer_from_config(cfg)
    t.setup()
    t.train()
    return tmp_path / run_name


def test_resume_with_wrong_architecture_rejected(tmp_path):
    src = _train_once(tmp_path)
    cfg = base_cfg(**{"model_config.backbone_config.unet.filters": 16})
    cfg.trainer_config.resume_ckpt_path = str(src / "best.ckpt")
    with pytest.raises(ValueError, match="architecture|match"):
        ModelTrainer.get_model_trainer_from_config(cfg).setup()


def test_resume_from_nonexistent_checkpoint_errors():
    cfg = base_cfg()
    cfg.trainer_config.resume_ckpt_path = "/nonexistent/best.ckpt"
    with pytest.raises((FileNotFoundError, ValueError, OSError)):
        ModelTrainer.get_model_trainer_from_config(cfg).setup()


def test_resume_from_corrupt_checkpoint_errors(tmp_path):
    corrupt = tmp_path / "best.ckpt"
    corrupt.mkdir()
    (corrupt / "garbage").write_bytes(b"\x00" * 64)
    cfg = base_cfg()
    cfg.trainer_config.resume_ckpt_path = str(corrupt)
    with pytest.raises(Exception):
        ModelTrainer.get_model_trainer_from_config(cfg).setup()


def test_resume_seed_mismatch_warns(tmp_path):
    src = _train_once(tmp_path)
    cfg = base_cfg()
    cfg.trainer_config.seed = 1234  # differs from the saved run's seed
    cfg.trainer_config.resume_ckpt_path = str(src / "best.ckpt")
    cfg.trainer_config.save_ckpt = True
    cfg.trainer_config.ckpt_dir = str(tmp_path)
    cfg.trainer_config.run_name = "resumed"
    import warnings

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        ModelTrainer.get_model_trainer_from_config(cfg).setup()
    assert any("seed" in str(x.message).lower() for x in w)


def test_resume_continues_epoch_counter(tmp_path):
    src = _train_once(tmp_path)
    cfg = base_cfg()
    cfg.trainer_config.resume_ckpt_path = str(src / "best.ckpt")
    t = ModelTrainer.get_model_trainer_from_config(cfg)
    t.setup()
    assert t.current_epoch >= 1  # resumes AFTER the trained epoch


def test_pretrained_backbone_weights_wrong_shapes_rejected(tmp_path):
    src = _train_once(tmp_path)
    cfg = base_cfg(**{"model_config.backbone_config.unet.filters": 16})
    cfg.model_config.pretrained_backbone_weights = str(src / "best.ckpt")
    with pytest.raises(ValueError, match="shapes|subtree"):
        ModelTrainer.get_model_trainer_from_config(cfg).setup()


# ── boundary-valid configs ───────────────────────────────────────────────────


def test_minimal_valid_config_trains(tmp_path):
    out = _train_once(tmp_path, run_name="ok")
    assert (out / "best.ckpt").exists()
    assert (out / "training_config.yaml").exists()
    assert (out / "training_log.csv").exists()


def test_val_fraction_split_single_frame_errors_clearly():
    """A 1-frame dataset cannot produce a nonempty val split; the error
    names the problem instead of failing deep in the loader."""
    cfg = base_cfg()
    cfg.data_config.use_same_data_for_val = False
    cfg.data_config.validation_fraction = 0.5
    with pytest.raises(ValueError, match="empty"):
        ModelTrainer.get_model_trainer_from_config(cfg).setup()


def test_val_fraction_split_multi_frame_accepted(tmp_path):
    import cv2

    from sleap_nn_tpu.io import LabeledFrame, Labels
    from sleap_nn_tpu.io.slp import load_slp, save_slp
    from sleap_nn_tpu.io.video import Video

    src = load_slp(FIXTURE)
    lf = src.labeled_frames[0]
    img = lf.image
    pngs = []
    for i in range(4):
        fp = tmp_path / f"f{i}.png"
        cv2.imwrite(str(fp), img[..., 0] if img.shape[-1] == 1 else img)
        pngs.append(str(fp))
    vid = Video.from_filename(pngs)
    clones = Labels(
        labeled_frames=[
            LabeledFrame(vid, i, list(lf.instances)[:1]) for i in range(4)
        ],
        videos=[vid], skeletons=src.skeletons,
    )
    multi = tmp_path / "multi.slp"
    save_slp(multi, clones)
    cfg = base_cfg()
    cfg.data_config.train_labels_path = [str(multi)]
    cfg.data_config.use_same_data_for_val = False
    cfg.data_config.validation_fraction = 0.25
    t = ModelTrainer.get_model_trainer_from_config(cfg)
    t.setup()
    assert len(t.train_ds) == 3 and len(t.val_ds) == 1


def test_single_instance_multi_instance_frames_rejected():
    """single_instance training errors on multi-animal frames
    (reference tests/training/test_model_trainer.py:561)."""
    from tests.training.test_trainer import FIXTURE, make_cfg

    cfg = make_cfg("single_instance", "/tmp/unused")
    cfg.data_config.train_labels_path = [FIXTURE]  # 2 instances per frame
    with pytest.raises(ValueError, match="at most.*one instance per frame"):
        ModelTrainer.get_model_trainer_from_config(cfg)


def test_single_instance_single_instance_frames_ok(tmp_path):
    from tests.fixture_utils import single_instance_fixture
    from tests.training.test_trainer import make_cfg

    cfg = make_cfg("single_instance", tmp_path)
    cfg.data_config.train_labels_path = [single_instance_fixture()]
    trainer = ModelTrainer.get_model_trainer_from_config(cfg)
    assert trainer.model_type == "single_instance"
