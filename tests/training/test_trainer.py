"""End-to-end training tests on the fixture (CPU, tiny epochs)."""

from pathlib import Path

import numpy as np
import pytest
pytestmark = pytest.mark.slow  # integration tier: real training loops / model builds / subprocesses


from sleap_nn_tpu.config import TrainingJobConfig, apply_overrides
from sleap_nn_tpu.io import load_slp
from sleap_nn_tpu.training import ModelTrainer

FIXTURE = "/root/reference/tests/assets/datasets/minimal_instance.pkg.slp"
from tests.fixture_utils import single_instance_fixture as _si
SI_FIXTURE = _si()  # single-instance derivation: SI training rejects multi-instance frames


def make_cfg(model_type: str, tmp_path, **over):
    cfg = TrainingJobConfig()
    if model_type == "single_instance":
        # single_instance training hard-errors on multi-instance frames.
        from tests.fixture_utils import single_instance_fixture

        cfg.data_config.train_labels_path = [single_instance_fixture()]
    else:
        cfg.data_config.train_labels_path = [FIXTURE]
    cfg.data_config.use_same_data_for_val = True
    cfg.data_config.use_augmentations_train = False
    cfg.data_config.preprocessing.scale = 0.25
    apply_overrides(cfg, {
        "model_config.backbone_config.unet.filters": 8,
        "model_config.backbone_config.unet.filters_rate": 2.0,
        "model_config.backbone_config.unet.max_stride": 8,
        "model_config.backbone_config.unet.output_stride": 2,
    })
    if model_type == "single_instance":
        apply_overrides(cfg, {"model_config.head_configs.single_instance.confmaps.output_stride": 2})
    elif model_type == "centroid":
        apply_overrides(cfg, {"model_config.head_configs.centroid.confmaps.output_stride": 2})
    elif model_type == "centered_instance":
        apply_overrides(cfg, {"model_config.head_configs.centered_instance.confmaps.output_stride": 2})
    elif model_type == "bottomup":
        apply_overrides(cfg, {
            "model_config.head_configs.bottomup.confmaps.output_stride": 2,
            "model_config.head_configs.bottomup.pafs.output_stride": 4,
        })
    cfg.trainer_config.max_epochs = 2
    cfg.trainer_config.min_train_steps_per_epoch = 1
    cfg.trainer_config.train_data_loader.batch_size = 2
    cfg.trainer_config.val_data_loader.batch_size = 2
    cfg.trainer_config.save_ckpt = True
    cfg.trainer_config.ckpt_dir = str(tmp_path)
    cfg.trainer_config.run_name = f"test_{model_type}"
    cfg.trainer_config.enable_progress_bar = False
    cfg.trainer_config.optimizer.lr = 1e-3
    for k, v in over.items():
        apply_overrides(cfg, {k: v})
    return cfg


@pytest.mark.parametrize("model_type", ["single_instance", "centroid", "centered_instance", "bottomup"])
def test_train_two_epochs(model_type, tmp_path):
    cfg = make_cfg(model_type, tmp_path)
    trainer = ModelTrainer.get_model_trainer_from_config(cfg)
    history = trainer.train()
    assert len(history) == 2
    assert np.isfinite(history[0]["train/loss"])
    assert np.isfinite(history[-1]["val/loss"])

    # Model dir contract.
    run_dir = Path(tmp_path) / f"test_{model_type}"
    assert (run_dir / "training_config.yaml").exists()
    assert (run_dir / "initial_config.yaml").exists()
    assert (run_dir / "best.ckpt").exists()
    assert (run_dir / "training_log.csv").exists()
    assert (run_dir / "labels_train_gt_0.slp").exists()

    # CSV has 2 epochs.
    rows = (run_dir / "training_log.csv").read_text().strip().splitlines()
    assert len(rows) == 3  # header + 2

    # Checkpoint loads back.
    state = ModelTrainer.load_checkpoint_params(run_dir / "best.ckpt")
    assert "params" in state


def test_loss_decreases(tmp_path):
    cfg = make_cfg("single_instance", tmp_path)
    cfg.trainer_config.max_epochs = 10
    cfg.trainer_config.min_train_steps_per_epoch = 1
    cfg.trainer_config.train_steps_per_epoch = 5
    trainer = ModelTrainer.get_model_trainer_from_config(cfg)
    history = trainer.train()
    losses = [h["train/loss"] for h in history]
    assert losses[-1] < losses[0] * 0.9, losses


def test_scheduler_and_ohkm(tmp_path):
    cfg = make_cfg("single_instance", tmp_path)
    apply_overrides(cfg, {
        "trainer_config.lr_scheduler.step_lr.step_size": 1,
        "trainer_config.lr_scheduler.step_lr.gamma": 0.5,
        "trainer_config.lr_scheduler.reduce_lr_on_plateau": None,
        "trainer_config.online_hard_keypoint_mining.online_mining": True,
    })
    trainer = ModelTrainer.get_model_trainer_from_config(cfg)
    history = trainer.train()
    assert history[0]["learning_rate"] == pytest.approx(5e-4)
    assert history[1]["learning_rate"] == pytest.approx(2.5e-4)


def test_early_stopping(tmp_path):
    cfg = make_cfg("single_instance", tmp_path)
    cfg.trainer_config.max_epochs = 50
    cfg.trainer_config.min_train_steps_per_epoch = 1
    cfg.trainer_config.optimizer.lr = 0.0  # loss frozen -> plateau
    apply_overrides(cfg, {
        "trainer_config.early_stopping.patience": 2,
        "trainer_config.early_stopping.min_delta": 1e-12,
    })
    trainer = ModelTrainer.get_model_trainer_from_config(cfg)
    history = trainer.train()
    assert len(history) <= 5


def test_viz_callback_and_keep_viz(tmp_path):
    cfg = make_cfg("single_instance", tmp_path)
    cfg.trainer_config.max_epochs = 2
    cfg.trainer_config.min_train_steps_per_epoch = 1
    cfg.trainer_config.visualize_preds_during_training = True
    cfg.trainer_config.keep_viz = True
    trainer = ModelTrainer.get_model_trainer_from_config(cfg)
    trainer.train()
    viz = Path(tmp_path) / "test_single_instance" / "viz"
    pngs = list(viz.glob("epoch_*.png"))
    assert len(pngs) == 2
    assert pngs[0].stat().st_size > 1000

    # keep_viz=False removes the viz dir at train end.
    cfg2 = make_cfg("single_instance", tmp_path, **{"trainer_config.run_name": "no_keep"})
    cfg2.trainer_config.max_epochs = 1
    cfg2.trainer_config.min_train_steps_per_epoch = 1
    cfg2.trainer_config.visualize_preds_during_training = True
    cfg2.trainer_config.keep_viz = False
    ModelTrainer.get_model_trainer_from_config(cfg2).train()
    assert not (Path(tmp_path) / "no_keep" / "viz").exists()


def test_epoch_end_evaluation_callback(tmp_path):
    cfg = make_cfg("single_instance", tmp_path)
    cfg.trainer_config.max_epochs = 2
    cfg.trainer_config.min_train_steps_per_epoch = 1
    apply_overrides(cfg, {"trainer_config.eval.enabled": True,
                          "trainer_config.eval.frequency": 1})
    trainer = ModelTrainer.get_model_trainer_from_config(cfg)
    history = trainer.train()
    # dist.avg logged (mOKS may be NaN-free too once peaks exist).
    assert "val/dist.avg" in history[-1] or "val/mOKS" in history[-1]
    csv_text = (Path(tmp_path) / "test_single_instance" / "training_log.csv").read_text()
    assert "val/dist.avg" in csv_text or "val/mOKS" in csv_text


def test_epoch_end_evaluation_segmentation(tmp_path):
    """Segmentation model types log val/fg_iou from the eval callback."""
    cfg = TrainingJobConfig()
    cfg.data_config.train_labels_path = [FIXTURE]
    cfg.data_config.use_same_data_for_val = True
    cfg.data_config.use_augmentations_train = False
    cfg.data_config.preprocessing.scale = 0.5
    apply_overrides(cfg, {
        "model_config.backbone_config.unet.filters": 8,
        "model_config.backbone_config.unet.max_stride": 8,
        "model_config.backbone_config.unet.output_stride": 2,
        "model_config.head_configs.semantic_segmentation.segmentation.output_stride": 2,
        "trainer_config.eval.enabled": True,
        "trainer_config.eval.frequency": 1,
    })
    cfg.trainer_config.max_epochs = 2
    cfg.trainer_config.min_train_steps_per_epoch = 1
    cfg.trainer_config.train_data_loader.batch_size = 1
    cfg.trainer_config.val_data_loader.batch_size = 1
    cfg.trainer_config.enable_progress_bar = False
    trainer = ModelTrainer.get_model_trainer_from_config(cfg)
    history = trainer.train()
    assert "val/fg_iou" in history[-1]
    assert 0.0 <= history[-1]["val/fg_iou"] <= 1.0


def test_resume_from_checkpoint(tmp_path):
    """resume_ckpt_path continues from the saved epoch with the saved params."""
    cfg = make_cfg("single_instance", tmp_path)
    cfg.trainer_config.max_epochs = 2
    cfg.trainer_config.min_train_steps_per_epoch = 1
    t1 = ModelTrainer.get_model_trainer_from_config(cfg)
    t1.train()
    ckpt = str(Path(tmp_path) / "test_single_instance" / "best.ckpt")

    cfg2 = make_cfg("single_instance", tmp_path)
    cfg2.trainer_config.max_epochs = 4
    cfg2.trainer_config.min_train_steps_per_epoch = 1
    cfg2.trainer_config.run_name = "resumed"
    cfg2.trainer_config.resume_ckpt_path = ckpt
    t2 = ModelTrainer.get_model_trainer_from_config(cfg2)
    history = t2.train()
    # Resumed at epoch 2 -> only epochs 2 and 3 ran.
    assert len(history) == 2 and t2.current_epoch == 3
    # Loss continues from the trained point (well below a fresh init's).
    assert history[0]["train/loss"] < t1.history[0]["train/loss"]

    # Architecture mismatch is rejected.
    cfg3 = make_cfg("centroid", tmp_path)
    cfg3.trainer_config.min_train_steps_per_epoch = 1
    cfg3.trainer_config.run_name = "bad_resume"
    cfg3.trainer_config.resume_ckpt_path = ckpt
    with pytest.raises((ValueError, Exception)):
        ModelTrainer.get_model_trainer_from_config(cfg3).train()


@pytest.mark.parametrize("backbone", ["convnext", "swint"])
def test_train_nonunet_backbones(backbone, tmp_path):
    """ConvNeXt/SwinT train end to end through the real trainer (1 epoch)."""
    cfg = TrainingJobConfig()
    cfg.data_config.train_labels_path = [SI_FIXTURE]
    cfg.data_config.use_same_data_for_val = True
    cfg.data_config.use_augmentations_train = False
    cfg.data_config.preprocessing.scale = 0.25
    tiny_arch = {"depths": [1, 1, 1, 1], "channels": [8, 16, 32, 64]}
    if backbone == "convnext":
        apply_overrides(cfg, {
            "model_config.backbone_config.convnext.arch": tiny_arch,
            "model_config.backbone_config.convnext.output_stride": 4,
        })
    else:
        apply_overrides(cfg, {
            "model_config.backbone_config.swint.arch": {
                "embed": 8, "depths": [1, 1, 1, 1], "num_heads": [1, 2, 4, 8],
            },
            "model_config.backbone_config.swint.output_stride": 4,
        })
    apply_overrides(cfg, {
        "model_config.head_configs.single_instance.confmaps.output_stride": 4,
    })
    cfg.trainer_config.max_epochs = 1
    cfg.trainer_config.min_train_steps_per_epoch = 1
    cfg.trainer_config.train_data_loader.batch_size = 1
    cfg.trainer_config.val_data_loader.batch_size = 1
    cfg.trainer_config.enable_progress_bar = False
    trainer = ModelTrainer.get_model_trainer_from_config(cfg)
    history = trainer.train()
    assert np.isfinite(history[-1]["train/loss"])
    assert np.isfinite(history[-1]["val/loss"])


def test_wandb_offline_fallback(tmp_path):
    """use_wandb without the wandb package logs to a local offline run dir."""
    cfg = make_cfg("single_instance", tmp_path)
    cfg.trainer_config.use_wandb = True
    cfg.trainer_config.wandb.project = "proj"
    trainer = ModelTrainer.get_model_trainer_from_config(cfg)
    with pytest.warns(UserWarning, match="wandb"):
        trainer.train()
    runs = list((trainer.ckpt_dir / "wandb").glob("offline-run-*"))
    assert len(runs) == 1
    lines = (runs[0] / "metrics.jsonl").read_text().strip().splitlines()
    assert len(lines) == 2  # one per epoch
    import json

    row = json.loads(lines[0])
    assert row["epoch"] == 0 and "val/loss" in row and "train/loss" in row
    assert (runs[0] / "summary.json").exists()
    assert cfg.trainer_config.wandb.current_run_id


def test_resume_seed_mismatch_warns(tmp_path):
    cfg = make_cfg("single_instance", tmp_path)
    trainer = ModelTrainer.get_model_trainer_from_config(cfg)
    trainer.train()
    ckpt = trainer.ckpt_dir / "best.ckpt"

    cfg2 = make_cfg("single_instance", tmp_path, **{"trainer_config.run_name": "resumed"})
    cfg2.trainer_config.resume_ckpt_path = str(ckpt)
    cfg2.trainer_config.seed = 1234  # differs from the original run
    cfg2.trainer_config.max_epochs = 3
    with pytest.warns(UserWarning, match="train/val split|seed"):
        ModelTrainer.get_model_trainer_from_config(cfg2).setup()


def test_loader_prefetch_matches_sync():
    """Background-prefetch iteration yields the same batches as inline."""
    from sleap_nn_tpu.config import TrainingJobConfig
    from sleap_nn_tpu.data.pipeline import Loader, build_pipeline_context, make_dataset
    from sleap_nn_tpu.io import load_slp

    labels = load_slp(FIXTURE)
    cfg = make_cfg("single_instance", Path("/tmp"))
    ctx = build_pipeline_context(cfg, labels, "single_instance")
    ds = make_dataset("single_instance", [labels], ctx)
    a = Loader(ds, batch_size=2, shuffle=True, seed=3, prefetch=2)
    b = Loader(ds, batch_size=2, shuffle=True, seed=3, prefetch=0)
    a.set_epoch(1)
    b.set_epoch(1)
    batches_a = list(a)
    batches_b = list(b)
    assert len(batches_a) == len(batches_b) > 0
    for x, y in zip(batches_a, batches_b):
        assert sorted(x) == sorted(y)
        for k in x:
            np.testing.assert_array_equal(x[k], y[k])


def test_pretrained_backbone_weights_transfer(tmp_path):
    """model_config.pretrained_backbone_weights initializes the backbone
    from another checkpoint (transfer learning; shapes must match)."""
    import jax
    import numpy as np
    from sleap_nn_tpu.config import TrainingJobConfig, apply_overrides

    def make_cfg(run, extra=None):
        cfg = TrainingJobConfig()
        cfg.data_config.train_labels_path = [SI_FIXTURE]
        cfg.data_config.use_same_data_for_val = True
        cfg.data_config.use_augmentations_train = False
        cfg.data_config.preprocessing.scale = 0.25
        apply_overrides(cfg, {
            "model_config.backbone_config.unet.filters": 8,
            "model_config.backbone_config.unet.filters_rate": 2.0,
            "model_config.backbone_config.unet.max_stride": 8,
            "model_config.backbone_config.unet.output_stride": 2,
            "model_config.head_configs.single_instance.confmaps.output_stride": 2,
            **(extra or {}),
        })
        cfg.trainer_config.max_epochs = 1
        cfg.trainer_config.min_train_steps_per_epoch = 1
        cfg.trainer_config.train_data_loader.batch_size = 1
        cfg.trainer_config.val_data_loader.batch_size = 1
        cfg.trainer_config.save_ckpt = True
        cfg.trainer_config.ckpt_dir = str(tmp_path)
        cfg.trainer_config.run_name = run
        cfg.trainer_config.enable_progress_bar = False
        return cfg

    t1 = ModelTrainer.get_model_trainer_from_config(make_cfg("src"))
    t1.train()
    src_backbone = jax.device_get(t1.params["params"]["backbone"])

    cfg2 = make_cfg("dst")
    cfg2.model_config.pretrained_backbone_weights = str(tmp_path / "src")
    t2 = ModelTrainer.get_model_trainer_from_config(cfg2)
    t2.setup()
    dst_backbone = jax.device_get(t2.params["params"]["backbone"])
    src_leaves = jax.tree_util.tree_leaves(src_backbone)
    dst_leaves = jax.tree_util.tree_leaves(dst_backbone)
    assert all(
        np.allclose(a, b) for a, b in zip(src_leaves, dst_leaves)
    ), "backbone weights were not transferred"

    # A shape-incompatible source raises instead of silently mixing.
    cfg3 = make_cfg("bad", extra={
        "model_config.backbone_config.unet.filters": 16,
    })
    cfg3.model_config.pretrained_backbone_weights = str(tmp_path / "src")
    with pytest.raises(ValueError, match="shapes"):
        ModelTrainer.get_model_trainer_from_config(cfg3).setup()


def test_legacy_pre_trained_weights_errors():
    from sleap_nn_tpu.config import TrainingJobConfig, verify_training_cfg

    cfg = TrainingJobConfig()
    from sleap_nn_tpu.config import apply_overrides
    apply_overrides(cfg, {
        "model_config.backbone_config.unet.filters": 8,
        "model_config.head_configs.single_instance.confmaps.output_stride": 2,
    })
    cfg.model_config.pre_trained_weights = "ConvNeXt_Tiny_Weights"
    with pytest.raises(ValueError, match="pre_trained_weights"):
        verify_training_cfg(cfg)


def test_save_top_k_epoch_checkpoints(tmp_path):
    """save_top_k > 1 keeps epoch-stamped best checkpoints, pruned to k."""
    cfg = TrainingJobConfig()
    cfg.data_config.train_labels_path = [SI_FIXTURE]
    cfg.data_config.use_same_data_for_val = True
    cfg.data_config.use_augmentations_train = False
    cfg.data_config.preprocessing.scale = 0.25
    apply_overrides(cfg, {
        "model_config.backbone_config.unet.filters": 8,
        "model_config.backbone_config.unet.filters_rate": 2.0,
        "model_config.backbone_config.unet.max_stride": 8,
        "model_config.backbone_config.unet.output_stride": 2,
        "model_config.head_configs.single_instance.confmaps.output_stride": 2,
    })
    cfg.trainer_config.max_epochs = 4
    cfg.trainer_config.min_train_steps_per_epoch = 2
    cfg.trainer_config.train_data_loader.batch_size = 1
    cfg.trainer_config.val_data_loader.batch_size = 1
    cfg.trainer_config.save_ckpt = True
    cfg.trainer_config.ckpt_dir = str(tmp_path)
    cfg.trainer_config.run_name = "topk"
    cfg.trainer_config.enable_progress_bar = False
    cfg.trainer_config.model_ckpt.save_top_k = 2
    ModelTrainer.get_model_trainer_from_config(cfg).train()
    run = tmp_path / "topk"
    epoch_ckpts = sorted(run.glob("epoch=*.ckpt"))
    assert 1 <= len(epoch_ckpts) <= 2, epoch_ckpts
    assert (run / "best.ckpt").exists()
    # Stamped checkpoints load back like best.ckpt does.
    state = ModelTrainer.load_checkpoint_params(epoch_ckpts[0])
    assert "params" in state


def test_post_training_eval_on_test_file(tmp_path):
    """data_config.test_file_path gets predicted + evaluated after training
    (labels_pr.test_0.slp + metrics.test_0.npz in the model dir)."""
    from sleap_nn_tpu.train import run_training

    cfg = TrainingJobConfig()
    cfg.data_config.train_labels_path = [SI_FIXTURE]
    cfg.data_config.use_same_data_for_val = True
    cfg.data_config.use_augmentations_train = False
    cfg.data_config.preprocessing.scale = 0.25
    cfg.data_config.test_file_path = FIXTURE  # held-out eval (same fixture)
    apply_overrides(cfg, {
        "model_config.backbone_config.unet.filters": 8,
        "model_config.backbone_config.unet.filters_rate": 2.0,
        "model_config.backbone_config.unet.max_stride": 8,
        "model_config.backbone_config.unet.output_stride": 2,
        "model_config.head_configs.single_instance.confmaps.output_stride": 2,
    })
    cfg.trainer_config.max_epochs = 10
    cfg.trainer_config.min_train_steps_per_epoch = 8
    cfg.trainer_config.train_data_loader.batch_size = 1
    cfg.trainer_config.val_data_loader.batch_size = 1
    cfg.trainer_config.save_ckpt = True
    cfg.trainer_config.ckpt_dir = str(tmp_path)
    cfg.trainer_config.run_name = "testsplit"
    cfg.trainer_config.enable_progress_bar = False
    run_training(cfg)
    run = tmp_path / "testsplit"
    assert (run / "labels_pr.test_0.slp").exists()
    assert (run / "metrics.test.0.npz").exists()  # reference naming contract


def test_keyboard_interrupt_cleans_run_dir(tmp_path, monkeypatch):
    """Ctrl-C mid-training removes the partial run dir (reference
    model_trainer.py:1896-1940)."""
    cfg = TrainingJobConfig()
    cfg.data_config.train_labels_path = [SI_FIXTURE]
    cfg.data_config.use_same_data_for_val = True
    cfg.data_config.use_augmentations_train = False
    cfg.data_config.preprocessing.scale = 0.25
    apply_overrides(cfg, {
        "model_config.backbone_config.unet.filters": 8,
        "model_config.backbone_config.unet.max_stride": 8,
        "model_config.backbone_config.unet.output_stride": 2,
        "model_config.head_configs.single_instance.confmaps.output_stride": 2,
    })
    cfg.trainer_config.max_epochs = 50
    cfg.trainer_config.min_train_steps_per_epoch = 1
    cfg.trainer_config.train_data_loader.batch_size = 1
    cfg.trainer_config.val_data_loader.batch_size = 1
    cfg.trainer_config.save_ckpt = True
    cfg.trainer_config.ckpt_dir = str(tmp_path)
    cfg.trainer_config.run_name = "interrupted"
    cfg.trainer_config.enable_progress_bar = False
    trainer = ModelTrainer.get_model_trainer_from_config(cfg)

    # Interrupt from inside the loop via a callback hook.
    class Interrupter:
        def __getattr__(self, name):
            if name == "on_epoch_start":
                def hook(trainer_, epoch):
                    if epoch >= 1:
                        raise KeyboardInterrupt
                return hook
            return lambda *a, **k: None

    trainer.setup()
    trainer.callbacks.append(Interrupter())
    run_dir = tmp_path / "interrupted"
    trainer.train()
    assert not run_dir.exists(), "interrupted run dir must be cleaned up"


def test_profiler_simple_summary(tmp_path, capsys):
    cfg = TrainingJobConfig()
    cfg.data_config.train_labels_path = [SI_FIXTURE]
    cfg.data_config.use_same_data_for_val = True
    cfg.data_config.use_augmentations_train = False
    cfg.data_config.preprocessing.scale = 0.25
    apply_overrides(cfg, {
        "model_config.backbone_config.unet.filters": 8,
        "model_config.backbone_config.unet.max_stride": 8,
        "model_config.backbone_config.unet.output_stride": 2,
        "model_config.head_configs.single_instance.confmaps.output_stride": 2,
    })
    cfg.trainer_config.max_epochs = 2
    cfg.trainer_config.min_train_steps_per_epoch = 1
    cfg.trainer_config.train_data_loader.batch_size = 1
    cfg.trainer_config.val_data_loader.batch_size = 1
    cfg.trainer_config.save_ckpt = False
    cfg.trainer_config.enable_progress_bar = False
    cfg.trainer_config.profiler = "simple"
    ModelTrainer.get_model_trainer_from_config(cfg).train()
    out = capsys.readouterr().out
    assert "[profiler:simple]" in out
    assert "steps/sec" in out
