"""Identity (class-vectors) accuracy diagnostic.

Reference analog: the TopDownMultiClass lightning module logs per-epoch
class accuracy for the supervised-ID FC head. Targets
sleap_nn_tpu/training/losses.py::compute_loss (ClassVectorsHead branch)
and the trainer's log-key plumbing (model_trainer.py epoch logs).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pytest
pytestmark = pytest.mark.slow  # integration tier: real training loops / model builds / subprocesses


from sleap_nn_tpu.training.losses import compute_loss


class Head:
    def __init__(self, name, loss_weight=1.0):
        self.name = name
        self.loss_weight = loss_weight


def run(y, y_hat):
    heads = [Head("ClassVectorsHead")]
    preds = {"ClassVectorsHead": jnp.asarray(y_hat, jnp.float32)}
    targets = {"class_vectors": jnp.asarray(y, jnp.float32)}
    return compute_loss(preds, targets, heads)


def test_perfect_predictions():
    y = np.eye(2, dtype=np.float32)            # two rows, two classes
    y_hat = np.array([[5.0, -5.0], [-5.0, 5.0]])
    _, parts = run(y, y_hat)
    assert parts["class_accuracy"] == pytest.approx(1.0)


def test_all_wrong():
    y = np.eye(2, dtype=np.float32)
    y_hat = np.array([[-5.0, 5.0], [5.0, -5.0]])
    _, parts = run(y, y_hat)
    assert parts["class_accuracy"] == pytest.approx(0.0)


def test_half_right():
    y = np.eye(2, dtype=np.float32)
    y_hat = np.array([[5.0, -5.0], [5.0, -5.0]])
    _, parts = run(y, y_hat)
    assert parts["class_accuracy"] == pytest.approx(0.5)


def test_padded_rows_excluded():
    # Padding rows are all-zero one-hots (untracked/absent instances);
    # they must not count toward accuracy in either direction.
    y = np.array([[1.0, 0.0], [0.0, 0.0], [0.0, 0.0]], np.float32)
    y_hat = np.array([[5.0, -5.0], [5.0, -5.0], [-5.0, 5.0]])
    _, parts = run(y, y_hat)
    assert parts["class_accuracy"] == pytest.approx(1.0)


def test_all_padding_gives_zero_not_nan():
    y = np.zeros((2, 2), np.float32)
    y_hat = np.ones((2, 2), np.float32)
    _, parts = run(y, y_hat)
    assert np.isfinite(float(parts["class_accuracy"]))


def test_accuracy_not_in_optimized_loss():
    y = np.eye(2, dtype=np.float32)
    y_hat = np.array([[5.0, -5.0], [-5.0, 5.0]])
    loss, parts = run(y, y_hat)
    assert float(loss) == pytest.approx(float(parts["ClassVectorsHead"]))


def test_trainer_logs_class_accuracy(tmp_path):
    """multi_class_topdown training logs train/ and val/ class_accuracy."""
    from sleap_nn_tpu.config import TrainingJobConfig, apply_overrides
    from sleap_nn_tpu.io import Track, load_slp
    from sleap_nn_tpu.training import ModelTrainer

    fixture = "/root/reference/tests/assets/datasets/minimal_instance.pkg.slp"
    labels = load_slp(fixture)
    t0, t1 = Track("a0"), Track("a1")
    labels[0].instances[0].track = t0
    labels[0].instances[1].track = t1
    labels.tracks = [t0, t1]
    p = tmp_path / "tracked.slp"
    labels.save(p, embed=True)

    cfg = TrainingJobConfig()
    cfg.data_config.train_labels_path = [str(p)]
    cfg.data_config.use_same_data_for_val = True
    cfg.data_config.use_augmentations_train = False
    cfg.data_config.preprocessing.scale = 0.25
    apply_overrides(cfg, {
        "model_config.backbone_config.unet.filters": 8,
        "model_config.backbone_config.unet.filters_rate": 1.5,
        "model_config.backbone_config.unet.max_stride": 8,
        "model_config.backbone_config.unet.output_stride": 2,
        "model_config.head_configs.multi_class_topdown.confmaps.output_stride": 2,
        "model_config.head_configs.multi_class_topdown.class_vectors.num_fc_units": 16,
    })
    cfg.trainer_config.max_epochs = 1
    cfg.trainer_config.min_train_steps_per_epoch = 1
    cfg.trainer_config.train_data_loader.batch_size = 2
    cfg.trainer_config.val_data_loader.batch_size = 2
    cfg.trainer_config.save_ckpt = False
    cfg.trainer_config.ckpt_dir = str(tmp_path)
    cfg.trainer_config.run_name = "mct"
    cfg.trainer_config.enable_progress_bar = False
    history = ModelTrainer.get_model_trainer_from_config(cfg).train()
    logs = history[0]
    assert "train/class_accuracy" in logs and np.isfinite(logs["train/class_accuracy"])
    assert "val/class_accuracy" in logs and np.isfinite(logs["val/class_accuracy"])
    assert 0.0 <= logs["train/class_accuracy"] <= 1.0
    # the suffixed form must NOT leak in (it's a diagnostic, not a loss)
    assert "train/class_accuracy_loss" not in logs
