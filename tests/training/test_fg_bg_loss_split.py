"""Confmap fg/bg loss-split diagnostics.

Reference scenario source: tests/data/test_negative_frames.py
(TestConfmapFgBgLoss): foreground/background MSE split by GT value,
diagnostic-only (never in the optimized loss), logged per stage.
Targets sleap_nn_tpu/training/losses.py::_add_confmap_fg_bg_diagnostics
(reference lightning_modules.py:684).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pytest

from sleap_nn_tpu.training.losses import compute_loss


class Head:
    def __init__(self, name, loss_weight=1.0):
        self.name = name
        self.loss_weight = loss_weight


def make_case(y, y_hat, head="SingleInstanceConfmapsHead"):
    heads = [Head(head)]
    preds = {head: jnp.asarray(y_hat)}
    targets = {"confmaps": jnp.asarray(y)}
    return compute_loss(preds, targets, heads)


def test_basic_fg_bg_split():
    y = np.zeros((1, 4, 4, 1), np.float32)
    y[0, 1, 1, 0] = 1.0  # one foreground pixel
    y_hat = y + 0.1
    loss, parts = make_case(y, y_hat)
    assert parts["confmap_loss_fg"] == pytest.approx(0.01, rel=1e-5)
    assert parts["confmap_loss_bg"] == pytest.approx(0.01, rel=1e-5)
    assert parts["confmap_fg_frac"] == pytest.approx(1 / 16)


def test_split_differs_when_errors_differ():
    y = np.zeros((1, 4, 4, 1), np.float32)
    y[0, 0, 0, 0] = 1.0
    y_hat = np.zeros_like(y)          # fg error = 1, bg error = 0
    _, parts = make_case(y, y_hat)
    assert parts["confmap_loss_fg"] == pytest.approx(1.0)
    assert parts["confmap_loss_bg"] == pytest.approx(0.0)


def test_no_foreground_pixels():
    y = np.zeros((1, 4, 4, 1), np.float32)
    _, parts = make_case(y, y + 0.2)
    assert parts["confmap_loss_fg"] == pytest.approx(0.0)
    assert parts["confmap_loss_bg"] == pytest.approx(0.04, rel=1e-5)
    assert parts["confmap_fg_frac"] == 0.0


def test_no_background_pixels():
    y = np.ones((1, 2, 2, 1), np.float32)
    _, parts = make_case(y, y * 0.5)
    assert parts["confmap_loss_bg"] == pytest.approx(0.0)
    assert parts["confmap_loss_fg"] == pytest.approx(0.25)
    assert parts["confmap_fg_frac"] == 1.0


def test_diagnostics_not_in_optimized_loss():
    y = np.zeros((1, 4, 4, 1), np.float32)
    y[0, 1, 1, 0] = 1.0
    y_hat = y + 0.1
    loss, parts = make_case(y, y_hat)
    # total loss == the plain head MSE; diagnostics are aux-only
    head_part = parts["SingleInstanceConfmapsHead"]
    assert float(loss) == pytest.approx(float(head_part))


def test_absent_for_nonconfmap_models():
    head = Head("SegmentationHead")
    preds = {"SegmentationHead": jnp.zeros((1, 4, 4, 1))}
    targets = {"segmentation": jnp.zeros((1, 4, 4, 1))}
    _, parts = compute_loss(preds, targets, [head])
    assert "confmap_loss_fg" not in parts


def test_trainer_logs_fg_bg_keys(tmp_path):
    from tests.training.test_trainer import make_cfg

    from sleap_nn_tpu.training import ModelTrainer

    cfg = make_cfg("single_instance", tmp_path)
    cfg.trainer_config.max_epochs = 1
    cfg.trainer_config.save_ckpt = False
    tr = ModelTrainer.get_model_trainer_from_config(cfg)
    history = tr.train()
    logs = history[0]
    for key in ("train/confmap_loss_fg", "train/confmap_loss_bg",
                "train/confmap_fg_frac", "val/confmap_loss_fg",
                "val/confmap_loss_bg", "val/confmap_fg_frac"):
        assert key in logs and np.isfinite(logs[key])
    assert 0.0 <= logs["train/confmap_fg_frac"] <= 1.0
    # naming: per-head parts keep the _loss suffix
    assert "train/SingleInstanceConfmapsHead_loss" in logs
