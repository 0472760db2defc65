"""Run-dir duplication + accelerator fallback matrix.

Parity target: reference tests/training/test_model_trainer.py —
test_model_ckpt_path_duplication (:1459) and the
verify_accelerator_config fallback scenarios (:1292-1350), against
ModelTrainer._setup_ckpt_dir / setup (sleap_nn_tpu/training/model_trainer.py).
"""

from __future__ import annotations

from pathlib import Path

import pytest
pytestmark = pytest.mark.slow  # integration tier: real training loops / model builds / subprocesses


from sleap_nn_tpu.training import ModelTrainer

from tests.training.test_trainer import make_cfg


def test_existing_run_dir_auto_suffixes(tmp_path):
    cfg = make_cfg("single_instance", tmp_path)
    cfg.trainer_config.max_epochs = 1  # dir-suffix semantics only
    cfg.trainer_config.run_name = "dup"
    ModelTrainer.get_model_trainer_from_config(cfg).train()
    assert (tmp_path / "dup" / "best.ckpt").exists()

    cfg2 = make_cfg("single_instance", tmp_path)
    cfg2.trainer_config.max_epochs = 1
    cfg2.trainer_config.run_name = "dup"
    t2 = ModelTrainer.get_model_trainer_from_config(cfg2)
    t2.train()
    assert (tmp_path / "dup-1" / "best.ckpt").exists()
    assert t2.config.trainer_config.run_name == "dup-1"

    cfg3 = make_cfg("single_instance", tmp_path)
    cfg3.trainer_config.max_epochs = 1
    cfg3.trainer_config.run_name = "dup"
    ModelTrainer.get_model_trainer_from_config(cfg3).train()
    assert (tmp_path / "dup-2" / "best.ckpt").exists()
    # The original run's artifacts were never touched.
    assert (tmp_path / "dup" / "training_config.yaml").exists()


def test_empty_run_dir_reused_without_suffix(tmp_path):
    (tmp_path / "fresh").mkdir()
    cfg = make_cfg("single_instance", tmp_path)
    cfg.trainer_config.run_name = "fresh"
    ModelTrainer.get_model_trainer_from_config(cfg).train()
    assert (tmp_path / "fresh" / "best.ckpt").exists()
    assert not (tmp_path / "fresh-1").exists()


def test_empty_run_name_auto_generates(tmp_path):
    cfg = make_cfg("single_instance", tmp_path)
    cfg.trainer_config.run_name = ""
    t = ModelTrainer.get_model_trainer_from_config(cfg)
    t.train()
    assert t.ckpt_dir is not None and t.ckpt_dir.exists()
    assert "single_instance" in t.ckpt_dir.name


def test_unrecognized_accelerator_warns_and_falls_back(tmp_path, capsys):
    cfg = make_cfg("single_instance", tmp_path)
    cfg.trainer_config.trainer_accelerator = "quantum"
    cfg.trainer_config.max_epochs = 1
    t = ModelTrainer.get_model_trainer_from_config(cfg)
    t.setup()
    assert "unrecognized trainer_accelerator" in capsys.readouterr().out
    assert t.config.trainer_config.trainer_accelerator == "auto"


@pytest.mark.parametrize("accel", ["auto", "cpu", "tpu", "gpu"])
def test_recognized_accelerators_accepted_silently(tmp_path, capsys, accel):
    cfg = make_cfg("single_instance", tmp_path)
    cfg.trainer_config.trainer_accelerator = accel
    t = ModelTrainer.get_model_trainer_from_config(cfg)
    t.setup()
    assert "unrecognized" not in capsys.readouterr().out
    assert t.config.trainer_config.trainer_accelerator == accel
