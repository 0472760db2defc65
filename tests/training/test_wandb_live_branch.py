"""Live-wandb branch coverage via an injected stub `wandb` module.

The environment has no `wandb` package, so only the `_LocalRun` offline
fallback runs in other tests; these tests install a recording stub in
`sys.modules` to exercise the REAL branch of
`training/wandb_logging.py` — login, init kwargs (resume id), epoch-axis
`define_metric`, per-epoch log, summary, finish, and delete_local_logs
(reference: training/model_trainer.py:1461-1486,1832-1861).
"""

from __future__ import annotations

import sys
import types
from pathlib import Path
from types import SimpleNamespace

import pytest
pytestmark = pytest.mark.slow  # integration tier: real training loops / model builds / subprocesses


FIXTURE = "/root/reference/tests/assets/datasets/minimal_instance.pkg.slp"


class _StubRun:
    def __init__(self, calls):
        self.id = "stub-run-123"
        self.url = "https://wandb.local/stub-run-123"
        self.summary = {}
        self._calls = calls

    def log(self, payload):
        self._calls.append(("log", payload))

    def save(self, path):
        self._calls.append(("save", path))

    def finish(self):
        self._calls.append(("finish", None))


@pytest.fixture()
def stub_wandb(monkeypatch):
    calls = []
    run = _StubRun(calls)
    mod = types.ModuleType("wandb")
    mod.login = lambda key=None: calls.append(("login", key))
    mod.init = lambda **kw: (calls.append(("init", kw)), run)[1]
    mod.define_metric = lambda *a, **kw: calls.append(("define_metric", (a, kw)))
    monkeypatch.setitem(sys.modules, "wandb", mod)
    return calls, run


def _fake_trainer(tmp_path, **wandb_over):
    from sleap_nn_tpu.config.trainer_config import WandBConfig

    wb = WandBConfig(entity="lab", project="poses", api_key="sekrit",
                     prv_runid="prev42", **wandb_over)
    tc = SimpleNamespace(wandb=wb, run_name="runA")
    cfg = SimpleNamespace(trainer_config=tc, to_dict=lambda: {"k": "v"})
    return SimpleNamespace(
        config=cfg, model_type="single_instance", ckpt_dir=Path(tmp_path),
        best_val_loss=0.5, current_epoch=1,
    )


def test_live_branch_init_resume_and_define_metric(stub_wandb, tmp_path):
    from sleap_nn_tpu.training.wandb_logging import WandbLoggerCallback

    calls, run = stub_wandb
    trainer = _fake_trainer(tmp_path)
    cb = WandbLoggerCallback(trainer)
    cb.on_train_start(trainer)

    assert ("login", "sekrit") in calls
    init_kw = next(kw for name, kw in calls if name == "init")
    assert init_kw["entity"] == "lab" and init_kw["project"] == "poses"
    assert init_kw["id"] == "prev42" and init_kw["resume"] == "allow"
    assert init_kw["name"] == "runA"
    metrics_defined = [a[0] for name, (a, _) in
                       [(n, p) for n, p in calls if n == "define_metric"]]
    assert "epoch" in metrics_defined
    assert "train/*" in metrics_defined and "val/*" in metrics_defined
    # run id recorded for resume continuity
    assert trainer.config.trainer_config.wandb.current_run_id == "stub-run-123"
    assert trainer.wandb_url == run.url


def test_live_branch_logs_viz_summary_and_cleanup(stub_wandb, tmp_path):
    from sleap_nn_tpu.training.wandb_logging import WandbLoggerCallback

    calls, run = stub_wandb
    trainer = _fake_trainer(tmp_path, save_viz_imgs_wandb=True)
    trainer.config.trainer_config.wandb.delete_local_logs = True
    viz = Path(tmp_path) / "viz"
    viz.mkdir()
    (viz / "epoch_0003.png").write_bytes(b"png")
    local_wandb = Path(tmp_path) / "wandb"
    local_wandb.mkdir()
    (local_wandb / "junk.log").write_text("x")

    cb = WandbLoggerCallback(trainer)
    cb.on_train_start(trainer)
    cb.on_epoch_end(trainer, 3, {"train/loss": 0.25, "val/loss": 0.3})

    logged = next(p for n, p in calls if n == "log")
    assert logged["epoch"] == 3 and logged["train/loss"] == 0.25
    assert any(n == "save" and p.endswith("epoch_0003.png") for n, p in calls)

    cb.on_train_end(trainer)
    assert run.summary["best_val_loss"] == 0.5
    assert run.summary["epochs"] == 2
    assert ("finish", None) in calls
    # delete_local_logs removed the synced dir
    assert not local_wandb.exists()


def test_live_branch_via_real_training(stub_wandb, tmp_path):
    """Integration: a real 1-epoch train drives the stubbed live branch."""
    from sleap_nn_tpu.config import TrainingJobConfig, apply_overrides
    from sleap_nn_tpu.training import ModelTrainer

    from tests.fixture_utils import single_instance_fixture

    calls, run = stub_wandb
    cfg = TrainingJobConfig()
    cfg.data_config.train_labels_path = [single_instance_fixture()]
    cfg.data_config.use_same_data_for_val = True
    cfg.data_config.use_augmentations_train = False
    cfg.data_config.preprocessing.scale = 0.25
    apply_overrides(cfg, {
        "model_config.backbone_config.unet.filters": 8,
        "model_config.backbone_config.unet.max_stride": 8,
        "model_config.backbone_config.unet.output_stride": 2,
        "model_config.head_configs.single_instance.confmaps.output_stride": 2,
    })
    cfg.trainer_config.max_epochs = 1
    cfg.trainer_config.min_train_steps_per_epoch = 1
    cfg.trainer_config.train_data_loader.batch_size = 1
    cfg.trainer_config.val_data_loader.batch_size = 1
    cfg.trainer_config.save_ckpt = True
    cfg.trainer_config.ckpt_dir = str(tmp_path)
    cfg.trainer_config.run_name = "wandb_live"
    cfg.trainer_config.enable_progress_bar = False
    cfg.trainer_config.use_wandb = True
    cfg.trainer_config.wandb.project = "proj"
    trainer = ModelTrainer.get_model_trainer_from_config(cfg)
    trainer.setup()
    trainer.train()
    names = [n for n, _ in calls]
    assert "init" in names and "finish" in names
    assert any(n == "log" and "epoch" in p for n, p in calls)
    assert cfg.trainer_config.wandb.current_run_id == "stub-run-123"
