"""Weights & Biases logging callback (with an offline local fallback).

Parity target: reference sleap_nn wires wandb through a Lightning
``WandbLogger`` plus explicit ``wandb.init``/``define_metric`` calls
(reference: training/model_trainer.py:1461-1486,1832-1861). This package
runs its own training loop, so the equivalent is a callback that:

- initializes a wandb run from ``trainer_config.wandb`` (entity, project,
  name, mode, group, resume id), logging the epoch-indexed metric dict the
  CSV logger sees;
- defines ``epoch`` as the x-axis for ``train/*`` and ``val/*`` metrics;
- records the run id back into ``trainer_config.wandb.current_run_id`` so a
  resumed run can continue the same wandb run (reference semantics);
- optionally uploads the per-epoch viz PNGs
  (``wandb.save_viz_imgs_wandb``).

When the ``wandb`` package is not installed, ``use_wandb: true`` still does
something observable instead of a silent no-op: a local run directory
``<ckpt_dir>/wandb/offline-run-<ts>/`` is created with the run config and an
append-only ``metrics.jsonl``, and a warning is printed once. Raising was
the alternative; the local sink keeps headless TPU pods (where wandb is
often unavailable) trainable with the same config file.
"""

from __future__ import annotations

import json
import time
import warnings
from pathlib import Path
from typing import Dict, Optional

from sleap_nn_tpu.training.callbacks import Callback


class _LocalRun:
    """Minimal offline wandb-run stand-in: JSONL metrics + config snapshot."""

    def __init__(self, root: Path, run_id: str, config: Dict):
        self.dir = root / f"offline-run-{run_id}"
        self.dir.mkdir(parents=True, exist_ok=True)
        self.id = run_id
        self.url = self.dir.as_uri()
        with open(self.dir / "config.json", "w") as fp:
            json.dump(config, fp, indent=2, default=str)
        self._metrics = open(self.dir / "metrics.jsonl", "a")

    def log(self, logs: Dict):
        self._metrics.write(json.dumps(logs, default=float) + "\n")
        self._metrics.flush()

    def save(self, path):  # parity with wandb.save for viz images
        import shutil

        dest = self.dir / "files"
        dest.mkdir(exist_ok=True)
        shutil.copy2(path, dest / Path(path).name)

    def finish(self, summary: Optional[Dict] = None):
        if summary is not None:
            with open(self.dir / "summary.json", "w") as fp:
                json.dump(summary, fp, indent=2, default=float)
        self._metrics.close()


class WandbLoggerCallback(Callback):
    """Log per-epoch metrics to wandb (or a local offline run directory)."""

    def __init__(self, trainer):
        self.trainer = trainer
        self.run = None
        self._is_wandb = False

    # -- lifecycle -------------------------------------------------------------
    def on_train_start(self, trainer):
        cfg = trainer.config.trainer_config
        wb = cfg.wandb
        run_config = {
            "model_type": trainer.model_type,
            "run_name": cfg.run_name,
            "config": trainer.config.to_dict()
            if hasattr(trainer.config, "to_dict")
            else str(trainer.config),
        }
        try:
            import wandb  # noqa: F401 — optional dependency
        except ImportError:
            warnings.warn(
                "use_wandb is enabled but the `wandb` package is not "
                "installed; logging metrics to a local offline run directory "
                "under the checkpoint dir instead.",
                stacklevel=2,
            )
            run_id = wb.prv_runid or time.strftime("%Y%m%d_%H%M%S")
            root = (trainer.ckpt_dir or Path(".")) / "wandb"
            self.run = _LocalRun(root, run_id, run_config)
        else:
            if wb.api_key:
                wandb.login(key=wb.api_key)
            self.run = wandb.init(
                entity=wb.entity,
                project=wb.project,
                name=wb.name or cfg.run_name,
                group=wb.group,
                mode=wb.wandb_mode or None,
                id=wb.prv_runid,
                resume="allow" if wb.prv_runid else None,
                config=run_config,
                dir=str(trainer.ckpt_dir) if trainer.ckpt_dir else None,
            )
            self._is_wandb = True
            # Epoch is the x-axis for everything (reference
            # model_trainer.py:1846-1861).
            wandb.define_metric("epoch")
            for pattern in ("train/*", "val/*", "learning_rate"):
                wandb.define_metric(pattern, step_metric="epoch")
        wb.current_run_id = self.run.id
        trainer.wandb_url = getattr(self.run, "url", None)

    def on_epoch_end(self, trainer, epoch: int, logs: Dict):
        if self.run is None:
            return
        payload = {"epoch": epoch, **logs}
        self.run.log(payload)
        wb = trainer.config.trainer_config.wandb
        if (
            wb.save_viz_imgs_wandb
            and getattr(wb, "viz_enabled", True)
            and trainer.ckpt_dir is not None
        ):
            viz_dir = trainer.ckpt_dir / "viz"
            if viz_dir.exists():
                # VizCallback writes <viz_dir>/epoch_{epoch:04d}.<fmt>
                for png in sorted(viz_dir.glob(f"epoch_{epoch:04d}.*")):
                    self.run.save(str(png))

    def on_train_end(self, trainer):
        if self.run is None:
            return
        summary = {
            "best_val_loss": float(getattr(trainer, "best_val_loss", float("nan"))),
            "epochs": int(getattr(trainer, "current_epoch", -1)) + 1,
        }
        if self._is_wandb:
            for key, value in summary.items():
                self.run.summary[key] = value
            self.run.finish()
            # delete_local_logs (reference WandbConfig): drop the synced
            # local wandb dir after the run finishes uploading.
            wb = trainer.config.trainer_config.wandb
            if getattr(wb, "delete_local_logs", None) and trainer.ckpt_dir:
                import shutil

                shutil.rmtree(trainer.ckpt_dir / "wandb", ignore_errors=True)
        else:
            self.run.finish(summary)
        self.run = None

    def close(self):
        if self.run is not None:
            try:
                self.run.finish()
            except Exception:
                pass
            self.run = None
