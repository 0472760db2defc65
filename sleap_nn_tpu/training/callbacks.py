"""Training callbacks: CSV logging, ZMQ GUI protocol, early stopping, progress.

Parity targets: reference sleap_nn/training/callbacks.py —
``CSVLoggerCallback`` (:48), ``TrainingControllerZMQ`` (:1030),
``ProgressReporterZMQ`` (:1100), Lightning ``EarlyStopping`` semantics.
The ZMQ message schema (dicts with ``what``/``event``/``logs`` published on
a PUB socket; ``{"command": "stop"}`` consumed from a SUB socket) is the
SLEAP GUI integration contract and is kept verbatim (jsonpickle of plain
dicts == plain JSON).
"""

from __future__ import annotations

import csv
import json
import math
import time
from pathlib import Path
from typing import Dict, List, Optional


class Callback:
    """Minimal callback protocol for the training loop."""

    def on_train_start(self, trainer):
        pass

    def on_train_end(self, trainer):
        pass

    def on_epoch_start(self, trainer, epoch: int):
        pass

    def on_epoch_end(self, trainer, epoch: int, logs: Dict):
        pass

    def on_batch_start(self, trainer, batch_idx: int):
        pass

    def on_batch_end(self, trainer, batch_idx: int, logs: Dict):
        pass


class CSVLoggerCallback(Callback):
    """Write one row per epoch to ``training_log.csv`` (reference: :48)."""

    def __init__(self, path, keys: Optional[List[str]] = None):
        self.path = Path(path)
        self.keys = keys
        self._initialized = False

    def _init_file(self, logs: Dict):
        if self.keys is None:
            self.keys = ["epoch"] + sorted(k for k in logs if k != "epoch")
        with open(self.path, "w", newline="") as f:
            csv.writer(f).writerow(self.keys)
        self._initialized = True

    def on_epoch_end(self, trainer, epoch: int, logs: Dict):
        logs = dict(logs, epoch=epoch)
        if not self._initialized:
            self._init_file(logs)
        row = [logs.get(k, "") for k in self.keys]
        with open(self.path, "a", newline="") as f:
            csv.writer(f).writerow(row)


class EarlyStopping(Callback):
    """Stop on val/loss plateau (Lightning-equivalent semantics)."""

    def __init__(
        self,
        monitor: str = "val/loss",
        min_delta: float = 1e-8,
        patience: int = 10,
        enabled: bool = True,
    ):
        self.monitor = monitor
        self.min_delta = min_delta
        self.patience = patience
        self.enabled = enabled
        self.best = math.inf
        self.wait = 0

    def on_epoch_end(self, trainer, epoch: int, logs: Dict):
        if not self.enabled:
            return
        current = logs.get(self.monitor)
        if current is None:
            return
        if current < self.best - self.min_delta:
            self.best = current
            self.wait = 0
        else:
            self.wait += 1
            if self.wait >= self.patience:
                trainer.should_stop = True


class ProgressCallback(Callback):
    """Simple stdout progress with per-epoch timing + throughput."""

    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self._t0 = None

    def on_epoch_start(self, trainer, epoch: int):
        self._t0 = time.perf_counter()

    def on_epoch_end(self, trainer, epoch: int, logs: Dict):
        if not self.enabled:
            return
        dt = time.perf_counter() - (self._t0 or time.perf_counter())
        msg = f"Epoch {epoch}: " + ", ".join(
            f"{k}={v:.5g}" for k, v in sorted(logs.items()) if isinstance(v, (int, float))
        )
        print(f"{msg} ({dt:.1f}s)", flush=True)


class TrainingControllerZMQ(Callback):
    """SUB socket consuming GUI control commands (reference: :1030).

    Supported commands: ``{"command": "stop"}`` halts training at the next
    batch boundary; ``{"command": "set_lr", "lr": x}`` overrides the LR.
    """

    def __init__(self, address="tcp://127.0.0.1:9000", topic="", poll_timeout=10):
        import zmq

        self.address = address
        self.timeout = poll_timeout
        self.context = zmq.Context()
        self.socket = self.context.socket(zmq.SUB)
        self.socket.subscribe(topic)
        self.socket.connect(self.address)
        self._zmq = zmq

    def close(self):
        self.socket.close()
        self.context.term()

    def on_batch_end(self, trainer, batch_idx: int, logs: Dict):
        if self.socket.poll(self.timeout, self._zmq.POLLIN):
            msg = json.loads(self.socket.recv_string())
            if msg.get("command") == "stop":
                trainer.should_stop = True
            elif msg.get("command") == "set_lr":
                trainer.lr_override = float(msg["lr"])


class ProgressReporterZMQ(Callback):
    """PUB socket publishing train events for the SLEAP GUI (reference: :1100)."""

    def __init__(self, address="tcp://127.0.0.1:9001", what=""):
        import zmq

        self.address = address
        self.what = what
        self.context = zmq.Context()
        self.socket = self.context.socket(zmq.PUB)
        self.socket.connect(self.address)
        self._zmq = zmq

    def close(self):
        self.socket.setsockopt(self._zmq.LINGER, 0)
        self.socket.close()
        self.context.term()

    def send(self, event: str, logs=None, **kwargs):
        msg = dict(what=self.what, event=event, logs=logs, **kwargs)
        self.socket.send_string(json.dumps(msg))

    def on_train_start(self, trainer):
        self.send("train_begin", wandb_url=None)

    def on_train_end(self, trainer):
        self.send("train_end")

    def on_epoch_start(self, trainer, epoch: int):
        self.send("epoch_begin", epoch=epoch)

    def on_epoch_end(self, trainer, epoch: int, logs: Dict):
        self.send("epoch_end", epoch=epoch, logs=_sanitize(logs))

    def on_batch_start(self, trainer, batch_idx: int):
        self.send("batch_start", batch=batch_idx)

    def on_batch_end(self, trainer, batch_idx: int, logs: Dict):
        self.send("batch_end", epoch=trainer.current_epoch, batch=batch_idx, logs=_sanitize(logs))


def _sanitize(logs: Dict) -> Dict:
    out = {}
    for k, v in (logs or {}).items():
        try:
            out[k] = float(v)
        except (TypeError, ValueError):
            out[k] = v
    return out
