"""ZMQ callback event-schema matrix (unit level — no live sockets).

Parity target: reference tests/training/test_callbacks.py
TestProgressReporterZMQ / TestTrainingControllerZMQ unit scenarios: the
exact per-hook event payloads the SLEAP GUI consumes, no-message no-ops,
unknown-command tolerance, and socket cleanup.
"""

from __future__ import annotations

import json
from types import SimpleNamespace

import pytest

zmq = pytest.importorskip("zmq")

from sleap_nn_tpu.training.callbacks import (
    ProgressReporterZMQ,
    TrainingControllerZMQ,
)


@pytest.fixture()
def reporter():
    r = ProgressReporterZMQ(address="tcp://127.0.0.1:19777", what="test_job")
    sent = []
    r.socket.send_string = lambda s: sent.append(json.loads(s))
    yield r, sent
    r.close()


def test_train_begin_event_schema(reporter):
    r, sent = reporter
    r.on_train_start(SimpleNamespace())
    (msg,) = sent
    assert msg["what"] == "test_job"
    assert msg["event"] == "train_begin"
    assert "wandb_url" in msg


def test_train_end_event_schema(reporter):
    r, sent = reporter
    r.on_train_end(SimpleNamespace())
    assert sent[0]["event"] == "train_end"


def test_epoch_events_carry_epoch_number(reporter):
    r, sent = reporter
    r.on_epoch_start(SimpleNamespace(), 7)
    r.on_epoch_end(SimpleNamespace(), 7, {"val/loss": 0.5})
    assert sent[0] == {"what": "test_job", "event": "epoch_begin",
                       "logs": None, "epoch": 7}
    assert sent[1]["event"] == "epoch_end"
    assert sent[1]["logs"] == {"val/loss": 0.5}


def test_batch_end_event_carries_epoch_and_batch(reporter):
    r, sent = reporter
    tr = SimpleNamespace(current_epoch=2)
    r.on_batch_end(tr, 13, {"train/loss": 1.25})
    (msg,) = sent
    assert msg["event"] == "batch_end"
    assert msg["epoch"] == 2 and msg["batch"] == 13
    assert msg["logs"]["train/loss"] == 1.25


def test_logs_sanitized_to_floats(reporter):
    import numpy as np

    r, sent = reporter
    r.on_epoch_end(SimpleNamespace(), 0, {"val/loss": np.float32(0.25),
                                          "note": "text"})
    logs = sent[0]["logs"]
    assert isinstance(logs["val/loss"], float)
    assert logs["note"] == "text"


def test_all_events_are_json_round_trippable(reporter):
    r, sent = reporter
    r.send("custom_event", logs={"k": 1}, extra="x")
    assert json.loads(json.dumps(sent[0])) == sent[0]


# ----------------------------------------------------------- controller


@pytest.fixture()
def controller():
    c = TrainingControllerZMQ(address="tcp://127.0.0.1:19778", poll_timeout=5)
    yield c
    c.close()


def test_no_message_is_noop(controller):
    tr = SimpleNamespace(should_stop=False)
    controller.on_batch_end(tr, 0, {})
    assert tr.should_stop is False


def test_unknown_command_tolerated(controller, monkeypatch):
    monkeypatch.setattr(controller.socket, "poll", lambda *a, **k: 1)
    monkeypatch.setattr(
        controller.socket, "recv_string",
        lambda: json.dumps({"command": "dance"}),
    )
    tr = SimpleNamespace(should_stop=False)
    controller.on_batch_end(tr, 0, {})
    assert tr.should_stop is False


def test_stop_command_sets_flag(controller, monkeypatch):
    monkeypatch.setattr(controller.socket, "poll", lambda *a, **k: 1)
    monkeypatch.setattr(
        controller.socket, "recv_string",
        lambda: json.dumps({"command": "stop"}),
    )
    tr = SimpleNamespace(should_stop=False)
    controller.on_batch_end(tr, 0, {})
    assert tr.should_stop is True


def test_set_lr_command_sets_override(controller, monkeypatch):
    monkeypatch.setattr(controller.socket, "poll", lambda *a, **k: 1)
    monkeypatch.setattr(
        controller.socket, "recv_string",
        lambda: json.dumps({"command": "set_lr", "lr": "0.005"}),
    )
    tr = SimpleNamespace(should_stop=False)
    controller.on_batch_end(tr, 0, {})
    assert tr.lr_override == pytest.approx(0.005)


def test_close_is_idempotent_and_releases_socket():
    c = TrainingControllerZMQ(address="tcp://127.0.0.1:19779")
    c.close()
    with pytest.raises(zmq.ZMQError):
        c.socket.poll(1)
