"""ZMQ GUI-protocol tests over real sockets: progress events publish and
the stop / set_lr control commands act (the SLEAP GUI integration
contract, reference callbacks.py:1030-1196 / SURVEY §5).
"""

import json
import time

import pytest
pytestmark = pytest.mark.slow  # integration tier: real training loops / model builds / subprocesses


zmq = pytest.importorskip("zmq")

from sleap_nn_tpu.config import TrainingJobConfig, apply_overrides
from sleap_nn_tpu.training import ModelTrainer

from tests.fixture_utils import single_instance_fixture
FIXTURE = single_instance_fixture()


def _cfg(controller=None, publish=None, max_epochs=2):
    cfg = TrainingJobConfig()
    cfg.data_config.train_labels_path = [FIXTURE]
    cfg.data_config.use_same_data_for_val = True
    cfg.data_config.use_augmentations_train = False
    cfg.data_config.preprocessing.scale = 0.25
    apply_overrides(cfg, {
        "model_config.backbone_config.unet.filters": 8,
        "model_config.backbone_config.unet.max_stride": 8,
        "model_config.backbone_config.unet.output_stride": 2,
        "model_config.head_configs.single_instance.confmaps.output_stride": 2,
    })
    cfg.trainer_config.max_epochs = max_epochs
    cfg.trainer_config.min_train_steps_per_epoch = 2
    cfg.trainer_config.train_data_loader.batch_size = 1
    cfg.trainer_config.val_data_loader.batch_size = 1
    cfg.trainer_config.save_ckpt = False
    cfg.trainer_config.enable_progress_bar = False
    if controller:
        cfg.trainer_config.zmq.controller_port = controller
    if publish:
        cfg.trainer_config.zmq.publish_port = publish
    return cfg


def test_progress_events_publish():
    """A concurrently-polling subscriber (the GUI usage pattern) receives
    the batch/epoch/train events while training runs."""
    import threading

    port = 19765
    ctx = zmq.Context()
    sub = ctx.socket(zmq.SUB)
    sub.subscribe("")
    sub.bind(f"tcp://127.0.0.1:{port}")  # GUI binds; trainer connects
    events = []
    stop = threading.Event()

    def drain():
        while not stop.is_set():
            if sub.poll(100, zmq.POLLIN):
                events.append(json.loads(sub.recv_string())["event"])

    t = threading.Thread(target=drain)
    t.start()
    try:
        trainer = ModelTrainer.get_model_trainer_from_config(_cfg(publish=port))
        trainer.train()
        time.sleep(1.0)
    finally:
        stop.set()
        t.join()
        sub.close(0)
        ctx.term()
    # The first 1-2 messages can be lost to ZMQ's slow-joiner handshake
    # window; everything after must arrive.
    assert "epoch_end" in events, events
    assert "batch_end" in events, events
    assert "train_end" in events, events


def test_stop_command_halts_training():
    """A GUI 'stop' message ends training at the next batch boundary."""
    port = 19766
    ctx = zmq.Context()
    pub = ctx.socket(zmq.PUB)
    pub.bind(f"tcp://127.0.0.1:{port}")
    try:
        trainer = ModelTrainer.get_model_trainer_from_config(
            _cfg(controller=port, max_epochs=100)
        )
        trainer.setup()

        # Fire the stop command from a hook once training is demonstrably
        # running (PUB/SUB needs the connection up before the send).
        class Firer:
            fired = False

            def __getattr__(self, name):
                if name == "on_batch_end":
                    def hook(trainer_, i, logs):
                        if not Firer.fired:
                            time.sleep(0.2)  # let SUB connect
                            pub.send_string(json.dumps({"command": "stop"}))
                            Firer.fired = True
                    return hook
                return lambda *a, **k: None

        trainer.callbacks.append(Firer())
        t0 = time.time()
        history = trainer.train()
        assert trainer.should_stop
        assert len(history) < 100
        assert time.time() - t0 < 120
    finally:
        pub.close(0)
        ctx.term()


def test_set_lr_command_overrides():
    port = 19767
    ctx = zmq.Context()
    pub = ctx.socket(zmq.PUB)
    pub.bind(f"tcp://127.0.0.1:{port}")
    try:
        trainer = ModelTrainer.get_model_trainer_from_config(
            _cfg(controller=port, max_epochs=3)
        )
        trainer.setup()

        class Firer:
            fired = False

            def __getattr__(self, name):
                if name == "on_batch_end":
                    def hook(trainer_, i, logs):
                        if not Firer.fired:
                            time.sleep(0.2)
                            pub.send_string(json.dumps(
                                {"command": "set_lr", "lr": 1e-5}))
                            Firer.fired = True
                    return hook
                return lambda *a, **k: None

        trainer.callbacks.append(Firer())
        trainer.train()
        assert getattr(trainer, "lr_override", None) == pytest.approx(1e-5)
    finally:
        pub.close(0)
        ctx.term()
