"""Tail batches ship unpadded and re-pad on device, bit-identically.

Providers host-pad a partial tail batch by repeating the last frame
(providers.py pad); the predictor's dispatch loop instead sends only the
valid rows over the host->device link and rebuilds the pad device-side
(predictor.py `_DEVICE_PAD_TAIL`) — on a remote-attached chip the pad rows
are pure wasted wire bytes (up to (B-1)/B of the last transfer). These
tests pin that the optimization is output-invariant and kill-switchable.
"""

import importlib

import numpy as np
import pytest

import sleap_nn_tpu.inference.predictor as predictor_mod
from sleap_nn_tpu.inference.predictor import Predictor

VIDEO = "/root/reference/tests/assets/datasets/small_robot.mp4"
CKPT = (
    "/root/reference/tests/assets/model_ckpts/minimal_instance_single_instance"
)


def _keypoints(monkeypatch, enabled: bool, frames, batch_size=4):
    monkeypatch.setattr(predictor_mod, "_DEVICE_PAD_TAIL", enabled)
    p = Predictor.from_model_paths(
        [CKPT], batch_size=batch_size, peak_threshold=0.05
    )
    out = p.predict(VIDEO, frames=frames, make_labels=False)
    return np.concatenate([o["pred_keypoints"] for o in out], axis=0)


def test_partial_tail_outputs_identical(monkeypatch):
    # 6 frames at batch 4 -> one full batch + a 2-frame tail.
    frames = list(range(6))
    kp_on = _keypoints(monkeypatch, True, frames)
    kp_off = _keypoints(monkeypatch, False, frames)
    assert kp_on.shape == kp_off.shape
    np.testing.assert_array_equal(kp_on, kp_off)


def test_even_batches_unaffected(monkeypatch):
    # 8 frames at batch 4 -> no tail; the optimization must be a no-op.
    frames = list(range(8))
    kp_on = _keypoints(monkeypatch, True, frames)
    kp_off = _keypoints(monkeypatch, False, frames)
    np.testing.assert_array_equal(kp_on, kp_off)


def test_kill_switch_env(monkeypatch):
    monkeypatch.setenv("SLEAP_NN_TPU_DEVICE_PAD_TAIL", "0")
    importlib.reload(predictor_mod)
    try:
        assert predictor_mod._DEVICE_PAD_TAIL is False
    finally:
        monkeypatch.delenv("SLEAP_NN_TPU_DEVICE_PAD_TAIL")
        importlib.reload(predictor_mod)
        assert predictor_mod._DEVICE_PAD_TAIL is True
