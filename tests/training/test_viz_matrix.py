"""Training-viz rendering scenario matrix.

Reference scenario source: tests/training/test_training_utils.py
(TestPlotImg/TestPlotConfmaps/TestPlotPeaks/TestMatplotlibSaver) and
test_callbacks.py MatplotlibSaver frequency/failure gating. Targets
sleap_nn_tpu/training/viz.py (parity: reference training/utils.py:158-290,
callbacks.py:523-1029).
"""

from __future__ import annotations

from types import SimpleNamespace

import numpy as np
import pytest

from sleap_nn_tpu.training.viz import VizCallback, render_prediction_png


def gray_img(h=32, w=48):
    return np.random.RandomState(0).randint(0, 255, (h, w, 1), np.uint8)


def test_render_returns_figure_without_path():
    fig = render_prediction_png(gray_img())
    import matplotlib.pyplot as plt

    assert fig.axes  # a live figure with one axes
    plt.close(fig)


def test_render_saves_png(tmp_path):
    out = tmp_path / "epoch.png"
    got = render_prediction_png(gray_img(), output_path=out)
    assert got == out and out.stat().st_size > 0
    assert out.read_bytes()[:8] == b"\x89PNG\r\n\x1a\n"


def test_render_with_confmaps_peaks_and_gt(tmp_path):
    cm = np.zeros((16, 24, 2), np.float32)
    cm[8, 12, 0] = 1.0
    out = tmp_path / "full.png"
    render_prediction_png(
        gray_img(), confmaps=cm, peaks=np.array([[24.0, 16.0]]),
        gt_points=np.array([[[25.0, 17.0]]]), output_path=out,
        confmap_stride=2, title="epoch 3",
    )
    assert out.stat().st_size > 0


def test_render_accepts_2d_and_rgb_images(tmp_path):
    render_prediction_png(gray_img()[..., 0], output_path=tmp_path / "a.png")
    rgb = np.random.RandomState(1).randint(0, 255, (32, 48, 3), np.uint8)
    render_prediction_png(rgb, output_path=tmp_path / "b.png")
    assert (tmp_path / "a.png").exists() and (tmp_path / "b.png").exists()


def test_render_axes_match_image_not_confmap_grid():
    cm = np.zeros((8, 12, 1), np.float32)  # stride-4 grid of a 32x48 image
    fig = render_prediction_png(gray_img(), confmaps=cm, confmap_stride=4)
    ax = fig.axes[0]
    assert ax.get_xlim() == (0.0, 48.0)
    assert ax.get_ylim() == (32.0, 0.0)
    import matplotlib.pyplot as plt

    plt.close(fig)


# -- VizCallback gating -------------------------------------------------------


def make_cb(tmp_path, every_n):
    cb = VizCallback(trainer=None, viz_dir=tmp_path / "viz",
                     every_n_epochs=every_n)
    calls = []
    cb._render = lambda trainer, epoch: calls.append(epoch)
    return cb, calls


def test_viz_callback_frequency(tmp_path):
    cb, calls = make_cb(tmp_path, 2)
    for e in range(5):
        cb.on_epoch_end(SimpleNamespace(), e, {})
    assert calls == [0, 2, 4]


def test_viz_callback_frequency_floor(tmp_path):
    cb, calls = make_cb(tmp_path, 0)
    for e in range(3):
        cb.on_epoch_end(SimpleNamespace(), e, {})
    assert calls == [0, 1, 2]


def test_viz_callback_failure_never_breaks_training(tmp_path, capsys):
    cb, _ = make_cb(tmp_path, 1)

    def boom(trainer, epoch):
        raise RuntimeError("render exploded")

    cb._render = boom
    cb.on_epoch_end(SimpleNamespace(), 0, {})  # must not raise
    assert "viz render failed" in capsys.readouterr().out


def test_viz_callback_creates_dir(tmp_path):
    VizCallback(trainer=None, viz_dir=tmp_path / "deep" / "viz")
    assert (tmp_path / "deep" / "viz").is_dir()
