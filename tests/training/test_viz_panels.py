"""Viz panel matrix: PAF magnitude/quiver + class-map overlays.

Parity target: the reference bottom-up viz panels (reference
tests/training/test_training_utils.py TestMatplotlibRenderer render_pafs
scenarios and test_callbacks.py UnifiedVizCallback pafs/class-maps modes),
against this repo's render_paf_png / render_class_maps_png and the
VizCallback panel emission (sleap_nn_tpu/training/viz.py).
"""

from __future__ import annotations

import numpy as np
import pytest

import sleap_nn_tpu.data.pipeline as pipeline_mod
from sleap_nn_tpu.training.viz import (
    VizCallback,
    render_class_maps_png,
    render_paf_png,
)


def _img(h=32, w=48):
    return np.zeros((h, w, 1), np.float32)


def _pafs(h=16, w=24, e=2):
    p = np.zeros((h, w, 2 * e), np.float32)
    p[4:8, 4:8, 0] = 1.0  # edge 0 x-component patch
    p[10:12, 10:12, 3] = -1.0  # edge 1 y-component patch
    return p


def _close(fig):
    import matplotlib.pyplot as plt

    plt.close(fig)


# ------------------------------------------------------------ render_paf_png


def test_paf_render_returns_figure_without_path():
    fig = render_paf_png(_img(), _pafs())
    assert fig.axes
    _close(fig)


def test_paf_render_saves_png(tmp_path):
    out = tmp_path / "pafs.png"
    got = render_paf_png(_img(), _pafs(), output_path=out)
    assert got == out and out.stat().st_size > 0


def test_paf_render_accepts_4d_layout(tmp_path):
    p = _pafs().reshape(16, 24, 2, 2)
    out = render_paf_png(_img(), p, output_path=tmp_path / "p4.png")
    assert out.stat().st_size > 0


def test_paf_render_odd_channel_count_raises():
    with pytest.raises(ValueError, match="even"):
        render_paf_png(_img(), np.zeros((16, 24, 3), np.float32))


def test_paf_render_2d_input_raises():
    with pytest.raises(ValueError, match="3D or 4D"):
        render_paf_png(_img(), np.zeros((16, 24), np.float32))


def test_paf_render_all_zero_field_no_crash(tmp_path):
    out = render_paf_png(_img(), np.zeros((16, 24, 4), np.float32),
                         output_path=tmp_path / "z.png")
    assert out.stat().st_size > 0


def test_paf_render_axes_match_image_not_grid():
    # 16x24 PAF grid at stride 2 over a 32x48 image: axes follow the image.
    fig = render_paf_png(_img(32, 48), _pafs(16, 24), paf_stride=2)
    ax = fig.axes[0]
    assert ax.get_xlim() == (0.0, 48.0)
    assert ax.get_ylim() == (32.0, 0.0)
    _close(fig)


# ----------------------------------------------------- render_class_maps_png


def test_class_maps_render_saves_png(tmp_path):
    cm = np.zeros((16, 24, 3), np.float32)
    cm[2:6, 2:6, 0] = 1.0
    cm[8:12, 8:12, 2] = 0.9
    out = render_class_maps_png(_img(), cm, output_path=tmp_path / "cm.png")
    assert out.stat().st_size > 0


def test_class_maps_render_wrong_ndim_raises():
    with pytest.raises(ValueError, match="H, W, C"):
        render_class_maps_png(_img(), np.zeros((16, 24), np.float32))


def test_class_maps_render_axes_match_image():
    fig = render_class_maps_png(_img(32, 48), np.zeros((16, 24, 2), np.float32),
                                stride=2)
    ax = fig.axes[0]
    assert ax.get_xlim() == (0.0, 48.0)
    assert ax.get_ylim() == (32.0, 0.0)
    _close(fig)


# ------------------------------------------------- VizCallback panel output


class _Head:
    def __init__(self, name, output_stride=2):
        self.name = name
        self.output_stride = output_stride


class _Model:
    def __init__(self, heads, outputs):
        self.heads = heads
        self._outputs = outputs

    def apply(self, params, image):
        return self._outputs


class _DS:
    def make_batch(self, idxs):
        return {
            "image": np.zeros((1, 32, 48, 1), np.float32),
            "instances": np.zeros((1, 2, 2), np.float32),
        }


class _Trainer:
    def __init__(self, model, model_type):
        self.ctx = None
        self.model = model
        self.model_type = model_type
        self.params = None
        self.val_ds = _DS()


@pytest.fixture(autouse=True)
def _passthrough_render(monkeypatch):
    monkeypatch.setattr(
        pipeline_mod, "make_render_fn", lambda ctx, train: (lambda b: b)
    )


def test_callback_emits_paf_panel_for_bottomup(tmp_path):
    outputs = {
        "MultiInstanceConfmapsHead": np.zeros((1, 16, 24, 2), np.float32),
        "PartAffinityFieldsHead": np.zeros((1, 8, 12, 2), np.float32),
    }
    model = _Model(
        [_Head("MultiInstanceConfmapsHead", 2), _Head("PartAffinityFieldsHead", 4)],
        outputs,
    )
    cb = VizCallback(trainer=None, viz_dir=tmp_path / "viz")
    cb._render(_Trainer(model, "bottomup"), epoch=0)
    assert (tmp_path / "viz" / "epoch_0000.png").exists()
    assert (tmp_path / "viz" / "epoch_0000_pafs.png").exists()
    assert not (tmp_path / "viz" / "epoch_0000_classmaps.png").exists()


def test_callback_emits_class_maps_panel_for_multiclass(tmp_path):
    outputs = {
        "MultiInstanceConfmapsHead": np.zeros((1, 16, 24, 2), np.float32),
        "ClassMapsHead": np.zeros((1, 16, 24, 3), np.float32),
    }
    model = _Model(
        [_Head("MultiInstanceConfmapsHead", 2), _Head("ClassMapsHead", 2)],
        outputs,
    )
    cb = VizCallback(trainer=None, viz_dir=tmp_path / "viz")
    cb._render(_Trainer(model, "multi_class_bottomup"), epoch=3)
    assert (tmp_path / "viz" / "epoch_0003.png").exists()
    assert (tmp_path / "viz" / "epoch_0003_classmaps.png").exists()
    assert not (tmp_path / "viz" / "epoch_0003_pafs.png").exists()


def test_callback_no_extra_panels_for_single_instance(tmp_path):
    outputs = {"SingleInstanceConfmapsHead": np.zeros((1, 16, 24, 2), np.float32)}
    model = _Model([_Head("SingleInstanceConfmapsHead", 2)], outputs)
    cb = VizCallback(trainer=None, viz_dir=tmp_path / "viz")
    cb._render(_Trainer(model, "single_instance"), epoch=0)
    files = sorted(p.name for p in (tmp_path / "viz").iterdir())
    assert files == ["epoch_0000.png"]
