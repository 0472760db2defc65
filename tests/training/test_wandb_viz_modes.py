"""WandB viz-mode matrix: peaks_to_boxes payloads + box/mask overlays.

Parity target: reference tests/training/test_callbacks.py
TestWandBVizCallback / TestWandBRenderer (boxes mode, masks mode,
peaks_to_boxes NaN handling, log table), against
sleap_nn_tpu/training/wandb_logging.py.
"""

from __future__ import annotations

import numpy as np
import pytest

from sleap_nn_tpu.training.wandb_logging import (
    WandbLoggerCallback,
    peaks_to_boxes,
)


# ------------------------------------------------------------ peaks_to_boxes


def test_boxes_2d_input_one_box_per_node():
    out = peaks_to_boxes(np.array([[10.0, 20.0], [30.0, 40.0]]), box_size=6.0)
    data = out["predictions"]["box_data"]
    assert len(data) == 2
    b0 = data[0]
    assert b0["position"] == {"minX": 7.0, "maxX": 13.0,
                              "minY": 17.0, "maxY": 23.0}
    assert b0["class_id"] == 0
    assert b0["scores"]["confidence"] == 1.0


def test_boxes_3d_input_flattens_instances():
    pts = np.zeros((3, 2, 2))
    out = peaks_to_boxes(pts)
    assert len(out["predictions"]["box_data"]) == 6


def test_boxes_skip_nan_peaks():
    pts = np.array([[10.0, 20.0], [np.nan, np.nan]])
    out = peaks_to_boxes(pts)
    assert len(out["predictions"]["box_data"]) == 1


def test_boxes_confidence_threshold_gates():
    pts = np.array([[10.0, 20.0], [30.0, 40.0]])
    vals = np.array([0.9, 0.05])
    out = peaks_to_boxes(pts, vals, confmap_threshold=0.1)
    data = out["predictions"]["box_data"]
    assert len(data) == 1
    assert data[0]["scores"]["confidence"] == pytest.approx(0.9)


def test_boxes_node_names_in_captions_and_labels():
    out = peaks_to_boxes(np.array([[1.0, 1.0], [2.0, 2.0]]),
                         node_names=["head", "tail"])
    data = out["predictions"]["box_data"]
    assert data[0]["box_caption"] == "head"
    assert data[1]["box_caption"] == "tail"
    assert out["predictions"]["class_labels"] == {0: "head", 1: "tail"}


def test_boxes_missing_node_names_use_indices():
    out = peaks_to_boxes(np.array([[1.0, 1.0]]))
    assert out["predictions"]["box_data"][0]["box_caption"] == "0"


# ------------------------------------------------------- overlay wiring


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
        return {"image": np.zeros((1, 16, 16, 1), np.float32)}


class _WB:
    viz_enabled = True
    save_viz_imgs_wandb = False
    viz_boxes = True
    viz_masks = True
    viz_box_size = 5.0
    viz_confmap_threshold = 0.1
    log_viz_table = True


class _Run:
    def __init__(self):
        self.logged = []

    def log(self, payload):
        self.logged.append(payload)


def _trainer(outputs, heads):
    from types import SimpleNamespace

    return SimpleNamespace(
        ctx=None, model=_Model(heads, outputs), params=None, val_ds=_DS(),
    )


@pytest.fixture(autouse=True)
def _passthrough_render(monkeypatch):
    import sleap_nn_tpu.data.pipeline as pipeline_mod

    monkeypatch.setattr(
        pipeline_mod, "make_render_fn", lambda ctx, train: (lambda b: b)
    )


def test_overlays_log_boxes_and_masks_and_table_rows():
    cms = np.zeros((1, 8, 8, 2), np.float32)
    cms[0, 3, 4, 0] = 1.0
    seg = np.zeros((1, 8, 8, 1), np.float32)
    seg[0, 2:5, 2:5, 0] = 10.0
    cb = WandbLoggerCallback(trainer=None)
    cb.run = _Run()
    cb._is_wandb = False
    tr = _trainer(
        {"MultiInstanceConfmapsHead": cms, "SegmentationHead": seg},
        [_Head("MultiInstanceConfmapsHead", 2), _Head("SegmentationHead", 2)],
    )
    cb._log_viz_overlays(tr, epoch=3, wb=_WB())
    (payload,) = cb.run.logged
    assert payload["epoch"] == 3
    boxes = payload["viz/boxes"]["boxes"]["predictions"]["box_data"]
    assert len(boxes) == 1
    # Peak at grid (x=4, y=3), stride 2 -> image point (8, 6).
    assert boxes[0]["position"]["minX"] == pytest.approx(8 - 2.5)
    mask = payload["viz/masks"]["masks"]["predictions"]["mask_data"]
    assert mask.sum() == 9
    assert len(cb._table_rows) == 1


def test_overlay_failure_never_breaks_training(capsys):
    cb = WandbLoggerCallback(trainer=None)
    cb.run = _Run()
    cb._is_wandb = False

    class _BoomDS:
        def make_batch(self, idxs):
            raise RuntimeError("decoder exploded")

    from types import SimpleNamespace

    tr = SimpleNamespace(ctx=None, model=None, params=None, val_ds=_BoomDS(),
                         config=SimpleNamespace(trainer_config=SimpleNamespace(
                             wandb=_WB())), ckpt_dir=None)
    cb.on_epoch_end(tr, 0, {"train/loss": 1.0})
    assert "wandb viz overlay failed" in capsys.readouterr().out


def test_table_rows_logged_at_train_end():
    from types import SimpleNamespace

    cb = WandbLoggerCallback(trainer=None)
    cb.run = _Run()
    cb._is_wandb = False
    cb._table_rows = [[0, {}], [1, {}]]
    run = cb.run
    # _LocalRun-style finish(summary) signature.
    run.finish = lambda summary=None: None
    tr = SimpleNamespace(best_val_loss=0.1, current_epoch=1)
    cb.on_train_end(tr)
    assert any("viz/table_rows" in p for p in run.logged)
