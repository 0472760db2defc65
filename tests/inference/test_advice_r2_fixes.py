"""Regression tests for the round-2 advisor findings (ADVICE.md r2).

1. Export-dir predict flows through the full post-prediction pipeline
   (tracking, no_empty_frames, filters) instead of returning early
   (reference cli.py:1746-1755 forwards these to exported runtimes).
2. --full_res_masks crops the stride/sizematch pad off the grid mask before
   resizing to the original resolution (no top-left compression).
3. PrefetchIterator abandoned without close() is garbage-collected and its
   worker thread exits (the finalize path must actually be reachable).
4. --stream-to-file flushes frames DURING prediction (crash-safe temp file
   exists before the run finishes), not as a post-hoc replay.
"""

from __future__ import annotations

import gc
from pathlib import Path

import numpy as np
import pytest

from sleap_nn_tpu.inference import predict
from sleap_nn_tpu.io import load_slp

CKPTS = Path("/root/reference/tests/assets/model_ckpts")
FIXTURE = "/root/reference/tests/assets/datasets/minimal_instance.pkg.slp"

pytestmark = pytest.mark.skipif(
    not CKPTS.exists(), reason="reference assets unavailable"
)


def test_export_dir_predict_honors_tracking_and_post_pipeline(tmp_path):
    """predict(-m exportdir, tracking=True) must track, not silently skip."""
    from sleap_nn_tpu.export import export_model

    src = CKPTS / "minimal_instance_single_instance"
    out_dir = export_model(src, output_dir=tmp_path / "exp", batch_size=1,
                           peak_threshold=0.1,
                           input_height=384, input_width=384)
    labels = load_slp(FIXTURE)
    out = predict(
        labels, [out_dir],
        tracking=True, no_empty_frames=True,
        output_path=tmp_path / "pred.slp",
    )
    insts = [i for lf in out.labeled_frames for i in lf.predicted_instances]
    assert insts, "export-dir predict produced no instances"
    assert all(i.track is not None for i in insts), (
        "tracking was requested but instances carry no track - the "
        "export-dir branch skipped the post-prediction pipeline"
    )
    assert (tmp_path / "pred.slp").exists()


def test_export_dir_predict_rejects_streaming_with_tracking(tmp_path):
    from sleap_nn_tpu.export import export_model

    src = CKPTS / "minimal_instance_single_instance"
    out_dir = export_model(src, output_dir=tmp_path / "exp", batch_size=1,
                           peak_threshold=0.1,
                           input_height=384, input_width=384)
    with pytest.raises(ValueError, match="stream_to_file"):
        predict(
            load_slp(FIXTURE), [out_dir],
            tracking=True, stream_to_file=tmp_path / "s.slp",
        )


def test_crop_valid_grid_strips_stride_pad():
    """30px image, max_stride pad to 32, seg stride 2: grid 16 -> valid 15."""
    from sleap_nn_tpu.inference.segmentation import crop_valid_grid

    mask = np.ones((16, 16), bool)
    out = crop_valid_grid(mask, (30, 30), eff_scale=1.0, scale=1.0, stride=2)
    assert out.shape == (15, 15)
    # Sizematch + scale combined: orig 100, eff 0.5 -> 50, scale 0.5 -> 25,
    # stride 4 -> ceil(25/4) = 7 valid cells.
    out = crop_valid_grid(np.ones((8, 8), bool), (100, 100), 0.5, 0.5, 4)
    assert out.shape == (7, 7)


def test_semantic_full_res_masks_not_compressed():
    """Pad rows must not shrink mask content toward the top-left."""
    from sleap_nn_tpu.inference.segmentation import SemanticSegmentationLayer

    layer = SemanticSegmentationLayer.__new__(SemanticSegmentationLayer)
    layer.seg_output_stride = 2
    layer.fg_threshold = 0.5
    layer.full_res_masks = True
    layer.pre = type("P", (), {"scale": 1.0})()
    # Grid 16x16 covers a 32x32 padded canvas of a 30x30 image: rows/cols 15
    # are pure pad. Valid region fully foreground.
    fg = np.zeros((1, 16, 16, 1), np.float32)
    fg[:, :15, :15, 0] = 1.0
    dev = {"fg": fg, "eff_scale": np.float32(1.0),
           "orig_hw": np.array([30, 30], np.int32)}
    out = layer.finalize(dev)
    mask = out["pred_masks"][0][0].mask
    assert mask.shape == (30, 30)
    # Old behavior stretched the zero pad row into rows ~28-29.
    assert mask.all(), "full-res mask lost bottom/right content to pad stretch"
    assert out["mask_scale"] == 1.0


def test_prefetch_iterator_gc_releases_worker():
    from sleap_nn_tpu.data.prefetch import PrefetchIterator

    def gen():
        i = 0
        while True:
            yield i
            i += 1

    it = PrefetchIterator(gen(), prefetch=2)
    assert next(it) == 0
    thread = it.thread
    del it
    gc.collect()
    thread.join(timeout=5.0)
    assert not thread.is_alive(), (
        "abandoned PrefetchIterator was never collected - the worker "
        "closure must not hold a reference to the iterator"
    )


def test_prefetch_iterator_still_propagates_errors():
    from sleap_nn_tpu.data.prefetch import PrefetchIterator

    def gen():
        yield 1
        raise RuntimeError("boom")

    it = PrefetchIterator(gen(), prefetch=2)
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="boom"):
        next(it)
        next(it)


def test_stream_to_file_flushes_during_prediction(tmp_path):
    target = tmp_path / "streamed.slp"
    tmp_file = target.with_suffix(".tmp.slp")
    seen_tmp_during_run = []

    def on_progress(n_frames):
        seen_tmp_during_run.append(tmp_file.exists())

    labels = load_slp(FIXTURE)
    predict(
        labels, [CKPTS / "minimal_instance_single_instance"],
        stream_to_file=target, write_interval=1, batch_size=1,
        progress_callback=on_progress,
    )
    assert seen_tmp_during_run and all(seen_tmp_during_run), (
        "temp .slp did not exist while batches were still being predicted - "
        "streaming is post-hoc, not crash-safe"
    )
    assert target.exists() and not tmp_file.exists()
    assert len(load_slp(str(target)).labeled_frames) >= 1


def test_stream_to_file_rejects_tracking_api():
    with pytest.raises(ValueError, match="stream_to_file"):
        predict(
            load_slp(FIXTURE), [CKPTS / "minimal_instance_single_instance"],
            stream_to_file="/tmp/never.slp", tracking=True,
        )
