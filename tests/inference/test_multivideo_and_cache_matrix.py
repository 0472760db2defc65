"""Multi-video routing, cache-fill failure propagation, host-resize
qualification rules.

Reference scenario sources: tests/test_parallel_caching.py (cache-fill
failure sync), MultiVideoProvider routing, and the host-resize fast-path
eligibility conditions.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pytest

from sleap_nn_tpu.data.pipeline import PipelineContext, make_dataset
from sleap_nn_tpu.inference.predictor import Predictor
from sleap_nn_tpu.io import (
    Instance,
    LabeledFrame,
    Labels,
    PredictedInstance,
    Skeleton,
    load_slp,
)
from sleap_nn_tpu.io.video import Video

CKPTS = Path("/root/reference/tests/assets/model_ckpts")
FIXTURE = "/root/reference/tests/assets/datasets/minimal_instance.pkg.slp"


class ArrayBackend:
    def __init__(self, n=4, hw=(384, 384), value=0):
        self.n, self.hw, self.value = n, hw, value

    @property
    def num_frames(self):
        return self.n

    @property
    def shape(self):
        return (self.n,) + self.hw + (1,)

    def get_frame(self, idx, fmt=None):
        if idx >= self.n:
            raise IndexError(idx)
        return np.full(self.hw + (1,), self.value, np.uint8)


def _vid(value, n=2):
    return Video(filename=f"synthetic://{value}", backend=ArrayBackend(n=n, value=value))


# ── multi-video labels predict ───────────────────────────────────────────────


def test_predict_routes_frames_to_their_videos():
    src = load_slp(FIXTURE)
    skel = src.skeletons[0]
    va, vb = _vid(10), _vid(200)
    labels = Labels(
        labeled_frames=[
            LabeledFrame(va, 0, [Instance(points=np.array([[5.0, 5.0], [9.0, 9.0]]),
                                          skeleton=skel)]),
            LabeledFrame(vb, 1, [Instance(points=np.array([[7.0, 7.0], [3.0, 3.0]]),
                                          skeleton=skel)]),
        ],
        videos=[va, vb], skeletons=[skel],
    )
    p = Predictor.from_model_paths([CKPTS / "minimal_instance_single_instance"],
                                   batch_size=2, peak_threshold=0.0)
    out = p.predict(labels)
    vids = {lf.frame_idx: lf.video for lf in out.labeled_frames}
    assert vids.get(0) is va and vids.get(1) is vb
    assert out.videos == [va, vb]


def test_labels_provider_video_inds_match_positions():
    from sleap_nn_tpu.inference.providers import LabelsProvider

    skel = Skeleton(nodes=["a", "b"])
    va, vb = _vid(1), _vid(2)
    labels = Labels(
        labeled_frames=[
            LabeledFrame(vb, 0, [Instance(points=np.ones((2, 2)), skeleton=skel)]),
            LabeledFrame(va, 0, [Instance(points=np.ones((2, 2)), skeleton=skel)]),
        ],
        videos=[va, vb], skeletons=[skel],
    )
    (batch,) = list(LabelsProvider(labels, batch_size=2))
    assert list(batch.video_inds) == [1, 0]
    # frame content comes from the right backend
    assert batch.frames[0].max() == 2 and batch.frames[1].max() == 1


# ── cache-fill failure propagation ───────────────────────────────────────────


def test_disk_spill_failure_raises_not_hangs(tmp_path, monkeypatch):
    labels = load_slp(FIXTURE)
    ctx = PipelineContext(model_type="single_instance", n_nodes=2,
                          max_instances=2, scale=0.25, max_stride=8)
    calls = {"n": 0}
    real_save = np.save

    def failing_save(path, arr, *a, **k):
        calls["n"] += 1
        raise OSError("disk full")

    monkeypatch.setattr(np, "save", failing_save)
    with pytest.raises(OSError, match="disk full"):
        make_dataset("single_instance", [labels], ctx,
                     cache_mode="disk", cache_dir=str(tmp_path))
    assert calls["n"] >= 1
    monkeypatch.setattr(np, "save", real_save)


def test_disk_spill_failure_in_worker_pool_propagates(tmp_path, monkeypatch):
    labels = load_slp(FIXTURE)
    ctx = PipelineContext(model_type="single_instance", n_nodes=2,
                          max_instances=2, scale=0.25, max_stride=8)

    def failing_save(path, arr, *a, **k):
        raise OSError("worker disk full")

    monkeypatch.setattr(np, "save", failing_save)
    with pytest.raises(OSError, match="worker disk full"):
        make_dataset("single_instance", [labels], ctx,
                     cache_mode="disk", cache_dir=str(tmp_path),
                     cache_workers=4)


# ── host-resize qualification rules ──────────────────────────────────────────


def _mk(models, host_resize=True, **kw):
    return Predictor.from_model_paths(
        [CKPTS / m for m in models], host_resize=host_resize,
        peak_threshold=0.1, **kw)


def test_host_resize_applies_to_qualifying_single_model():
    p = _mk(["minimal_instance_single_instance"])  # scale 0.5, sizematch set
    assert p._host_transform is not None
    scale, mh, mw = p._host_transform
    assert scale == 0.5 and (mh, mw) == (320, 560)
    # device-side preprocessing was neutralized (host does it instead)
    pre = p.layer.pre
    assert pre.scale == 1.0 and pre.max_height is None and pre.max_width is None


def test_host_resize_disabled_by_flag():
    p = _mk(["minimal_instance_single_instance"], host_resize=False)
    assert p._host_transform is None
    assert p.layer.pre.scale == 0.5


def test_host_resize_requires_matching_topdown_pres():
    p = _mk(["minimal_instance_centroid", "minimal_instance_centered_instance"])
    # both stages share (scale=1.0, 384, 384) -> qualifies
    assert p._host_transform == (1.0, 384, 384)


def test_host_resize_coords_roundtrip():
    p = _mk(["minimal_instance_single_instance"])
    frames = np.random.default_rng(0).integers(
        0, 255, (1, 320, 560, 3), dtype=np.uint8)
    resized, factor = p._apply_host_resize(frames)
    assert resized.shape == (1, 160, 280, 3)
    assert np.isclose(factor, 0.5)
    out = {"pred_keypoints": np.array([[[[80.0, 40.0]]]])}
    lifted = Predictor._lift_host_coords(out, factor)
    np.testing.assert_allclose(lifted["pred_keypoints"][0, 0, 0], [160, 80])


# ── save_predictions formats ─────────────────────────────────────────────────


def test_save_predictions_slp_and_analysis(tmp_path):
    from sleap_nn_tpu.inference.run import save_predictions

    skel = Skeleton(nodes=["a", "b"])
    v = _vid(5)
    labels = Labels(
        [LabeledFrame(v, 0, [PredictedInstance(
            points=np.ones((2, 2)), skeleton=skel,
            point_scores=np.ones(2), score=1.0)])],
        videos=[v], skeletons=[skel],
    )
    out = tmp_path / "p.slp"
    written = save_predictions(labels, out, output_format=["slp", "analysis_h5"])
    assert out.exists()
    assert len(written) == 1 and Path(written[0]).exists()
