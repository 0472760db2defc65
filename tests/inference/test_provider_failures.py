"""Provider / prefetch failure injection.

Reference scenario source: provider-thread failure paths the reference
covers in tests/inference/test_providers.py — decoder raising mid-video,
empty sources, mixed frame sizes, out-of-range frames, early abandonment.
Errors raised in the background decode thread must surface in the CONSUMER,
not vanish with the thread.
"""

from __future__ import annotations

import time

import numpy as np
import pytest

from sleap_nn_tpu.data.prefetch import PrefetchIterator
from sleap_nn_tpu.inference.providers import Batch, LabelsProvider, VideoProvider
from sleap_nn_tpu.io import LabeledFrame, Labels, PredictedInstance, Skeleton
from sleap_nn_tpu.io.video import Video

MP4 = "/root/reference/tests/assets/datasets/small_robot.mp4"


class FlakyBackend:
    """Video backend that raises on a chosen frame index."""

    def __init__(self, n=10, fail_at=None, shape=(32, 48, 1)):
        self.n = n
        self.fail_at = fail_at
        self.shape_hw = shape

    @property
    def num_frames(self):
        return self.n

    @property
    def shape(self):
        return (self.n,) + self.shape_hw

    def get_frame(self, idx, fmt=None):
        if idx >= self.n:
            raise IndexError(f"frame {idx} out of range (n={self.n})")
        if self.fail_at is not None and idx == self.fail_at:
            raise RuntimeError(f"decode failed at frame {idx}")
        return np.full(self.shape_hw, idx % 255, np.uint8)


def flaky_video(**kw):
    return Video(filename="synthetic://flaky", backend=FlakyBackend(**kw))


def test_decoder_error_mid_video_surfaces_in_consumer():
    prov = VideoProvider(flaky_video(n=10, fail_at=5), batch_size=2)
    with pytest.raises(RuntimeError, match="decode failed at frame 5"):
        for _ in prov:
            pass


def test_batches_before_failure_are_delivered():
    prov = VideoProvider(flaky_video(n=10, fail_at=6), batch_size=2)
    it = iter(prov)
    got = [next(it), next(it), next(it)]  # frames 0..5 decode fine
    assert [list(b.frame_inds) for b in got] == [[0, 1], [2, 3], [4, 5]]
    with pytest.raises(RuntimeError):
        while True:
            next(it)


def test_empty_frame_selection_yields_nothing():
    prov = VideoProvider(flaky_video(n=10), batch_size=4, frames=[])
    assert len(prov) == 0
    assert list(iter(prov)) == []


def test_out_of_range_frame_raises():
    prov = VideoProvider(flaky_video(n=4), batch_size=2, frames=[0, 99])
    with pytest.raises(Exception):
        list(iter(prov))


def test_partial_final_batch_padding_and_validity():
    prov = VideoProvider(flaky_video(n=5), batch_size=4)
    batches = list(iter(prov))
    assert len(batches) == 2
    last = batches[1]
    assert list(last.valid) == [True, False, False, False]
    # pad rows repeat the final real frame and its index
    assert list(last.frame_inds) == [4, 4, 4, 4]
    assert last.frames.shape[0] == 4


def test_abandoning_provider_iteration_stops_thread():
    prov = VideoProvider(flaky_video(n=1000), batch_size=2, prefetch=2)
    it = iter(prov)
    next(it)
    thread = it.thread
    it.close()
    thread.join(timeout=5)
    assert not thread.is_alive()


def test_mixed_size_labels_frames_raise_not_hang():
    """LabelsProvider stacks frames; mixed sizes must raise a clear error in
    the consumer (np.stack shape mismatch), not deadlock the queue."""
    skel = Skeleton(nodes=["a"])

    class FixedImgLF:
        def __init__(self, idx, hw):
            self.frame_idx = idx
            self.video = None
            self.instances = [PredictedInstance(
                points=np.array([[1.0, 1.0]]), skeleton=skel,
                point_scores=np.ones(1), score=1.0)]
            self._hw = hw

        @property
        def image(self):
            return np.zeros(self._hw + (1,), np.uint8)

    labels = Labels.__new__(Labels)
    labels.labeled_frames = [FixedImgLF(0, (32, 32)), FixedImgLF(1, (48, 48))]
    labels.videos = []
    prov = LabelsProvider(labels, batch_size=2)
    with pytest.raises(Exception):
        list(iter(prov))


def test_video_provider_frame_subset_order_preserved():
    prov = VideoProvider(flaky_video(n=20), batch_size=3, frames=[7, 3, 11, 2])
    batches = list(iter(prov))
    inds = [i for b in batches for i, v in zip(b.frame_inds, b.valid) if v]
    assert inds == [7, 3, 11, 2]
    # frame content must follow the requested order too
    vals = [int(b.frames[k, 0, 0, 0]) for b in batches
            for k in range(len(b.frame_inds)) if b.valid[k]]
    assert vals == [7, 3, 11, 2]


def test_real_mp4_gray_fast_path_shapes():
    prov = VideoProvider(MP4, batch_size=2, frames=[0, 1, 2],
                         out_format="gray")
    batches = list(iter(prov))
    assert batches[0].frames.shape == (2, 320, 560, 1)
    assert batches[0].frames.dtype == np.uint8


def test_real_mp4_rgb_default_shapes():
    prov = VideoProvider(MP4, batch_size=2, frames=[0, 1])
    (b,) = list(iter(prov))
    assert b.frames.shape == (2, 320, 560, 3)


def test_prefetch_queue_bounded_backpressure():
    """The worker never buffers more than `prefetch` batches ahead."""
    produced = []

    def gen():
        for i in range(100):
            produced.append(i)
            yield i

    it = PrefetchIterator(gen(), prefetch=3)
    time.sleep(0.2)  # give the worker time to run ahead if unbounded
    # queue(3) + the one item blocked in put() + possibly one consumed slot
    assert len(produced) <= 5
    assert next(it) == 0
    it.close()


def test_prefetch_immediate_close_without_consuming():
    it = PrefetchIterator(iter(range(1000)), prefetch=2)
    it.close()
    it.thread.join(timeout=5)
    assert not it.thread.is_alive()
    with pytest.raises(StopIteration):
        next(it)


def test_prefetch_error_on_first_item():
    def gen():
        raise ValueError("instant failure")
        yield  # pragma: no cover

    it = PrefetchIterator(gen(), prefetch=2)
    with pytest.raises(ValueError, match="instant failure"):
        next(it)


def test_labels_provider_gt_centroids_padding():
    skel = Skeleton(nodes=["a", "b"])
    insts = [
        PredictedInstance(points=np.array([[10.0, 10.0], [12.0, 12.0]]),
                          skeleton=skel, point_scores=np.ones(2), score=1.0),
    ]

    class ImgLF:
        frame_idx = 0
        video = None
        instances = insts

        @property
        def image(self):
            return np.zeros((16, 16, 1), np.uint8)

    labels = Labels.__new__(Labels)
    labels.labeled_frames = [ImgLF()]
    labels.videos = []
    prov = LabelsProvider(labels, batch_size=1, with_centroids=True,
                          max_instances=4)
    (b,) = list(iter(prov))
    assert b.gt_centroids.shape == (1, 4, 2)
    assert b.gt_centroid_valid.tolist() == [[True, False, False, False]]
    np.testing.assert_allclose(b.gt_centroids[0, 0], [11.0, 11.0])
    assert np.isnan(b.gt_centroids[0, 1:]).all()


def test_labels_provider_gt_centroid_vals_carry_scores():
    """GT centroid confidences: PredictedInstance scores carry through,
    user instances report 1.0, empty slots NaN (reference finding 14)."""
    from sleap_nn_tpu.io import (
        Instance,
        LabeledFrame,
        Labels,
        PredictedInstance,
        Skeleton,
    )
    from sleap_nn_tpu.inference.providers import LabelsProvider

    skel = Skeleton(nodes=["a", "b"])
    v = flaky_video(n=2)
    lf = LabeledFrame(v, 0, [
        PredictedInstance(points=np.array([[5.0, 5.0], [7.0, 7.0]]),
                          skeleton=skel, point_scores=np.ones(2), score=0.7),
        Instance(points=np.array([[20.0, 20.0], [22.0, 22.0]]), skeleton=skel),
    ])
    labels = Labels([lf], videos=[v], skeletons=[skel])
    (b,) = list(LabelsProvider(labels, batch_size=1, with_centroids=True,
                               max_instances=4))
    assert b.gt_centroid_vals.shape == (1, 4)
    assert b.gt_centroid_vals[0, 0] == pytest.approx(0.7)
    assert b.gt_centroid_vals[0, 1] == pytest.approx(1.0)
    assert np.isnan(b.gt_centroid_vals[0, 2:]).all()


def test_labels_provider_user_frames_only_excludes_predicted_instances():
    """In user-frames (GT) mode, mixed frames expose only user instances as
    GT centroids; non-GT mode exposes all (reference finding 43)."""
    from sleap_nn_tpu.io import (
        Instance,
        LabeledFrame,
        Labels,
        PredictedInstance,
        Skeleton,
    )
    from sleap_nn_tpu.inference.providers import LabelsProvider

    skel = Skeleton(nodes=["a", "b"])
    v = flaky_video(n=3)
    user = Instance(points=np.array([[5.0, 5.0], [7.0, 7.0]]), skeleton=skel)
    pred = PredictedInstance(points=np.array([[50.0, 50.0], [52.0, 52.0]]),
                             skeleton=skel, point_scores=np.ones(2), score=0.9)
    labels = Labels(
        [
            LabeledFrame(v, 0, [user]),
            LabeledFrame(v, 1, [pred]),  # predicted-only: dropped in GT mode
            LabeledFrame(v, 2, [user, pred]),  # mixed
        ],
        videos=[v], skeletons=[skel],
    )

    gt = LabelsProvider(labels, batch_size=4, with_centroids=True,
                        max_instances=4, user_frames_only=True)
    assert [lf.frame_idx for lf in gt.lfs] == [0, 2]
    (b,) = list(gt)
    # mixed frame (slot 1 of the batch): only the user centroid
    assert b.gt_centroid_valid[1].tolist() == [True, False, False, False]
    np.testing.assert_allclose(b.gt_centroids[1, 0], [6.0, 6.0])

    allmode = LabelsProvider(labels, batch_size=4, with_centroids=True,
                             max_instances=4)
    batches = list(allmode)
    mixed = batches[0].gt_centroid_valid[2]
    assert mixed.tolist() == [True, True, False, False]
