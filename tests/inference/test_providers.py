"""Provider tests: batch padding/validity, frame subsets, GT centroids,
prefetch equivalence (reference inference/providers test model).
"""

import numpy as np
import pytest

from sleap_nn_tpu.inference.providers import LabelsProvider, VideoProvider
from sleap_nn_tpu.io import Instance, LabeledFrame, Labels, Skeleton
from sleap_nn_tpu.io.video import Video

MP4 = "/root/reference/tests/assets/datasets/small_robot.mp4"
SKEL = Skeleton(nodes=["a", "b"])


def test_video_provider_pads_last_batch():
    p = VideoProvider(Video(MP4), batch_size=4, frames=list(range(6)))
    batches = list(p)
    assert len(batches) == 2
    assert batches[0].frames.shape[0] == 4
    assert batches[0].valid.all()
    # Last batch is padded to the full batch size; padding marked invalid.
    assert batches[1].frames.shape[0] == 4
    assert batches[1].valid.tolist() == [True, True, False, False]
    assert batches[1].frame_inds[:2].tolist() == [4, 5]


def test_video_provider_frame_subset_order():
    p = VideoProvider(Video(MP4), batch_size=3, frames=[5, 1, 9])
    (b,) = list(p)
    assert b.frame_inds[:3].tolist() == [5, 1, 9]
    assert b.frames.shape[1:] == (320, 560, 3)


def test_video_provider_string_path():
    p = VideoProvider(MP4, batch_size=2, frames=[0, 1])
    (b,) = list(p)
    assert b.frames.dtype == np.uint8
    assert b.valid.all()


def test_labels_provider_batches_and_video_inds():
    video = Video(MP4)
    lfs = [
        LabeledFrame(video=video, frame_idx=i,
                     instances=[Instance(np.full((2, 2), 10.0 + i), SKEL)])
        for i in range(5)
    ]
    labels = Labels(lfs)
    labels.videos = [video]
    p = LabelsProvider(labels, batch_size=2)
    batches = list(p)
    assert len(batches) == 3
    assert batches[-1].valid.tolist() == [True, False]
    assert all((b.video_inds == 0).all() for b in batches)


def test_labels_provider_gt_centroids_anchor():
    video = Video(MP4)
    pts = np.array([[10.0, 20.0], [30.0, 40.0]])
    lf = LabeledFrame(video=video, frame_idx=0,
                      instances=[Instance(pts, SKEL)])
    labels = Labels([lf])
    labels.videos = [video]

    # Default anchor: mean of visible nodes.
    (b,) = list(LabelsProvider(labels, batch_size=1, with_centroids=True,
                               max_instances=4))
    np.testing.assert_allclose(b.gt_centroids[0, 0], [20.0, 30.0])
    assert np.isnan(b.gt_centroids[0, 1]).all()  # empty slot NaN-padded

    # anchor_ind pins to node 0.
    (b2,) = list(LabelsProvider(labels, batch_size=1, with_centroids=True,
                                max_instances=4, anchor_ind=0))
    np.testing.assert_allclose(b2.gt_centroids[0, 0], [10.0, 20.0])


def test_labels_provider_empty_frames_still_batch():
    video = Video(MP4)
    lfs = [LabeledFrame(video=video, frame_idx=i, instances=[]) for i in range(3)]
    labels = Labels(lfs)
    labels.videos = [video]
    batches = list(LabelsProvider(labels, batch_size=2))
    assert sum(int(b.valid.sum()) for b in batches) == 3


def test_prefetch_equivalence():
    """prefetch=0 and prefetch=2 yield identical batches."""
    a = [b.frames.sum() for b in
         VideoProvider(Video(MP4), batch_size=4, frames=list(range(8)),
                       prefetch=0)]
    b = [b_.frames.sum() for b_ in
         VideoProvider(Video(MP4), batch_size=4, frames=list(range(8)),
                       prefetch=2)]
    assert a == b
