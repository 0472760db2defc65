"""Tracking extras: candidate pool mechanics, feature/scorer combinations,
reduction modes (reference tracking/candidates tests model).
"""

import numpy as np
import pytest

from sleap_nn_tpu.io import LabeledFrame, Labels, PredictedInstance, Skeleton
from sleap_nn_tpu.tracking import Tracker
from sleap_nn_tpu.tracking.candidates import (
    FixedWindowCandidates,
    LocalQueueCandidates,
)

SKEL = Skeleton(nodes=["a", "b", "c"])


def make_instance(xy, score=1.0):
    pts = np.asarray(xy, float) + np.array([[0, 0], [5, 0], [0, 5]])
    return PredictedInstance(points=pts, skeleton=SKEL,
                             point_scores=np.ones(3), score=score)


def synth(n_frames=10, speeds=((2.0, 0.0), (0.0, 2.0))):
    starts = [np.array([20.0, 20.0]), np.array([80.0, 80.0])]
    return Labels([
        LabeledFrame(video=None, frame_idx=t, instances=[
            make_instance(starts[k] + t * np.asarray(speeds[k]))
            for k in range(len(starts))
        ]) for t in range(n_frames)
    ])


def rows(labels):
    return [
        [i.track.name if i.track else None for i in lf.predicted_instances]
        for lf in sorted(labels.labeled_frames, key=lambda l: l.frame_idx)
    ]


def test_fixed_window_evicts_old_frames():
    c = FixedWindowCandidates(window_size=3)
    tracker = Tracker(candidate=c, features="centroids",
                      scoring_method="euclidean_dist")
    for t in range(6):
        tracker.track([make_instance([10.0 + t, 10.0])], t)
    # Queue holds at most window_size frames.
    assert len(c.tracker_queue) <= 3


def test_local_queue_per_track_depth():
    c = LocalQueueCandidates(window_size=2, max_tracks=4)
    tracker = Tracker(candidate=c, features="centroids",
                      scoring_method="euclidean_dist")
    for t in range(6):
        tracker.track([make_instance([10.0 + t, 10.0])], t)
    (tid,) = c.current_tracks
    assert len(c.tracker_queue[tid]) <= 2


def test_features_bboxes_with_iou_scoring():
    labels = synth()
    tracker = Tracker.from_config(features="bboxes", scoring_method="iou")
    out = tracker.track_labels(labels)
    r = rows(out)
    assert all(row == r[0] for row in r)
    assert len(set(r[0])) == 2


def test_scoring_reduction_modes():
    for reduction, extra in [("mean", {}), ("max", {}),
                             ("robust_quantile", {"robust_best_instance": 0.9})]:
        labels = synth()
        tracker = Tracker.from_config(
            scoring_reduction=reduction, window_size=4, **extra)
        out = tracker.track_labels(labels)
        r = rows(out)
        assert all(row == r[0] for row in r), reduction


def test_invalid_scoring_reduction_raises():
    labels = synth(n_frames=3)
    tracker = Tracker.from_config(scoring_reduction="bogus")
    with pytest.raises(ValueError, match="scoring_reduction"):
        tracker.track_labels(labels)


def test_invalid_features_raises():
    labels = synth(n_frames=3)
    tracker = Tracker.from_config(features="bogus")
    with pytest.raises(ValueError, match="features"):
        tracker.track_labels(labels)


def test_invalid_scoring_method_raises():
    labels = synth(n_frames=3)
    tracker = Tracker.from_config(scoring_method="bogus")
    with pytest.raises(ValueError, match="scoring_method"):
        tracker.track_labels(labels)


def test_invalid_matching_method_raises():
    labels = synth(n_frames=3)
    tracker = Tracker.from_config(track_matching_method="bogus")
    with pytest.raises(ValueError, match="track_matching_method"):
        tracker.track_labels(labels)


def test_local_queue_max_tracks_blocks_new_spawns():
    # 3 instances but max_tracks=2: the third never gets an id.
    lfs = []
    for t in range(5):
        lfs.append(LabeledFrame(video=None, frame_idx=t, instances=[
            make_instance([10.0 + t, 10]),
            make_instance([100.0, 10 + t]),
            make_instance([200.0, 200 - t]),
        ]))
    tracker = Tracker.from_config(max_tracks=2)
    out = tracker.track_labels(Labels(lfs))
    assert len(out.tracks) == 2
    untracked = [
        i for lf in out.labeled_frames for i in lf.predicted_instances
        if i.track is None
    ]
    assert untracked  # the surplus instance stays unassigned


def test_tracking_scores_populated_and_bounded():
    labels = synth()
    Tracker.from_config(scoring_method="oks").track_labels(labels)
    for lf in labels.labeled_frames:
        for inst in lf.predicted_instances:
            assert 0.0 <= inst.tracking_score <= 1.0 + 1e-9


def test_tracker_reconnects_across_all_empty_gap():
    """Empty frames don't advance the candidate window (only processed
    frames are enqueued), so identity survives an all-empty gap."""
    lfs = []
    for t in range(12):
        insts = [] if 4 <= t < 9 else [make_instance([10.0 + t, 10.0])]
        lfs.append(LabeledFrame(video=None, frame_idx=t, instances=insts))
    out = Tracker.from_config(window_size=3).track_labels(Labels(lfs))
    names = {i.track.name for lf in out.labeled_frames
             for i in lf.predicted_instances if i.track}
    assert len(names) == 1
