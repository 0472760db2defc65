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


def test_empty_gap_beyond_window_flushes_candidates():
    """The fixed candidate window is FRAME-based (reference semantics):
    empty frames advance it, so an all-empty gap longer than the window
    flushes candidates and re-entry starts a NEW track. A gap shorter than
    the window still reconnects."""
    def run(gap):
        lfs = []
        for t in range(12):
            insts = [] if t in gap else [make_instance([10.0 + t, 10.0])]
            lfs.append(LabeledFrame(video=None, frame_idx=t, instances=insts))
        out = Tracker.from_config(window_size=3).track_labels(Labels(lfs))
        return {i.track.name for lf in out.labeled_frames
                for i in lf.predicted_instances if i.track}

    assert len(run(range(4, 9))) == 2   # 5-frame gap > window 3 -> new track
    assert len(run(range(4, 6))) == 1   # 2-frame gap < window 3 -> bridged


def test_two_trackers_do_not_share_track_objects():
    """Separate tracker instances mint distinct Track objects (reference
    test_tracker_track_objects_not_shared)."""
    a, b = synth(n_frames=3), synth(n_frames=3)
    t1 = Tracker.from_config()
    t2 = Tracker.from_config()
    t1.track_labels(a)
    t2.track_labels(b)
    tracks_a = {id(i.track) for lf in a.labeled_frames
                for i in lf.predicted_instances if i.track}
    tracks_b = {id(i.track) for lf in b.labeled_frames
                for i in lf.predicted_instances if i.track}
    assert not tracks_a & tracks_b


def test_run_tracker_zero_frames_with_clean_count():
    from sleap_nn_tpu.io import Labels
    from sleap_nn_tpu.tracking import run_tracker

    out = run_tracker(Labels([]), clean_instance_count=2)
    assert out.labeled_frames == []
    assert out.tracks == []


def test_get_scores_empty_candidate_list_no_crash():
    """A track whose candidate list is empty scores NaN, not crash."""
    tracker = Tracker.from_config()
    inst = make_instance([10, 10])
    current = tracker.get_features([inst], 0)
    # Fabricate a live track id with NO stored features.
    tracker.candidate.tracker_queue.append([])
    scores = tracker.get_scores(current, {tid: [] for tid in
                                          tracker.candidate.current_tracks})
    assert scores.shape[0] == 1
    assert np.isnan(scores).all() or scores.size == 0


def test_hungarian_all_inf_matrix_yields_no_matches():
    from sleap_nn_tpu.tracking.utils import hungarian_matching

    cost = np.full((3, 3), np.inf)
    rows, cols = hungarian_matching(cost)
    assert len(rows) == 0 and len(cols) == 0


def test_nms_with_target_keeps_count():
    from sleap_nn_tpu.tracking.utils import nms_fast

    boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60],
                      [100, 100, 110, 110]], float)
    scores = np.array([0.9, 0.8, 0.7, 0.6])
    keep = nms_fast(boxes, scores, iou_threshold=0.5, target_count=2)
    assert len(keep) == 2
    assert keep[0] == 0  # highest score survives
    assert 1 not in keep  # suppressed duplicate
