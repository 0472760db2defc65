"""Tracking tests: synthetic moving instances across frames."""

import numpy as np
import pytest

from sleap_nn_tpu.io import LabeledFrame, Labels, PredictedInstance, Skeleton
from sleap_nn_tpu.tracking import FlowShiftTracker, KalmanShiftTracker, Tracker, run_tracker
from sleap_nn_tpu.tracking.candidates import LocalQueueCandidates
from sleap_nn_tpu.tracking.utils import (
    compute_iou,
    cull_frame_instances,
    greedy_matching,
    hungarian_matching,
)

SKEL = Skeleton(nodes=["a", "b", "c"])


def make_instance(xy, score=1.0):
    pts = np.asarray(xy, float) + np.array([[0, 0], [5, 0], [0, 5]])
    return PredictedInstance(points=pts, skeleton=SKEL, point_scores=np.ones(3), score=score)


def synth_labels(n_frames=10, speeds=((2.0, 0.0), (0.0, 2.0))):
    """Two instances moving on different linear trajectories."""
    starts = [np.array([20.0, 20.0]), np.array([80.0, 80.0])]
    lfs = []
    for t in range(n_frames):
        insts = [
            make_instance(starts[k] + t * np.asarray(speeds[k]))
            for k in range(len(starts))
        ]
        lfs.append(LabeledFrame(video=None, frame_idx=t, instances=insts))
    return Labels(lfs)


def track_ids_over_time(labels):
    out = []
    for lf in sorted(labels.labeled_frames, key=lambda l: l.frame_idx):
        out.append([inst.track.name if inst.track else None for inst in lf.predicted_instances])
    return out


@pytest.mark.parametrize("method", ["hungarian", "greedy"])
def test_tracker_consistent_ids(method):
    labels = synth_labels()
    tracker = Tracker.from_config(track_matching_method=method)
    tracker.track_labels(labels)
    ids = track_ids_over_time(labels)
    # Each instance keeps its identity across all frames.
    for t in range(1, len(ids)):
        assert ids[t] == ids[0]
    assert len(set(ids[0])) == 2
    assert len(labels.tracks) == 2
    # Tracking scores are populated.
    for lf in labels:
        for inst in lf.predicted_instances:
            assert inst.tracking_score > 0


def test_tracker_crossing_with_centroids():
    labels = synth_labels(speeds=((2.0, 2.0), (-2.0, -2.0)))
    tracker = Tracker.from_config(features="centroids", scoring_method="euclidean_dist")
    tracker.track_labels(labels)
    ids = track_ids_over_time(labels)
    for t in range(1, len(ids)):
        assert ids[t] == ids[0]


def test_local_queue_max_tracks():
    labels = synth_labels()
    tracker = Tracker.from_config(max_tracks=1, candidates_method="local_queues")
    assert isinstance(tracker.candidate, LocalQueueCandidates)
    tracker.track_labels(labels)
    assert len(labels.tracks) == 1  # capped


def test_kalman_tracker():
    labels = synth_labels(n_frames=15)
    tracker = Tracker.from_config(use_kalman=True, tracking_target_instance_count=2, features="centroids",
                                  scoring_method="euclidean_dist")
    assert isinstance(tracker, KalmanShiftTracker)
    tracker.track_labels(labels)
    ids = track_ids_over_time(labels)
    for t in range(1, len(ids)):
        assert ids[t] == ids[0]


def test_iou_and_matching_utils():
    assert compute_iou([0, 0, 10, 10], [0, 0, 10, 10]) == pytest.approx(1.0)
    assert compute_iou([0, 0, 10, 10], [20, 20, 30, 30]) == 0.0
    cost = np.array([[1.0, 9.0], [9.0, 1.0]])
    r, c = hungarian_matching(cost)
    assert set(zip(r.tolist(), c.tolist())) == {(0, 0), (1, 1)}
    r, c = greedy_matching(cost)
    assert set(zip(r.tolist(), c.tolist())) == {(0, 0), (1, 1)}


def test_cull_frame_instances():
    insts = [make_instance([i * 30, 0], score=0.1 * (i + 1)) for i in range(5)]
    culled = cull_frame_instances(insts, target_count=2)
    assert len(culled) == 2
    assert all(i.score >= 0.4 for i in culled)


def test_run_tracker_entry():
    labels = synth_labels()
    out = run_tracker(labels, window_size=3, scoring_method="oks")
    assert len(out.tracks) == 2


def test_min_match_points_gate():
    # Instances with almost all-NaN points should not spawn tracks when gated.
    pts = np.full((3, 2), np.nan)
    pts[0] = [5, 5]
    inst = PredictedInstance(points=pts, skeleton=SKEL, score=1.0)
    labels = Labels([LabeledFrame(video=None, frame_idx=0, instances=[inst])])
    tracker = Tracker.from_config(min_new_track_points=2)
    tracker.track_labels(labels)
    assert inst.track is None


def test_connect_single_breaks():
    from sleap_nn_tpu.io import Track
    from sleap_nn_tpu.tracking import connect_single_breaks

    t1, t2, t3 = Track("track_0"), Track("track_1"), Track("track_2")
    lfs = []
    for fi in range(6):
        a = make_instance([20 + 2 * fi, 20])
        b = make_instance([80, 80 + 2 * fi])
        a.track = t1
        # The tracker loses t2 at frame 3 and spawns t3 in its place.
        b.track = t2 if fi < 3 else t3
        lfs.append(LabeledFrame(video=None, frame_idx=fi, instances=[a, b]))
    labels = Labels(lfs)
    connect_single_breaks(labels, max_instances=2)
    for lf in labels.labeled_frames:
        names = {i.track.name for i in lf.instances}
        assert names == {"track_0", "track_1"}, (lf.frame_idx, names)


def test_cull_instances_and_run_tracker_knobs():
    from sleap_nn_tpu.tracking.utils import cull_instances

    # Frame with 3 predictions (one low-score duplicate) -> cull to 2.
    lfs = []
    for fi in range(4):
        insts = [
            make_instance([20 + 2 * fi, 20], score=0.9),
            make_instance([80, 80 + 2 * fi], score=0.8),
            make_instance([21 + 2 * fi, 20], score=0.1),  # near-duplicate
        ]
        lfs.append(LabeledFrame(video=None, frame_idx=fi, instances=insts))
    labels = Labels(lfs)
    cull_instances(labels, target_count=2, iou_threshold=0.3)
    assert all(len(lf.instances) == 2 for lf in labels.labeled_frames)
    assert all(
        min(i.score for i in lf.predicted_instances) >= 0.8
        for lf in labels.labeled_frames
    )

    # run_tracker wiring: pre-cull + post-connect run end to end.
    labels2 = Labels([
        LabeledFrame(video=None, frame_idx=fi, instances=[
            make_instance([20 + 2 * fi, 20], score=0.9),
            make_instance([80, 80 + 2 * fi], score=0.8),
            make_instance([22 + 2 * fi, 20], score=0.1),
        ]) for fi in range(6)
    ])
    out = run_tracker(
        labels2, window_size=3, scoring_method="oks",
        target_instance_count=2, pre_cull_to_target=True,
        pre_cull_iou_threshold=0.3, post_connect_single_breaks=True,
    )
    ids = track_ids_over_time(out)
    assert all(len(set(row)) == 2 for row in ids)
    # Identities are stable over the whole clip.
    assert len({frozenset(row) for row in ids}) == 1

    with pytest.raises(ValueError):
        run_tracker(labels2, post_connect_single_breaks=True)


def test_long_sequence_identity_stability():
    """200 frames of two sinusoid-crossing instances keep 2 stable IDs."""
    rng = np.random.default_rng(0)
    lfs = []
    for t in range(200):
        a = np.array([30.0 + 1.2 * t % 200, 50.0 + 20 * np.sin(t / 12)])
        b = np.array([170.0 - 0.7 * t % 200, 120.0 + 15 * np.cos(t / 9)])
        insts = [
            make_instance(a + rng.normal(0, 0.3, 2)),
            make_instance(b + rng.normal(0, 0.3, 2)),
        ]
        lfs.append(LabeledFrame(video=None, frame_idx=t, instances=insts))
    labels = Labels(lfs)
    tracker = Tracker.from_config(window_size=5, max_tracks=2)
    out = tracker.track_labels(labels)
    ids = track_ids_over_time(out)
    names = {n for row in ids for n in row}
    assert len(names) == 2
    # Identity flips: the first instance in each row should keep one name
    # (instances are appended in a stable order and move smoothly).
    first = [row[0] for row in ids if row]
    flips = sum(1 for x, y in zip(first, first[1:]) if x != y)
    assert flips <= 2, f"{flips} identity flips over 200 frames"


def test_long_sequence_occlusion_gap_reconnect():
    """An instance vanishing for 3 frames resumes its track within window."""
    lfs = []
    for t in range(60):
        insts = [make_instance(np.array([20.0 + 2 * t, 40.0]))]
        if not 30 <= t < 33:  # occlusion gap for the second animal
            insts.append(make_instance(np.array([150.0, 100.0 + 1.5 * t])))
        lfs.append(LabeledFrame(video=None, frame_idx=t, instances=insts))
    labels = Labels(lfs)
    tracker = Tracker.from_config(window_size=8, max_tracks=None)
    out = tracker.track_labels(labels)
    # The second animal's track name before and after the gap must match.
    def second_name(t):
        lf = next(l for l in out.labeled_frames if l.frame_idx == t)
        cands = [i for i in lf.predicted_instances if i.numpy()[0, 0] > 100]
        return cands[0].track.name if cands else None

    assert second_name(29) == second_name(34)


def test_tracker_empty_and_single_frames():
    """Frames with zero instances mid-sequence don't break track assignment."""
    lfs = []
    for t in range(20):
        insts = [] if t % 7 == 3 else [make_instance(np.array([10.0 + t, 10.0]))]
        lfs.append(LabeledFrame(video=None, frame_idx=t, instances=insts))
    out = Tracker.from_config(window_size=5).track_labels(Labels(lfs))
    names = {
        i.track.name
        for lf in out.labeled_frames
        for i in lf.predicted_instances
        if i.track
    }
    assert len(names) == 1


# -- mask-feature tracking (features="masks" / scoring "mask_iou") --------------


def _disk_mask(h, w, cx, cy, r):
    yy, xx = np.mgrid[:h, :w]
    return (xx - cx) ** 2 + (yy - cy) ** 2 <= r**2


def synth_mask_labels(n_frames=8):
    from sleap_nn_tpu.io.model import SegmentationMask

    lfs = []
    for t in range(n_frames):
        masks = [
            SegmentationMask(_disk_mask(120, 160, 30 + 2 * t, 40, 10), score=0.9),
            SegmentationMask(_disk_mask(120, 160, 120, 80 - 2 * t, 12), score=0.8),
        ]
        lf = LabeledFrame(video=None, frame_idx=t, instances=[])
        lf.masks = masks
        lfs.append(lf)
    return Labels(lfs)


def test_mask_feature_and_iou():
    from sleap_nn_tpu.tracking.utils import MaskFeature, compute_mask_iou, get_mask

    m = _disk_mask(60, 80, 30, 20, 8)
    f = get_mask(m)
    assert isinstance(f, MaskFeature)
    assert f.area == int(m.sum())
    assert compute_mask_iou(f, f) == pytest.approx(1.0)
    shifted = get_mask(_disk_mask(60, 80, 33, 20, 8))
    assert 0.3 < compute_mask_iou(f, shifted) < 1.0
    far = get_mask(_disk_mask(60, 80, 70, 50, 8))
    assert compute_mask_iou(f, far) == 0.0
    # Degenerate contracts: empty/empty -> 1.0, empty/non-empty -> 0.0.
    empty = get_mask(np.zeros((60, 80), bool))
    assert compute_mask_iou(empty, empty) == 1.0
    assert compute_mask_iou(empty, f) == 0.0


def test_mask_tracking_identity():
    labels = synth_mask_labels()
    tracker = Tracker.from_config(features="masks", scoring_method="mask_iou")
    out = tracker.track_labels(labels)
    assert len(out.tracks) == 2
    rows = []
    for lf in sorted(out.labeled_frames, key=lambda l: l.frame_idx):
        rows.append([m.track.name for m in lf.masks])
    for row in rows[1:]:
        assert row == rows[0]


def test_mask_area_gates_track_spawn():
    from sleap_nn_tpu.io.model import SegmentationMask
    from sleap_nn_tpu.tracking.utils import count_valid_points

    tiny = SegmentationMask(_disk_mask(50, 50, 25, 25, 1), score=0.5)
    assert count_valid_points(tiny) == tiny.area
    lf = LabeledFrame(video=None, frame_idx=0, instances=[])
    lf.masks = [tiny]
    tracker = Tracker.from_config(
        features="masks", scoring_method="mask_iou", min_new_track_points=50
    )
    tracker.track_labels(Labels([lf]))
    assert tiny.track is None  # area below the spawn gate


# -- Kalman knobs ----------------------------------------------------------------


def test_kalman_warmup_and_modes():
    labels = synth_labels(n_frames=20)
    tracker = Tracker.from_config(
        use_kalman=True, tracking_target_instance_count=2, features="centroids", scoring_method="euclidean_dist",
        kf_init_frame_count=5, kf_reset_gap_size=3,
    )
    assert tracker.kf_init_frame_count == 5
    assert tracker.kf_reset_gap_size == 3
    tracker.track_labels(labels)
    ids = track_ids_over_time(labels)
    for t in range(1, len(ids)):
        assert ids[t] == ids[0]
    # Filters exist after warm-up.
    assert len(tracker._filters) == 2


def test_kalman_keypoints_mode_with_node_indices():
    labels = synth_labels(n_frames=20)
    tracker = Tracker.from_config(
        use_kalman=True, tracking_target_instance_count=2, features="keypoints", scoring_method="oks",
        kf_track_features="keypoints", kf_node_indices=[0, 1],
        kf_init_frame_count=4,
    )
    # keypoints mode auto-resolves oks_stddev to the noisier 0.1.
    assert tracker.oks_stddev == pytest.approx(0.1)
    tracker.track_labels(labels)
    ids = track_ids_over_time(labels)
    for t in range(1, len(ids)):
        assert ids[t] == ids[0]
    # Observation dimension: 2 tracked nodes x 2 coords (state is 4x: pos+vel).
    kf = next(iter(tracker._filters.values()))
    assert kf.n_dim_obs == 4
    assert kf.n_dim_state == 8


def test_kalman_invalid_track_features_rejected():
    with pytest.raises(ValueError, match="kf_track_features"):
        Tracker.from_config(use_kalman=True, tracking_target_instance_count=2, kf_track_features="bogus")


def test_kalman_stale_filter_reset():
    # An instance that disappears for > kf_reset_gap_size frames gets its
    # filter dropped, then re-initialized on reappearance.
    lfs = []
    for t in range(30):
        insts = [make_instance(np.array([20.0 + 2 * t, 40.0]))]
        if not 10 <= t < 20:
            insts.append(make_instance(np.array([150.0, 100.0])))
        lfs.append(LabeledFrame(video=None, frame_idx=t, instances=insts))
    tracker = Tracker.from_config(
        use_kalman=True, tracking_target_instance_count=2, features="centroids", scoring_method="euclidean_dist",
        kf_init_frame_count=3, kf_reset_gap_size=4, window_size=15,
    )
    out = tracker.track_labels(Labels(lfs))
    assert len(out.tracks) >= 2  # both animals tracked; no crash across the gap


# -- optical flow img scale -------------------------------------------------------


def test_flow_of_img_scale_shift():
    pytest.importorskip("cv2")
    rng = np.random.default_rng(3)
    base = (rng.random((96, 128)) * 255).astype(np.uint8)
    shifted_img = np.roll(base, shift=4, axis=1)  # move right by 4 px
    tracker = Tracker.from_config(
        use_flow=True, of_img_scale=0.5, of_window_size=15, of_max_levels=2
    )
    assert isinstance(tracker, FlowShiftTracker)
    assert tracker.of_img_scale == 0.5
    pts = np.array([[40.0, 40.0], [60.0, 50.0]], np.float32)
    out = tracker._compute_optical_flow(pts, base, shifted_img)
    # Flow recovers the +4 px x-shift in ORIGINAL pixel units despite the
    # half-resolution LK computation.
    assert np.allclose(out[:, 0] - pts[:, 0], 4.0, atol=1.5)
    assert np.allclose(out[:, 1] - pts[:, 1], 0.0, atol=1.5)


# -- post-tracking clean cull -----------------------------------------------------


def test_run_tracker_clean_instance_count():
    lfs = []
    for fi in range(6):
        insts = [
            make_instance([20 + 2 * fi, 20], score=0.9),
            make_instance([80, 80 + 2 * fi], score=0.8),
            make_instance([140, 30 + fi], score=0.2),  # spurious third
        ]
        lfs.append(LabeledFrame(video=None, frame_idx=fi, instances=insts))
    out = run_tracker(
        Labels(lfs), window_size=3, scoring_method="oks",
        clean_instance_count=2,
    )
    assert all(len(lf.predicted_instances) == 2 for lf in out.labeled_frames)
    assert all(
        min(i.score for i in lf.predicted_instances) >= 0.8
        for lf in out.labeled_frames
    )
