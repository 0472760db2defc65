"""Long-video / occlusion / multi-animal tracking scenario matrix.

Reference scenario sources: tests/tracking/test_tracker.py long-sequence
cases and the issue-regression style (crossing paths, occlusion gaps,
re-entry, identity counts, cull + clean + single-break repair).
"""

from __future__ import annotations

import numpy as np
import pytest

from sleap_nn_tpu.io import LabeledFrame, Labels, PredictedInstance, Skeleton
from sleap_nn_tpu.tracking import Tracker
from sleap_nn_tpu.tracking.tracker import connect_single_breaks, run_tracker
from sleap_nn_tpu.tracking.utils import (
    compute_euclidean_distance,
    compute_iou,
    compute_oks_score,
    cull_frame_instances,
    cull_instances,
    greedy_matching,
    hungarian_matching,
    nms_fast,
)

SKEL = Skeleton(nodes=["a", "b", "c"])


def inst(xy, score=1.0):
    pts = np.asarray(xy, float) + np.array([[0.0, 0.0], [5.0, 0.0], [0.0, 5.0]])
    return PredictedInstance(points=pts, skeleton=SKEL,
                             point_scores=np.ones(3), score=score)


def labels_from_paths(paths, drop=lambda k, t: False):
    """paths: list of per-animal position functions t -> (x, y)."""
    n_frames = max(len(p) for p in paths)
    lfs = []
    for t in range(n_frames):
        instances = [
            inst(p[t]) for k, p in enumerate(paths)
            if t < len(p) and not drop(k, t)
        ]
        lfs.append(LabeledFrame(video=None, frame_idx=t, instances=instances))
    return Labels(lfs)


def track_ids(labels):
    out = {}
    for lf in sorted(labels.labeled_frames, key=lambda l: l.frame_idx):
        for i in lf.predicted_instances:
            out.setdefault(i.track.name if i.track else None, []).append(
                (lf.frame_idx, tuple(np.round(i.numpy()[0], 1)))
            )
    return out


def straight(start, velocity, n):
    return [np.asarray(start, float) + t * np.asarray(velocity, float)
            for t in range(n)]


# ── identity continuity ──────────────────────────────────────────────────────


def test_two_parallel_animals_keep_identities_100_frames():
    labels = labels_from_paths([
        straight([10, 10], [1.5, 0], 100),
        straight([10, 120], [1.5, 0], 100),
    ])
    out = Tracker.from_config(window_size=5).track_labels(labels)
    ids = track_ids(out)
    assert len(ids) == 2
    assert all(len(v) == 100 for v in ids.values())


def test_crossing_paths_hungarian_keeps_identities():
    # Vertical separation shrinks then grows; OKS matching across a 1-frame
    # step keeps each identity through the crossing.
    a = straight([0, 0], [2, 2], 60)
    b = straight([0, 118], [2, -2], 60)
    out = Tracker.from_config(window_size=3).track_labels(
        labels_from_paths([a, b])
    )
    ids = track_ids(out)
    # At the exact crossing the two detections coincide, so a window tracker
    # without a motion model may swap identities — but it must keep exactly
    # two continuous tracks covering every frame (no spurious births).
    assert len(ids) == 2
    assert all(len(v) == 60 for v in ids.values())


def test_occlusion_gap_within_window_resumes_track():
    path = straight([50, 50], [1, 0], 30)
    labels = labels_from_paths([path], drop=lambda k, t: t in (10, 11))
    out = Tracker.from_config(window_size=5).track_labels(labels)
    ids = track_ids(out)
    assert len(ids) == 1  # the gap is bridged by the candidate window
    assert len(next(iter(ids.values()))) == 28


def test_occlusion_gap_beyond_window_starts_new_track():
    path = straight([50, 50], [1, 0], 40)
    gap = set(range(10, 25))  # 15-frame gap >> window 5
    labels = labels_from_paths([path], drop=lambda k, t: t in gap)
    out = Tracker.from_config(window_size=5).track_labels(labels)
    assert len(track_ids(out)) == 2


def test_new_animal_entering_gets_new_track():
    a = straight([10, 10], [1, 0], 50)
    b = straight([200, 200], [0, 1], 30)
    labels = labels_from_paths([a, b], drop=lambda k, t: k == 1 and t < 20)
    out = Tracker.from_config(window_size=5).track_labels(labels)
    ids = track_ids(out)
    assert len(ids) == 2
    lengths = sorted(len(v) for v in ids.values())
    assert lengths == [10, 50]  # b only exists frames 20..29


def test_max_tracks_caps_identities():
    paths = [straight([20 * k, 10], [0, 1], 20) for k in range(5)]
    out = Tracker.from_config(window_size=3, max_tracks=3).track_labels(
        labels_from_paths(paths)
    )
    named = [k for k in track_ids(out) if k is not None]
    assert len(named) <= 3


def test_min_match_points_blocks_sparse_matches():
    # Instances with only 1 visible point can't match when 2 are required.
    lfs = []
    for t in range(5):
        pts = np.full((3, 2), np.nan)
        pts[0] = [10.0 + t, 10.0]
        lfs.append(LabeledFrame(video=None, frame_idx=t, instances=[
            PredictedInstance(points=pts, skeleton=SKEL,
                              point_scores=np.ones(3), score=1.0)
        ]))
    out = Tracker.from_config(window_size=3, min_match_points=2).track_labels(
        Labels(lfs)
    )
    assert len(track_ids(out)) == 5  # every frame spawns a fresh track


# ── feature / scoring combos ─────────────────────────────────────────────────


@pytest.mark.parametrize("features,scoring", [
    ("keypoints", "oks"),
    ("centroids", "euclidean_dist"),
    ("bboxes", "iou"),
    ("keypoints", "cosine_sim"),
])
def test_feature_scoring_combo_tracks_two_animals(features, scoring):
    labels = labels_from_paths([
        straight([10, 10], [1, 0], 20),
        straight([10, 150], [1, 0], 20),
    ])
    out = Tracker.from_config(window_size=3, features=features,
                              scoring_method=scoring).track_labels(labels)
    assert len(track_ids(out)) == 2


@pytest.mark.parametrize("reduction", ["mean", "max", "robust_quantile"])
def test_scoring_reductions_run(reduction):
    labels = labels_from_paths([straight([10, 10], [1, 0], 10)])
    out = Tracker.from_config(
        window_size=4, scoring_reduction=reduction,
        robust_best_instance=0.9 if reduction == "robust_quantile" else 1.0,
    ).track_labels(labels)
    assert len(track_ids(out)) == 1


def test_greedy_vs_hungarian_same_result_on_easy_case():
    labels = labels_from_paths([
        straight([10, 10], [1, 0], 15),
        straight([10, 200], [1, 0], 15),
    ])
    h = Tracker.from_config(window_size=3,
                            track_matching_method="hungarian").track_labels(labels)
    labels2 = labels_from_paths([
        straight([10, 10], [1, 0], 15),
        straight([10, 200], [1, 0], 15),
    ])
    g = Tracker.from_config(window_size=3,
                            track_matching_method="greedy").track_labels(labels2)
    assert len(track_ids(h)) == len(track_ids(g)) == 2


def test_flow_tracker_tracks_with_images():
    """FlowShiftTracker needs frames; give a moving blob video."""
    rng = np.random.default_rng(0)
    frames = []
    for t in range(8):
        img = (rng.normal(8, 2, (64, 64)).clip(0, 255)).astype(np.uint8)
        x = 10 + 3 * t
        img[28:36, x:x + 8] = 255
        frames.append(img)
    lfs = []
    for t in range(8):
        lfs.append(LabeledFrame(video=None, frame_idx=t,
                                instances=[inst([10 + 3 * t + 4, 30])]))
    labels = Labels(lfs)
    tracker = Tracker.from_config(window_size=3, use_flow=True)
    for t, lf in enumerate(sorted(labels.labeled_frames,
                                  key=lambda l: l.frame_idx)):
        tracked = tracker.track(lf.predicted_instances, t,
                                image=frames[t][..., None])
        lf.instances = tracked
    assert len(track_ids(labels)) == 1


def test_kalman_tracker_survives_velocity_gap():
    path = straight([20, 20], [3, 0], 30)
    labels = labels_from_paths([path], drop=lambda k, t: t in (15, 16))
    out = Tracker.from_config(
        window_size=5, use_kalman=True, tracking_target_instance_count=2, kf_init_frame_count=8,
        kf_reset_gap_size=5,
    ).track_labels(labels)
    assert len(track_ids(out)) == 1


# ── culling / cleaning / repair ──────────────────────────────────────────────


def test_pre_cull_to_target_keeps_best_scoring():
    lfs = [LabeledFrame(video=None, frame_idx=0, instances=[
        inst([10, 10], score=0.9),
        inst([100, 100], score=0.8),
        inst([12, 12], score=0.2),
    ])]
    labels = Labels(lfs)
    cull_instances(labels, 2, 0)
    got = labels.labeled_frames[0].predicted_instances
    assert len(got) == 2
    assert sorted(i.score for i in got) == [0.8, 0.9]


def test_cull_uses_iou_nms_before_score():
    insts = [inst([10, 10], score=0.9), inst([10.5, 10.5], score=0.85),
             inst([100, 100], score=0.3)]
    got = cull_frame_instances(insts, 2, iou_threshold=0.5)
    assert len(got) == 2
    # the overlapping low-scorer is dropped, the far one kept despite score
    scores = sorted(i.score for i in got)
    assert scores == [0.3, 0.9]


def test_run_tracker_clean_instance_count_post_filter():
    paths = [straight([30 * k, 10], [0, 1], 10) for k in range(3)]
    out = run_tracker(labels_from_paths(paths), window_size=3,
                      clean_instance_count=2)
    for lf in out.labeled_frames:
        assert len(lf.predicted_instances) <= 2


def test_connect_single_breaks_merges_one_frame_identity_break():
    labels = labels_from_paths([straight([10, 10], [1, 0], 9)])
    out = Tracker.from_config(window_size=3).track_labels(labels)
    # Manufacture a single-frame break: frame 4 gets a fresh track object.
    from sleap_nn_tpu.io.model import Track

    lf4 = sorted(out.labeled_frames, key=lambda l: l.frame_idx)[4]
    lf4.predicted_instances[0].track = Track(name="spurious")
    repaired = connect_single_breaks(out, max_instances=1)
    names = {i.track.name for lf in repaired.labeled_frames
             for i in lf.predicted_instances}
    assert len(names) == 1


def test_run_tracker_post_connect_requires_target_count():
    labels = labels_from_paths([straight([10, 10], [1, 0], 5)])
    with pytest.raises(ValueError, match="target_instance_count"):
        run_tracker(labels, post_connect_single_breaks=True)


# ── matching / scoring primitives ────────────────────────────────────────────


def test_hungarian_matching_optimal_assignment():
    cost = np.array([[1.0, 10.0], [10.0, 1.0]])
    rows, cols = hungarian_matching(cost)
    assert list(zip(rows, cols)) == [(0, 0), (1, 1)]


def test_hungarian_beats_greedy_on_adversarial_costs():
    cost = np.array([[1.0, 2.0], [2.0, 100.0]])
    hr, hc = hungarian_matching(cost)
    total_h = cost[hr, hc].sum()
    gr, gc = greedy_matching(cost)
    total_g = cost[gr, gc].sum()
    assert total_h == 4.0  # (0,1)+(1,0)
    assert total_g == 101.0  # greedy takes (0,0) first then is stuck


def test_greedy_matching_rectangular():
    cost = np.array([[5.0, 1.0, 3.0]])
    rows, cols = greedy_matching(cost)
    assert list(rows) == [0] and list(cols) == [1]


def test_oks_score_identical_instances_is_one():
    a = np.array([[0.0, 0.0], [5.0, 0.0], [0.0, 5.0]])
    assert np.isclose(compute_oks_score(a, a.copy()), 1.0, atol=1e-6)


def test_oks_score_decays_with_distance():
    a = np.array([[0.0, 0.0], [5.0, 0.0], [0.0, 5.0]])
    near = compute_oks_score(a, a + 0.5)
    far = compute_oks_score(a, a + 5.0)
    assert 0 < far < near < 1.0


def test_iou_of_disjoint_and_nested_boxes():
    a = np.array([0.0, 0.0, 10.0, 10.0])
    assert compute_iou(a, np.array([20.0, 20.0, 30.0, 30.0])) == 0.0
    inner = np.array([2.0, 2.0, 8.0, 8.0])
    got = compute_iou(a, inner)
    assert np.isclose(got, 36.0 / 100.0)


def test_euclidean_distance_feature_scores_negative_distance():
    # Tracker converts distances to similarities internally; the primitive
    # itself is a plain distance.
    d = compute_euclidean_distance(np.array([0.0, 0.0]), np.array([3.0, 4.0]))
    assert np.isclose(abs(d), 5.0)


def test_nms_fast_suppresses_by_iou():
    boxes = np.array([
        [0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60],
    ], float)
    scores = np.array([0.9, 0.8, 0.5])
    keep = nms_fast(boxes, scores, iou_threshold=0.5)
    assert 0 in keep and 2 in keep and 1 not in keep


# ── track_labels bookkeeping ─────────────────────────────────────────────────


def test_track_labels_registers_tracks_on_labels():
    labels = labels_from_paths([straight([5, 5], [1, 1], 6)])
    out = Tracker.from_config(window_size=3).track_labels(labels)
    assert out.tracks and all(t.name for t in out.tracks)
    inst_tracks = {i.track for lf in out.labeled_frames
                   for i in lf.predicted_instances}
    assert inst_tracks <= set(out.tracks)


def test_track_labels_sets_tracking_score():
    labels = labels_from_paths([straight([5, 5], [1, 0], 6)])
    out = Tracker.from_config(window_size=3).track_labels(labels)
    later = [i for lf in sorted(out.labeled_frames,
                                key=lambda l: l.frame_idx)[1:]
             for i in lf.predicted_instances]
    assert all(getattr(i, "tracking_score", None) is not None for i in later)


def test_empty_frames_are_tolerated():
    lfs = [LabeledFrame(video=None, frame_idx=t,
                        instances=[] if t % 2 else [inst([10 + t, 10])])
           for t in range(8)]
    out = Tracker.from_config(window_size=4).track_labels(Labels(lfs))
    assert len(track_ids(out)) == 1


def test_mask_tracking_gap_beyond_window_flushes():
    """The frame-based window flush applies to MASK tracking too: an
    occlusion gap longer than the window starts a new identity."""
    from sleap_nn_tpu.io.model import SegmentationMask

    def run(gap):
        lfs = []
        for t in range(14):
            lf = LabeledFrame(video=None, frame_idx=t, instances=[])
            if t not in gap:
                m = np.zeros((32, 32), bool)
                m[8:16, 8 + t:16 + t] = True
                lf.masks = [SegmentationMask(mask=m, score=0.9)]
            lfs.append(lf)
        out = Tracker.from_config(window_size=3, features="masks",
                                  scoring_method="mask_iou").track_labels(
            Labels(lfs))
        return {m.track.name for lf in out.labeled_frames
                for m in getattr(lf, "masks", []) if m.track}

    assert len(run(range(5, 10))) == 2  # 5-frame gap > window 3
    assert len(run(range(5, 7))) == 1   # 2-frame gap bridged


# ── mixed-scale mask features (#618 stride encoding in mask-IoU tracking) ──


def test_mask_iou_same_scale_native_resolution():
    """Same-scale features compare without rescaling (unit-free IoU)."""
    from sleap_nn_tpu.io.model import SegmentationMask
    from sleap_nn_tpu.tracking.utils import compute_mask_iou

    m = np.zeros((32, 32), bool)
    m[8:24, 8:24] = True
    a = SegmentationMask(m, scale=4.0)
    b = SegmentationMask(m.copy(), scale=4.0)
    assert compute_mask_iou(a, b) == 1.0


def test_mask_iou_mixed_scales_compares_in_image_space():
    """A stride-4 mask and its exact image-res decode must IoU ~1.0; naive
    native-grid comparison would place the grid mask in the wrong corner."""
    from sleap_nn_tpu.io.model import SegmentationMask
    from sleap_nn_tpu.tracking.utils import compute_mask_iou

    full = np.zeros((128, 128), bool)
    full[32:96, 32:96] = True
    grid = full[::4, ::4]
    a = SegmentationMask(full, scale=1.0)
    b = SegmentationMask(grid, scale=4.0)
    assert compute_mask_iou(a, b) > 0.95
    # Control: the same grid mask claiming image resolution is a quarter-
    # size blob at the wrong place.
    c = SegmentationMask(grid, scale=1.0)
    assert compute_mask_iou(a, c) < 0.3


def test_mask_retrack_mixed_scales_keeps_identity(tmp_path):
    """Retracking a labels file whose masks mix image-res and stride-encoded
    sources keeps per-animal identity across frames."""
    from sleap_nn_tpu.io.model import LabeledFrame, Labels, SegmentationMask
    from sleap_nn_tpu.io.video import Video
    from sleap_nn_tpu.tracking.tracker import run_tracker

    vid = Video(filename="fake.mp4")
    lfs = []
    for t in range(4):
        a_full = np.zeros((128, 128), bool)
        a_full[10 + t:40 + t, 10:40] = True  # animal A drifting down
        b_full = np.zeros((128, 128), bool)
        b_full[80:120, 80 + t:110 + t] = True  # animal B drifting right
        if t % 2 == 0:  # alternate sources: image-res vs stride-encoded
            masks = [SegmentationMask(a_full, score=1.0),
                     SegmentationMask(b_full, score=1.0)]
        else:
            masks = [SegmentationMask(a_full[::4, ::4], score=1.0, scale=4.0),
                     SegmentationMask(b_full[::4, ::4], score=1.0, scale=4.0)]
        lf = LabeledFrame(video=vid, frame_idx=t, instances=[])
        lf.masks = masks
        lfs.append(lf)
    labels = Labels(lfs, videos=[vid])
    out = run_tracker(labels, features="masks", scoring_method="mask_iou",
                      target_instance_count=2)
    names_per_frame = [
        tuple(sorted(m.track.name for m in lf.masks))
        for lf in out.labeled_frames
    ]
    assert len(set(names_per_frame)) == 1  # two stable identities
    a_names = [lf.masks[0].track.name for lf in out.labeled_frames]
    assert len(set(a_names)) == 1  # animal A keeps ONE track across sources
