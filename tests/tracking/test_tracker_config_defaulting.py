"""Regression matrix: legacy tracker-config defaulting + cap semantics.

Parity target: reference issue-582 clusters (reference
tests/inference/test_issue_582.py — _build_tracker_config defaulting,
apply_tracking gates, bottom-up top-N-by-score truncation), re-expressed
against this repo's CLI edge layer (sleap_nn_tpu/cli.py
_build_tracker_kwargs), run_tracker (tracking/tracker.py), and
group_batch_host (inference/streaming.py).
"""

from __future__ import annotations

import numpy as np
import pytest

from sleap_nn_tpu.cli import _TRACKER_KNOBS, _build_tracker_kwargs
from sleap_nn_tpu.inference.streaming import group_batch_host
from sleap_nn_tpu.io import LabeledFrame, Labels, PredictedInstance, Skeleton
from sleap_nn_tpu.tracking import Tracker, run_tracker
from sleap_nn_tpu.tracking.candidates import (
    FixedWindowCandidates,
    LocalQueueCandidates,
)


def _cli_kwargs(**over):
    """A full click-kwarg dict with every tracking knob at its CLI default."""
    kw = {
        "tracking": True,
        "max_instances": None,
        "tracking_window_size": 5,
        "min_new_track_points": 0,
        "candidates_method": None,
        "min_match_points": 0,
        "features": None,
        "scoring_method": None,
        "scoring_reduction": "mean",
        "robust_best_instance": 1.0,
        "track_matching_method": "hungarian",
        "max_tracks": None,
        "use_flow": False,
        "of_img_scale": 1.0,
        "of_window_size": 21,
        "of_max_levels": 3,
        "use_kalman": False,
        "kf_track_features": "centroid",
        "kf_init_frame_count": 10,
        "kf_node_indices": None,
        "kf_reset_gap_size": 5,
        "oks_stddev": None,
        "post_connect_single_breaks": False,
        "tracking_target_instance_count": None,
        "tracking_pre_cull_to_target": 0,
        "tracking_pre_cull_iou_threshold": 0.0,
        "tracking_clean_instance_count": 0,
        "tracking_clean_iou_threshold": 0.0,
    }
    kw.update(over)
    return kw


# ------------------------------------------------ CLI edge-layer defaulting


def test_post_connect_derives_max_tracks_from_max_instances():
    out = _build_tracker_kwargs(
        _cli_kwargs(post_connect_single_breaks=True, max_instances=3)
    )
    assert out["max_tracks"] == 3
    assert out["target_instance_count"] == 3


def test_post_connect_keeps_explicit_max_tracks():
    out = _build_tracker_kwargs(
        _cli_kwargs(post_connect_single_breaks=True, max_instances=3, max_tracks=7)
    )
    assert out["max_tracks"] == 7
    assert out["target_instance_count"] == 3


def test_pre_cull_derives_target_from_max_instances():
    out = _build_tracker_kwargs(
        _cli_kwargs(tracking_pre_cull_to_target=1, max_instances=4)
    )
    assert out["target_instance_count"] == 4
    assert out["pre_cull_to_target"] is True
    # pre_cull alone must NOT force a track cap.
    assert out["max_tracks"] is None


def test_kalman_derives_target_from_max_instances():
    out = _build_tracker_kwargs(_cli_kwargs(use_kalman=True, max_instances=2))
    assert out["target_instance_count"] == 2


def test_explicit_target_never_overwritten():
    out = _build_tracker_kwargs(
        _cli_kwargs(
            post_connect_single_breaks=True,
            max_instances=9,
            tracking_target_instance_count=2,
        )
    )
    assert out["target_instance_count"] == 2


def test_no_max_instances_leaves_target_none_for_downstream_gate():
    out = _build_tracker_kwargs(_cli_kwargs(post_connect_single_breaks=True))
    assert out["target_instance_count"] is None


def test_plain_tracking_derives_nothing():
    out = _build_tracker_kwargs(_cli_kwargs(max_instances=5))
    assert out["target_instance_count"] is None
    assert out["max_tracks"] is None


def test_tracking_off_returns_empty_and_pops_all_knobs():
    kw = _cli_kwargs(tracking=False, post_connect_single_breaks=True,
                     max_instances=3)
    out = _build_tracker_kwargs(kw)
    assert out == {}
    for k in _TRACKER_KNOBS:
        assert k not in kw
    # Non-tracking kwargs survive for predict().
    assert kw["max_instances"] == 3


def test_unset_sentinel_knobs_omitted_for_downstream_resolution():
    out = _build_tracker_kwargs(_cli_kwargs())
    for k in ("candidates_method", "features", "scoring_method", "oks_stddev",
              "kf_node_indices"):
        assert k not in out


# ------------------------------------------------------- run_tracker gates

SKEL = Skeleton(nodes=["a", "b"])


def _labels(n_frames=4):
    lfs = []
    for t in range(n_frames):
        insts = [
            PredictedInstance(
                points=np.array([[10.0 + t, 10.0], [15.0 + t, 10.0]]),
                skeleton=SKEL, point_scores=np.ones(2), score=1.0,
            ),
            PredictedInstance(
                points=np.array([[80.0, 80.0 + t], [85.0, 80.0 + t]]),
                skeleton=SKEL, point_scores=np.ones(2), score=0.9,
            ),
        ]
        lfs.append(LabeledFrame(video=None, frame_idx=t, instances=insts))
    return Labels(lfs)


def test_run_tracker_post_connect_without_target_raises_before_tracking():
    labels = _labels()
    with pytest.raises(ValueError, match="target_instance_count"):
        run_tracker(labels, post_connect_single_breaks=True)
    # Fail-fast: nothing was tracked.
    assert all(
        inst.track is None
        for lf in labels.labeled_frames
        for inst in lf.predicted_instances
    )


def test_run_tracker_pre_cull_without_target_raises():
    with pytest.raises(ValueError, match="target_instance_count"):
        run_tracker(_labels(), pre_cull_to_target=True)


def test_run_tracker_post_connect_with_target_succeeds():
    labels = run_tracker(
        _labels(), post_connect_single_breaks=True, target_instance_count=2
    )
    assert len(labels.tracks) == 2


def test_run_tracker_pre_cull_with_target_succeeds():
    labels = run_tracker(
        _labels(), pre_cull_to_target=True, target_instance_count=1,
    )
    for lf in labels.labeled_frames:
        assert len(lf.predicted_instances) == 1


# --------------------------------------------- candidate-maker auto-switch


def test_max_tracks_switches_explicit_fixed_window_to_local_queues():
    tracker = Tracker.from_config(candidates_method="fixed_window", max_tracks=2)
    assert isinstance(tracker.candidate, LocalQueueCandidates)
    assert tracker.candidate.max_tracks == 2


def test_fixed_window_kept_without_max_tracks():
    tracker = Tracker.from_config(candidates_method="fixed_window")
    assert isinstance(tracker.candidate, FixedWindowCandidates)


# ------------------------------------- bottom-up top-N-by-score truncation


class _StubScorer:
    """Assembles two instances with the LOW-score one first, so a correct
    top-N truncation must reorder by score rather than keep assembly order."""

    def group_sample(self, gp, gv, sc, return_matches=False):
        pts = np.array(
            [[[0.0, 0.0], [0.0, 10.0]],       # instance A, low score
             [[100.0, 0.0], [100.0, 10.0]]],  # instance B, high score
        )
        vals = np.array([[0.3, 0.3], [0.9, 0.9]])
        scores = np.array([0.6, 1.8])
        if return_matches:
            return pts, vals, scores, []
        return pts, vals, scores


def _payload():
    return {
        "grouped_peaks": np.zeros((1, 2, 2, 2)),
        "grouped_vals": np.zeros((1, 2, 2)),
        "scores": np.zeros((1, 1, 2, 2)),
        "lift": 2.0,
    }


def test_group_batch_host_uncapped_keeps_both_instances():
    out = group_batch_host(_payload(), _StubScorer(), max_instances=None)
    assert out["pred_keypoints"][0].shape[0] == 2


def test_group_batch_host_truncates_top_n_by_score():
    out = group_batch_host(_payload(), _StubScorer(), max_instances=1)
    (pts,) = out["pred_keypoints"]
    (scores,) = out["pred_instance_scores"]
    assert pts.shape[0] == 1
    assert scores[0] == pytest.approx(1.8)  # kept B, not first-assembled A
    # lift applied to coordinates (grid -> original image space).
    assert pts[0, 0, 0] == pytest.approx(200.0)


def test_group_batch_host_cap_noop_when_within_cap():
    out = group_batch_host(_payload(), _StubScorer(), max_instances=5)
    assert out["pred_keypoints"][0].shape[0] == 2
