"""Trackers: base (feature scoring + assignment), flow-shift, Kalman-shift.

Parity target: reference sleap_nn/tracking/tracker.py:50-1620 — same
candidate/score/assign architecture, including optical-flow candidate
shifting (OpenCV LK) and constant-velocity Kalman smoothing (hand-rolled
filter replacing pykalman, which is unavailable here).
"""

from __future__ import annotations

import functools
from collections import defaultdict
from typing import Dict, List, Optional, Union

import numpy as np

from sleap_nn_tpu.io.model import Labels, PredictedInstance, Track
from sleap_nn_tpu.tracking.candidates import (
    FixedWindowCandidates,
    LocalQueueCandidates,
    TrackedInstanceFeature,
)
from sleap_nn_tpu.tracking.utils import (
    compute_cosine_sim,
    compute_euclidean_distance,
    compute_iou,
    compute_mask_iou,
    compute_oks_score,
    count_valid_points,
    cull_frame_instances,
    get_bbox,
    get_centroid,
    get_keypoints,
    get_mask,
    greedy_matching,
    hungarian_matching,
)


class Tracker:
    """Pose tracker: features -> candidate scoring -> assignment (reference: :50)."""

    def __init__(
        self,
        candidate=None,
        min_match_points: int = 0,
        features: str = "keypoints",
        scoring_method: str = "oks",
        scoring_reduction: str = "mean",
        track_matching_method: str = "hungarian",
        robust_best_instance: float = 1.0,
        oks_stddev: float = 0.025,
        tracking_target_instance_count: Optional[int] = None,
        tracking_pre_cull_to_target: int = 0,
        tracking_pre_cull_iou_threshold: float = 0,
    ):
        self.candidate = candidate or FixedWindowCandidates()
        self.is_local_queue = isinstance(self.candidate, LocalQueueCandidates)
        self.min_match_points = min_match_points
        self.features = features
        self.scoring_method = scoring_method
        self.scoring_reduction = scoring_reduction
        self.track_matching_method = track_matching_method
        self.robust_best_instance = robust_best_instance
        self.oks_stddev = oks_stddev
        self.tracking_target_instance_count = tracking_target_instance_count
        self.tracking_pre_cull_to_target = tracking_pre_cull_to_target
        self.tracking_pre_cull_iou_threshold = tracking_pre_cull_iou_threshold
        self._track_objects: Dict[int, Track] = {}

    _feature_methods = {
        "keypoints": get_keypoints,
        "centroids": get_centroid,
        "bboxes": get_bbox,
        "masks": get_mask,
    }
    _matching_methods = {"hungarian": hungarian_matching, "greedy": greedy_matching}

    @classmethod
    def from_config(
        cls,
        window_size: int = 5,
        min_new_track_points: int = 0,
        candidates_method: str = "fixed_window",
        min_match_points: int = 0,
        features: str = "keypoints",
        scoring_method: str = "oks",
        scoring_reduction: str = "mean",
        robust_best_instance: float = 1.0,
        track_matching_method: str = "hungarian",
        max_tracks: Optional[int] = None,
        use_flow: bool = False,
        use_kalman: bool = False,
        oks_stddev: Optional[float] = None,
        tracking_target_instance_count: Optional[int] = None,
        tracking_pre_cull_to_target: int = 0,
        tracking_pre_cull_iou_threshold: float = 0,
        of_img_scale: float = 1.0,
        of_window_size: int = 21,
        of_max_levels: int = 3,
        kf_track_features: str = "centroid",
        kf_init_frame_count: int = 10,
        kf_node_indices: Optional[List[int]] = None,
        kf_reset_gap_size: int = 5,
        **flow_kwargs,
    ) -> "Tracker":
        """Build a tracker from config knobs (reference: :128).

        ``max_tracks`` auto-switches to local-queue candidates. ``oks_stddev``
        left unset auto-resolves to 0.1 for ``use_kalman`` +
        ``kf_track_features="keypoints"`` (per-node Kalman predictions are
        noisier than detections; reference tracker.py:305) and 0.025 otherwise.
        """
        if use_kalman and kf_track_features not in ("centroid", "keypoints"):
            raise ValueError(
                f"Invalid kf_track_features={kf_track_features!r}; "
                "choose 'centroid' or 'keypoints'."
            )
        if oks_stddev is None:
            oks_stddev = 0.1 if (use_kalman and kf_track_features == "keypoints") else 0.025
        if max_tracks is not None or candidates_method == "local_queues":
            candidate = LocalQueueCandidates(
                window_size=window_size,
                max_tracks=max_tracks,
                min_new_track_points=min_new_track_points,
            )
        else:
            candidate = FixedWindowCandidates(
                window_size=window_size, min_new_track_points=min_new_track_points
            )
        kwargs = dict(
            candidate=candidate,
            min_match_points=min_match_points,
            features=features,
            scoring_method=scoring_method,
            scoring_reduction=scoring_reduction,
            track_matching_method=track_matching_method,
            robust_best_instance=robust_best_instance,
            oks_stddev=oks_stddev,
            tracking_target_instance_count=tracking_target_instance_count,
            tracking_pre_cull_to_target=tracking_pre_cull_to_target,
            tracking_pre_cull_iou_threshold=tracking_pre_cull_iou_threshold,
        )
        if use_kalman:
            return KalmanShiftTracker(
                **kwargs,
                kf_track_features=kf_track_features,
                kf_init_frame_count=kf_init_frame_count,
                kf_node_indices=kf_node_indices,
                kf_reset_gap_size=kf_reset_gap_size,
                **flow_kwargs,
            )
        if use_flow:
            return FlowShiftTracker(
                **kwargs,
                of_img_scale=of_img_scale,
                of_window_size=of_window_size,
                of_max_levels=of_max_levels,
                **flow_kwargs,
            )
        return cls(**kwargs)

    # -- core --------------------------------------------------------------------
    def _score_fn(self):
        fns = {
            "oks": functools.partial(compute_oks_score, stddev=self.oks_stddev),
            "iou": compute_iou,
            "cosine_sim": compute_cosine_sim,
            "euclidean_dist": compute_euclidean_distance,
            "mask_iou": compute_mask_iou,
        }
        if self.scoring_method not in fns:
            raise ValueError(
                f"Invalid scoring_method {self.scoring_method}; one of {sorted(fns)}"
            )
        return fns[self.scoring_method]

    def _reduce_fn(self):
        if self.scoring_reduction == "mean":
            return np.nanmean
        if self.scoring_reduction == "max":
            return np.nanmax
        if self.scoring_reduction == "robust_quantile":
            return functools.partial(np.nanquantile, q=self.robust_best_instance)
        raise ValueError(
            f"Invalid scoring_reduction {self.scoring_reduction}; "
            "one of mean, max, robust_quantile"
        )

    def get_features(self, instances, frame_idx, image=None):
        if self.features not in self._feature_methods:
            raise ValueError(
                f"Invalid features {self.features}; one of {sorted(self._feature_methods)}"
            )
        fm = self._feature_methods[self.features]
        return self.candidate.make_instances(
            [fm(i) for i in instances], instances, frame_idx, image
        )

    def update_candidates(self, image=None) -> Dict[int, List[TrackedInstanceFeature]]:
        return {
            tid: self.candidate.get_features_from_track_id(tid)
            for tid in self.candidate.current_tracks
        }

    def get_scores(self, current_instances, candidates_feature_dict) -> np.ndarray:
        score = self._score_fn()
        reduce = self._reduce_fn()
        tracks = self.candidate.current_tracks
        scores = np.zeros((len(current_instances), len(tracks)))
        for f_idx, ti in enumerate(current_instances):
            for t_idx, tid in enumerate(tracks):
                vals = [
                    score(ti.feature, c.shifted_keypoints if c.shifted_keypoints is not None else c.feature)
                    for c in candidates_feature_dict[tid]
                    if count_valid_points(c.src_predicted_instance) > self.min_match_points
                ]
                scores[f_idx, t_idx] = np.nan if not vals else reduce(vals)
        return scores

    def scores_to_cost_matrix(self, scores: np.ndarray) -> np.ndarray:
        cost = -scores
        cost[np.isnan(cost)] = np.inf
        return cost

    def assign_tracks(self, current_instances, cost_matrix):
        matcher = self._matching_methods.get(self.track_matching_method)
        if matcher is None:
            raise ValueError(
                f"Invalid track_matching_method {self.track_matching_method}"
            )
        rows, cols = matcher(cost_matrix)
        tracking_scores = [-cost_matrix[r, c] for r, c in zip(rows, cols)]
        return self.candidate.update_tracks(current_instances, rows, cols, tracking_scores)

    def track(
        self,
        untracked_instances: List[PredictedInstance],
        frame_idx: int,
        image: Optional[np.ndarray] = None,
    ) -> List[PredictedInstance]:
        """Assign track IDs to one frame's instances (reference: :369)."""
        if (
            self.tracking_target_instance_count
            and self.tracking_pre_cull_to_target
            and self.features != "masks"  # culling is keypoint-bbox based
        ):
            untracked_instances = cull_frame_instances(
                untracked_instances,
                self.tracking_target_instance_count,
                self.tracking_pre_cull_iou_threshold,
            )
        current = self.get_features(untracked_instances, frame_idx, image)
        if self.candidate.current_tracks:
            feats = self.update_candidates(image)
            scores = self.get_scores(current, feats)
            tracked = self.assign_tracks(current, self.scores_to_cost_matrix(scores))
        else:
            tracked = self.candidate.add_new_tracks(current)

        out = []
        for ti in tracked:
            if ti.track_id is not None:
                if ti.track_id not in self._track_objects:
                    self._track_objects[ti.track_id] = Track(f"track_{ti.track_id}")
                ti.src_instance.track = self._track_objects[ti.track_id]
                ti.src_instance.tracking_score = float(ti.tracking_score)
            out.append(ti.src_instance)
        return out

    def track_labels(self, labels: Labels, get_image: bool = False) -> Labels:
        """Track all frames of a Labels (sorted by video, frame_idx)."""
        lfs = sorted(
            labels.labeled_frames,
            key=lambda lf: (
                labels.videos.index(lf.video) if lf.video in labels.videos else 0,
                lf.frame_idx,
            ),
        )
        needs_img = get_image or isinstance(self, FlowShiftTracker)
        for lf in lfs:
            img = lf.image if (needs_img and lf.video is not None) else None
            if self.features == "masks":
                # Segmentation output: identity lives on LabeledFrame.masks
                # (SegmentationMask objects; they carry .track like instances).
                # Track every frame — including mask-less ones — so the
                # frame-based candidate window flushes across occlusion gaps
                # exactly like the keypoint path below.
                items = [m for m in getattr(lf, "masks", []) or [] if m.area > 0]
                self.track(items, lf.frame_idx, img)
                continue
            # User-labeled instances take precedence for tracking; untracked
            # predictions are carried alongside (reference
            # inference/tracking.py apply_tracking :311-316).
            items = lf.user_instances if lf.has_user_instances else lf.predicted_instances
            # Track EVERY frame, including empty ones: the fixed candidate
            # window is FRAME-based in the reference, so an occlusion gap
            # longer than the window flushes candidates and re-entry starts
            # a NEW track rather than silently bridging arbitrary gaps.
            self.track(items, lf.frame_idx, img)
        labels.tracks = list(self._track_objects.values())
        return labels


class FlowShiftTracker(Tracker):
    """Shift candidates forward via Lucas-Kanade optical flow (reference: :632)."""

    def __init__(self, *args, of_img_scale: float = 1.0, of_window_size: int = 21,
                 of_max_levels: int = 3, **kwargs):
        super().__init__(*args, **kwargs)
        self.of_img_scale = float(of_img_scale)
        self.of_window_size = of_window_size
        self.of_max_levels = of_max_levels

    def _compute_optical_flow(self, ref_pts: np.ndarray, ref_img: np.ndarray, new_img: np.ndarray):
        import cv2

        def gray(img):
            img = np.asarray(img)
            if img.ndim == 3 and img.shape[-1] == 3:
                return cv2.cvtColor(img, cv2.COLOR_RGB2GRAY)
            return img[..., 0] if img.ndim == 3 else img

        # of_img_scale < 1 downscales both frames before LK (cheaper flow on
        # large frames; reference tracker.py:194). Points map into the scaled
        # grid and the shifted results map back.
        s = self.of_img_scale if self.of_img_scale > 0 else 1.0
        ga, gb = gray(ref_img), gray(new_img)
        if s != 1.0:
            ga = cv2.resize(ga, None, fx=s, fy=s, interpolation=cv2.INTER_AREA)
            gb = cv2.resize(gb, None, fx=s, fy=s, interpolation=cv2.INTER_AREA)

        pts = ref_pts.reshape(-1, 1, 2).astype(np.float32)
        valid = ~np.isnan(pts[:, 0, :]).any(axis=-1)
        pts_in = np.nan_to_num(pts) * s
        shifted, status, _ = cv2.calcOpticalFlowPyrLK(
            ga,
            gb,
            pts_in,
            None,
            winSize=(self.of_window_size, self.of_window_size),
            maxLevel=self.of_max_levels,
        )
        shifted = (shifted / s).reshape(ref_pts.shape)
        ok = (status.reshape(-1) == 1) & valid
        shifted[~ok.reshape(ref_pts.shape[:-1])] = np.nan if ref_pts.ndim == 2 else np.nan
        return shifted

    def update_candidates(self, image=None):
        feats = super().update_candidates(image)
        if image is None:
            return feats
        for tid, cand_list in feats.items():
            for c in cand_list:
                ref_img = None
                # find the stored image of the candidate's frame
                for frame in (
                    self.candidate.tracker_queue
                    if not self.is_local_queue
                    else self.candidate.tracker_queue.get(tid, [])
                ):
                    items = frame if isinstance(frame, list) else [frame]
                    for ti in items:
                        if ti.frame_idx == c.frame_idx and ti.image is not None:
                            ref_img = ti.image
                            break
                    if ref_img is not None:
                        break
                if ref_img is None:
                    continue
                pts = np.asarray(c.feature, dtype=np.float32)
                if pts.ndim == 1:
                    pts = pts.reshape(1, -1)
                c.shifted_keypoints = self._compute_optical_flow(pts, ref_img, image)
        return feats

    def get_features(self, instances, frame_idx, image=None):
        return super().get_features(instances, frame_idx, image)


class _ConstantVelocityKalman:
    """Minimal constant-velocity Kalman filter (replaces pykalman)."""

    def __init__(self, x0: np.ndarray, dt: float = 1.0, q: float = 1.0, r: float = 2.0):
        n = x0.size
        self.n = n
        self.x = np.concatenate([x0, np.zeros(n)])  # [pos, vel]
        self.P = np.eye(2 * n) * 10.0
        self.F = np.eye(2 * n)
        self.F[:n, n:] = np.eye(n) * dt
        self.H = np.zeros((n, 2 * n))
        self.H[:, :n] = np.eye(n)
        self.Q = np.eye(2 * n) * q
        self.R = np.eye(n) * r

    def predict(self) -> np.ndarray:
        self.x = self.F @ self.x
        self.P = self.F @ self.P @ self.F.T + self.Q
        return self.x[: self.n]

    def update(self, z: np.ndarray):
        valid = ~np.isnan(z)
        if not valid.any():
            return
        H = self.H[valid]
        R = self.R[np.ix_(valid, valid)]
        y = z[valid] - H @ self.x
        S = H @ self.P @ H.T + R
        K = self.P @ H.T @ np.linalg.inv(S)
        self.x = self.x + K @ y
        self.P = (np.eye(self.P.shape[0]) - K @ H) @ self.P


class KalmanShiftTracker(Tracker):
    """Constant-velocity Kalman prediction per track (reference: :865).

    Candidate features are replaced by the filter's predicted positions
    before scoring; observations update the filters after assignment.
    """

    def __init__(self, *args, max_velocity: Optional[float] = None,
                 kf_track_features: str = "centroid",
                 kf_init_frame_count: int = 10,
                 kf_node_indices: Optional[List[int]] = None,
                 kf_reset_gap_size: int = 5, **kwargs):
        super().__init__(*args, **kwargs)
        self.max_velocity = max_velocity
        self.kf_track_features = kf_track_features
        self.kf_init_frame_count = int(kf_init_frame_count)
        self.kf_node_indices = (
            list(kf_node_indices) if kf_node_indices is not None else None
        )
        self.kf_reset_gap_size = int(kf_reset_gap_size)
        self._filters: Dict[int, _ConstantVelocityKalman] = {}
        self._last_seen: Dict[int, int] = {}
        self._last_obs: Dict[int, np.ndarray] = {}
        self._frames_seen: int = 0
        self._cur_frame_idx: Optional[int] = None

    def _kf_observation(self, inst) -> np.ndarray:
        """Motion-model observation vector for one instance.

        ``centroid`` mode tracks a 2-vector; ``keypoints`` mode tracks the
        (optionally ``kf_node_indices``-selected) node coordinates
        (reference tracker.py:211-218).
        """
        if self.kf_track_features == "centroid":
            return np.asarray(get_centroid(inst), dtype=float).reshape(-1)
        pts = np.asarray(get_keypoints(inst), dtype=float)
        if self.kf_node_indices is not None:
            pts = pts[self.kf_node_indices]
        return pts.reshape(-1)

    def update_candidates(self, image=None):
        feats = super().update_candidates(image)
        # Warm-up: behave like the base tracker until enough frames were seen
        # for the constant-velocity model to be meaningful (reference :878).
        if self._frames_seen < self.kf_init_frame_count:
            return feats
        for tid, cand_list in feats.items():
            # Reset stale filters: a track unseen for > kf_reset_gap_size
            # frames gets a fresh start at its next observation.
            if (
                self._cur_frame_idx is not None
                and tid in self._last_seen
                and self._cur_frame_idx - self._last_seen[tid] > self.kf_reset_gap_size
            ):
                self._filters.pop(tid, None)
                self._last_obs.pop(tid, None)
            kf = self._filters.get(tid)
            if kf is None:
                continue
            pred = kf.predict().copy()
            last = self._last_obs.get(tid)
            if self.max_velocity is not None and last is not None:
                step = pred - last
                speed = float(np.linalg.norm(step))
                if speed > self.max_velocity:
                    pred = last + step * (self.max_velocity / speed)
            for c in cand_list:
                feat = np.asarray(c.feature, dtype=float)
                if self.kf_track_features == "centroid":
                    if self.features == "centroids":
                        c.shifted_keypoints = pred.reshape(feat.shape)
                    elif last is not None:
                        # Translate the candidate's feature by the predicted
                        # centroid motion (keeps pose shape, moves it).
                        c.shifted_keypoints = feat + (pred - last).reshape(
                            (1, -1) if feat.ndim == 2 else (-1,)
                        )
                elif self.features == "keypoints":
                    shifted = feat.copy()
                    if self.kf_node_indices is not None:
                        shifted[self.kf_node_indices] = pred.reshape(-1, 2)
                    else:
                        shifted = pred.reshape(feat.shape)
                    c.shifted_keypoints = shifted
        return feats

    def track(self, untracked_instances, frame_idx, image=None):
        self._cur_frame_idx = frame_idx
        out = super().track(untracked_instances, frame_idx, image)
        self._frames_seen += 1
        # Update / init filters with this frame's assigned observations.
        for inst in out:
            if inst.track is None:
                continue
            tid = next(
                (t for t, obj in self._track_objects.items() if obj is inst.track), None
            )
            if tid is None:
                continue
            z = self._kf_observation(inst)
            if tid not in self._filters:
                self._filters[tid] = _ConstantVelocityKalman(np.nan_to_num(z))
            else:
                self._filters[tid].update(z)
            self._last_obs[tid] = np.nan_to_num(z)
            self._last_seen[tid] = frame_idx
        return out


def connect_single_breaks(labels: Labels, max_instances: int) -> Labels:
    """Merge single-frame track breaks (reference tracker.py:1522 semantics).

    Walks frames in order keeping the last "good" track set. When exactly one
    track disappears and exactly one new track appears on the same frame, the
    new track is an identity continuation of the lost one: the instance is
    remapped and the old->new mapping is remembered so later frames that
    still carry the spurious new track are fixed too.
    """
    lfs = sorted(labels.labeled_frames, key=lambda lf: lf.frame_idx)
    if not lfs:
        return labels

    fix_track_map: Dict[int, Track] = {}  # id(spurious track) -> original
    last_good = {inst.track for inst in lfs[0].instances if inst.track is not None}
    for lf in lfs:
        frame_tracks = {i.track for i in lf.instances if i.track is not None}

        # Apply previously-discovered fixes first (only when the fix target
        # isn't already present on this frame — no duplicate identities).
        for inst in lf.instances:
            fixed = fix_track_map.get(id(inst.track))
            if fixed is not None and fixed not in frame_tracks:
                inst.track = fixed
                frame_tracks = {i.track for i in lf.instances if i.track is not None}

        extra = frame_tracks - last_good
        missing = last_good - frame_tracks
        if len(extra) == 1 and len(missing) == 1:
            for inst in lf.instances:
                if inst.track in extra:
                    old, new = inst.track, missing.pop()
                    fix_track_map[id(old)] = new
                    inst.track = new
                    break
        elif len(frame_tracks) >= len(last_good):
            # Only refresh the reference set when the frame is at least as
            # populated — prevents a dropout frame from becoming the baseline.
            last_good = frame_tracks
    return labels


def run_tracker(
    labels: Labels,
    post_connect_single_breaks: bool = False,
    target_instance_count: Optional[int] = None,
    pre_cull_to_target: bool = False,
    pre_cull_iou_threshold: float = 0,
    clean_instance_count: int = 0,
    clean_iou_threshold: float = 0,
    **config,
) -> Labels:
    """Track a Labels end-to-end from config knobs (reference: :1586).

    ``pre_cull_to_target`` culls every frame to ``target_instance_count``
    before tracking (bbox-NMS + score); ``clean_instance_count`` culls every
    frame to that count *after* tracking (the reference's
    ``tracking_clean_instance_count``); ``post_connect_single_breaks`` merges
    single-frame identity breaks last.
    """
    from sleap_nn_tpu.tracking.utils import cull_instances

    # Fail fast BEFORE tracking (reference inference/tracking.py apply_tracking
    # gate, issue #582): both the pre-cull and the single-break repair require
    # an explicit target identity count; silently no-op'ing the cull or raising
    # only after a long tracking pass were the legacy bugs.
    if (post_connect_single_breaks or pre_cull_to_target) and not target_instance_count:
        raise ValueError(
            "post_connect_single_breaks and pre_cull_to_target require "
            "target_instance_count to be set (the CLI derives it from "
            "--max_instances when omitted)."
        )
    if pre_cull_to_target and target_instance_count:
        cull_instances(labels, target_instance_count, pre_cull_iou_threshold)
    # The target identity count also informs the tracker itself (per-frame
    # cull inside tracking, Kalman init) — forward it unless the caller set
    # the tracker-level knob explicitly.
    if target_instance_count and "tracking_target_instance_count" not in config:
        config["tracking_target_instance_count"] = target_instance_count
    tracker = Tracker.from_config(**config)
    labels = tracker.track_labels(labels)
    if clean_instance_count:
        cull_instances(labels, clean_instance_count, clean_iou_threshold)
    if post_connect_single_breaks:
        labels = connect_single_breaks(labels, target_instance_count)
    return labels
