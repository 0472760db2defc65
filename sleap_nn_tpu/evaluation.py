"""Evaluation metrics: OKS, PCK, VOC mAP/mAR, distances, visibility.

Parity target: reference sleap_nn/evaluation.py:558-2458 — identical math
for ``compute_oks`` (cocoeval normalization), greedy score-ranked instance
matching, VOC precision/recall interpolation, PCK and distance percentiles,
plus the centroid match mode and the npz metrics file contract.
All computation is host-side numpy (matching the reference's design).
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple, Union

import numpy as np

from sleap_nn_tpu.io.model import LabeledFrame, Labels, PredictedInstance


# ---------------------------------------------------------------------------
# Core math
# ---------------------------------------------------------------------------


def compute_instance_area(points: np.ndarray) -> np.ndarray:
    """Bounding-box area of keypoint sets (reference: evaluation.py:626)."""
    if points.ndim == 2:
        points = np.expand_dims(points, axis=0)
    min_pt = np.nanmin(points, axis=-2)
    max_pt = np.nanmax(points, axis=-2)
    return np.prod(max_pt - min_pt, axis=-1)


def compute_oks(
    points_gt: np.ndarray,
    points_pr: np.ndarray,
    scale: Optional[float] = None,
    stddev: float = 0.025,
    use_cocoeval: bool = True,
) -> np.ndarray:
    """Object keypoint similarity matrix ``(n_gt, n_pr)`` (reference: :644).

    Math matches the reference exactly (cocoeval normalization by default:
    spread ``(2*stddev)**2``, scale ``2*(area+eps)``).
    """
    if points_gt.ndim == 2:
        points_gt = np.expand_dims(points_gt, axis=0)
    if points_pr.ndim == 2:
        points_pr = np.expand_dims(points_pr, axis=0)
    if scale is None:
        scale = compute_instance_area(points_gt)

    n_gt, n_nodes, n_ed = points_gt.shape
    n_pr = points_pr.shape[0]
    if np.isscalar(scale):
        scale = np.full(n_gt, scale)
    if np.isscalar(stddev):
        stddev = np.full(n_nodes, stddev)

    displacement = np.reshape(points_gt, (n_gt, 1, n_nodes, n_ed)) - np.reshape(
        points_pr, (1, n_pr, n_nodes, n_ed)
    )
    distance = (displacement**2).sum(axis=-1)

    if use_cocoeval:
        spread_factor = (2 * stddev) ** 2
        scale_factor = 2 * (scale + np.spacing(1))
    else:
        spread_factor = stddev**2
        scale_factor = 2 * ((scale + np.spacing(1)) ** 2)
    normalization_factor = np.reshape(spread_factor, (1, 1, n_nodes)) * np.reshape(
        scale_factor, (n_gt, 1, 1)
    )

    missing_pr = np.any(np.isnan(points_pr), axis=-1)
    distance[:, missing_pr] = np.inf
    ks = np.exp(-(distance / normalization_factor))
    missing_gt = np.any(np.isnan(points_gt), axis=-1)
    ks[np.expand_dims(missing_gt, axis=1)] = 0
    n_visible_gt = np.sum((~missing_gt).astype("float32"), axis=-1, keepdims=True)
    return np.sum(ks, axis=-1) / n_visible_gt


@dataclasses.dataclass
class MatchInstance:
    """An instance + frame provenance (reference: evaluation.py:510)."""

    instance: Any
    frame_idx: int
    video_path: Optional[str] = None


def get_instances(lf: LabeledFrame) -> List[MatchInstance]:
    vpath = str(getattr(lf.video, "filename", "")) if lf.video is not None else ""
    return [MatchInstance(inst, lf.frame_idx, vpath) for inst in lf.instances]


def find_frame_pairs(
    labels_gt: Labels, labels_pr: Labels, user_labels_only: bool = True
) -> List[Tuple[LabeledFrame, LabeledFrame]]:
    """Pair GT/pred frames by (video position, frame_idx) (reference: :558)."""
    pairs = []
    pr_index: Dict[Tuple[int, int], LabeledFrame] = {}
    for lf in labels_pr.labeled_frames:
        vi = labels_pr.videos.index(lf.video) if lf.video in labels_pr.videos else 0
        pr_index[(vi, lf.frame_idx)] = lf

    for lf_gt in labels_gt.labeled_frames:
        vi = labels_gt.videos.index(lf_gt.video) if lf_gt.video in labels_gt.videos else 0
        frame_gt = lf_gt
        if user_labels_only:
            user = lf_gt.user_instances
            if not user:
                continue
            frame_gt = LabeledFrame(lf_gt.video, lf_gt.frame_idx, user)
        lf_pr = pr_index.get((vi, lf_gt.frame_idx))
        if lf_pr is not None:
            pairs.append((frame_gt, lf_pr))
    return pairs


def match_instances(
    frame_gt: LabeledFrame,
    frame_pr: LabeledFrame,
    stddev: float = 0.025,
    scale: Optional[float] = None,
    threshold: float = 0,
):
    """Greedy score-ranked OKS matching within one frame (reference: :763)."""
    pr_instances = get_instances(frame_pr)
    scores_pr = np.array(
        [getattr(m.instance, "score", 0.0) for m in pr_instances], dtype=float
    )
    idxs_pr = np.argsort(-scores_pr, kind="mergesort")

    available_gt = get_instances(frame_gt)
    available_idxs = list(range(len(available_gt)))

    positive_pairs = []
    for idx_pr in idxs_pr:
        if not available_idxs:
            break
        instance_pr = pr_instances[idx_pr]
        points_pr = np.expand_dims(instance_pr.instance.numpy(), axis=0)
        points_gt = np.stack(
            [available_gt[i].instance.numpy() for i in available_idxs], axis=0
        )
        oks = np.squeeze(
            compute_oks(points_gt, points_pr, stddev=stddev, scale=scale), axis=1
        )
        oks[oks <= threshold] = np.nan
        best = int(np.argsort(-oks, kind="mergesort")[0])
        if np.isnan(oks[best]):
            continue
        gt_idx = available_idxs.pop(best)
        positive_pairs.append((available_gt[gt_idx], instance_pr, float(oks[best])))

    false_negatives = [available_gt[i] for i in available_idxs]
    return positive_pairs, false_negatives


def match_frame_pairs(frame_pairs, stddev=0.025, scale=None, threshold=0):
    """Match instances over a list of frame pairs (reference: :859)."""
    positive_pairs, false_negatives = [], []
    for frame_gt, frame_pr in frame_pairs:
        pp, fn = match_instances(frame_gt, frame_pr, stddev, scale, threshold)
        positive_pairs.extend(pp)
        false_negatives.extend(fn)
    return positive_pairs, false_negatives


def compute_dists(positive_pairs) -> Dict[str, Any]:
    """Per-node Euclidean errors for matched pairs (reference: :904)."""
    dists, frame_idxs, video_paths = [], [], []
    for gt, pr, _ in positive_pairs:
        dists.append(
            np.linalg.norm(pr.instance.numpy() - gt.instance.numpy(), axis=-1)
        )
        frame_idxs.append(gt.frame_idx)
        video_paths.append(gt.video_path)
    return {
        "dists": np.array(dists),
        "frame_idxs": frame_idxs,
        "video_paths": video_paths,
    }


# ---------------------------------------------------------------------------
# Centroid matching (single-node / centroid-only models)
# ---------------------------------------------------------------------------


def compute_gt_centroids(labels: Labels, anchor_part: Optional[str] = None):
    """GT centroid per instance (anchor node when visible, else mean)."""
    out = {}
    for lf in labels.labeled_frames:
        cents = []
        for inst in lf.user_instances or lf.instances:
            cents.append(inst.centroid(anchor=anchor_part))
        out[(id(lf.video), lf.frame_idx)] = np.array(cents)
    return out


def match_centroids(gt_pts: np.ndarray, pr_pts: np.ndarray, threshold: float = 50.0):
    """Greedy nearest-pair matching under a pixel threshold (reference: :60)."""
    from scipy.optimize import linear_sum_assignment

    if len(gt_pts) == 0 or len(pr_pts) == 0:
        return [], list(range(len(gt_pts))), list(range(len(pr_pts)))
    d = np.linalg.norm(gt_pts[:, None] - pr_pts[None, :], axis=-1)
    d_safe = np.where(np.isnan(d), 1e9, d)
    rows, cols = linear_sum_assignment(d_safe)
    pairs, used_gt, used_pr = [], set(), set()
    for r, c in zip(rows, cols):
        if d_safe[r, c] <= threshold:
            pairs.append((int(r), int(c), float(d[r, c])))
            used_gt.add(int(r))
            used_pr.add(int(c))
    fn = [i for i in range(len(gt_pts)) if i not in used_gt]
    fp = [i for i in range(len(pr_pts)) if i not in used_pr]
    return pairs, fn, fp


# ---------------------------------------------------------------------------
# Evaluator
# ---------------------------------------------------------------------------


class Evaluator:
    """Compute standard pose metrics from GT + predicted labels (reference: :942)."""

    def __init__(
        self,
        ground_truth_instances: Labels,
        predicted_instances: Labels,
        oks_stddev: float = 0.025,
        oks_scale: Optional[float] = None,
        match_threshold: float = 0,
        user_labels_only: bool = True,
        match_method: str = "oks",
        anchor_part: Optional[str] = None,
    ):
        self.labels_gt = ground_truth_instances
        self.labels_pr = predicted_instances
        self.oks_stddev = oks_stddev
        self.oks_scale = oks_scale
        self.match_threshold = match_threshold
        self.match_method = match_method
        self.anchor_part = anchor_part
        self.false_positives: List = []

        self.frame_pairs = find_frame_pairs(
            self.labels_gt, self.labels_pr, user_labels_only
        )
        if match_method == "centroid":
            self._process_frames_centroid()
        else:
            self._process_frames()

    def _process_frames(self):
        self.positive_pairs, self.false_negatives = match_frame_pairs(
            self.frame_pairs,
            stddev=self.oks_stddev,
            scale=self.oks_scale,
            threshold=self.match_threshold,
        )
        matched_pr = {id(pr.instance) for _, pr, _ in self.positive_pairs}
        for _, frame_pr in self.frame_pairs:
            for inst in frame_pr.instances:
                if id(inst) not in matched_pr:
                    self.false_positives.append(inst)
        self.dists_dict = compute_dists(self.positive_pairs)

    def _process_frames_centroid(self):
        threshold = self.match_threshold if self.match_threshold > 0 else 50.0
        self.positive_pairs, self.false_negatives = [], []
        dists = []
        for frame_gt, frame_pr in self.frame_pairs:
            gt_c = np.array(
                [inst.centroid(anchor=self.anchor_part) for inst in frame_gt.instances]
            )
            pr_c = np.array(
                [np.nanmean(inst.numpy(), axis=0) for inst in frame_pr.instances]
            )
            pairs, fn, fp = match_centroids(
                gt_c.reshape(-1, 2) if gt_c.size else gt_c,
                pr_c.reshape(-1, 2) if pr_c.size else pr_c,
                threshold,
            )
            gt_mi = get_instances(frame_gt)
            pr_mi = get_instances(frame_pr)
            for r, c, d in pairs:
                self.positive_pairs.append((gt_mi[r], pr_mi[c], d))
                dists.append([d])
            self.false_negatives.extend(gt_mi[i] for i in fn)
            self.false_positives.extend(pr_mi[i] for i in fp)
        self.dists_dict = {
            "dists": np.array(dists) if dists else np.zeros((0, 1)),
            "frame_idxs": [p[0].frame_idx for p in self.positive_pairs],
            "video_paths": [p[0].video_path for p in self.positive_pairs],
        }

    # -- metrics ---------------------------------------------------------------
    def mOKS(self):
        pair_oks = np.array([oks for _, _, oks in self.positive_pairs])
        return {"mOKS": float(pair_oks.mean()) if pair_oks.size else np.nan}

    def voc_metrics(
        self,
        match_score_by: str = "oks",
        match_score_thresholds: np.ndarray = np.linspace(0.5, 0.95, 10),
        recall_thresholds: np.ndarray = np.linspace(0, 1, 101),
    ) -> dict:
        """PASCAL-VOC style AP/AR over match-score thresholds (reference: :1253)."""
        if match_score_by == "oks":
            match_scores = np.array([oks for _, _, oks in self.positive_pairs])
            name = "oks_voc"
        elif match_score_by == "pck":
            name = "pck_voc"
            if not self.positive_pairs:
                match_scores = np.array([])
            else:
                pck = self.pck_metrics()
                match_scores = pck["pcks"].mean(axis=-1).mean(axis=-1)
        else:
            raise ValueError("match_score_by must be 'oks' or 'pck'")

        detection_scores = np.array(
            [getattr(pp[1].instance, "score", 0.0) for pp in self.positive_pairs]
        )
        inds = np.argsort(-detection_scores, kind="mergesort")
        detection_scores = detection_scores[inds]
        match_scores = match_scores[inds] if match_scores.size else match_scores

        npig = len(self.positive_pairs) + len(self.false_negatives)
        precisions, recalls = [], []
        for thr in match_score_thresholds:
            tp = np.cumsum(match_scores >= thr)
            fp = np.cumsum(match_scores < thr)
            if tp.size == 0:
                return {
                    f"{name}.match_score_thresholds": 0,
                    f"{name}.recall_thresholds": 0,
                    f"{name}.match_scores": 0,
                    f"{name}.precisions": 0,
                    f"{name}.recalls": 0,
                    f"{name}.AP": 0,
                    f"{name}.AR": 0,
                    f"{name}.mAP": 0,
                    f"{name}.mAR": 0,
                }
            rc = tp / npig if npig else tp * 0.0
            pr = tp / (fp + tp + np.spacing(1))
            recall = rc[-1]
            for i in range(len(pr) - 1, 0, -1):
                if pr[i] > pr[i - 1]:
                    pr[i - 1] = pr[i]
            rc_inds = np.searchsorted(rc, recall_thresholds, side="left")
            precision = np.zeros(rc_inds.shape)
            valid = rc_inds < len(pr)
            precision[valid] = pr[rc_inds[valid]]
            precisions.append(precision)
            recalls.append(recall)

        precisions = np.array(precisions)
        recalls = np.array(recalls)
        AP = precisions.mean(axis=1)
        AR = recalls
        return {
            f"{name}.match_score_thresholds": match_score_thresholds,
            f"{name}.recall_thresholds": recall_thresholds,
            f"{name}.match_scores": match_scores,
            f"{name}.precisions": precisions,
            f"{name}.recalls": recalls,
            f"{name}.AP": AP,
            f"{name}.AR": AR,
            f"{name}.mAP": float(AP.mean()),
            f"{name}.mAR": float(AR.mean()),
        }

    def distance_metrics(self) -> dict:
        dists = self.dists_dict["dists"]
        results = {
            "frame_idxs": self.dists_dict["frame_idxs"],
            "video_paths": self.dists_dict["video_paths"],
            "dists": dists,
            "avg": (
                float(np.nanmean(dists))
                if np.asarray(dists).size and not np.all(np.isnan(dists))
                else np.nan
            ),
            "p50": np.nan,
            "p75": np.nan,
            "p90": np.nan,
            "p95": np.nan,
            "p99": np.nan,
        }
        non_nan = ~np.isnan(dists) if np.asarray(dists).size else np.array([], dtype=bool)
        if np.any(non_nan):
            vals = dists[non_nan]
            for p in (50, 75, 90, 95, 99):
                results[f"p{p}"] = float(np.percentile(vals, p))
        return results

    def detection_metrics(self) -> dict:
        n_tp = len(self.positive_pairs)
        n_fp = len(self.false_positives)
        n_fn = len(self.false_negatives)
        precision = n_tp / (n_tp + n_fp) if (n_tp + n_fp) else 0.0
        recall = n_tp / (n_tp + n_fn) if (n_tp + n_fn) else 0.0
        f1 = 2 * precision * recall / (precision + recall) if (precision + recall) else 0.0
        results = {
            "precision": precision,
            "recall": recall,
            "f1": f1,
            "n_tp": n_tp,
            "n_fp": n_fp,
            "n_fn": n_fn,
            "avg": np.nan,
            "p50": np.nan,
            "p75": np.nan,
            "p90": np.nan,
            "p95": np.nan,
            "p99": np.nan,
        }
        dists = self.dists_dict["dists"]
        non_nan = ~np.isnan(dists) if np.asarray(dists).size else np.array([], dtype=bool)
        if np.any(non_nan):
            vals = dists[non_nan]
            results["avg"] = float(np.mean(vals))
            for p in (50, 75, 90, 95, 99):
                results[f"p{p}"] = float(np.percentile(vals, p))
        return results

    def pck_metrics(self, thresholds: np.ndarray = np.linspace(1, 10, 10)) -> dict:
        dists = np.copy(self.dists_dict["dists"])
        dists[np.isnan(dists)] = np.inf
        pcks = np.expand_dims(dists, -1) < np.reshape(thresholds, (1, 1, -1))
        if dists.size == 0:
            return {
                "thresholds": thresholds,
                "pcks": pcks,
                "mPCK_parts": np.array([]),
                "mPCK": np.nan,
                "PCK@5": np.nan,
                "PCK@10": np.nan,
            }
        mPCK_parts = pcks.mean(axis=0).mean(axis=-1)
        idx5 = int(np.argmin(np.abs(thresholds - 5)))
        idx10 = int(np.argmin(np.abs(thresholds - 10)))
        return {
            "thresholds": thresholds,
            "pcks": pcks,
            "mPCK_parts": mPCK_parts,
            "mPCK": float(mPCK_parts.mean()),
            "PCK@5": float(pcks[:, :, idx5].mean()),
            "PCK@10": float(pcks[:, :, idx10].mean()),
        }

    def visibility_metrics(self) -> dict:
        tp = fn = fp = tn = 0
        for gt, pr, _ in self.positive_pairs:
            miss_gt = np.isnan(gt.instance.numpy()).any(axis=-1)
            miss_pr = np.isnan(pr.instance.numpy()).any(axis=-1)
            tn += (miss_gt & miss_pr).sum()
            fn += (~miss_gt & miss_pr).sum()
            fp += (miss_gt & ~miss_pr).sum()
            tp += (~miss_gt & ~miss_pr).sum()
        return {
            "tp": int(tp),
            "fp": int(fp),
            "tn": int(tn),
            "fn": int(fn),
            "precision": tp / (tp + fp) if (tp + fp) else np.nan,
            "recall": tp / (tp + fn) if (tp + fn) else np.nan,
        }

    def evaluate(self) -> dict:
        if self.match_method == "centroid":
            return {
                "detection_metrics": self.detection_metrics(),
                "distance_metrics": self.distance_metrics(),
            }
        metrics = {}
        metrics["voc_metrics"] = self.voc_metrics(match_score_by="oks")
        metrics["voc_metrics"].update(self.voc_metrics(match_score_by="pck"))
        metrics["mOKS"] = self.mOKS()
        metrics["distance_metrics"] = self.distance_metrics()
        metrics["pck_metrics"] = self.pck_metrics()
        metrics["visibility_metrics"] = self.visibility_metrics()
        return metrics


# ---------------------------------------------------------------------------
# Entry + persistence
# ---------------------------------------------------------------------------


def _is_single_node_skeleton(skeleton) -> bool:
    return skeleton is not None and len(skeleton.node_names) == 1


def run_evaluation(
    ground_truth_path,
    predicted_path,
    oks_stddev: float = 0.025,
    oks_scale: Optional[float] = None,
    match_threshold: float = 0,
    user_labels_only: bool = True,
    save_metrics: Optional[str] = None,
    match_method: str = "oks",
    anchor_part: Optional[str] = None,
) -> Optional[dict]:
    """Evaluate predictions vs ground truth (reference: evaluation.py:2167)."""
    from sleap_nn_tpu.io.slp import load_slp

    labels_gt = ground_truth_path if isinstance(ground_truth_path, Labels) else load_slp(
        ground_truth_path
    )
    labels_pr = predicted_path if isinstance(predicted_path, Labels) else load_slp(
        predicted_path
    )

    if not len(labels_pr) or not any(len(lf.instances) for lf in labels_pr):
        return None

    pred_skel = labels_pr.skeletons[0] if labels_pr.skeletons else None
    if match_method == "auto":
        match_method = "centroid" if _is_single_node_skeleton(pred_skel) else "oks"
    if match_method == "centroid" and match_threshold == 0:
        match_threshold = 50.0

    evaluator = Evaluator(
        labels_gt,
        labels_pr,
        oks_stddev=oks_stddev,
        oks_scale=oks_scale,
        match_threshold=match_threshold,
        user_labels_only=user_labels_only,
        match_method=match_method,
        anchor_part=anchor_part,
    )
    metrics = evaluator.evaluate()
    if save_metrics:
        save_metrics_npz(metrics, save_metrics)
    return metrics


def _flatten(metrics: dict, prefix: str = "") -> dict:
    out = {}
    for k, v in metrics.items():
        key = f"{prefix}{k}" if not prefix else f"{prefix}.{k}"
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = v
    return out


def save_metrics_npz(metrics: dict, path):
    """Save metrics to npz (flattened keys, reference contract)."""
    flat = _flatten(metrics)
    arrays = {}
    for k, v in flat.items():
        try:
            arrays[k] = np.asarray(v)
        except Exception:
            arrays[k] = np.asarray(str(v))
    np.savez(path, **arrays)


def load_metrics(path) -> dict:
    """Load a metrics npz back into a flat dict (reference: :1999)."""
    with np.load(path, allow_pickle=True) as data:
        return {k: data[k] for k in data.files}
