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
            if not user and not getattr(lf_gt, "masks", None):
                continue
            frame_gt = LabeledFrame(
                lf_gt.video, lf_gt.frame_idx, user, masks=getattr(lf_gt, "masks", None)
            )
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
# Mask / semantic metrics (reference: evaluation.py:120-465)
# ---------------------------------------------------------------------------


def mask_iou(a: np.ndarray, b: np.ndarray) -> float:
    """Pixel IoU of two binary masks (reference: :120)."""
    a = np.asarray(a, bool)
    b = np.asarray(b, bool)
    union = np.logical_or(a, b).sum()
    if union == 0:
        return 0.0
    return float(np.logical_and(a, b).sum() / union)


def match_masks(gt_masks, pr_masks, iou_threshold: float = 0.5):
    """Hungarian IoU matching of masks (reference: :161).

    Returns (pairs [(gt_i, pr_j, iou)], fn_inds, fp_inds)."""
    from scipy.optimize import linear_sum_assignment

    if not gt_masks or not pr_masks:
        return [], list(range(len(gt_masks))), list(range(len(pr_masks)))
    iou = np.array([[mask_iou(g, p) for p in pr_masks] for g in gt_masks])
    rows, cols = linear_sum_assignment(-iou)
    pairs, used_g, used_p = [], set(), set()
    for r, c in zip(rows, cols):
        if iou[r, c] >= iou_threshold:
            pairs.append((int(r), int(c), float(iou[r, c])))
            used_g.add(int(r))
            used_p.add(int(c))
    fn = [i for i in range(len(gt_masks)) if i not in used_g]
    fp = [j for j in range(len(pr_masks)) if j not in used_p]
    return pairs, fn, fp


def _mask_to_boundary(mask: np.ndarray, dilation_ratio: float = 0.02) -> np.ndarray:
    """Boundary band of a mask (reference: :375)."""
    from scipy import ndimage

    mask = np.asarray(mask, bool)
    h, w = mask.shape
    d = max(1, int(round(dilation_ratio * np.hypot(h, w))))
    eroded = ndimage.binary_erosion(mask, iterations=d)
    return mask & ~eroded


def boundary_iou(gt: np.ndarray, pr: np.ndarray, dilation_ratio: float = 0.02) -> float:
    """IoU restricted to boundary bands (reference: :396)."""
    return mask_iou(_mask_to_boundary(gt, dilation_ratio), _mask_to_boundary(pr, dilation_ratio))


def _skeletonize(mask: np.ndarray, max_iters: int = 128) -> np.ndarray:
    """Morphological skeleton via iterative erosion-opening (scipy-only
    stand-in for skimage.skeletonize; reference: :412)."""
    from scipy import ndimage

    mask = np.asarray(mask, bool)
    skel = np.zeros_like(mask)
    m = mask.copy()
    for _ in range(max_iters):
        if not m.any():
            break
        eroded = ndimage.binary_erosion(m)
        opened = ndimage.binary_dilation(eroded)
        skel |= m & ~opened
        m = eroded
    return skel


def mask_cldice(pred: np.ndarray, gt: np.ndarray) -> float:
    """Centerline Dice (clDice) for thin structures (reference: :427)."""
    pred = np.asarray(pred, bool)
    gt = np.asarray(gt, bool)
    if not pred.any() or not gt.any():
        return 0.0
    sp = _skeletonize(pred)
    sg = _skeletonize(gt)
    tprec = (sp & gt).sum() / max(sp.sum(), 1)
    tsens = (sg & pred).sum() / max(sg.sum(), 1)
    if tprec + tsens == 0:
        return 0.0
    return float(2 * tprec * tsens / (tprec + tsens))


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
        elif match_method in ("mask", "semantic"):
            self._process_frames_mask()
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

    def _process_frames_mask(self):
        """Pair GT/pred masks per frame (mask + semantic modes).

        (reference: evaluation.py:1134 ``_process_frames_mask`` / :1204
        ``_process_frames_semantic``.)"""
        iou_thr = self.match_threshold if self.match_threshold > 0 else 0.5
        self.positive_pairs, self.false_negatives = [], []
        self.mask_pairs = []  # (gt_mask, pr_mask, iou)
        self.semantic_frames = []  # (gt_union, pr_union)
        for frame_gt, frame_pr in self.frame_pairs:
            gt_masks = [m.mask for m in getattr(frame_gt, "masks", [])]
            pr_masks = [m.mask for m in getattr(frame_pr, "masks", [])]
            if self.match_method == "semantic":
                def union(ms, like):
                    if ms:
                        out = np.zeros_like(ms[0], dtype=bool)
                        for m in ms:
                            out |= m
                        return out
                    return np.zeros_like(like, dtype=bool) if like is not None else None

                g = union(gt_masks, pr_masks[0] if pr_masks else None)
                p = union(pr_masks, gt_masks[0] if gt_masks else None)
                if g is not None and p is not None:
                    self.semantic_frames.append((g, p))
                continue
            pairs, fn, fp = match_masks(gt_masks, pr_masks, iou_thr)
            gt_mi = get_instances(frame_gt)
            for (gi, pj, iou) in pairs:
                self.mask_pairs.append((gt_masks[gi], pr_masks[pj], iou))
                self.positive_pairs.append(
                    (
                        MatchInstance(frame_gt.masks[gi], frame_gt.frame_idx),
                        MatchInstance(frame_pr.masks[pj], frame_pr.frame_idx),
                        iou,
                    )
                )
            self.false_negatives.extend(
                MatchInstance(frame_gt.masks[i], frame_gt.frame_idx) for i in fn
            )
            self.false_positives.extend(
                MatchInstance(frame_pr.masks[j], frame_pr.frame_idx) for j in fp
            )
        self.dists_dict = {"dists": np.zeros((0, 1)), "frame_idxs": [], "video_paths": []}

    def mask_metrics(self) -> dict:
        """Matched-mask quality (reference: :1456)."""
        ious = np.array([iou for _, _, iou in self.mask_pairs])
        bious = np.array(
            [boundary_iou(g, p) for g, p, _ in self.mask_pairs]
        ) if self.mask_pairs else np.array([])
        cld = np.array(
            [mask_cldice(p, g) for g, p, _ in self.mask_pairs]
        ) if self.mask_pairs else np.array([])
        return {
            "mean_iou": float(ious.mean()) if ious.size else np.nan,
            "mean_boundary_iou": float(bious.mean()) if bious.size else np.nan,
            "mean_cldice": float(cld.mean()) if cld.size else np.nan,
            "n_matched": len(self.mask_pairs),
        }

    def semantic_metrics(self) -> dict:
        """Matching-free whole-frame foreground metrics (reference: :1554)."""
        if not getattr(self, "semantic_frames", None):
            return {"fg_iou": np.nan, "boundary_iou": np.nan, "cldice": np.nan}
        ious = [mask_iou(g, p) for g, p in self.semantic_frames]
        bious = [boundary_iou(g, p) for g, p in self.semantic_frames]
        cld = [mask_cldice(p, g) for g, p in self.semantic_frames]
        return {
            "fg_iou": float(np.mean(ious)),
            "boundary_iou": float(np.mean(bious)),
            "cldice": float(np.mean(cld)),
            "n_frames": len(self.semantic_frames),
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
        if self.match_method == "mask":
            return {
                "detection_metrics": self.detection_metrics(),
                "mask_metrics": self.mask_metrics(),
            }
        if self.match_method == "semantic":
            return {"semantic_metrics": self.semantic_metrics()}
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

    if match_method in ("mask", "semantic"):
        has_predictions = any(len(getattr(lf, "masks", [])) for lf in labels_pr)
    else:
        has_predictions = any(len(lf.instances) for lf in labels_pr)
    if not len(labels_pr) or not has_predictions:
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
