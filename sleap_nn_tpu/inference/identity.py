"""Identity classification ops: peak -> class assignment.

Parity target: reference sleap_nn/inference/ops/identity.py:13-173 —
Hungarian matching of peaks to classes per (sample, node) from class-map
probabilities, and class assignment from classification vectors. Host-side
numpy (small matrices), operating on the fixed-size peak arrays produced by
the device peak finder.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
from scipy.optimize import linear_sum_assignment


def group_class_peaks(
    peak_class_probs: np.ndarray,
    peak_sample_inds: np.ndarray,
    peak_channel_inds: np.ndarray,
    n_samples: int,
    n_channels: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """Hungarian-match peaks to classes per (sample, channel) (reference: :13)."""
    peak_inds_list, class_inds_list = [], []
    for sample in range(n_samples):
        for channel in range(n_channels):
            mask = (peak_sample_inds == sample) & (peak_channel_inds == channel)
            if not mask.any():
                continue
            probs = peak_class_probs[mask]
            rows, cols = linear_sum_assignment(-probs)
            masked_idx = np.nonzero(mask)[0]
            peak_inds_list.append(masked_idx[rows])
            class_inds_list.append(cols)
    if not peak_inds_list:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int64)
    peak_inds = np.concatenate(peak_inds_list)
    class_inds = np.concatenate(class_inds_list)

    # Keep only assignments where the matched class is the peak's best class.
    matched = peak_class_probs[peak_inds, class_inds]
    best = peak_class_probs[peak_inds].max(axis=1)
    keep = matched == best
    return peak_inds[keep], class_inds[keep]


def classify_peaks_from_maps(
    class_maps: np.ndarray,
    peak_points: np.ndarray,
    peak_vals: np.ndarray,
    peak_sample_inds: np.ndarray,
    peak_channel_inds: np.ndarray,
    n_channels: int,
    sort_keys: np.ndarray = None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Group peaks into per-class instances via class maps (reference: :71).

    Args:
        class_maps: ``(n_samples, H, W, n_classes)`` channel-last.
        peak_points: ``(n_peaks, 2)`` (x, y) in CLASS-MAP grid coords.
        peak_vals / peak_sample_inds / peak_channel_inds: ``(n_peaks,)``.
        sort_keys: optional ``(n_peaks, 2)`` (x, y) UNREFINED peak positions
            used for ordering (see below); defaults to ``peak_points``.

    Returns:
        ``(points (S, n_classes, n_channels, 2), point_vals, class_probs)``;
        NaN where unassigned.
    """
    n_samples, h, w, n_classes = class_maps.shape
    # Reorder peaks into the reference's (sample, channel, row, col) scan
    # order: scipy's Hungarian tie-breaking depends on row order, and the
    # reference's peak finder emits peaks in nonzero-scan order over
    # (B, C, H, W) of the ROUGH (pre-refinement) peak grid (reference:
    # ops/identity.py:41 nonzero(mask)), while our device peak finder emits
    # fixed-size top-K by value. Same order -> identical assignments on tied
    # class probabilities.
    xy = np.round(peak_points).astype(int)
    cols = np.clip(xy[:, 0], 0, w - 1)
    rows = np.clip(xy[:, 1], 0, h - 1)
    peak_class_probs = class_maps[peak_sample_inds, rows, cols, :]  # (n, n_classes)
    return group_and_assemble(
        peak_points,
        peak_vals,
        peak_sample_inds,
        peak_channel_inds,
        peak_class_probs,
        n_samples,
        n_classes,
        n_channels,
        sort_keys=sort_keys,
    )


def group_and_assemble(
    peak_points: np.ndarray,
    peak_vals: np.ndarray,
    peak_sample_inds: np.ndarray,
    peak_channel_inds: np.ndarray,
    peak_class_probs: np.ndarray,
    n_samples: int,
    n_classes: int,
    n_channels: int,
    sort_keys: np.ndarray = None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Hungarian-group pre-gathered per-peak class probs into instances.

    Shared by the live class-maps layer and exported graphs (which bake the
    class-prob gather on device). See :func:`classify_peaks_from_maps` for
    the ordering contract.
    """
    keys = peak_points if sort_keys is None else sort_keys
    order = np.lexsort(
        (
            np.round(keys[:, 0]),
            np.round(keys[:, 1]),
            peak_channel_inds,
            peak_sample_inds,
        )
    )
    peak_points = peak_points[order]
    peak_vals = peak_vals[order]
    peak_sample_inds = peak_sample_inds[order]
    peak_channel_inds = peak_channel_inds[order]
    peak_class_probs = peak_class_probs[order]

    peak_inds, class_inds = group_class_peaks(
        peak_class_probs, peak_sample_inds, peak_channel_inds, n_samples, n_channels
    )

    points = np.full((n_samples, n_classes, n_channels, 2), np.nan, dtype=np.float32)
    point_vals = np.full((n_samples, n_classes, n_channels), np.nan, dtype=np.float32)
    class_probs = np.full((n_samples, n_classes, n_channels), np.nan, dtype=np.float32)
    s = peak_sample_inds[peak_inds]
    c = peak_channel_inds[peak_inds]
    points[s, class_inds, c] = peak_points[peak_inds]
    point_vals[s, class_inds, c] = peak_vals[peak_inds]
    class_probs[s, class_inds, c] = peak_class_probs[peak_inds, class_inds]
    return points, point_vals, class_probs


def get_class_inds_from_vectors(peak_class_probs: np.ndarray):
    """Assign each sample a distinct class by Hungarian matching (reference: :149)."""
    n_samples = peak_class_probs.shape[0]
    rows, cols = linear_sum_assignment(-np.nan_to_num(peak_class_probs))
    class_inds = np.full((n_samples,), -1, dtype=np.int64)
    class_probs = np.full((n_samples,), np.nan, dtype=np.float32)
    class_inds[rows] = cols
    class_probs[rows] = peak_class_probs[rows, cols]
    return class_inds, class_probs
