"""Host-side sample extraction from labeled frames.

Parity target: reference sleap_nn/data/providers.py:14-150 (``process_lf``,
``get_max_instances``, ``get_max_height_width``) in channel-last numpy.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from sleap_nn_tpu.io.model import Instance, LabeledFrame, Labels, PredictedInstance


def get_max_instances(labels: Labels, include_user_centroids: bool = False) -> int:
    """Max number of instances in any labeled frame.

    ``include_user_centroids`` (centroid models only) also counts
    user-centroid records: pure-centroid seeding frames carry no pose
    instances but each centroid becomes one training instance. Other
    model families never consume centroids, so counting them would just
    inflate padded array shapes.
    """

    def count(lf):
        n = len(lf.instances)
        if include_user_centroids:
            n = max(n, len(getattr(lf, "user_centroids", []) or []))
        return n

    return max((count(lf) for lf in labels.labeled_frames), default=1)


def get_max_height_width(labels: Labels) -> Tuple[int, int]:
    """Max (height, width) over the labels' videos."""
    h = w = 0
    for video in labels.videos:
        shape = video.shape
        if shape is not None:
            h = max(h, shape[1])
            w = max(w, shape[2])
    if h == 0 or w == 0:
        img = labels.labeled_frames[0].image
        h, w = img.shape[0], img.shape[1]
    return h, w


def filter_oob_points(points: np.ndarray, img_height: int, img_width: int) -> np.ndarray:
    """NaN-out keypoints outside [0, W) x [0, H) (annotation errors)."""
    points = points.copy()
    x, y = points[..., 0], points[..., 1]
    oob = (x < 0) | (x >= img_width) | (y < 0) | (y >= img_height)
    points[oob] = np.nan
    return points


def process_lf(
    lf: LabeledFrame,
    video_idx: int,
    max_instances: int,
    user_instances_only: bool = True,
    image: Optional[np.ndarray] = None,
    track_index: Optional[dict] = None,
) -> Optional[Dict[str, Any]]:
    """LabeledFrame -> sample dict.

    Returns None when no usable instances remain (matches reference).

    Keys: ``image`` uint8 (H, W, C); ``instances`` float32
    (max_instances, n_nodes, 2) NaN-padded; ``num_instances`` int;
    ``frame_idx``/``video_idx`` int; ``orig_size`` (2,) [h, w]; ``track_ids``
    int32 (max_instances,) (-1 = untracked/padding) for supervised-ID heads
    when ``track_index`` (mapping ``id(track) -> class idx``) is given.
    """
    instances_list = list(lf.instances)
    if user_instances_only:
        user = [i for i in instances_list if not isinstance(i, PredictedInstance)]
        if user:
            instances_list = user

    img = image if image is not None else lf.image
    if img.ndim == 2:
        img = img[..., None]
    img_height, img_width = img.shape[:2]

    pts_list, tid_list = [], []
    for inst in instances_list:
        if inst.is_empty():
            continue
        pts = filter_oob_points(inst.numpy().astype(np.float32), img_height, img_width)
        if np.isnan(pts).all():
            continue
        pts_list.append(pts)
        tid = -1
        if track_index is not None and inst.track is not None:
            tid = track_index.get(id(inst.track), -1)
        tid_list.append(tid)
    if not pts_list:
        return None

    n_nodes = pts_list[0].shape[0]
    num_instances = min(len(pts_list), max_instances)
    instances = np.full((max_instances, n_nodes, 2), np.nan, dtype=np.float32)
    instances[:num_instances] = np.stack(pts_list)[:num_instances]
    track_ids = np.full((max_instances,), -1, dtype=np.int32)
    track_ids[:num_instances] = np.asarray(tid_list[:num_instances], dtype=np.int32)

    return {
        "image": np.ascontiguousarray(img),
        "instances": instances,
        "num_instances": num_instances,
        "frame_idx": int(lf.frame_idx),
        "video_idx": int(video_idx),
        "orig_size": np.array([img_height, img_width], dtype=np.float32),
        "track_ids": track_ids,
    }
