"""Instance crop-size computation + crop generation.

Parity target: reference sleap_nn/data/instance_cropping.py:11-219.
Crop extraction itself reuses the XLA gather in sleap_nn_tpu.ops.crops.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from sleap_nn_tpu.io.model import Labels
from sleap_nn_tpu.ops.crops import crop_bboxes, make_centered_bboxes


def compute_augmentation_padding(
    bbox_size: float, rotation_max: float = 0.0, scale_max: float = 1.0
) -> int:
    """Padding needed so rotation/scale augmentation keeps the instance in-crop."""
    if rotation_max == 0.0 and scale_max <= 1.0:
        return 0
    rotation_rad = math.radians(min(abs(rotation_max), 90))
    rotation_factor = abs(math.cos(rotation_rad)) + abs(math.sin(rotation_rad))
    if abs(rotation_max) >= 45:
        rotation_factor = math.sqrt(2)
    expansion = rotation_factor * max(scale_max, 1.0)
    return int(math.ceil(bbox_size * expansion - bbox_size))


def find_max_instance_bbox_size(labels: Labels) -> float:
    """Max bbox side over all non-empty instances."""
    max_length = 0.0
    for lf in labels:
        for inst in lf.instances:
            if inst.is_empty():
                continue
            pts = inst.numpy()
            dx = np.nanmax(pts[:, 0]) - np.nanmin(pts[:, 0])
            dy = np.nanmax(pts[:, 1]) - np.nanmin(pts[:, 1])
            max_length = max(max_length, 0 if np.isnan(dx) else dx, 0 if np.isnan(dy) else dy)
    return float(max_length)


def find_instance_crop_size(
    labels: Labels,
    padding: int = 0,
    maximum_stride: int = 2,
    min_crop_size: Optional[int] = None,
) -> int:
    """Crop size covering the largest instance, stride-rounded (reference: :80)."""
    min_crop_size = 0 if min_crop_size is None else min_crop_size
    if min_crop_size > 0 and min_crop_size % maximum_stride == 0:
        return min_crop_size
    max_length = max(find_max_instance_bbox_size(labels), float(min_crop_size - padding))
    max_length += float(padding)
    return int(math.ceil(max_length / float(maximum_stride)) * maximum_stride)


def generate_crops(
    image: jnp.ndarray,
    instances: jnp.ndarray,
    centroids: jnp.ndarray,
    crop_size: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Crop around centroids and shift keypoints into crop coordinates.

    Args:
        image: ``(B, H, W, C)``.
        instances: ``(B, ..., n_nodes, 2)`` keypoints to shift — one entry
            per centroid row (i.e. already gathered per-instance).
        centroids: ``(B, 2)`` crop centers (one crop per batch row).
        crop_size: static crop side length.

    Returns:
        ``(crops (B, crop, crop, C), shifted_instances, shifted_centroids)``.
    """
    bboxes = make_centered_bboxes(centroids, crop_size, crop_size)
    sample_inds = jnp.arange(image.shape[0])
    crops = crop_bboxes(image, bboxes, sample_inds, crop_size, crop_size)
    # Integer-floored top-left (must match the gather in crop_bboxes).
    half = jnp.array([crop_size // 2, crop_size // 2], dtype=centroids.dtype)
    top_left = jnp.trunc(bboxes[:, 0, :] + half) - half
    shift = top_left.reshape((image.shape[0],) + (1,) * (instances.ndim - 2) + (2,))
    return crops, instances - shift, centroids - top_left
