"""Segmentation training targets: fg mask, center heatmap, center offsets.

Parity target: reference sleap_nn/data/segmentation_maps.py:10-200, rebuilt
as batched channel-last jax ops over fixed-size mask stacks
``(n_instances, H, W)`` with a validity mask (ragged mask lists become
padded stacks under jit). Also provides keypoint->mask synthesis (capsules
around skeleton edges) mirroring the reference's synthetic segmentation
fixtures (reference: tests/fixtures/datasets.py:17-46
``make_seg_labels_from_slp``).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from sleap_nn_tpu.ops.edge_maps import distance_to_edge
from sleap_nn_tpu.ops.grid import make_grid_vectors


def render_masks_from_instances(
    instances: jnp.ndarray,
    img_hw: Tuple[int, int],
    edge_inds: Optional[jnp.ndarray] = None,
    radius: float = 12.0,
) -> jnp.ndarray:
    """Synthesize per-instance masks as capsules around skeleton edges.

    Pixels within ``radius`` of any skeleton edge segment (or any node when
    no edges) are foreground — the keypoint-driven mask synthesis used when
    labels carry no real masks.

    Args:
        instances: ``(n_instances, n_nodes, 2)`` NaN-padded keypoints.
        img_hw: mask resolution (full image pixels).

    Returns:
        ``(n_instances, H, W)`` bool.
    """
    h, w = img_hw
    xv, yv = make_grid_vectors(h, w, 1)
    xx, yy = jnp.meshgrid(xv, yv)
    grid = jnp.stack([xx, yy], axis=-1)  # (H, W, 2)

    def one(inst):
        if edge_inds is not None and edge_inds.shape[0] > 0:
            src = inst[edge_inds[:, 0]]
            dst = inst[edge_inds[:, 1]]
        else:
            src = inst
            dst = inst
        d2 = distance_to_edge(grid, src, dst)  # (H, W, n_edges)
        d2 = jnp.where(jnp.isnan(d2), jnp.inf, d2)
        return jnp.min(d2, axis=-1) <= radius**2

    return jax.vmap(one)(instances)


def _area_downsample(mask: jnp.ndarray, output_stride: int) -> jnp.ndarray:
    """Area-average a (..., H, W) float mask by the stride."""
    if output_stride == 1:
        return mask
    *lead, h, w = mask.shape
    s = output_stride
    m = mask.reshape(*lead, h // s, s, w // s, s)
    return m.mean(axis=(-3, -1))


def generate_foreground_mask(
    masks: jnp.ndarray,
    mask_valid: jnp.ndarray,
    output_stride: int = 2,
    maxpool: bool = False,
) -> jnp.ndarray:
    """Binary union foreground at output stride (reference: :10).

    Args:
        masks: ``(B, I, H, W)`` float/bool instance masks (padded rows 0).
        mask_valid: ``(B, I)`` bool.

    Returns:
        ``(B, H/s, W/s, 1)`` float32 in {0, 1}. ``maxpool=True`` keeps any
        coverage (thin structures); default requires >50% cell coverage.
    """
    m = masks.astype(jnp.float32) * mask_valid[..., None, None]
    union = jnp.max(m, axis=1)  # (B, H, W)
    cov = _area_downsample(union, output_stride)
    thresh = 0.0 if maxpool else 0.5
    return (cov > thresh).astype(jnp.float32)[..., None]


def compute_mask_centroids(
    masks: jnp.ndarray, mask_valid: jnp.ndarray
) -> jnp.ndarray:
    """Center of mass per mask, (x, y) pixels; NaN for invalid/empty masks."""
    b, i, h, w = masks.shape
    m = masks.astype(jnp.float32)
    total = jnp.sum(m, axis=(-2, -1))
    xs = jnp.arange(w, dtype=jnp.float32)
    ys = jnp.arange(h, dtype=jnp.float32)
    cx = jnp.sum(m * xs[None, None, None, :], axis=(-2, -1)) / jnp.maximum(total, 1)
    cy = jnp.sum(m * ys[None, None, :, None], axis=(-2, -1)) / jnp.maximum(total, 1)
    cents = jnp.stack([cx, cy], axis=-1)
    ok = mask_valid & (total > 0)
    return jnp.where(ok[..., None], cents, jnp.nan)


def generate_center_heatmap(
    masks: jnp.ndarray,
    mask_valid: jnp.ndarray,
    output_stride: int = 2,
    sigma: float = 4.0,
    centers: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Gaussian heatmap at mask centroids (reference: :60).

    Grid coordinates are CELL CENTERS (``i*s + s/2``) matching the reference.

    Returns ``(B, H/s, W/s, 1)``.
    """
    b, i, h, w = masks.shape
    if centers is None:
        centers = compute_mask_centroids(masks, mask_valid)  # (B, I, 2)
    out_h, out_w = h // output_stride, w // output_stride
    xv = jnp.arange(out_w, dtype=jnp.float32) * output_stride + output_stride / 2.0
    yv = jnp.arange(out_h, dtype=jnp.float32) * output_stride + output_stride / 2.0
    s2 = 2 * (sigma * output_stride) ** 2
    cx = centers[..., 0][:, :, None, None]
    cy = centers[..., 1][:, :, None, None]
    g = jnp.exp(-((xv[None, None, None, :] - cx) ** 2 + (yv[None, None, :, None] - cy) ** 2) / s2)
    g = jnp.nan_to_num(g)
    return jnp.max(g, axis=1)[..., None]


def generate_center_offsets(
    masks: jnp.ndarray,
    mask_valid: jnp.ndarray,
    output_stride: int = 2,
    centers: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-pixel (dx, dy) to the pixel's instance center (reference: :108).

    Overlaps resolve to the SMALLEST instance (the reference writes
    largest-first so smaller overwrite).

    Returns ``(offsets (B, H/s, W/s, 2), weight_mask (B, H/s, W/s, 1))``.
    """
    b, i, h, w = masks.shape
    if centers is None:
        centers = compute_mask_centroids(masks, mask_valid)
    out_h, out_w = h // output_stride, w // output_stride

    m = masks.astype(jnp.float32) * mask_valid[..., None, None]
    m_ds = _area_downsample(m, output_stride) > 0.5  # (B, I, h', w')
    areas = jnp.sum(masks.astype(jnp.float32), axis=(-2, -1))
    areas = jnp.where(mask_valid, areas, jnp.inf)
    # Owner per pixel = covering instance with the smallest area.
    area_map = jnp.where(m_ds, areas[..., None, None], jnp.inf)
    owner = jnp.argmin(area_map, axis=1)  # (B, h', w')
    covered = jnp.any(m_ds, axis=1)

    xx = jnp.arange(out_w, dtype=jnp.float32) * output_stride + output_stride / 2.0
    yy = jnp.arange(out_h, dtype=jnp.float32) * output_stride + output_stride / 2.0
    gx, gy = jnp.meshgrid(xx, yy)

    # Gather each pixel's owner center: centers (B, I, 2), owner (B, h', w').
    flat_owner = owner.reshape(b, -1).astype(jnp.int32)  # (B, P)
    own_c = jnp.take_along_axis(
        centers, jnp.broadcast_to(flat_owner[..., None], (b, flat_owner.shape[1], 2)), axis=1
    )  # (B, P, 2)
    own_c = own_c.reshape(b, out_h, out_w, 2)
    dx = own_c[..., 0] - gx[None]
    dy = own_c[..., 1] - gy[None]
    offsets = jnp.stack([dx, dy], axis=-1)
    offsets = jnp.where(covered[..., None], jnp.nan_to_num(offsets), 0.0)
    weight = covered.astype(jnp.float32)[..., None]
    return offsets, weight
