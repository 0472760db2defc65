"""Batched bbox construction and crop extraction (XLA gather).

Behavioral parity with the reference ops (reference:
sleap_nn/data/instance_cropping.py:129, sleap_nn/inference/ops/crops.py:31)
in channel-last layout, built on a zero-padded gather so out-of-image crop
pixels are 0 and shapes stay static under jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def make_centered_bboxes(
    centroids: jnp.ndarray, box_height: int, box_width: int
) -> jnp.ndarray:
    """Corner bboxes centered on points.

    Args:
        centroids: ``(..., 2)`` (x, y) centers.
        box_height/box_width: crop size in pixels.

    Returns:
        ``(..., 4, 2)`` corners in top-left, top-right, bottom-right,
        bottom-left order (the reference's convention, so a box of size k
        spans ``center ± (k - 1) / 2`` inclusive).
    """
    half_h = (box_height - 1) / 2.0
    half_w = (box_width - 1) / 2.0
    x, y = centroids[..., 0], centroids[..., 1]
    corners = jnp.stack(
        [
            jnp.stack([x - half_w, y - half_h], axis=-1),
            jnp.stack([x + half_w, y - half_h], axis=-1),
            jnp.stack([x + half_w, y + half_h], axis=-1),
            jnp.stack([x - half_w, y + half_h], axis=-1),
        ],
        axis=-2,
    )
    return corners


def crop_bboxes(
    images: jnp.ndarray,
    bboxes: jnp.ndarray,
    sample_inds: jnp.ndarray,
    crop_height: int,
    crop_width: int,
) -> jnp.ndarray:
    """Extract fixed-size crops around bbox top-lefts via padded gather.

    TPU-first contract: ``crop_height/width`` are static Python ints (the
    reference infers them from the first bbox at runtime — impossible under
    jit). NaN bbox coordinates produce an all-zero crop (used for padded /
    invalid peaks).

    Args:
        images: ``(samples, H, W, C)``.
        bboxes: ``(n_bboxes, 4, 2)`` corners from :func:`make_centered_bboxes`.
        sample_inds: ``(n_bboxes,)`` int — source sample per crop.

    Returns:
        ``(n_bboxes, crop_height, crop_width, C)``.
    """
    h, w = images.shape[1], images.shape[2]
    pad_h, pad_w = crop_height, crop_width
    padded = jnp.pad(
        images, ((0, 0), (pad_h, pad_h), (pad_w, pad_w), (0, 0)), mode="constant"
    )

    top_left = bboxes[:, 0, :]  # (n, 2) (x, y)
    # Match the reference's legacy-compatible floor: trunc(x + half) - half
    # (reference: sleap_nn/inference/ops/crops.py:85-100).
    half = jnp.array([crop_width // 2, crop_height // 2], dtype=top_left.dtype)
    tl_int = jnp.trunc(top_left + half).astype(jnp.int32) - half.astype(jnp.int32)

    invalid = jnp.isnan(top_left).any(axis=-1)
    # Send invalid crops to the zero-padding region (the (0,0) corner block
    # of `padded` is all zeros since pad == crop size).
    tl_int = jnp.where(invalid[:, None], -jnp.array([pad_w, pad_h]), tl_int)

    # One dynamic_slice per crop, vmapped: XLA lowers this to a BLOCK gather
    # (384 copies of a (ch, cw, C) tile) instead of the per-element gather
    # that advanced indexing produces. On a v5e the per-element form ran at
    # ~80 M elem/s (78 ms for 384x128x128 crops — 3x the whole backbone);
    # the block form is ~2 orders of magnitude cheaper. dynamic_slice clamps
    # out-of-range starts, which matches the old per-pixel clip for every
    # reachable centroid (peaks are in-image, so |tl| <= crop).
    start_y = tl_int[:, 1] + pad_h
    start_x = tl_int[:, 0] + pad_w
    c = padded.shape[-1]

    def one_crop(s, y, x):
        return jax.lax.dynamic_slice(
            padded,
            (s, y, x, jnp.int32(0)),
            (1, crop_height, crop_width, c),
        )[0]

    return jax.vmap(one_crop)(
        sample_inds.astype(jnp.int32), start_y, start_x
    )
