"""Device-side resize / pad ops with static shapes.

Parity target: reference sleap_nn/data/resizing.py:11-174. All target sizes
are static Python ints (computed at trace time from static input shapes), so
the whole chain compiles into one XLA program per input geometry.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def find_padding_for_stride(height: int, width: int, max_stride: int) -> Tuple[int, int]:
    """Bottom/right padding needed to make (height, width) divisible by stride."""
    pad_height = (max_stride - height % max_stride) % max_stride
    pad_width = (max_stride - width % max_stride) % max_stride
    return pad_height, pad_width


def apply_pad_to_stride(image: jnp.ndarray, max_stride: int) -> jnp.ndarray:
    """Zero-pad bottom/right to a multiple of ``max_stride`` (channel-last)."""
    h, w = image.shape[-3], image.shape[-2]
    pad_h, pad_w = find_padding_for_stride(h, w, max_stride)
    if pad_h == 0 and pad_w == 0:
        return image
    pad = [(0, 0)] * (image.ndim - 3) + [(0, pad_h), (0, pad_w), (0, 0)]
    return jnp.pad(image, pad, mode="constant")


def resize_image(image: jnp.ndarray, scale: float) -> jnp.ndarray:
    """Bilinear resize by a scale factor (channel-last, leading batch dims)."""
    h, w = image.shape[-3], image.shape[-2]
    new_h, new_w = int(round(h * scale)), int(round(w * scale))
    new_shape = image.shape[:-3] + (new_h, new_w, image.shape[-1])
    return jax.image.resize(image, new_shape, method="bilinear")


def apply_resizer(image: jnp.ndarray, instances: jnp.ndarray, scale: float = 1.0):
    """Rescale image and keypoints together."""
    if scale != 1.0:
        image = resize_image(image, scale)
        instances = instances * scale
    return image, instances


def apply_sizematcher(
    image: jnp.ndarray,
    max_height: Optional[int] = None,
    max_width: Optional[int] = None,
) -> Tuple[jnp.ndarray, float]:
    """Resize-to-fit (max_height, max_width) preserving aspect, then pad.

    Returns ``(image, eff_scale)``; keypoints must be multiplied by
    ``eff_scale`` (reference: resizing.py:135-174 — same rounding).
    """
    h, w = image.shape[-3], image.shape[-2]
    max_height = max_height or h
    max_width = max_width or w
    if h == max_height and w == max_width:
        return image, 1.0
    hratio = max_height / h
    wratio = max_width / w
    eff_scale = min(hratio, wratio)
    target_h = int(round(h * eff_scale))
    target_w = int(round(w * eff_scale))
    new_shape = image.shape[:-3] + (target_h, target_w, image.shape[-1])
    image = jax.image.resize(image, new_shape, method="bilinear")
    pad = [(0, 0)] * (image.ndim - 3) + [
        (0, max_height - target_h),
        (0, max_width - target_w),
        (0, 0),
    ]
    image = jnp.pad(image, pad, mode="constant")
    return image, eff_scale
