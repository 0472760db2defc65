"""Device-side image normalization (reference: sleap_nn/data/normalization.py)."""

from __future__ import annotations

import jax.numpy as jnp

from sleap_nn_tpu.models.model import rgb_to_grayscale


def normalize_image(image: jnp.ndarray) -> jnp.ndarray:
    """uint8 (or float) image -> float32 in [0, 1]."""
    if image.dtype == jnp.uint8:
        return image.astype(jnp.float32) / 255.0
    image = image.astype(jnp.float32)
    return image


def ensure_rgb(image: jnp.ndarray) -> jnp.ndarray:
    """Replicate single channel to 3 (channel-last)."""
    if image.shape[-1] == 1:
        return jnp.repeat(image, 3, axis=-1)
    return image


def ensure_grayscale(image: jnp.ndarray) -> jnp.ndarray:
    """RGB -> single channel (channel-last)."""
    if image.shape[-1] == 3:
        return rgb_to_grayscale(image)
    return image


def apply_channel_config(image: jnp.ndarray, ensure_rgb_flag: bool, ensure_gray_flag: bool):
    if ensure_rgb_flag:
        return ensure_rgb(image)
    if ensure_gray_flag:
        return ensure_grayscale(image)
    return image
