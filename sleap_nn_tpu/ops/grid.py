"""Sampling-grid helpers (reference: sleap_nn/data/utils.py:55,114)."""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def make_grid_vectors(
    image_height: int, image_width: int, output_stride: int = 1
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sampling grid vectors ``(xv, yv)`` over image space.

    ``xv`` has shape ``(image_width // output_stride,)`` with values
    ``0, stride, 2*stride, ...`` (and likewise ``yv``), matching the
    reference semantics so rendered targets and peak coordinates line up.
    """
    xv = jnp.arange(0, image_width, step=output_stride, dtype=jnp.float32)
    yv = jnp.arange(0, image_height, step=output_stride, dtype=jnp.float32)
    return xv, yv


def gaussian_pdf(x: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Unnormalized 0-centered Gaussian PDF: ``exp(-x^2 / (2 sigma^2))``."""
    return jnp.exp(-(x**2) / (2 * sigma**2))
