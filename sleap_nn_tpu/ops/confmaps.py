"""Confidence-map target rendering.

Behavioral parity with the reference renderers
(reference: sleap_nn/data/confidence_maps.py:94,132) but fully vectorized:
the reference loops over instances in Python on CPU dataloader workers; here
the instance axis is a broadcast dimension reduced with ``max`` in one fused
XLA expression, so rendering runs on-device inside the preprocessing graph.

Layout: confmaps are ``(..., H, W, n_nodes)`` (channel-last).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from sleap_nn_tpu.ops.grid import make_grid_vectors


def make_confmaps(
    points: jnp.ndarray,
    xv: jnp.ndarray,
    yv: jnp.ndarray,
    sigma: float,
) -> jnp.ndarray:
    """Render per-node Gaussian confidence maps for a single instance set.

    Args:
        points: ``(..., n_nodes, 2)`` (x, y) coords; NaN = missing (renders 0).
        xv: ``(W,)`` grid vector. yv: ``(H,)`` grid vector.
        sigma: Gaussian std in grid units.

    Returns:
        ``(..., H, W, n_nodes)`` float32 confidence maps.
    """
    x = points[..., 0][..., None, None, :]  # (..., 1, 1, n_nodes)
    y = points[..., 1][..., None, None, :]
    xg = xv[None, :, None]  # (1, W, 1)
    yg = yv[:, None, None]  # (H, 1, 1)
    cm = jnp.exp(-((xg - x) ** 2 + (yg - y) ** 2) / (2 * sigma**2))
    return jnp.nan_to_num(cm)


def make_multi_confmaps(
    points: jnp.ndarray,
    xv: jnp.ndarray,
    yv: jnp.ndarray,
    sigma: float,
) -> jnp.ndarray:
    """Render multi-instance confmaps by max-reduction over instances.

    Args:
        points: ``(..., n_instances, n_nodes, 2)``; NaN instances/nodes
            contribute zeros (so padded instances are free).

    Returns:
        ``(..., H, W, n_nodes)`` — elementwise max over instances.

    With ``SLEAP_NN_TPU_PALLAS=1`` and a 4-D batched input, rendering is
    routed through the fused Pallas kernel
    (:func:`sleap_nn_tpu.ops.pallas_kernels.make_multi_confmaps_pallas`).
    """
    if points.ndim == 4:
        from sleap_nn_tpu.ops.pallas_kernels import make_multi_confmaps_pallas, use_pallas

        if use_pallas():
            return make_multi_confmaps_pallas(points, xv, yv, sigma)
    cms = make_confmaps(points, xv, yv, sigma)  # (..., n_inst, H, W, n_nodes)
    return jnp.max(cms, axis=-4)


def generate_confmaps(
    points: jnp.ndarray,
    img_hw: Tuple[int, int],
    sigma: float = 1.5,
    output_stride: int = 2,
) -> jnp.ndarray:
    """Single-instance confmaps at output stride.

    Matches reference ``generate_confmaps`` semantics
    (reference: sleap_nn/data/confidence_maps.py:8): sigma is scaled by the
    output stride so its spread is specified in *input-image* pixels.
    """
    height, width = img_hw
    xv, yv = make_grid_vectors(height, width, output_stride)
    return make_confmaps(points, xv, yv, sigma * output_stride)


def generate_multiconfmaps(
    points: jnp.ndarray,
    img_hw: Tuple[int, int],
    sigma: float = 1.5,
    output_stride: int = 2,
    is_centroids: bool = False,
) -> jnp.ndarray:
    """Multi-instance (or centroid) confmaps at output stride.

    Matches reference ``generate_multiconfmaps``
    (reference: sleap_nn/data/confidence_maps.py:46). For centroids the
    input is ``(..., n_instances, 2)`` and the output has one channel.
    """
    if is_centroids:
        points = points[..., None, :]  # (..., n_inst, 1, 2)
    height, width = img_hw
    xv, yv = make_grid_vectors(height, width, output_stride)
    return make_multi_confmaps(points, xv, yv, sigma * output_stride)
