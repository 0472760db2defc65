"""Supervised-ID targets: class vectors and class maps.

Parity target: reference sleap_nn/data/identity.py:10-137.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sleap_nn_tpu.ops.confmaps import make_multi_confmaps
from sleap_nn_tpu.ops.grid import make_grid_vectors


def make_class_vectors(class_inds: jnp.ndarray, n_classes: int) -> jnp.ndarray:
    """One-hot class vectors; negative indices (untracked/padded) -> all zero.

    Args:
        class_inds: ``(...,)`` int32 class indices.

    Returns:
        ``(..., n_classes)`` float32.
    """
    onehot = jax.nn.one_hot(jnp.maximum(class_inds, 0), n_classes)
    return jnp.where((class_inds >= 0)[..., None], onehot, 0.0)


def make_class_maps(
    confmaps: jnp.ndarray,
    class_inds: jnp.ndarray,
    n_classes: int,
    threshold: float = 0.2,
) -> jnp.ndarray:
    """Class maps: per-class masks gated by per-instance confmaps.

    Args:
        confmaps: ``(B, n_instances, H, W, n_nodes)`` PER-INSTANCE confmaps.
        class_inds: ``(B, n_instances)`` int32 (-1 = padded).

    Returns:
        ``(B, H, W, n_classes)``: for each class, the max over instances of
        that class of (confmap over threshold, scaled to [0, 1]).
    """
    # Reduce nodes: an instance's support is the max over its nodes.
    support = jnp.max(confmaps, axis=-1)  # (B, I, H, W)
    gated = jnp.clip((support - threshold) / (1 - threshold), 0.0, 1.0)
    gated = jnp.where(support > threshold, 1.0, 0.0) * gated

    onehot = make_class_vectors(class_inds, n_classes)  # (B, I, n_classes)
    # (B, I, H, W, 1) * (B, I, 1, 1, C) -> max over I
    maps = gated[..., None] * onehot[:, :, None, None, :]
    return jnp.max(maps, axis=1)


def generate_class_maps(
    instances: jnp.ndarray,
    img_hw,
    class_inds: jnp.ndarray,
    n_classes: int,
    sigma: float = 5.0,
    output_stride: int = 2,
    threshold: float = 0.2,
) -> jnp.ndarray:
    """Render class maps from keypoints (reference: identity.py:85)."""
    height, width = img_hw
    xv, yv = make_grid_vectors(height, width, output_stride)
    from sleap_nn_tpu.ops.confmaps import make_confmaps

    # Per-instance confmaps: (B, I, H, W, n_nodes)
    cms = make_confmaps(instances, xv, yv, sigma * output_stride)
    return make_class_maps(cms, class_inds, n_classes, threshold)
