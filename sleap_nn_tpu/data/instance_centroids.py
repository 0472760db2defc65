"""Instance centroid computation (reference: sleap_nn/data/instance_centroids.py)."""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def find_points_mean(points: jnp.ndarray) -> jnp.ndarray:
    """NaN-aware mean over the node axis: ``(..., n_nodes, 2) -> (..., 2)``."""
    valid = ~jnp.isnan(points[..., 0:1])
    filled = jnp.nan_to_num(points)
    count = jnp.sum(valid, axis=-2)
    total = jnp.sum(filled * valid, axis=-2)
    mean = total / jnp.maximum(count, 1)
    return jnp.where(count > 0, mean, jnp.nan)


def generate_centroids(
    instances: jnp.ndarray, anchor_ind: Optional[int] = None
) -> jnp.ndarray:
    """Centroid per instance: anchor node if visible, else visible-point mean.

    Args:
        instances: ``(..., n_instances, n_nodes, 2)`` NaN-padded.
        anchor_ind: optional node index used as the anchor part.

    Returns:
        ``(..., n_instances, 2)``.
    """
    mean = find_points_mean(instances)
    if anchor_ind is None:
        return mean
    anchor = instances[..., anchor_ind, :]
    use_anchor = ~jnp.isnan(anchor[..., 0:1])
    return jnp.where(use_anchor, anchor, mean)
