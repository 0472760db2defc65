"""Part-affinity-field (PAF) target rendering.

Behavioral parity with the reference (reference: sleap_nn/data/edge_maps.py:
15,120,167) with the per-instance Python loop replaced by a broadcast
instance axis + sum reduction — one fused XLA expression suitable for the
device-side preprocessing graph.

Layout: PAFs are ``(..., H, W, n_edges, 2)`` or flattened
``(..., H, W, 2*n_edges)`` channel-last. The flattened layout interleaves as
``[e0_x, e0_y, e1_x, e1_y, ...]`` matching the reference's
``reshape(n_edges*2, H, W)`` channel order so grouping code agrees.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from sleap_nn_tpu.ops.grid import gaussian_pdf, make_grid_vectors


def distance_to_edge(
    points: jnp.ndarray, edge_source: jnp.ndarray, edge_destination: jnp.ndarray
) -> jnp.ndarray:
    """Squared distance from query points to line segments.

    Args:
        points: ``(..., 2)`` query points (broadcast dims allowed).
        edge_source / edge_destination: ``(n_edges, 2)`` segment endpoints.

    Returns:
        ``(..., n_edges)`` squared distances, with the projection parameter
        clamped to [0, 1] (distance to the *segment*, not the line).
    """
    direction = edge_destination - edge_source  # (n_edges, 2)
    edge_length = jnp.maximum(jnp.sum(direction**2, axis=-1), 1.0)  # (n_edges,)

    rel = points[..., None, :] - edge_source  # (..., n_edges, 2)
    t = jnp.sum(rel * direction, axis=-1) / edge_length  # (..., n_edges)
    t = jnp.clip(t, 0.0, 1.0)
    d = jnp.sum((t[..., None] * direction - rel) ** 2, axis=-1)
    return d


def make_edge_maps(
    xv: jnp.ndarray,
    yv: jnp.ndarray,
    edge_source: jnp.ndarray,
    edge_destination: jnp.ndarray,
    sigma: float,
) -> jnp.ndarray:
    """Gaussian tube mask around each edge: ``(H, W, n_edges)``."""
    xx, yy = jnp.meshgrid(xv, yv)  # (H, W)
    grid = jnp.stack([xx, yy], axis=-1)  # (H, W, 2)
    d = distance_to_edge(grid, edge_source, edge_destination)
    return gaussian_pdf(d, sigma=sigma)


def make_pafs(
    xv: jnp.ndarray,
    yv: jnp.ndarray,
    edge_source: jnp.ndarray,
    edge_destination: jnp.ndarray,
    sigma: float,
) -> jnp.ndarray:
    """Single-instance PAFs: unit edge vectors masked by the edge tube.

    Returns ``(H, W, n_edges, 2)``; NaN where the instance's edge endpoints
    are missing (callers zero-fill before reduction).
    """
    direction = edge_destination - edge_source
    unit = direction / jnp.linalg.norm(direction, axis=-1, keepdims=True)
    tube = make_edge_maps(xv, yv, edge_source, edge_destination, sigma)
    return tube[..., None] * unit  # (H, W, n_edges, 2)


def make_multi_pafs(
    xv: jnp.ndarray,
    yv: jnp.ndarray,
    edge_sources: jnp.ndarray,
    edge_destinations: jnp.ndarray,
    sigma: float,
) -> jnp.ndarray:
    """Multi-instance PAFs summed over instances (NaN instances contribute 0).

    Args:
        edge_sources / edge_destinations: ``(..., n_instances, n_edges, 2)``.

    Returns:
        ``(..., H, W, n_edges, 2)``.
    """
    # vectorize over the instance axis via broadcasting inside distance calc:
    # fold instances into the edge axis, render, then unfold + sum.
    *lead, n_inst, n_edges, _ = edge_sources.shape
    src = edge_sources.reshape(*lead, n_inst * n_edges, 2)
    dst = edge_destinations.reshape(*lead, n_inst * n_edges, 2)
    if lead:
        import jax

        render = jax.vmap(lambda s, d: make_pafs(xv, yv, s, d, sigma))
        flat_src = src.reshape(-1, n_inst * n_edges, 2)
        flat_dst = dst.reshape(-1, n_inst * n_edges, 2)
        pafs = render(flat_src, flat_dst)
        h, w = pafs.shape[1], pafs.shape[2]
        pafs = pafs.reshape(*lead, h, w, n_inst, n_edges, 2)
        pafs = jnp.nan_to_num(pafs).sum(axis=-3)
    else:
        pafs = make_pafs(xv, yv, src, dst, sigma)
        h, w = pafs.shape[0], pafs.shape[1]
        pafs = pafs.reshape(h, w, n_inst, n_edges, 2)
        pafs = jnp.nan_to_num(pafs).sum(axis=-3)
    return pafs


def get_edge_points(
    instances: jnp.ndarray, edge_inds: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Gather per-edge (source, destination) points.

    Args:
        instances: ``(..., n_nodes, 2)``.
        edge_inds: ``(n_edges, 2)`` int (source_idx, destination_idx).

    Returns:
        Tuple of ``(..., n_edges, 2)`` source and destination points.
    """
    src = jnp.take(instances, edge_inds[:, 0], axis=-2)
    dst = jnp.take(instances, edge_inds[:, 1], axis=-2)
    return src, dst


def generate_pafs(
    instances: jnp.ndarray,
    img_hw: Tuple[int, int],
    edge_inds: jnp.ndarray,
    sigma: float = 1.5,
    output_stride: int = 2,
    flatten_channels: bool = True,
) -> jnp.ndarray:
    """Render PAF training targets for one sample.

    Matches reference ``generate_pafs`` (reference:
    sleap_nn/data/edge_maps.py:250), except the out-of-image instance filter
    is realized by masking (NaN-ing) instead of boolean indexing so shapes
    stay static under jit.

    Args:
        instances: ``(n_instances, n_nodes, 2)`` padded with NaN rows.
        img_hw: input image size; grid is ``img_hw // output_stride``.
        edge_inds: ``(n_edges, 2)``.
        flatten_channels: if True returns ``(H, W, 2*n_edges)`` with
            ``[e0x, e0y, e1x, e1y, ...]`` channel order, else
            ``(H, W, n_edges, 2)``.
    """
    height, width = img_hw
    xv, yv = make_grid_vectors(height, width, output_stride)

    # Out-of-image filter (reference keeps instances with any point whose
    # coords are strictly inside (0, max_grid_coord)); masked instances
    # become NaN and render as zeros.
    limit = jnp.array([xv[-1], yv[-1]])
    in_img = (instances > 0) & (instances < limit)
    keep = jnp.any(jnp.all(in_img, axis=-1), axis=-1)  # (n_instances,)
    inst = jnp.where(keep[:, None, None], instances, jnp.nan)

    src, dst = get_edge_points(inst, edge_inds)
    pafs = make_multi_pafs(xv, yv, src, dst, sigma * output_stride)
    if flatten_channels:
        h, w, n_edges, _ = pafs.shape
        pafs = pafs.reshape(h, w, n_edges * 2)
    return pafs
