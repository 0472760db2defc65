"""Pallas TPU kernels for hot ops.

The target-rendering ops are the framework's highest-volume elementwise
work (B x I x N Gaussians over H x W grids rendered every training step —
reference renders these per-sample on CPU workers,
sleap_nn/data/confidence_maps.py:132). The XLA fusion of the jnp versions
is already good; these kernels exist to (a) cap VMEM traffic by fusing the
instance-max reduction into one pass over each output tile and (b) serve as
the template for further Pallas work (peak NMS, PAF line gather).

All kernels fall back to the pure-jnp implementations off-TPU (CPU tests
run them in interpreter mode).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # TPU-only module; absent on CPU-only installs.
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pltpu = None


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _confmap_kernel(pts_ref, xv_ref, yv_ref, out_ref, *, n_instances, sigma):
    """One (batch, node, row-tile) program: max over instances of the
    Gaussian rendered on a (TILE_H, W) tile.

    Block layouts are chosen for the TPU tiling rules (last two block dims
    must be full or (8, 128)-aligned): points come in as ``(1, 1, I, 2)``,
    the output tile as ``(1, 1, TILE_H, W)``.
    """
    del n_instances  # instance axis is fully vectorized below
    xrow = xv_ref[0, :]  # (W,)
    ycol = yv_ref[:, 0]  # (TILE_H,)
    inv = 1.0 / (2.0 * sigma * sigma)
    # Vectorize over instances on the VPU: (I, 1, W) + (I, TILE_H, 1),
    # max-reduce over I before the single store. On v5e this is within
    # measurement noise of XLA's own fusion (3-4 ms either way at B=16,
    # I=8, N=16, 512x512); a scalar fori_loop over instances was ~40%
    # slower. Kept as the opt-in Pallas path + template for further kernels.
    px = pts_ref[0, 0, :, 0][:, None, None]
    py = pts_ref[0, 0, :, 1][:, None, None]
    dx2 = (xrow[None, None, :] - px) ** 2
    dy2 = (ycol[None, :, None] - py) ** 2
    cm = jnp.exp(-(dy2 + dx2) * inv)
    cm = jnp.where(jnp.isnan(cm), 0.0, cm)
    out_ref[0, 0, :, :] = jnp.max(cm, axis=0)


def make_multi_confmaps_pallas(
    points: jnp.ndarray,
    xv: jnp.ndarray,
    yv: jnp.ndarray,
    sigma: float,
    tile_h: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """Pallas multi-instance confmap rendering.

    Semantics identical to :func:`sleap_nn_tpu.ops.make_multi_confmaps`:
    ``(B, I, N, 2)`` NaN-padded points -> ``(B, H, W, N)`` max-reduced
    Gaussians.

    The grid is ``(B, N, H/tile_h)``; each program renders one row-tile of
    one node channel, fusing the instance reduction so each output tile is
    written exactly once (single pass over HBM).
    """
    b, n_inst, n_nodes, _ = points.shape
    w = xv.shape[0]
    h = yv.shape[0]
    tile_h = min(tile_h, h)
    if h % tile_h:
        # Keep row tiles aligned; fall back to one full-height tile.
        tile_h = h
    grid = (b, n_nodes, pl.cdiv(h, tile_h))

    pts_t = jnp.transpose(points.astype(jnp.float32), (0, 2, 1, 3))  # (B, N, I, 2)
    kernel = functools.partial(_confmap_kernel, n_instances=n_inst, sigma=float(sigma))
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, n_nodes, h, w), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, n_inst, 2), lambda bi, ni, hi: (bi, ni, 0, 0)),
            pl.BlockSpec((1, w), lambda bi, ni, hi: (0, 0)),
            pl.BlockSpec((tile_h, 1), lambda bi, ni, hi: (hi, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, tile_h, w), lambda bi, ni, hi: (bi, ni, hi, 0)
        ),
        interpret=interpret,
    )(pts_t, xv.reshape(1, -1), yv.reshape(-1, 1))
    return jnp.transpose(out, (0, 2, 3, 1))  # -> (B, H, W, N)


def use_pallas() -> bool:
    """Whether to route hot ops through Pallas (opt-in via
    ``SLEAP_NN_TPU_PALLAS=1``; XLA's fusion of the jnp versions measures
    equal-within-noise on v5e, so the default stays on the simpler path)."""
    env = os.environ.get("SLEAP_NN_TPU_PALLAS")
    if env is None:
        return False
    return env not in ("0", "false", "")
