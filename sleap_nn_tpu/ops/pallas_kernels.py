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


# --------------------------------------------------------------------------- #
# Kernel target #1 (SURVEY §2.6): peak NMS. Fuses the kxk neighborhood max,
# the strict-maximum compare, and the threshold gate into ONE pass over each
# confmap tile, emitting the top_k-ready score map (cms where peak, -inf
# elsewhere). The XLA path materializes k*k-1 shifted copies; this reads each
# input tile once (plus a halo) and writes each output tile once.
# --------------------------------------------------------------------------- #


def _nms_scores_kernel(cms_ref, out_ref, *, kernel, threshold, tile_h, n_tiles):
    """One (B*C,) program: strict local-max scores on one confmap plane.

    The plane arrives with an r-row/-col -inf halo baked in; the kernel
    walks row tiles with static slices (halo rows overlap between tiles, so
    blocked index maps can't express this — the plane block + internal loop
    can). All shifts are in-register VPU maxima; each output row is written
    exactly once.
    """
    r = kernel // 2
    w_pad = cms_ref.shape[2]
    w = w_pad - 2 * r
    for ti in range(n_tiles):
        x = cms_ref[0, ti * tile_h : ti * tile_h + tile_h + 2 * r, :]
        core = x[r:r + tile_h, r:r + w]
        nbr = None
        for dy in range(-r, r + 1):
            for dx in range(-r, r + 1):
                if dy == 0 and dx == 0:
                    continue
                s = x[r + dy : r + dy + tile_h, r + dx : r + dx + w]
                nbr = s if nbr is None else jnp.maximum(nbr, s)
        is_peak = (core > nbr) & (core > threshold)
        out_ref[0, ti * tile_h : (ti + 1) * tile_h, :] = jnp.where(
            is_peak, core, jnp.float32(-jnp.inf)
        )


def nms_scores_pallas(
    cms: jnp.ndarray, threshold: float, kernel: int = 3,
    tile_h: int = 128, interpret: bool = False,
) -> jnp.ndarray:
    """Fused strict-local-max + threshold score map (Pallas).

    Equivalent to ``jnp.where((cms > nms_max_pool(cms, kernel)) &
    (cms > threshold), cms, -inf)`` with channel-last ``(B, H, W, C)`` input;
    the output feeds ``jax.lax.top_k`` exactly like the XLA path
    (ops/peaks.py:find_local_peaks_rough). One pass over HBM instead of
    XLA's k*k-1 materialized shifts.
    """
    b, h, w, c = cms.shape
    r = kernel // 2
    x = jnp.moveaxis(cms, -1, 1).reshape(b * c, h, w).astype(jnp.float32)
    tile_h = min(tile_h, h)
    n_tiles = pl.cdiv(h, tile_h)
    padded_h = n_tiles * tile_h
    # -inf padding: bottom rows (tile alignment) + the kxk halo. Padded
    # cells can never exceed a real neighbor, so they are inert.
    x = jnp.pad(
        x, ((0, 0), (r, padded_h - h + r), (r, r)),
        constant_values=-jnp.inf,
    )

    kern = functools.partial(
        _nms_scores_kernel, kernel=kernel, threshold=float(threshold),
        tile_h=tile_h, n_tiles=n_tiles,
    )
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b * c, padded_h, w), jnp.float32),
        grid=(b * c,),
        in_specs=[
            pl.BlockSpec((1, padded_h + 2 * r, w + 2 * r),
                         lambda bi: (bi, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, padded_h, w), lambda bi: (bi, 0, 0)),
        interpret=interpret,
    )(x)
    out = out[:, :h, :]
    return jnp.moveaxis(out.reshape(b, c, h, w), 1, -1)


# --------------------------------------------------------------------------- #
# Kernel target #2 (SURVEY §2.6): PAF line-integral sampling. The XLA path
# gathers (B, E, K, K, P) samples from the PAF maps with arbitrary-index
# gathers — the op TPUs execute worst. This kernel replaces the gather with
# two SEPARABLE ONE-HOT MATMULS per edge plane (an MXU-native formulation):
#
#   row[m, :]  = onehot(ys[m], Hp) @ plane          (M, Hp) @ (Hp, Wp)
#   sample[m]  = sum_w row[m, w] * onehot(xs[m], Wp)
#
# with the edge's two PAF channels resident in VMEM across all M = K*K*P
# samples (one HBM read of the plane per (batch, edge) instead of M random
# touches). Geometry (line points, unit vectors, penalty) stays in XLA —
# it is tiny elementwise work on (B, E, K, K) tensors.
# --------------------------------------------------------------------------- #


def _paf_sample_kernel(xs_ref, ys_ref, planes_ref, out_ref):
    """One (B*E,) program: sample both PAF channels at M line points.

    planes_ref: ``(1, 2, Hp, Wp)`` — this edge's x/y PAF channels.
    xs_ref / ys_ref: ``(1, 1, M)`` int32 subscripts (pre-clipped).
    out_ref: ``(1, 2, M)`` sampled values.
    """
    hp, wp = planes_ref.shape[2], planes_ref.shape[3]
    m = xs_ref.shape[2]
    # Chunk the sample axis to bound VMEM: the (chunk, Hp)/(chunk, Wp)
    # one-hot selectors and the (chunk, Wp) matmul result are the peak
    # live set (an unchunked M=4000 x 192 run out of scoped VMEM).
    if m <= 2048:
        chunk = m
    else:  # largest divisor of m that fits the VMEM budget
        chunk = max(d for d in range(1, 2049) if m % d == 0)
    for ch in range(2):
        plane = planes_ref[0, ch, :, :]
        for s0 in range(0, m, chunk):
            ys = ys_ref[0, 0, s0:s0 + chunk]
            xs = xs_ref[0, 0, s0:s0 + chunk]
            rows = jax.lax.broadcasted_iota(jnp.int32, (chunk, hp), 1)
            cols = jax.lax.broadcasted_iota(jnp.int32, (chunk, wp), 1)
            oh_y = (rows == ys[:, None]).astype(jnp.float32)
            oh_x = (cols == xs[:, None]).astype(jnp.float32)
            # (chunk, Hp) @ (Hp, Wp) -> (chunk, Wp) on the MXU, then a
            # masked row sum. HIGHEST precision: the one-hot matmul must
            # pass values through unmodified (default bf16 MXU rounding
            # costs ~4e-3 relative).
            picked_rows = jnp.dot(
                oh_y, plane,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            out_ref[0, ch, s0:s0 + chunk] = jnp.sum(picked_rows * oh_x, axis=1)


def paf_line_samples_pallas(
    pafs: jnp.ndarray,
    xs: jnp.ndarray,
    ys: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """Sample PAF x/y channels at per-edge line points (Pallas, MXU gather).

    Args:
        pafs: ``(B, Hp, Wp, 2*E)`` channel order [e0x, e0y, e1x, ...].
        xs / ys: ``(B, E, M)`` int32 subscripts, already clipped to bounds.

    Returns:
        ``(B, E, 2, M)`` float32: ``[..., 0, :]`` = x-channel samples,
        ``[..., 1, :]`` = y-channel samples. Matches
        ``pafs[b, ys, xs, 2e]`` / ``pafs[b, ys, xs, 2e+1]``.
    """
    b, hp, wp, c2 = pafs.shape
    e = c2 // 2
    m = xs.shape[2]
    # (B*E, 2, Hp, Wp): each program gets one edge's channel pair. The
    # flattened leading axis keeps every block dim equal to its array dim
    # (the Mosaic tiling rule for non-8/128-aligned shapes).
    planes = jnp.moveaxis(pafs, -1, 1).reshape(b * e, 2, hp, wp)
    out = pl.pallas_call(
        _paf_sample_kernel,
        out_shape=jax.ShapeDtypeStruct((b * e, 2, m), jnp.float32),
        grid=(b * e,),
        in_specs=[
            # (1, 1, M): every block dim equals its array dim (tiling rule).
            pl.BlockSpec((1, 1, m), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, m), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 2, hp, wp), lambda i: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 2, m), lambda i: (i, 0, 0)),
        interpret=interpret,
    )(
        xs.astype(jnp.int32).reshape(b * e, 1, m),
        ys.astype(jnp.int32).reshape(b * e, 1, m),
        planes.astype(jnp.float32),
    )
    return out.reshape(b, e, 2, m)


def use_pallas() -> bool:
    """Whether to route hot ops through Pallas (opt-in via
    ``SLEAP_NN_TPU_PALLAS=1``; XLA's fusion of the jnp versions measures
    equal-within-noise on v5e, so the default stays on the simpler path)."""
    env = os.environ.get("SLEAP_NN_TPU_PALLAS")
    if env is None:
        return False
    return env not in ("0", "false", "")


def use_pallas_paf() -> bool:
    """Whether to route PAF line sampling through the Pallas kernel.

    Unlike the elementwise kernels, this one wins decisively: the XLA
    arbitrary-index gather measures 5.6-6.7 ms at B=4, E=12, M=4000 on v5e
    while the one-hot MXU kernel does the same sampling in 2.1-2.9 ms
    (2.3-2.9x) across 96-256 px PAF grids — so it is ON BY DEFAULT on TPU.
    ``SLEAP_NN_TPU_PALLAS=0`` forces it off; ``=1`` forces it on (CPU tests
    then run the interpreter). Off-TPU the interpreter is slower than the
    gather, so the default there is off.
    """
    env = os.environ.get("SLEAP_NN_TPU_PALLAS")
    if env is not None:
        return env not in ("0", "false", "")
    return jax.devices()[0].platform == "tpu"
