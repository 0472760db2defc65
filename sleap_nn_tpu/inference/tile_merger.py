"""Tiled-inference blending: importance windows + accumulate/normalize merge.

Parity target: reference sleap_nn/inference/tile_merger.py:30-179. The
accumulate step is an XLA ``scatter-add`` over the per-frame canvas
(vs the reference's in-place torch adds).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def build_importance_window(
    tile_hw: Tuple[int, int],
    mode: str = "gaussian",
    sigma_scale: float = 0.125,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Separable per-axis taper window, peak 1.0 (reference: :30)."""
    th, tw = tile_hw
    if mode == "gaussian":
        sy, sx = sigma_scale * th, sigma_scale * tw
        y = np.arange(-(th - 1) / 2.0, (th - 1) / 2.0 + 1)
        x = np.arange(-(tw - 1) / 2.0, (tw - 1) / 2.0 + 1)
        gy = np.exp(y**2 / (-2 * sy**2))
        gx = np.exp(x**2 / (-2 * sx**2))
        w = gy[:, None] * gx[None, :]
    elif mode == "pyramid":
        iy = np.arange(1, th + 1, dtype=np.float32)
        ix = np.arange(1, tw + 1, dtype=np.float32)
        ry = np.minimum(iy, th + 1 - iy)
        rx = np.minimum(ix, tw + 1 - ix)
        w = (ry / ry.max())[:, None] * (rx / rx.max())[None, :]
    elif mode == "constant":
        w = np.ones((th, tw))
    else:
        raise ValueError(
            f"Unknown importance window mode: {mode!r}. "
            "Expected 'gaussian', 'pyramid', or 'constant'."
        )
    min_nz = max(float(w.min()), 1e-3)
    return jnp.asarray(np.clip(w, min_nz, None), dtype=dtype)


def merge_tiles(
    tiles: jnp.ndarray,
    origins: jnp.ndarray,
    canvas_hw: Tuple[int, int],
    window: jnp.ndarray,
) -> jnp.ndarray:
    """Blend per-tile maps back onto a canvas via weighted scatter-add.

    Args:
        tiles: ``(n_tiles, th, tw, C)`` per-tile model outputs (output-stride
            resolution).
        origins: ``(n_tiles, 2)`` int (y0, x0) origins at the same resolution.
        canvas_hw: canvas size at the same resolution.
        window: ``(th, tw)`` importance weights.

    Returns:
        ``(H, W, C)`` normalized merged map (ACC / CNT).
    """
    n, th, tw, c = tiles.shape
    h, w = canvas_hw
    acc = jnp.zeros((h, w, c), tiles.dtype)
    cnt = jnp.zeros((h, w, 1), tiles.dtype)

    yy = jnp.arange(th)[None, :, None]
    xx = jnp.arange(tw)[None, None, :]
    abs_y = jnp.clip(origins[:, 0][:, None, None] + yy, 0, h - 1)
    abs_x = jnp.clip(origins[:, 1][:, None, None] + xx, 0, w - 1)

    weighted = tiles * window[None, :, :, None]
    acc = acc.at[abs_y, abs_x, :].add(weighted)
    cnt = cnt.at[abs_y, abs_x, :].add(jnp.broadcast_to(window[None, :, :, None], (n, th, tw, 1)))
    return acc / jnp.maximum(cnt, 1e-8)
