"""Peak finding on confidence maps (NMS + integral sub-pixel refinement).

Behavioral parity targets: reference sleap_nn/inference/ops/peaks.py:26-259.
TPU-first redesign decisions:

- channel-last ``(B, H, W, C)`` confmaps;
- :func:`find_local_peaks` returns **fixed-size** per-sample top-K arrays
  plus a validity mask instead of the reference's ragged
  ``(n_peaks,)`` tensors — the static-shape recipe the reference itself
  adopts in its ONNX export wrappers (reference:
  sleap_nn/export/wrappers/base.py:71-123);
- all branches are jit-safe (no data-dependent control flow): invalid
  peaks flow through refinement as NaN and are masked, not dropped.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from sleap_nn_tpu.ops.crops import crop_bboxes, make_centered_bboxes


def nms_max_pool(cms: jnp.ndarray, kernel: int = 3) -> jnp.ndarray:
    """Max over the ``kernel x kernel`` neighborhood (center excluded).

    ``kernel`` must be odd; 3 is the reference's 8-neighbor dilation NMS,
    larger values merge nearby duplicate maxima (the ``center_nms_kernel``
    inference knob for bottom-up segmentation center peaks).

    Args:
        cms: ``(..., H, W, C)``.

    Returns:
        Same shape; ``cms > nms_max_pool(cms)`` marks strict local maxima.
    """
    if kernel % 2 != 1 or kernel < 3:
        raise ValueError(f"NMS kernel must be an odd int >= 3, got {kernel}")
    r = kernel // 2
    neg_inf = jnp.array(-jnp.inf, dtype=cms.dtype)
    pad = [(0, 0)] * (cms.ndim - 3) + [(r, r), (r, r), (0, 0)]
    p = jnp.pad(cms, pad, constant_values=neg_inf)
    h, w = cms.shape[-3], cms.shape[-2]

    def shift(dy, dx):
        return p[..., r + dy : r + dy + h, r + dx : r + dx + w, :]

    out = None
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            if dy == 0 and dx == 0:
                continue  # strict maxima: exclude the center itself
            s = shift(dy, dx)
            out = s if out is None else jnp.maximum(out, s)
    return out


def integral_regression(
    crops: jnp.ndarray, xv: jnp.ndarray, yv: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Expected (x, y) under the crop's mass (reference: ops/peaks.py:66).

    Args:
        crops: ``(n, h, w)`` or ``(n, h, w, 1)`` patches.
        xv / yv: coordinate vectors of length w / h.

    Returns:
        ``(x_hat, y_hat)`` each ``(n,)``. All-zero crops give 0 offsets
        (safe divide) instead of NaN.
    """
    if crops.ndim == 4:
        crops = crops[..., 0]
    z = jnp.sum(crops, axis=(1, 2))
    safe_z = jnp.where(z == 0, 1.0, z)
    x_hat = jnp.sum(xv[None, None, :] * crops, axis=(1, 2)) / safe_z
    y_hat = jnp.sum(yv[None, :, None] * crops, axis=(1, 2)) / safe_z
    x_hat = jnp.where(z == 0, 0.0, x_hat)
    y_hat = jnp.where(z == 0, 0.0, y_hat)
    return x_hat, y_hat


def find_global_peaks_rough(
    cms: jnp.ndarray, threshold: float = 0.1
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Global max per (sample, channel).

    Args:
        cms: ``(B, H, W, C)``.

    Returns:
        ``(points, vals)``: points ``(B, C, 2)`` (x, y), NaN below
        threshold; vals ``(B, C)``, 0 below threshold.
    """
    b, h, w, c = cms.shape
    flat = cms.reshape(b, h * w, c)
    idx = jnp.argmax(flat, axis=1)  # (B, C)
    vals = jnp.max(flat, axis=1)
    yy = (idx // w).astype(jnp.float32)
    xx = (idx % w).astype(jnp.float32)
    points = jnp.stack([xx, yy], axis=-1)
    below = vals < threshold
    points = jnp.where(below[..., None], jnp.nan, points)
    vals = jnp.where(below, 0.0, vals)
    return points, vals


def refine_peaks_integral(
    cms: jnp.ndarray,
    rough_peaks: jnp.ndarray,
    sample_inds: jnp.ndarray,
    channel_inds: jnp.ndarray,
    integral_patch_size: int = 5,
) -> jnp.ndarray:
    """Integral sub-pixel refinement of rough peaks.

    Args:
        cms: ``(B, H, W, C)``.
        rough_peaks: ``(n, 2)`` (x, y); NaN rows pass through unchanged.
        sample_inds / channel_inds: ``(n,)`` source map per peak.

    Returns:
        ``(n, 2)`` refined peaks.
    """
    b, h, w, c = cms.shape
    patch = integral_patch_size
    maps = jnp.moveaxis(cms, -1, 1).reshape(b * c, h, w, 1)  # (B*C, H, W, 1)
    flat_inds = sample_inds.astype(jnp.int32) * c + channel_inds.astype(jnp.int32)
    bboxes = make_centered_bboxes(rough_peaks, patch, patch)
    crops = crop_bboxes(maps, bboxes, flat_inds, patch, patch)
    gv = jnp.arange(patch, dtype=jnp.float32) - (patch - 1) / 2.0
    dx, dy = integral_regression(crops, gv, gv)
    return rough_peaks + jnp.stack([dx, dy], axis=-1)


def refine_global_peaks_windowed(
    cms: jnp.ndarray, rough: jnp.ndarray, integral_patch_size: int = 5
) -> jnp.ndarray:
    """Integral refinement of one-peak-per-channel rough peaks, gather-free.

    Mathematically identical to :func:`refine_peaks_integral` for INTEGER
    rough peaks (global argmax locations): the patch sum
    ``sum_{|d|<=r} w(d) * cms[y0+dy, x0+dx]`` is computed as one fused
    elementwise pass over the maps — a distance window against the rough
    peak instead of a patch gather. On TPU this avoids the channel-major
    transpose + per-peak patch gather entirely (one map re-read, three
    reductions); out-of-image window cells contribute zero exactly like
    the old zero-padded crop.

    Non-integer rough peaks are snapped to the nearest pixel first (the
    window must be integer-centered for the patch-sum equivalence to hold),
    and the refinement offset is applied to the snapped location.

    Args:
        cms: ``(B, H, W, C)``.
        rough: ``(B, C, 2)`` (x, y); rounded to the pixel grid internally;
            NaN rows pass through.

    Returns:
        ``(B, C, 2)`` refined peaks.
    """
    b, h, w, c = cms.shape
    rough = jnp.round(rough)  # NaN passes through round unchanged
    r = (integral_patch_size - 1) / 2.0
    f = cms.astype(jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :, None]
    ys = jnp.arange(h, dtype=jnp.float32)[None, :, None, None]
    x0 = rough[..., 0][:, None, None, :]  # (B, 1, 1, C)
    y0 = rough[..., 1][:, None, None, :]
    dist_x = xs - x0
    dist_y = ys - y0
    win = (jnp.abs(dist_x) <= r) & (jnp.abs(dist_y) <= r)  # False for NaN x0
    v = jnp.where(win, f, 0.0)
    z = jnp.sum(v, axis=(1, 2))  # (B, C)
    safe_z = jnp.where(z == 0, 1.0, z)
    dx = jnp.sum(v * dist_x, axis=(1, 2)) / safe_z
    dy = jnp.sum(v * dist_y, axis=(1, 2)) / safe_z
    dx = jnp.where(z == 0, 0.0, dx)
    dy = jnp.where(z == 0, 0.0, dy)
    return rough + jnp.stack([dx, dy], axis=-1)


def find_global_peaks(
    cms: jnp.ndarray,
    threshold: float = 0.2,
    refinement: Optional[str] = None,
    integral_patch_size: int = 5,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Global peaks with optional integral refinement.

    Returns ``(points (B, C, 2), vals (B, C))`` — NaN points below threshold.
    """
    points, vals = find_global_peaks_rough(cms, threshold=threshold)
    if refinement != "integral":
        return points, vals
    return refine_global_peaks_windowed(cms, points, integral_patch_size), vals


def find_local_peaks_rough(
    cms: jnp.ndarray, threshold: float = 0.2, max_peaks: int = 100,
    nms_kernel: int = 3,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Local-maximum peaks, fixed-size top-K per sample.

    A pixel is a peak when it strictly exceeds its 8-neighborhood max and
    the threshold (reference semantics, ops/peaks.py:184), but the output
    is the static-shape contract: per-sample top-``max_peaks`` by value.

    Args:
        cms: ``(B, H, W, C)``.

    Returns:
        ``(points, vals, channel_inds, valid)``:
        points ``(B, K, 2)`` (x, y) float32, NaN on invalid slots;
        vals ``(B, K)`` (0 on invalid); channel_inds ``(B, K)`` int32
        (-1 invalid); valid ``(B, K)`` bool. Sorted by value descending.
    """
    b, h, w, c = cms.shape
    from sleap_nn_tpu.ops.pallas_kernels import nms_scores_pallas, use_pallas

    if use_pallas():
        # Pallas kernel target #1: single-pass fused NMS + threshold
        # (interpreter mode off-TPU so CPU tests exercise the same path).
        on_tpu = jax.devices()[0].platform == "tpu"
        scores = nms_scores_pallas(
            cms, threshold, kernel=nms_kernel, interpret=not on_tpu
        ).reshape(b, h * w * c)
    else:
        is_peak = (cms > nms_max_pool(cms, kernel=nms_kernel)) & (cms > threshold)
        neg = jnp.float32(-jnp.inf)
        scores = jnp.where(is_peak, cms, neg).reshape(b, h * w * c)
    k = min(max_peaks, h * w * c)
    top_vals, top_idx = jax.lax.top_k(scores, k)
    valid = jnp.isfinite(top_vals)
    yy = top_idx // (w * c)
    rem = top_idx % (w * c)
    xx = rem // c
    cc = rem % c
    points = jnp.stack([xx, yy], axis=-1).astype(jnp.float32)
    points = jnp.where(valid[..., None], points, jnp.nan)
    vals = jnp.where(valid, top_vals, 0.0)
    channel_inds = jnp.where(valid, cc, -1).astype(jnp.int32)
    if k < max_peaks:
        padn = max_peaks - k
        points = jnp.pad(points, ((0, 0), (0, padn), (0, 0)), constant_values=jnp.nan)
        vals = jnp.pad(vals, ((0, 0), (0, padn)))
        channel_inds = jnp.pad(channel_inds, ((0, 0), (0, padn)), constant_values=-1)
        valid = jnp.pad(valid, ((0, 0), (0, padn)))
    return points, vals, channel_inds, valid


def find_local_peaks(
    cms: jnp.ndarray,
    threshold: float = 0.2,
    refinement: Optional[str] = None,
    integral_patch_size: int = 5,
    max_peaks: int = 100,
    return_rough: bool = False,
    nms_kernel: int = 3,
) -> Tuple[jnp.ndarray, ...]:
    """Local peaks with optional integral refinement (fixed-size contract).

    Same returns as :func:`find_local_peaks_rough`; with
    ``return_rough=True`` a fifth array holds the unrefined integer peak
    positions (used by identity grouping to reproduce the reference's
    scan-order tie-breaking, reference: ops/identity.py:41).
    """
    points, vals, channel_inds, valid = find_local_peaks_rough(
        cms, threshold=threshold, max_peaks=max_peaks, nms_kernel=nms_kernel
    )
    rough = points
    if refinement == "integral":
        b, k = points.shape[:2]
        flat_pts = points.reshape(b * k, 2)
        sample_inds = jnp.repeat(jnp.arange(b), k)
        flat_ch = jnp.maximum(channel_inds.reshape(b * k), 0)
        refined = refine_peaks_integral(
            cms, flat_pts, sample_inds, flat_ch, integral_patch_size
        ).reshape(b, k, 2)
        points = jnp.where(valid[..., None], refined, jnp.nan)
    if return_rough:
        return points, vals, channel_inds, valid, rough
    return points, vals, channel_inds, valid
