"""Space-to-depth "packed" execution for narrow-channel stride-1 convs.

Why this exists (TPU-specific): the VPU/MXU lane width is 128 and XLA pads
a convolution's feature dimension up to the tile width. A stride-1 3x3 conv
at 1024x1024 with 24 channels (UNet ``medium_rf`` level 0; reference
config/model_config.py:77 preset) therefore moves ~5x more HBM bytes than
the tensor's logical size — and megapixel narrow UNets are HBM-bound, so
that padding waste is the throughput limit.

The fix is a mathematically EXACT layout transform: work on the
space-to-depth packing of the image, ``(B, H, W, C) -> (B, H/2, W/2, 4C)``,
where the four 2x2 spatial phases become channel blocks. A stride-1 KxK
conv in pixel space equals a stride-1 (K//2+1+K//2... see below) conv in
packed space with a sparse "packed kernel" built from the original weights:

    y[2i+di, 2j+dj, c] = sum_{u,v,e} W[u,v,e,c] * x[2i+di+u-r, 2j+dj+v-r, e]

with r = K//2.  Writing x in packed cells ``X[i', j', (p,q,e)]`` with
phases p,q in {0,1}, the tap (u, di, p) contributes iff
``2*Di + p == di + (u - r)`` for a cell offset Di, i.e. each original tap
lands on exactly one packed tap.  Cell offsets span ``|2Di + p - di| <= r``
so the packed kernel is Kp x Kp with ``Kp = 2*ceil((r+1)/2) + 1`` (= 3 for
K in {3,5}); roughly half its taps are structural zeros.  FLOPs grow 4x
(16x channels, 1/4 the pixels, same kernel size-ish) but the op is
memory-bound with MFU ~0.14, so trading dead bandwidth for live MXU cycles
is the right direction on this hardware.

``max_pool_same(x, 2)`` on the unpacked output is exactly a max over the
four phase blocks of the packed output (`packed_phase_max_pool`), so a
[conv, conv, pool] level-0 block never needs to leave packed space — and
when the UNet's decoder does not consume the stride-1 skip (output_stride
>= 2, the production presets), depth-to-space is never materialized at all.

No reference counterpart: the reference's CUDA convs don't pay lane
padding (reference architectures/encoder_decoder.py:38 runs plain torch
Conv2d); this module is pure TPU-native optimization.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/2, W/2, 4C); phase (p, q) at block p*2+q.

    H and W must be even (pad first with `pad_to_even` otherwise).
    """
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # (B, H/2, W/2, p, q, C)
    return x.reshape(b, h // 2, w // 2, 4 * c)


def depth_to_space(y: jnp.ndarray) -> jnp.ndarray:
    """Inverse of `space_to_depth`."""
    b, h2, w2, c4 = y.shape
    c = c4 // 4
    y = y.reshape(b, h2, w2, 2, 2, c)
    y = y.transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(b, h2 * 2, w2 * 2, c)


def pad_to_even(x: jnp.ndarray) -> Tuple[jnp.ndarray, Tuple[int, int]]:
    """Zero-pad H/W on the bottom/right to even sizes (SAME-conv compatible
    only when the caller crops the result back; production shapes are
    already stride-aligned so this is a safety net, not a hot path)."""
    b, h, w, c = x.shape
    ph, pw = h % 2, w % 2
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    return x, (ph, pw)


def pack_conv_kernel(kernel: jnp.ndarray) -> jnp.ndarray:
    """Build the packed-space kernel for a stride-1 SAME KxK conv.

    Args:
        kernel: (K, K, Cin, Cout) HWIO weights, K odd.

    Returns:
        (Kp, Kp, 4*Cin, 4*Cout) packed HWIO weights with structural zeros,
        where input block (p, q) holds phase (p, q) and output block
        (di, dj) holds phase (di, dj) — matching `space_to_depth` layout.
    """
    k = int(kernel.shape[0])
    assert kernel.shape[1] == k and k % 2 == 1, "square odd kernels only"
    r = k // 2
    # Cell offsets needed: |2*Di + p - di| <= r with p, di in {0,1} gives
    # Di in [-(r+1)//2, (r+1)//2]; symmetric window of size 2*((r+1)//2)+1.
    half = (r + 1) // 2
    kp = 2 * half + 1
    cin, cout = int(kernel.shape[2]), int(kernel.shape[3])
    # Pure-jnp assembly (static index plan, traced values) so the transform
    # works on tracers — i.e. inside jit and under grad, where it is a
    # linear map and gradients flow back to the original weights.
    out = jnp.zeros((kp, kp, 4 * cin, 4 * cout), dtype=kernel.dtype)
    for di in (0, 1):
        for dj in (0, 1):
            for p in (0, 1):
                for q in (0, 1):
                    for Di in range(-half, half + 1):
                        u = 2 * Di + p - di  # original row tap offset
                        if abs(u) > r:
                            continue
                        for Dj in range(-half, half + 1):
                            v = 2 * Dj + q - dj
                            if abs(v) > r:
                                continue
                            out = out.at[
                                Di + half,
                                Dj + half,
                                (p * 2 + q) * cin : (p * 2 + q + 1) * cin,
                                (di * 2 + dj) * cout : (di * 2 + dj + 1) * cout,
                            ].set(kernel[u + r, v + r])
    return out


def pack_conv_bias(bias: jnp.ndarray) -> jnp.ndarray:
    """Bias for the packed conv: the per-channel bias tiled over phases."""
    return jnp.tile(bias, 4)


def packed_conv(
    x_packed: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    *,
    prepacked: bool = False,
) -> jnp.ndarray:
    """Stride-1 SAME conv evaluated in packed space.

    Args:
        x_packed: (B, H/2, W/2, 4*Cin) space-to-depth input.
        kernel: original (K, K, Cin, Cout) weights (packed on the fly —
            a constant-foldable transform under jit) or, with
            ``prepacked=True``, an already-packed kernel.
        bias: original (Cout,) bias or None.

    Returns:
        (B, H/2, W/2, 4*Cout) packed output; `depth_to_space` of it equals
        the pixel-space SAME conv exactly.
    """
    kp = kernel if prepacked else pack_conv_kernel(kernel)
    y = jax.lax.conv_general_dilated(
        x_packed,
        kp.astype(x_packed.dtype),
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if bias is not None:
        y = y + pack_conv_bias(bias).astype(y.dtype)
    return y


def packed_pool_s2d(y_packed: jnp.ndarray) -> jnp.ndarray:
    """Fused ``space_to_depth(max_pool_same(depth_to_space(y), 2))``.

    Takes the packed stride-s level output and produces the PACKED input of
    the next (stride 2s) level without ever materializing the pixel-space
    pooled map — the whole chain is reshapes + one max reduce, which XLA
    fuses into a single kernel writing only the final packed tensor.
    """
    pooled = packed_phase_max_pool(y_packed)  # (B, Hc, Wc, C) pixel space
    return space_to_depth(pooled)


def _axis_upsample_coeffs(k: int) -> np.ndarray:
    """Per-axis composition of bilinear-2x upsample with a length-k conv.

    Returns ``M[d, delta, n]``: the coefficient of input ``x[i + delta]``
    in output ``z[2i + d]`` contributed through conv tap ``n`` (0..k-1),
    where ``z = conv_k(up2x(x))`` with half-pixel-centered bilinear
    upsampling (``u[2a] = 0.25 x[a-1] + 0.75 x[a]``,
    ``u[2a+1] = 0.75 x[a] + 0.25 x[a+1]`` — the jax.image.resize /
    torch align_corners=False interior formula).

    ``delta`` is indexed 0..kp-1 for offsets ``-(kp//2) .. kp//2`` with
    ``kp = 2*((k//2 + 1)//2) + 1`` (kp=3 for k=3).
    """
    r = k // 2
    half = (r + 1) // 2
    kp = 2 * half + 1
    M = np.zeros((2, kp, k), dtype=np.float64)
    for d in (0, 1):
        for n in range(k):
            j = d + (n - r)  # u-index relative to 2i
            a, p = j // 2, j % 2  # u[2i + j] = u[2(i+a) + p]
            if p == 0:
                taps = ((a - 1, 0.25), (a, 0.75))
            else:
                taps = ((a, 0.75), (a + 1, 0.25))
            for delta, w in taps:
                assert -half <= delta <= half, (k, d, n, delta)
                M[d, delta + half, n] += w
    return M


def compose_upsample_conv_kernel(kernel: jnp.ndarray) -> jnp.ndarray:
    """Kernel of ``conv_k(bilinear_up2x(x))`` expressed as ONE conv on x.

    Args:
        kernel: (k, k, Cin, Cout) HWIO weights of the post-upsample conv.

    Returns:
        (kp, kp, Cin, 4*Cout) HWIO weights: a stride-1 SAME conv of x with
        this kernel yields the PACKED (phase-blocked, `space_to_depth`
        layout) output of upsample-then-conv — exact in the interior;
        borders need `upsample_conv_border_fix` (the composed conv
        zero-pads x cells while the true op edge-clamps the upsample and
        zero-pads single pixels).
    """
    k = int(kernel.shape[0])
    assert kernel.shape[1] == k and k % 2 == 1, "square odd kernels only"
    M = jnp.asarray(_axis_upsample_coeffs(k), dtype=kernel.dtype)
    # Keff[d1, d2, du, dv, i, o] = sum_{nu, nv} K[nu, nv, i, o]
    #                              * M[d1, du, nu] * M[d2, dv, nv]
    keff = jnp.einsum("uvio,pau,qbv->pqabio", kernel, M, M)
    kp = keff.shape[2]
    cin, cout = int(kernel.shape[2]), int(kernel.shape[3])
    # phase blocks along Cout in space_to_depth order (p*2+q)
    keff = keff.transpose(2, 3, 4, 0, 1, 5)  # (kp, kp, cin, d1, d2, cout)
    return keff.reshape(kp, kp, cin, 4 * cout)


def packed_upsample_conv(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    *,
    exact_borders: bool = True,
) -> jnp.ndarray:
    """``conv_k(bilinear_up2x(x))`` evaluated straight into packed layout.

    Args:
        x: (B, Hc, Wc, Cin) pre-upsample feature (cell space == its own
            pixel space).
        kernel: (k, k, Cin, Cout) weights of the pixel-space conv (k=3
            supported with exact borders).

    Returns:
        (B, Hc, Wc, 4*Cout) — the packed (space_to_depth) form of the
        (B, 2Hc, 2Wc, Cout) pixel-space result. No bias/activation: the
        caller adds those after summing the skip contribution.
    """
    keff = compose_upsample_conv_kernel(kernel)
    y = jax.lax.conv_general_dilated(
        x,
        keff.astype(x.dtype),
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if exact_borders:
        y = upsample_conv_border_fix(y, x, kernel)
    return y


def _upsample2x(x: jnp.ndarray) -> jnp.ndarray:
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, h * 2, w * 2, c), method="bilinear")


def _conv_same(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def upsample_conv_border_fix(
    y_packed: jnp.ndarray, x: jnp.ndarray, kernel: jnp.ndarray
) -> jnp.ndarray:
    """Overwrite the border cells of `packed_upsample_conv` with exact values.

    The composed conv differs from true upsample-then-conv only in the
    outermost output cell ring (the upsample edge-clamps while the cell
    conv zero-pads). Recompute that ring exactly with the plain ops on
    3-cell-wide slabs (negligible cost) and patch it in. k=3 only.
    """
    assert int(kernel.shape[0]) == 3, "border fix implemented for k=3"
    hc, wc = x.shape[1], x.shape[2]
    if hc < 3 or wc < 3:
        # tiny maps: just compute the whole thing exactly
        full = _conv_same(_upsample2x(x), kernel)
        return space_to_depth(full)

    # top / bottom bands: 3 input rows -> exact output pixel rows 0..1 /
    # last 2 (the slab sees the same clamps and zero pads as the full map)
    top = space_to_depth(_conv_same(_upsample2x(x[:, :3]), kernel)[:, :2])
    bot = space_to_depth(_conv_same(_upsample2x(x[:, -3:]), kernel)[:, -2:])
    left = space_to_depth(
        _conv_same(_upsample2x(x[:, :, :3]), kernel)[:, :, :2]
    )
    right = space_to_depth(
        _conv_same(_upsample2x(x[:, :, -3:]), kernel)[:, :, -2:]
    )

    # Patch the ring with broadcasted selects, NOT dynamic_update_slice:
    # each DUS rewrites the whole tensor in HBM (4x 33 MB/frame on the
    # production UNet), while elementwise selects fuse into the consumer's
    # add+relu chain for free. Column selects run last so corner cells get
    # the (identical) exact column values regardless of order.
    rows = jax.lax.broadcasted_iota(jnp.int32, (hc, 1, 1), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, wc, 1), 1)
    y = y_packed
    y = jnp.where(rows == 0, top, y)
    y = jnp.where(rows == hc - 1, bot, y)
    y = jnp.where(cols == 0, left, y)
    y = jnp.where(cols == wc - 1, right, y)
    return y


def packed_phase_max_pool(y_packed: jnp.ndarray) -> jnp.ndarray:
    """`max_pool_same(x, 2)` of the unpacked tensor, computed in packed space.

    A 2x2/stride-2 SAME max pool's output pixel (i, j) is the max over the
    four phases of packed cell (i, j) — no spatial window crosses cells.
    """
    b, h2, w2, c4 = y_packed.shape
    c = c4 // 4
    return jnp.max(y_packed.reshape(b, h2, w2, 4, c), axis=3)
