"""Fused double 3x3 conv block as a Pallas TPU kernel.

Why: the UNet families here (reference `sleap_nn/architectures/unet.py`,
`encoder_decoder.py:240-320`) are narrow-channel (24-182 ch) at large
spatial sizes — XLA's conv lowering achieves only ~0.2 MFU on a v5e at
these shapes AND spills the inter-conv activation to HBM between the two
convs of every `SimpleConvBlock`. This kernel evaluates

    y = act(conv3x3(act(conv3x3(x) + b1)) + b2)

strip-by-strip with the intermediate held in VMEM: per spatial strip it
DMAs a (TH+4) row slab of the pre-padded input, runs both convolutions as
9 shifted ``dot_general`` contractions each (VALID windows over the
padded slab, so no masking anywhere), and writes only the final output —
the mid tensor never touches HBM, and the MXU sees large (rows x C)
matmuls instead of XLA's padded conv tiling.

Numerics: bf16 inputs/weights with f32 accumulation (preferred_element_type),
bias + activation applied in f32 — matches the plain flax path to bf16
rounding.

Falls back to plain ``lax.conv_general_dilated`` off-TPU or for shapes the
kernel does not support (see `_supported`).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

_ACTS = {
    "relu": lambda v: jnp.maximum(v, 0.0),
    "identity": lambda v: v,
}


def _plain_double_conv(x, w1, b1, w2, b2, activation):
    """Reference XLA path (also the off-TPU fallback)."""
    act = _ACTS.get(activation)
    if act is None:
        from sleap_nn_tpu.models.encoder_decoder import get_act_fn

        act = get_act_fn(activation)
    dn = lax.conv_dimension_numbers(x.shape, w1.shape, ("NHWC", "HWIO", "NHWC"))
    y = lax.conv_general_dilated(x, w1.astype(x.dtype), (1, 1), "SAME",
                                 dimension_numbers=dn)
    if b1 is not None:
        y = y + b1.astype(y.dtype)
    y = act(y).astype(x.dtype)
    dn = lax.conv_dimension_numbers(y.shape, w2.shape, ("NHWC", "HWIO", "NHWC"))
    z = lax.conv_general_dilated(y, w2.astype(y.dtype), (1, 1), "SAME",
                                 dimension_numbers=dn)
    if b2 is not None:
        z = z + b2.astype(z.dtype)
    return act(z).astype(x.dtype)


def _ceil_to(v: int, m: int) -> int:
    return -(-v // m) * m


def _vmem_bytes(th: int, w: int, c_in: int, c_mid: int, c_out: int) -> int:
    """Padded VMEM estimate for one grid step.

    Mosaic tiles the last two dims of every buffer to (sublane, lane) =
    (8, 128): a 24-channel f32 accumulator really occupies 128 lanes. The
    kernel's shifted-window slices additionally hold transient copies —
    measured on a v5e, actual scoped-vmem peak is ~2.9x this padded sum
    (50.47 MB observed vs 17.7 MB estimated at th=32, w=256, 1->24->24),
    which the caller folds in via ``_VMEM_BUDGET``.
    """
    wp = _ceil_to(w + 4, 8)
    return (
        (th + 4) * _ceil_to(wp, 8) * _ceil_to(c_in, 128) * 2
        + (th + 2) * _ceil_to(w + 2, 8) * _ceil_to(c_mid, 128) * (4 + 2)
        + th * _ceil_to(w, 8) * _ceil_to(c_out, 128) * (4 + 2 * 2)
    )


# Scoped-vmem limit is 16 MB; keep the padded estimate under 16/3 MB so
# the ~2.9x transient multiplier observed on hardware still fits.
_VMEM_BUDGET = 5 * 1024 * 1024


def _pick_th(h: int, w: int = 0, c_in: int = 0, c_mid: int = 0,
             c_out: int = 0) -> int:
    for th in (32, 16, 8, 4):
        if h % th != 0:
            continue
        if w and _vmem_bytes(th, w, c_in, c_mid, c_out) > _VMEM_BUDGET:
            continue
        return th
    return 0


def _supported(x, w1, w2) -> bool:
    if jax.default_backend() != "tpu":
        return False
    if w1.shape[0] != 3 or w1.shape[1] != 3 or w2.shape[0] != 3 or w2.shape[1] != 3:
        return False
    b, h, w, c_in = x.shape
    c_mid, c_out = w1.shape[3], w2.shape[3]
    if w % 8 != 0:
        return False
    return _pick_th(h, w, c_in, c_mid, c_out) != 0


def _kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, y_ref,
            *, th, w, h, c_mid, c_out, activation):
    import jax.experimental.pallas as pl

    act = _ACTS[activation]
    i = pl.program_id(1)
    x = x_ref[0]  # (TH+4, Wp, C_in) window (Element-indexed rows)

    # conv1: VALID over the slab -> (TH+2, W+2, C_mid), f32 accumulation.
    mid = jnp.zeros((th + 2, w + 2, c_mid), jnp.float32)
    for dj in range(3):
        xs = x[:, dj:dj + w + 2, :]
        for di in range(3):
            mid += lax.dot_general(
                xs[di:di + th + 2], w1_ref[di, dj],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    mid = act(mid + b1_ref[0, 0])
    # SAME-padding parity with the plain path: conv2 must see ZEROS for
    # mid positions outside the image (the plain path zero-pads the
    # intermediate activation), not act(conv1(padded x)) halo values.
    # mid row m / col c map to original row i*th-1+m / col c-1.
    col_id = lax.broadcasted_iota(jnp.int32, (th + 2, w + 2, 1), 1)
    row_id = lax.broadcasted_iota(jnp.int32, (th + 2, w + 2, 1), 0)
    orig_row = row_id + i * th - 1
    inside = (
        (col_id > 0) & (col_id < w + 1) & (orig_row >= 0) & (orig_row < h)
    )
    mid = jnp.where(inside, mid, 0.0).astype(x.dtype)

    # conv2: VALID over mid -> (TH, W, C_out).
    out = jnp.zeros((th, w, c_out), jnp.float32)
    for dj in range(3):
        ms = mid[:, dj:dj + w, :]
        for di in range(3):
            out += lax.dot_general(
                ms[di:di + th], w2_ref[di, dj],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    out = act(out + b2_ref[0, 0])
    y_ref[0] = out.astype(y_ref.dtype)


@functools.partial(jax.jit, static_argnames=("activation", "interpret"))
def _fused_tpu(x, w1, b1, w2, b2, activation, interpret=False):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bsz, h, w, c_in = x.shape
    c_mid, c_out = w1.shape[3], w2.shape[3]
    th = _pick_th(h, w, c_in, c_mid, c_out) or _pick_th(h)
    # Mosaic: DMA slice shapes must align the sublane (W) dim to 8 —
    # pad the input's W to the next multiple of 8 past w+4 (the extra
    # right-edge columns are never read by the valid-window slices).
    wp = -(-(w + 4) // 8) * 8
    xp = jnp.pad(x, ((0, 0), (2, 2), (2, wp - w - 2), (0, 0)))

    kern = functools.partial(
        _kernel, th=th, w=w, h=h, c_mid=c_mid, c_out=c_out,
        activation=activation)
    flops = 2 * bsz * h * w * 9 * (c_in * c_mid + c_mid * c_out)
    y = pl.pallas_call(
        kern,
        grid=(bsz, h // th),
        in_specs=[
            # Overlapping (TH+4)-row windows via Element indexing: window i
            # starts at element row i*th of the pre-padded input.
            pl.BlockSpec(
                (pl.Element(1), pl.Element(th + 4), pl.Element(wp),
                 pl.Element(c_in)),
                lambda b, i: (b, i * th, 0, 0),
                memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),      # w1 (3,3,C_in,C_mid)
            pl.BlockSpec(memory_space=pltpu.VMEM),      # b1 (1,1,C_mid)
            pl.BlockSpec(memory_space=pltpu.VMEM),      # w2
            pl.BlockSpec(memory_space=pltpu.VMEM),      # b2
        ],
        out_specs=pl.BlockSpec(
            (1, th, w, c_out), lambda b, i: (b, i, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, h, w, c_out), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=x.size * x.dtype.itemsize
            + bsz * h * w * c_out * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, w1.astype(x.dtype), b1.reshape(1, 1, -1).astype(jnp.float32),
      w2.astype(x.dtype), b2.reshape(1, 1, -1).astype(jnp.float32))
    return y


def fused_double_conv3x3(
    x: jnp.ndarray,
    w1: jnp.ndarray,
    b1: Optional[jnp.ndarray],
    w2: jnp.ndarray,
    b2: Optional[jnp.ndarray],
    activation: str = "relu",
    interpret: bool = False,
) -> jnp.ndarray:
    """act(conv3x3(act(conv3x3(x)+b1))+b2), SAME padding, NHWC/HWIO.

    Pallas TPU kernel with the inter-conv activation VMEM-resident;
    XLA fallback elsewhere.
    """
    if b1 is None:
        b1 = jnp.zeros((w1.shape[3],), jnp.float32)
    if b2 is None:
        b2 = jnp.zeros((w2.shape[3],), jnp.float32)
    if activation not in _ACTS or not (
        _supported(x, w1, w2) or interpret
    ):
        return _plain_double_conv(x, w1, b1, w2, b2, activation)
    return _fused_tpu(x, w1, b1, w2, b2, activation, interpret)
