"""Model backends for inference.

Parity target: reference sleap_nn/inference/layers/backends/* (`ModelBackend`
protocol with torch/ONNX/TRT implementations). On TPU the backend is a
jitted flax ``apply`` closure; ``use_bf16`` runs the forward in bfloat16
(the TPU analog of the reference's fp16 autocast, torch_backend.py:218).
"""

from __future__ import annotations

import time
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp


def choose_packed_levels(backbone) -> int:
    """Encoder levels ALLOWED to run space-to-depth packed.

    Level 0 packs while its channel count leaves most of the 128-lane
    tile padded (C <= 48 keeps the packed 4C <= 192). Depth beyond level
    0 pays ONLY when the deepest packed level's skip feeds the decoder's
    FINEST up-block — that engages the packed upsampling block + packed
    head and removes the full-resolution concat layout copies. Packing a
    level whose skip the decoder never consumes packed is a measured
    LOSS (r5 DCE-proof A/Bs, medium_rf topdown @1024px B=32 on a v5e:
    os2 depth 1/2/3 = 209.1/217.4/215.9 f/s — depth 2 engages; os4
    depth 1/2/3 = 336.8/305.3/320.4 — depth 2 never engages and depth
    3's level-2 channels, 54 -> 216 packed, overshoot the lane tile).

    The finest decoder level consumes the skip of encoder level
    log2(output_stride), so engagement needs depth log2(os)+1; only
    os <= 2 keeps that within the channel cap.

    This is an upper bound: the Encoder additionally gates on the input
    resolution at trace time (`Encoder.pack_min_res`, default 1024 px) —
    packing only wins at megapixel scale, XLA's native narrow-conv
    handling wins below it. The effective depth for a given input is
    `effective_packed_levels`.
    """
    def level_c(b: int) -> int:
        return int(backbone.filters * (backbone.filters_rate ** b))

    if backbone.down_blocks < 2 or level_c(0) > 48:
        return 0
    n = 1
    try:
        os_ = int(backbone.output_stride)
    except Exception:
        os_ = 1
    engage_depth = max(1, os_.bit_length())  # log2(os)+1 for pow2 os
    if engage_depth == 2 and backbone.down_blocks > 2 and level_c(1) <= 48:
        n = 2
    return n


def maybe_pack_level0(model, packed=None):
    """Opt a UNet-backbone model into packed (space-to-depth) execution.

    ``packed=None`` (auto) enables it on TPU for stem-less UNet backbones —
    an exact layout transform (see ops/packed_conv.py) that sidesteps the
    128-lane padding waste of narrow-channel convolutions, applied to the
    first `choose_packed_levels` encoder levels, the decoder up-blocks
    consuming their skips, and the bound 1x1 heads. Identical param tree,
    so the same checkpoint params apply unchanged. ``packed`` may also be
    an int to force an exact packed depth. Returns the (possibly rebuilt)
    model.

    Auto mode keeps the Encoder's resolution gate (`pack_min_res`, default
    1024 px): the allowed depth only engages on megapixel inputs, smaller
    traces run unpacked (same params either way). An explicit int force
    also drops the gate to 1 so the requested depth engages at any input
    size (tests and A/B harnesses rely on this).
    """
    from sleap_nn_tpu.models.unet import UNet

    backbone = getattr(model, "backbone", None)
    if not isinstance(backbone, UNet):
        return model
    if backbone.stem_blocks > 0 or backbone.down_blocks < 2:
        return model
    if isinstance(packed, bool) or packed is None:
        if packed is None:
            packed = jax.default_backend() == "tpu"
        target = choose_packed_levels(backbone) if packed else 0
        min_res = backbone.pack_min_res
    else:
        target = int(packed)
        min_res = 1 if target > 0 else backbone.pack_min_res
    if backbone.packed_levels == target and backbone.pack_min_res == min_res:
        return model
    return model.clone(
        backbone=backbone.clone(packed_levels=target, pack_min_res=min_res)
    )


def maybe_fuse_convs(model, fused=None):
    """Opt a UNet-backbone model into fused double-conv Pallas execution.

    ``fused=True`` runs every eligible double-conv block (encoder levels
    and decoder refine pairs, see ops/fused_conv.py) as one VMEM-resident
    Pallas kernel. Identical param tree; forward-only (the kernel has no
    VJP), so this is an inference-backend opt-in — training keeps the
    flax path.

    ``fused=None`` (auto) is OFF: A/B on a v5e (2026-08-21, 30-iter
    device loops) measured the kernel 3-5x SLOWER than XLA's conv
    lowering at every production shape (B32 256px 24ch: 6.85 ms plain vs
    36.06 ms fused; B32 128px 36ch: 2.38 vs 9.01) — sub-128 channel
    counts pad to the full 128-lane tile, so the strip matmuls run the
    MXU at ~19% lane utilization, which costs more than the saved HBM
    round-trip of the inter-conv activation. Kept as an opt-in for wide-
    channel custom models where the lane math flips.
    """
    from sleap_nn_tpu.models.unet import UNet

    backbone = getattr(model, "backbone", None)
    if not isinstance(backbone, UNet):
        return model
    if fused is None:
        fused = False
    fused = bool(fused)
    if backbone.use_fused == fused:
        return model
    return model.clone(backbone=backbone.clone(use_fused=fused))


def effective_packed_levels(backbone, height: int, width: int) -> int:
    """Packed depth the Encoder will actually use for an input size.

    Mirrors the trace-time logic in `Encoder.__call__` (divisibility +
    resolution gate) so benches and diagnostics can report the real
    packing without re-tracing.
    """
    n = min(getattr(backbone, "packed_levels", 0),
            getattr(backbone, "down_blocks", 0) - 1)
    if getattr(backbone, "stem_blocks", 0) > 0:
        n = 0
    while n > 0 and (height % (2 ** (n + 1)) != 0
                     or width % (2 ** (n + 1)) != 0):
        n -= 1
    if n > 0 and min(height, width) < getattr(backbone, "pack_min_res", 1024):
        n = 0
    return n


class JaxBackend:
    """Jitted forward pass over replicated params."""

    def __init__(self, model, params, use_bf16: bool = False,
                 packed_level0: Optional[bool] = None,
                 fused_convs: Optional[bool] = None,
                 output_dtype=jnp.float32):
        """``output_dtype=None`` keeps outputs in the compute dtype: under
        ``use_bf16`` the full-resolution confmaps then stay bf16 through the
        fused layer program (half the HBM bytes at the head/peaks boundary;
        +1.6% on the production medium_rf topdown @1024 on a v5e). Peak
        refinement upcasts to f32 internally either way; only returned map
        VALUES carry bf16 precision, mirroring the reference's fp16 engines.
        """
        model = maybe_pack_level0(model, packed_level0)
        model = maybe_fuse_convs(model, fused_convs)
        self.model = model
        self.params = params
        self.use_bf16 = use_bf16
        self.output_dtype = output_dtype

        def forward(params, x):
            if use_bf16:
                x = x.astype(jnp.bfloat16)
                params = jax.tree_util.tree_map(
                    lambda p: p.astype(jnp.bfloat16) if jnp.issubdtype(p.dtype, jnp.floating) else p,
                    params,
                )
            out = model.apply(params, x)
            if output_dtype is None:
                return out
            return {k: v.astype(output_dtype) for k, v in out.items()}

        self.forward = forward  # pure (params, x) -> dict
        self._fn = jax.jit(forward)
        # Set (to tracer params) while a layer program traces under
        # jit_layer — so the weights enter the compiled program as
        # ARGUMENTS, not baked constants. Closure-captured constants bloat
        # every compile by the full weight size (a 28M-param backbone adds
        # >100 MB to the serialized HLO, past the axon remote-compile
        # request limit) and force a recompile on any weight change.
        self._bound = None

    def __call__(self, x: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        if self._bound is not None:
            return self.forward(self._bound, x)
        return self._fn(self.params, x)

    @property
    def does_baked_postproc(self) -> bool:
        return False

    def warmup(self, input_shape, dtype=jnp.float32):
        x = jnp.zeros(input_shape, dtype)
        jax.block_until_ready(self._fn(self.params, x))
