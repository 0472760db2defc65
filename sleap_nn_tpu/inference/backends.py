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
    """Max leading encoder levels ALLOWED to run space-to-depth packed.

    Pack while the level's channel count leaves most of the 128-lane tile
    padded (C <= 48 keeps the packed 4C <= 192). Capped at 2 levels: by
    level 2 the maps are 4x smaller and the shrinking padding waste stops
    paying for the layout churn.

    This is an upper bound: the Encoder additionally gates each level on
    its input resolution at trace time (`Encoder.pack_min_res`, default
    1024 px) — DCE-proof v5e A/Bs showed packing only wins at megapixel
    scale, XLA's native narrow-conv handling wins below it. The effective
    depth for a given input is `effective_packed_levels`.
    """
    n = 0
    for b in range(min(2, backbone.down_blocks - 1)):
        c = int(backbone.filters * (backbone.filters_rate ** b))
        if c <= 48:
            n += 1
        else:
            break
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
    while n > 0 and (min(height, width) >> (n - 1)) < getattr(
            backbone, "pack_min_res", 1024):
        n -= 1
    return n


class JaxBackend:
    """Jitted forward pass over replicated params."""

    def __init__(self, model, params, use_bf16: bool = False,
                 packed_level0: Optional[bool] = None,
                 fused_convs: Optional[bool] = None):
        model = maybe_pack_level0(model, packed_level0)
        model = maybe_fuse_convs(model, fused_convs)
        self.model = model
        self.params = params
        self.use_bf16 = use_bf16

        def forward(params, x):
            if use_bf16:
                x = x.astype(jnp.bfloat16)
                params = jax.tree_util.tree_map(
                    lambda p: p.astype(jnp.bfloat16) if jnp.issubdtype(p.dtype, jnp.floating) else p,
                    params,
                )
            out = model.apply(params, x)
            return {k: v.astype(jnp.float32) for k, v in out.items()}

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
