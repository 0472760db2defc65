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
    """How many leading encoder levels to run space-to-depth packed.

    Pack while the level's channel count leaves most of the 128-lane tile
    padded (C <= 48 keeps the packed 4C <= 192, a clear traffic win) —
    each packed level trades ~4x FLOPs on that level for ~2-4x less HBM
    traffic, the right trade only while the model is memory-bound there.
    Capped at 2 levels: by level 2 the maps are 4x smaller and the FLOP
    multiplier starts to matter more than the shrinking padding waste.
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
    else:
        target = int(packed)
    if backbone.packed_levels == target:
        return model
    return model.clone(backbone=backbone.clone(packed_levels=target))


class JaxBackend:
    """Jitted forward pass over replicated params."""

    def __init__(self, model, params, use_bf16: bool = False,
                 packed_level0: Optional[bool] = None):
        model = maybe_pack_level0(model, packed_level0)
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
