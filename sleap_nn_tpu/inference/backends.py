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


class JaxBackend:
    """Jitted forward pass over replicated params."""

    def __init__(self, model, params, use_bf16: bool = False):
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
