"""JaxBackend contract matrix.

Parity target: reference tests/inference/layers/backends/* backend
protocol behaviors (dtype policy, half-precision path, warmup, binding),
against sleap_nn_tpu/inference/backends.py JaxBackend.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sleap_nn_tpu.inference.backends import JaxBackend
from sleap_nn_tpu.models import Model


class _Cfg:
    def __init__(self, d):
        self.__dict__.update(d)


@pytest.fixture(scope="module")
def tiny_model():
    model = Model.from_config(
        "unet",
        _Cfg({"in_channels": 1, "kernel_size": 3, "filters": 4,
              "filters_rate": 2.0, "max_stride": 4, "stem_stride": None,
              "middle_block": True, "up_interpolate": True, "stacks": 1,
              "convs_per_block": 1, "output_stride": 2}),
        {"confmaps": {"part_names": ["A", "B"], "sigma": 2.5,
                      "output_stride": 2}},
        "single_instance",
    )
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 1)))
    return model, params


def test_outputs_always_float32(tiny_model):
    model, params = tiny_model
    x = jnp.zeros((2, 16, 16, 1), jnp.float32)
    for bf16 in (False, True):
        out = JaxBackend(model, params, use_bf16=bf16)(x)
        for v in out.values():
            assert v.dtype == jnp.float32


def test_bf16_matches_fp32_coarsely(tiny_model):
    model, params = tiny_model
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (1, 16, 16, 1)),
                    jnp.float32)
    full = JaxBackend(model, params, use_bf16=False)(x)
    half = JaxBackend(model, params, use_bf16=True)(x)
    for k in full:
        np.testing.assert_allclose(
            np.asarray(full[k]), np.asarray(half[k]), atol=0.05
        )


def test_bf16_cast_skips_integer_leaves():
    # The cast inside forward must only touch floating leaves.
    seen = {}

    class _StubModel:
        @staticmethod
        def apply(params, x):
            seen["int_dtype"] = params["counter"].dtype
            seen["float_dtype"] = params["w"].dtype
            return {"o": x.astype(jnp.float32)}

    params = {"counter": jnp.asarray([1, 2], jnp.int32),
              "w": jnp.ones((2,), jnp.float32)}
    b = JaxBackend(_StubModel(), params, use_bf16=True)
    b.forward(params, jnp.zeros((1, 4, 4, 1)))
    assert seen["int_dtype"] == jnp.int32
    assert seen["float_dtype"] == jnp.bfloat16


def test_bound_params_path_used_during_tracing(tiny_model):
    model, params = tiny_model
    b = JaxBackend(model, params)
    x = jnp.asarray(
        np.random.default_rng(1).uniform(0, 1, (1, 16, 16, 1)), jnp.float32
    )
    eager = b(x)

    # Binding substitute params must change the output (proves the bound
    # path is consulted, not the constructor params).
    zeroed = jax.tree_util.tree_map(jnp.zeros_like, params)
    b._bound = zeroed
    bound_out = b(x)
    b._bound = None
    k = sorted(eager)[0]
    assert not np.allclose(np.asarray(eager[k]), np.asarray(bound_out[k]))
    # Unbinding restores the jitted self-params path.
    np.testing.assert_allclose(
        np.asarray(b(x)[k]), np.asarray(eager[k]), atol=1e-6
    )


def test_does_baked_postproc_false(tiny_model):
    model, params = tiny_model
    assert JaxBackend(model, params).does_baked_postproc is False


def test_warmup_compiles_without_error(tiny_model):
    model, params = tiny_model
    JaxBackend(model, params).warmup((1, 16, 16, 1))


def test_output_dtype_none_keeps_compute_dtype(tiny_model):
    """output_dtype=None keeps bf16 maps bf16 (the production fused-program
    configuration: half the HBM bytes at the head/peaks boundary)."""
    model, params = tiny_model
    x = jnp.zeros((2, 16, 16, 1), jnp.float32)
    out = JaxBackend(model, params, use_bf16=True, output_dtype=None)(x)
    for v in out.values():
        assert v.dtype == jnp.bfloat16
    # f32 compute stays f32.
    out32 = JaxBackend(model, params, use_bf16=False, output_dtype=None)(x)
    for v in out32.values():
        assert v.dtype == jnp.float32
    # And peaks consume bf16 maps fine end to end.
    from sleap_nn_tpu.ops import find_global_peaks

    pts, vals = find_global_peaks(out["SingleInstanceConfmapsHead"],
                                  threshold=0.1, refinement="integral")
    assert pts.dtype == jnp.float32
