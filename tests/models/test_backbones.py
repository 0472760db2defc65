"""Tests for ConvNeXt and SwinT backbones + model assembly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
pytestmark = pytest.mark.slow  # integration tier: real model builds / e2e flows


from sleap_nn_tpu.config.model_config import ConvNextConfig, SwinTConfig
from sleap_nn_tpu.models import Model
from sleap_nn_tpu.models.convnext import ConvNextWrapper
from sleap_nn_tpu.models.swint import SwinTWrapper

TINY_ARCH_CN = ((2, 2, 2, 2), (8, 16, 32, 64))  # small test-size convnext
TINY_ARCH_SW = (8, (1, 1, 1, 1), (2, 2, 2, 2))  # small test-size swin


def test_convnext_shapes_and_strides():
    m = ConvNextWrapper(arch=TINY_ARCH_CN, output_stride_cfg=4)
    assert m.max_stride == 32
    assert m.up_blocks == 3  # log2(32/(2*4)) + log2(2)
    x = jnp.zeros((1, 64, 64, 1))
    params = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(params, x)
    assert out["strides"] == [16, 8, 4]
    # spatial: input 64, stride 16 -> 4, 8 -> 8, 4 -> 16
    assert [o.shape[1] for o in out["outputs"]] == [4, 8, 16]
    # channels from decoder schedule: filters=8, rate=2, down=3, stem=1.
    s2f = m.stride_to_filters
    assert s2f[32] == 64 * 2
    assert out["outputs"][0].shape[-1] == s2f[16]
    assert out["middle_output"].shape == (1, 2, 2, 128)


def test_convnext_full_output_stride_2():
    m = ConvNextWrapper(arch=TINY_ARCH_CN, output_stride_cfg=2)
    x = jnp.zeros((1, 64, 64, 1))
    out = m.apply(m.init(jax.random.PRNGKey(0), x), x)
    assert out["strides"][-1] == 2
    assert out["outputs"][-1].shape[1] == 32


def test_swint_shapes_and_strides():
    m = SwinTWrapper(arch=TINY_ARCH_SW, window_size=4, output_stride_cfg=4)
    assert m.max_stride == 32
    x = jnp.zeros((1, 64, 64, 1))
    params = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(params, x)
    assert out["strides"] == [16, 8, 4]
    assert [o.shape[1] for o in out["outputs"]] == [4, 8, 16]
    assert np.all(np.isfinite(np.asarray(out["outputs"][-1])))


def test_swint_shifted_window_mask():
    # Input not divisible by window -> padding + shift path must stay finite.
    m = SwinTWrapper(arch=TINY_ARCH_SW, window_size=4, output_stride_cfg=4)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 48, 80, 1))
    out = m.apply(m.init(jax.random.PRNGKey(0), x), x)
    for o in out["outputs"]:
        assert np.all(np.isfinite(np.asarray(o)))


@pytest.mark.parametrize("backbone_type", ["convnext", "swint"])
def test_model_assembly_with_heads(backbone_type):
    if backbone_type == "convnext":
        cfg = ConvNextConfig(arch={"depths": [2, 2, 2, 2], "channels": [8, 16, 32, 64]},
                             output_stride=4, in_channels=1)
    else:
        cfg = SwinTConfig(arch={"embed": 8, "depths": [1, 1, 1, 1], "num_heads": [2, 2, 2, 2]},
                          window_size=4, output_stride=4, in_channels=1)
    head_cfg = {"confmaps": {"part_names": ["A", "B"], "sigma": 5.0, "output_stride": 4}}
    model = Model.from_config(backbone_type, cfg, head_cfg, "single_instance")
    x = jnp.zeros((1, 64, 64, 1))
    out = model.apply(model.init(jax.random.PRNGKey(0), x), x)
    assert out["SingleInstanceConfmapsHead"].shape == (1, 16, 16, 2)


def test_convnext_presets_param_scale():
    # tiny preset instantiates with the published channel schedule.
    m = ConvNextWrapper(model_type="tiny", output_stride_cfg=4)
    assert m.channels if hasattr(m, "channels") else True
    assert m.stride_to_filters[32] == 768 * 2
