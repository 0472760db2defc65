"""Tests for the UNet backbone and model assembly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sleap_nn_tpu.models import (
    Model,
    UNet,
    get_head,
)


def test_unet_shapes_and_strides():
    unet = UNet(filters=8, filters_rate=2.0, down_blocks=2, up_blocks=2)
    assert unet.max_stride == 4
    assert unet.output_stride == 1
    x = jnp.zeros((1, 64, 64, 1))
    params = unet.init(jax.random.PRNGKey(0), x)
    out = unet.apply(params, x)
    assert out["strides"] == [2, 1]
    assert out["outputs"][0].shape == (1, 32, 32, 16)
    assert out["outputs"][1].shape == (1, 64, 64, 8)
    assert out["middle_output"].shape == (1, 16, 16, 32)


def test_unet_filter_schedule_default_rate():
    # filters=32, rate=1.5, down=4, up=3 -> reference schedule:
    # encoder blocks 32,48,72,108; middle 162; decoder 108,72,48.
    unet = UNet(filters=32, filters_rate=1.5, down_blocks=4, up_blocks=3)
    s2f = unet.stride_to_filters
    assert s2f == {16: 162, 8: 108, 4: 72, 2: 48}
    x = jnp.zeros((1, 32, 32, 1))
    params = unet.init(jax.random.PRNGKey(0), x)
    out = unet.apply(params, x)
    assert [o.shape[-1] for o in out["outputs"]] == [108, 72, 48]
    assert out["strides"] == [8, 4, 2]


def test_unet_with_stem():
    # With a stem the encoder's first block also pools (reference parity):
    # bottleneck stride = 2 * 2**(down+stem) = 16 here.
    unet = UNet(filters=8, filters_rate=2.0, down_blocks=2, up_blocks=2, stem_blocks=1)
    assert unet.max_stride == 16
    x = jnp.zeros((1, 64, 64, 1))
    params = unet.init(jax.random.PRNGKey(0), x)
    out = unet.apply(params, x)
    assert out["strides"] == [8, 4]
    assert out["outputs"][0].shape[1] == 8
    assert out["outputs"][1].shape[1] == 16
    assert out["middle_output"].shape[1] == 4


def test_unet_from_config():
    class Cfg:
        in_channels = 1
        kernel_size = 3
        filters = 8
        filters_rate = 2.0
        max_stride = 8
        stem_stride = None
        middle_block = True
        up_interpolate = True
        stacks = 1
        convs_per_block = 2
        output_stride = 2

    unet = UNet.from_config(Cfg)
    assert unet.down_blocks == 3
    assert unet.up_blocks == 2
    assert unet.max_stride == 8
    assert unet.output_stride == 2


def test_unet_transposed_conv_upsampling():
    unet = UNet(filters=8, filters_rate=2.0, down_blocks=2, up_blocks=2, up_interpolate=False)
    x = jnp.zeros((1, 32, 32, 1))
    params = unet.init(jax.random.PRNGKey(0), x)
    out = unet.apply(params, x)
    assert out["outputs"][-1].shape == (1, 32, 32, 8)


@pytest.mark.parametrize(
    "model_type,head_cfg,expected_channels",
    [
        ("single_instance", {"confmaps": {"part_names": ["A", "B"], "sigma": 5.0, "output_stride": 2}}, {"SingleInstanceConfmapsHead": 2}),
        ("centroid", {"confmaps": {"anchor_part": None, "sigma": 5.0, "output_stride": 2}}, {"CentroidConfmapsHead": 1}),
        ("centered_instance", {"confmaps": {"part_names": ["A", "B"], "anchor_part": "A", "sigma": 5.0, "output_stride": 2}}, {"CenteredInstanceConfmapsHead": 2}),
        (
            "bottomup",
            {
                "confmaps": {"part_names": ["A", "B"], "sigma": 5.0, "output_stride": 2},
                "pafs": {"edges": [("A", "B")], "sigma": 15.0, "output_stride": 4},
            },
            {"MultiInstanceConfmapsHead": 2, "PartAffinityFieldsHead": 2},
        ),
        (
            "multi_class_topdown",
            {
                "confmaps": {"part_names": ["A", "B"], "anchor_part": None, "sigma": 5.0, "output_stride": 2},
                "class_vectors": {"classes": ["m0", "m1"], "num_fc_layers": 2, "num_fc_units": 32, "output_stride": 4},
            },
            {"CenteredInstanceConfmapsHead": 2, "ClassVectorsHead": 2},
        ),
        (
            "bottomup_segmentation",
            {
                "segmentation": {"output_stride": 2},
                "center": {"sigma": 4.0, "output_stride": 2},
                "offsets": {"output_stride": 2},
            },
            {"SegmentationHead": 1, "InstanceCenterHead": 1, "CenterOffsetHead": 2},
        ),
    ],
)
def test_model_head_outputs(model_type, head_cfg, expected_channels):
    backbone_cfg = {
        "in_channels": 1,
        "kernel_size": 3,
        "filters": 8,
        "filters_rate": 2.0,
        "max_stride": 8,
        "stem_stride": None,
        "middle_block": True,
        "up_interpolate": True,
        "stacks": 1,
        "convs_per_block": 2,
        "output_stride": 2,
    }

    class Cfg:
        def __init__(self, d):
            self.__dict__.update(d)

    model = Model.from_config("unet", Cfg(backbone_cfg), head_cfg, model_type)
    x = jnp.zeros((2, 32, 32, 1))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert set(out.keys()) == set(expected_channels.keys())
    for name, ch in expected_channels.items():
        if name == "ClassVectorsHead":
            assert out[name].shape == (2, ch)
            np.testing.assert_allclose(np.asarray(out[name].sum(-1)), 1.0, atol=1e-5)
        else:
            stride = {h.name: h.output_stride for h in model.heads}[name]
            assert out[name].shape == (2, 32 // stride, 32 // stride, ch), name


def test_model_channel_coercion():
    backbone_cfg = {
        "in_channels": 1, "kernel_size": 3, "filters": 8, "filters_rate": 2.0,
        "max_stride": 4, "stem_stride": None, "middle_block": True,
        "up_interpolate": True, "stacks": 1, "convs_per_block": 2, "output_stride": 2,
    }

    class Cfg:
        def __init__(self, d):
            self.__dict__.update(d)

    head_cfg = {"confmaps": {"part_names": ["A"], "sigma": 5.0, "output_stride": 2}}
    model = Model.from_config("unet", Cfg(backbone_cfg), head_cfg, "single_instance")
    x1 = jnp.ones((1, 32, 32, 1))
    params = model.init(jax.random.PRNGKey(0), x1)
    # Feeding RGB to a grayscale model must coerce, not crash.
    x3 = jnp.ones((1, 32, 32, 3))
    out = model.apply(params, x3)
    assert out["SingleInstanceConfmapsHead"].shape == (1, 16, 16, 1)


def test_model_jit_and_param_count():
    # Exactly the reference fixture hyperparameters
    # (tests/assets/model_ckpts/minimal_instance_single_instance/training_config.yaml).
    backbone_cfg = {
        "in_channels": 3, "kernel_size": 3, "filters": 8, "filters_rate": 2.0,
        "max_stride": 4, "stem_stride": None, "middle_block": True,
        "up_interpolate": True, "stacks": 1, "convs_per_block": 2, "output_stride": 4,
    }

    class Cfg:
        def __init__(self, d):
            self.__dict__.update(d)

    head_cfg = {"confmaps": {"part_names": ["A", "B"], "sigma": 5.0, "output_stride": 4}}
    model = Model.from_config("unet", Cfg(backbone_cfg), head_cfg, "single_instance")
    x = jnp.zeros((4, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    fwd = jax.jit(lambda p, x: model.apply(p, x))
    out = fwd(params, x)
    assert out["SingleInstanceConfmapsHead"].shape == (4, 16, 16, 2)
    n_params = sum(p.size for p in jax.tree_util.tree_leaves(params))
    # Reference fixture config with identical hyperparams reports 18,250 params
    # (tests/assets/model_ckpts/minimal_instance_single_instance/training_config.yaml).
    assert n_params == 18250
