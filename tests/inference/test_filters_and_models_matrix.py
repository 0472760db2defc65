"""Filter-pipeline matrix + architecture shape/behavior contracts.

Reference scenario sources: tests/inference/test_filters.py (filter knob
combinations), tests/architectures/* (UNet stride anchoring, head wiring,
channel coercion, ConvNeXt/SwinT decoders).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest
pytestmark = pytest.mark.slow  # integration tier: real training loops / model builds / subprocesses


from sleap_nn_tpu.inference.filters import (
    FilterConfig,
    FilterPipeline,
    suppress_overlapping,
)
from sleap_nn_tpu.io import PredictedInstance, Skeleton

SKEL = Skeleton(nodes=["a", "b", "c", "d"])


def inst(xy, scores=None, score=1.0):
    pts = np.asarray(xy, float)
    ps = np.asarray(scores if scores is not None else np.ones(len(pts)), float)
    return PredictedInstance(points=pts, skeleton=SKEL, point_scores=ps,
                             score=score)


def spread(x, y, s=10.0):
    return [[x, y], [x + s, y], [x, y + s], [x + s, y + s]]


# ── filter pipeline ──────────────────────────────────────────────────────────


def test_filter_config_disabled_by_default():
    assert not FilterConfig().enabled()
    assert FilterConfig(min_node_count=2).enabled()


def test_min_node_count_drops_sparse():
    sparse = inst([[1, 1], [2, 2], [np.nan, np.nan], [np.nan, np.nan]])
    dense = inst(spread(5, 5))
    out = FilterPipeline(FilterConfig(min_node_count=3)).apply([sparse, dense])
    assert out == [dense]


def test_min_node_confidence_nans_weak_nodes():
    i = inst(spread(5, 5), scores=[0.9, 0.05, 0.9, 0.9])
    (out,) = FilterPipeline(FilterConfig(min_node_confidence=0.1)).apply([i])
    assert np.isnan(out.numpy()[1]).all()
    assert out.n_visible == 3


def test_confidence_filter_composes_with_node_count():
    i = inst(spread(5, 5), scores=[0.9, 0.05, 0.05, 0.05])
    out = FilterPipeline(FilterConfig(min_node_confidence=0.1,
                                      min_node_count=2)).apply([i])
    assert out == []  # only one node survives -> dropped


def test_min_visible_node_fraction():
    half = inst([[1, 1], [2, 2], [np.nan, np.nan], [np.nan, np.nan]])
    out = FilterPipeline(
        FilterConfig(min_visible_node_fraction=0.75)).apply([half])
    assert out == []
    out2 = FilterPipeline(
        FilterConfig(min_visible_node_fraction=0.5)).apply([half])
    assert len(out2) == 1


def test_min_mean_node_score():
    weak = inst(spread(5, 5), scores=[0.2, 0.2, 0.2, 0.2])
    strong = inst(spread(50, 50), scores=[0.9, 0.9, 0.9, 0.9])
    out = FilterPipeline(FilterConfig(min_mean_node_score=0.5)).apply(
        [weak, strong])
    assert out == [strong]


def test_min_instance_score():
    out = FilterPipeline(FilterConfig(min_instance_score=0.5)).apply(
        [inst(spread(1, 1), score=0.4), inst(spread(9, 9), score=0.6)])
    assert len(out) == 1 and out[0].score == 0.6


def test_overlap_iou_nms_keeps_best():
    a = inst(spread(10, 10), score=0.9)
    b = inst(spread(11, 11), score=0.5)  # heavy overlap
    c = inst(spread(100, 100), score=0.3)
    out = FilterPipeline(
        FilterConfig(overlap_method="iou", overlap_threshold=0.5)
    ).apply([a, b, c])
    assert a in out and c in out and b not in out


def test_overlap_oks_nms():
    a = inst(spread(10, 10), score=0.9)
    b = inst(spread(10.3, 10.3), score=0.5)
    out = suppress_overlapping([a, b], "oks", 0.5)
    assert out == [a]


def test_overlap_disjoint_instances_all_kept():
    a = inst(spread(0, 0), score=0.9)
    b = inst(spread(100, 100), score=0.8)
    out = suppress_overlapping([a, b], "iou", 0.3)
    assert len(out) == 2


# ── architecture contracts ───────────────────────────────────────────────────


def _unet_cfg(**kw):
    from sleap_nn_tpu.config.model_config import UNetConfig

    base = dict(filters=8, filters_rate=2.0, max_stride=8, output_stride=2,
                in_channels=1)
    base.update(kw)
    return UNetConfig(**base)


def test_unet_emits_all_decoder_strides():
    from sleap_nn_tpu.models.unet import UNet

    net = UNet.from_config(_unet_cfg(output_stride=1))
    out = net.init_with_output(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)))[0]
    assert out["strides"] == [4, 2, 1]
    for feat, s in zip(out["outputs"], out["strides"]):
        assert feat.shape[1] == 32 // s


def test_unet_output_stride_truncates_decoder():
    from sleap_nn_tpu.models.unet import UNet

    net = UNet.from_config(_unet_cfg(output_stride=4))
    out = net.init_with_output(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)))[0]
    assert out["strides"] == [4]


def test_unet_filters_rate_grows_channels():
    from sleap_nn_tpu.models.unet import UNet

    net = UNet.from_config(_unet_cfg(filters=4, filters_rate=2.0))
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)))
    sizes = [p.shape[-1] for p in jax.tree_util.tree_leaves(params)
             if hasattr(p, "shape") and p.ndim == 4]
    assert max(sizes) >= 16  # 4 * 2**2 at depth 2


def test_unet_stem_stride_shifts_depth():
    from sleap_nn_tpu.models.unet import UNet

    net = UNet.from_config(_unet_cfg(max_stride=16, stem_stride=2,
                                     output_stride=2))
    out = net.init_with_output(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)))[0]
    assert 2 in out["strides"]
    # stem adds its stride on top of the encoder: bottleneck at least 16x
    assert out["middle_output"].shape[1] <= 32 // 16


def test_model_grayscale_to_rgb_coercion():
    from sleap_nn_tpu.models import Model

    model = Model.from_config(
        "unet", _unet_cfg(in_channels=3),
        {"confmaps": {"part_names": ["A", "B"], "sigma": 2.0,
                      "output_stride": 2}},
        "single_instance",
    )
    x = jnp.zeros((1, 32, 32, 1))  # gray input into an RGB model
    out = model.init_with_output(jax.random.PRNGKey(0), x)[0]
    assert out["SingleInstanceConfmapsHead"].shape == (1, 16, 16, 2)


def test_model_rgb_to_grayscale_coercion():
    from sleap_nn_tpu.models import Model

    model = Model.from_config(
        "unet", _unet_cfg(in_channels=1),
        {"confmaps": {"part_names": ["A"], "sigma": 2.0, "output_stride": 2}},
        "single_instance",
    )
    x = jnp.zeros((1, 32, 32, 3))
    out = model.init_with_output(jax.random.PRNGKey(0), x)[0]
    assert out["SingleInstanceConfmapsHead"].shape == (1, 16, 16, 1)


def test_model_rejects_head_at_unproduced_stride():
    from sleap_nn_tpu.models import Model

    with pytest.raises(ValueError, match="output_stride"):
        Model.from_config(
            "unet", _unet_cfg(output_stride=4),
            {"confmaps": {"part_names": ["A"], "sigma": 2.0,
                          "output_stride": 1}},
            "single_instance",
        )


def test_bottomup_model_emits_both_heads():
    from sleap_nn_tpu.models import Model

    model = Model.from_config(
        "unet", _unet_cfg(output_stride=2),
        {"confmaps": {"part_names": ["A", "B"], "sigma": 2.0,
                      "output_stride": 2},
         "pafs": {"edges": [["A", "B"]], "sigma": 2.0, "output_stride": 4}},
        "bottomup",
    )
    out = model.init_with_output(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)))[0]
    assert out["MultiInstanceConfmapsHead"].shape == (1, 16, 16, 2)
    assert out["PartAffinityFieldsHead"].shape == (1, 8, 8, 2)  # 2*n_edges


def test_classvectors_head_binds_to_bottleneck():
    from sleap_nn_tpu.models import Model

    model = Model.from_config(
        "unet", _unet_cfg(output_stride=2),
        {"confmaps": {"part_names": ["A", "B"], "anchor_part": None,
                      "sigma": 2.0, "output_stride": 2},
         "class_vectors": {"classes": ["m", "f"], "num_fc_layers": 1,
                           "num_fc_units": 16, "output_stride": 2}},
        "multi_class_topdown",
    )
    out = model.init_with_output(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)))[0]
    assert out["ClassVectorsHead"].shape == (1, 2)
    probs = np.asarray(out["ClassVectorsHead"])
    np.testing.assert_allclose(probs.sum(axis=-1), 1.0, rtol=1e-5)  # softmax


def test_segmentation_model_head_set():
    from sleap_nn_tpu.models import Model

    model = Model.from_config(
        "unet", _unet_cfg(output_stride=2),
        {"segmentation": {"output_stride": 2},
         "center": {"sigma": 3.0, "output_stride": 2},
         "offsets": {"output_stride": 2}},
        "bottomup_segmentation",
    )
    out = model.init_with_output(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)))[0]
    assert out["SegmentationHead"].shape == (1, 16, 16, 1)
    assert out["InstanceCenterHead"].shape == (1, 16, 16, 1)
    assert out["CenterOffsetHead"].shape == (1, 16, 16, 2)
    seg = np.asarray(out["SegmentationHead"])
    assert (seg >= 0).all() and (seg <= 1).all()  # sigmoid activation


def test_convnext_wrapper_strides():
    from sleap_nn_tpu.config.model_config import ConvNextConfig
    from sleap_nn_tpu.models.convnext import ConvNextWrapper

    net = ConvNextWrapper.from_config(ConvNextConfig(
        model_type="tiny", in_channels=1, output_stride=4,
        arch={"depths": [1, 1, 1, 1], "channels": [8, 16, 24, 32]},
    ))
    out = net.init_with_output(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 1)))[0]
    assert 4 in out["strides"]
    idx = out["strides"].index(4)
    assert out["outputs"][idx].shape[1] == 16


def test_swint_wrapper_strides():
    from sleap_nn_tpu.config.model_config import SwinTConfig
    from sleap_nn_tpu.models.swint import SwinTWrapper

    net = SwinTWrapper.from_config(SwinTConfig(
        model_type="tiny", in_channels=1, output_stride=4,
        arch={"embed": 8, "depths": [1, 1, 1, 1], "num_heads": [1, 2, 4, 8]},
    ))
    out = net.init_with_output(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 1)))[0]
    assert 4 in out["strides"]


def test_head_loss_weight_defaults():
    from sleap_nn_tpu.models.heads import (
        CenterOffsetHead,
        SegmentationHead,
        SingleInstanceConfmapsHead,
    )

    assert SingleInstanceConfmapsHead(part_names=["a"]).loss_weight == 1.0
    assert CenterOffsetHead().loss_weight == 0.1
    assert SegmentationHead().output_stride == 2
