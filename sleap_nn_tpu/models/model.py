"""Model assembly: backbone + heads (flax).

Parity target: reference sleap_nn/architectures/model.py:36-261 —
``get_backbone``/``get_head`` registries and the ``Model`` wrapper that
binds each head's 1x1 conv to the decoder feature at that head's
``output_stride``, with gray<->RGB input coercion in forward.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from sleap_nn_tpu.models.heads import (
    CenteredInstanceConfmapsHead,
    ConvHeadLayer,
    CenterOffsetHead,
    CentroidConfmapsHead,
    ClassMapsHead,
    ClassVectorsHead,
    Head,
    InstanceCenterHead,
    MultiInstanceConfmapsHead,
    OffsetRefinementHead,
    PartAffinityFieldsHead,
    SegmentationHead,
    SingleInstanceConfmapsHead,
)
from sleap_nn_tpu.models.unet import UNet

MODEL_TYPES = (
    "single_instance",
    "centroid",
    "centered_instance",
    "bottomup",
    "multi_class_bottomup",
    "multi_class_topdown",
    "bottomup_segmentation",
    "centered_instance_segmentation",
    "semantic_segmentation",
)


def _cfg_get(cfg, key, default=None):
    """Fetch from dataclass-or-dict configs uniformly."""
    if cfg is None:
        return default
    if isinstance(cfg, dict):
        return cfg.get(key, default)
    return getattr(cfg, key, default)


def get_backbone(backbone_type: str, backbone_config) -> nn.Module:
    """Instantiate a backbone flax module from its config.

    Supported: ``unet``, ``convnext``, ``swint`` (reference model.py:36).
    """
    if backbone_type == "unet":
        return UNet.from_config(backbone_config)
    if backbone_type == "convnext":
        from sleap_nn_tpu.models.convnext import ConvNextWrapper

        return ConvNextWrapper.from_config(backbone_config)
    if backbone_type == "swint":
        from sleap_nn_tpu.models.swint import SwinTWrapper

        return SwinTWrapper.from_config(backbone_config)
    if backbone_type == "pretrained":
        from sleap_nn_tpu.models.pretrained import PretrainedBackbone

        return PretrainedBackbone.from_config(backbone_config)
    raise KeyError(
        f"Unsupported backbone: {backbone_type}. "
        f"Supported: unet, convnext, swint, pretrained"
    )


def get_head(model_type: str, head_config) -> Tuple[Head, ...]:
    """Instantiate the head set for a model type (reference model.py:70)."""

    def kw(leaf, keys):
        return {k: _cfg_get(leaf, k) for k in keys if _cfg_get(leaf, k) is not None}

    heads = []
    if model_type == "single_instance":
        leaf = _cfg_get(head_config, "confmaps")
        heads.append(
            SingleInstanceConfmapsHead(
                **kw(leaf, ("part_names", "sigma", "output_stride", "loss_weight"))
            )
        )
    elif model_type == "centered_instance":
        leaf = _cfg_get(head_config, "confmaps")
        heads.append(
            CenteredInstanceConfmapsHead(
                **kw(leaf, ("part_names", "anchor_part", "sigma", "output_stride", "loss_weight"))
            )
        )
    elif model_type == "centroid":
        leaf = _cfg_get(head_config, "confmaps")
        heads.append(
            CentroidConfmapsHead(
                **kw(leaf, ("anchor_part", "sigma", "output_stride", "loss_weight"))
            )
        )
    elif model_type == "bottomup":
        cm = _cfg_get(head_config, "confmaps")
        pafs = _cfg_get(head_config, "pafs")
        heads.append(
            MultiInstanceConfmapsHead(
                **kw(cm, ("part_names", "sigma", "output_stride", "loss_weight"))
            )
        )
        heads.append(
            PartAffinityFieldsHead(
                **kw(pafs, ("edges", "sigma", "output_stride", "loss_weight"))
            )
        )
    elif model_type == "multi_class_bottomup":
        cm = _cfg_get(head_config, "confmaps")
        cmaps = _cfg_get(head_config, "class_maps")
        heads.append(
            MultiInstanceConfmapsHead(
                **kw(cm, ("part_names", "sigma", "output_stride", "loss_weight"))
            )
        )
        heads.append(
            ClassMapsHead(**kw(cmaps, ("classes", "sigma", "output_stride", "loss_weight")))
        )
    elif model_type == "multi_class_topdown":
        cm = _cfg_get(head_config, "confmaps")
        cv = _cfg_get(head_config, "class_vectors")
        heads.append(
            CenteredInstanceConfmapsHead(
                **kw(cm, ("part_names", "anchor_part", "sigma", "output_stride", "loss_weight"))
            )
        )
        heads.append(
            ClassVectorsHead(
                **kw(
                    cv,
                    (
                        "classes",
                        "num_fc_layers",
                        "num_fc_units",
                        "global_pool",
                        "output_stride",
                        "loss_weight",
                    ),
                )
            )
        )
    elif model_type == "bottomup_segmentation":
        seg = _cfg_get(head_config, "segmentation")
        center = _cfg_get(head_config, "center")
        offsets = _cfg_get(head_config, "offsets")
        heads.append(SegmentationHead(**kw(seg, ("output_stride", "loss_weight", "bce_weight", "dice_weight", "bce_pos_weight"))))
        heads.append(InstanceCenterHead(**kw(center, ("sigma", "output_stride", "loss_weight"))))
        heads.append(CenterOffsetHead(**kw(offsets, ("output_stride", "loss_weight"))))
    elif model_type in ("centered_instance_segmentation", "semantic_segmentation"):
        seg = _cfg_get(head_config, "segmentation")
        heads.append(SegmentationHead(**kw(seg, ("output_stride", "loss_weight", "bce_weight", "dice_weight", "bce_pos_weight"))))
    else:
        raise ValueError(
            f"{model_type} is not a defined model type. Choose one of {MODEL_TYPES}."
        )
    return tuple(heads)


def rgb_to_grayscale(x: jnp.ndarray) -> jnp.ndarray:
    """ITU-R 601 luma conversion, channel-last."""
    w = jnp.array([0.2989, 0.587, 0.114], dtype=x.dtype)
    return jnp.sum(x * w, axis=-1, keepdims=True)


class Model(nn.Module):
    """Backbone + heads.

    Attributes:
        backbone: a flax backbone module exposing ``stride_to_filters`` and
            returning the standard backbone output dict.
        heads: static tuple of :class:`Head` descriptors.
        in_channels: expected input channels (gray<->RGB coercion applied).
    """

    backbone: nn.Module
    heads: Tuple[Head, ...]
    in_channels: int = 1

    @classmethod
    def from_config(
        cls, backbone_type: str, backbone_config, head_configs, model_type: str
    ) -> "Model":
        heads = get_head(model_type, head_configs)
        backbone = get_backbone(backbone_type, backbone_config)
        produced = set(getattr(backbone, "stride_to_filters", {}) or {})
        for head in heads:
            if isinstance(head, ClassVectorsHead):
                continue  # binds to the bottleneck feature, not a decoder stride
            if produced and head.output_stride not in produced:
                raise ValueError(
                    f"Head '{head.name}' needs a feature at output_stride "
                    f"{head.output_stride}, but backbone '{backbone_type}' produces "
                    f"strides {sorted(produced)}."
                )
        return cls(
            backbone=backbone,
            heads=heads,
            in_channels=_cfg_get(backbone_config, "in_channels", 1),
        )

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        if x.shape[-1] != self.in_channels:
            if x.shape[-1] == 1:
                x = jnp.repeat(x, 3, axis=-1)
            elif x.shape[-1] == 3:
                x = rgb_to_grayscale(x)
        backbone_outputs = self.backbone(x)

        outputs = {}
        strides = backbone_outputs["strides"]
        packed = backbone_outputs.get("packed_outputs") or {}
        for head in self.heads:
            if not backbone_outputs["outputs"]:
                outputs[head.name] = head.make_layer()(
                    backbone_outputs["middle_output"]
                )
            elif isinstance(head, ClassVectorsHead):
                outputs[head.name] = head.make_layer()(
                    backbone_outputs["intermediate_feat"]
                )
            else:
                if head.output_stride not in strides:
                    raise ValueError(
                        f"Head '{head.name}' needs a feature at output_stride "
                        f"{head.output_stride}, but backbone produces {strides}."
                    )
                idx = strides.index(head.output_stride)
                if head.output_stride in packed:
                    # Packed decoder output: run the 1x1 head conv in packed
                    # layout (same params, exact math; the pixel-space
                    # decoder feature is then dead code). See heads.py.
                    layer = head.make_layer(packed=True)
                    if isinstance(layer, ConvHeadLayer) and layer.packed:
                        outputs[head.name] = layer(packed[head.output_stride])
                    else:
                        outputs[head.name] = layer(
                            backbone_outputs["outputs"][idx]
                        )
                else:
                    outputs[head.name] = head.make_layer()(
                        backbone_outputs["outputs"][idx]
                    )
        return outputs
