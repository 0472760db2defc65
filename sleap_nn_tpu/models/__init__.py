"""Model zoo: flax backbones (UNet/ConvNeXt/SwinT) + heads + assembly."""

from sleap_nn_tpu.models.heads import (
    CenteredInstanceConfmapsHead,
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
from sleap_nn_tpu.models.model import MODEL_TYPES, Model, get_backbone, get_head
from sleap_nn_tpu.models.unet import UNet

__all__ = [
    "MODEL_TYPES",
    "Model",
    "UNet",
    "get_backbone",
    "get_head",
    "Head",
    "SingleInstanceConfmapsHead",
    "CentroidConfmapsHead",
    "CenteredInstanceConfmapsHead",
    "MultiInstanceConfmapsHead",
    "PartAffinityFieldsHead",
    "ClassMapsHead",
    "ClassVectorsHead",
    "OffsetRefinementHead",
    "SegmentationHead",
    "InstanceCenterHead",
    "CenterOffsetHead",
]
