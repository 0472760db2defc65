"""Kwarg -> structured config builders (the Python-API ``train(...)`` path).

Parity target: reference sleap_nn/config/get_config.py:63-941
(``get_aug_config``, ``get_backbone_config``, ``get_head_configs``,
``get_data_config``, ``get_model_config``, ``get_trainer_config``) — string
/dict shorthands expanded into the structured dataclasses.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Union

from sleap_nn_tpu.config.base import from_dict
from sleap_nn_tpu.config.data_config import (
    AugmentationConfig,
    DataConfig,
    GeometricConfig,
    IntensityConfig,
    PreprocessingConfig,
)
from sleap_nn_tpu.config.model_config import (
    BackboneConfig,
    BottomUpConfig,
    BottomUpMultiClassConfig,
    BottomUpSegmentationConfig,
    CenteredInstanceConfig,
    CenteredInstanceSegmentationConfig,
    CentroidConfig,
    ConvNextConfig,
    HeadConfig,
    PretrainedConfig,
    ModelConfig,
    SemanticSegmentationConfig,
    SingleInstanceConfig,
    SwinTConfig,
    TopDownCenteredInstanceMultiClassConfig,
    UNetConfig,
    UNetLargeRFConfig,
    UNetMediumRFConfig,
)
from sleap_nn_tpu.config.trainer_config import TrainerConfig
from sleap_nn_tpu.config.training_job_config import TrainingJobConfig

_BACKBONE_PRESETS = {
    "unet": UNetConfig,
    "unet_medium_rf": UNetMediumRFConfig,
    "unet_large_rf": UNetLargeRFConfig,
    "convnext": ConvNextConfig,
    "convnext_tiny": lambda **kw: ConvNextConfig(model_type="tiny", **kw),
    "convnext_small": lambda **kw: ConvNextConfig(model_type="small", **kw),
    "convnext_base": lambda **kw: ConvNextConfig(model_type="base", **kw),
    "convnext_large": lambda **kw: ConvNextConfig(model_type="large", **kw),
    "swint": SwinTConfig,
    "swint_tiny": lambda **kw: SwinTConfig(model_type="tiny", **kw),
    "swint_small": lambda **kw: SwinTConfig(model_type="small", **kw),
    "swint_base": lambda **kw: SwinTConfig(model_type="base", **kw),
    "pretrained": PretrainedConfig,
}

_HEAD_WRAPPERS = {
    "single_instance": (SingleInstanceConfig, "single_instance"),
    "centroid": (CentroidConfig, "centroid"),
    "centered_instance": (CenteredInstanceConfig, "centered_instance"),
    "bottomup": (BottomUpConfig, "bottomup"),
    "multi_class_bottomup": (BottomUpMultiClassConfig, "multi_class_bottomup"),
    "multi_class_topdown": (TopDownCenteredInstanceMultiClassConfig, "multi_class_topdown"),
    "bottomup_segmentation": (BottomUpSegmentationConfig, "bottomup_segmentation"),
    "centered_instance_segmentation": (
        CenteredInstanceSegmentationConfig,
        "centered_instance_segmentation",
    ),
    "semantic_segmentation": (SemanticSegmentationConfig, "semantic_segmentation"),
}


def get_aug_config(
    intensity_aug: Union[str, Dict, None] = None,
    geometric_aug: Union[str, Dict, None] = None,
) -> Optional[AugmentationConfig]:
    """Expand augmentation shorthands (reference: get_config.py:63).

    Strings: intensity 'uniform_noise'|'gaussian_noise'|'contrast'|
    'brightness'; geometric 'rotation'|'scale'|'translate'|'erase_scale'|
    'mixup'|'flip'. Dicts are merged into the structured config directly.
    """
    if intensity_aug is None and geometric_aug is None:
        return None
    intensity = geometric = None
    if intensity_aug is not None:
        intensity = IntensityConfig()
        if isinstance(intensity_aug, str):
            intensity_aug = [intensity_aug]
        if isinstance(intensity_aug, (list, tuple)):
            for name in intensity_aug:
                setattr(intensity, f"{name}_p", 1.0)
        elif isinstance(intensity_aug, dict):
            intensity = from_dict(IntensityConfig, intensity_aug)
    if geometric_aug is not None:
        geometric = GeometricConfig()
        if isinstance(geometric_aug, str):
            geometric_aug = [geometric_aug]
        if isinstance(geometric_aug, (list, tuple)):
            for name in geometric_aug:
                if name == "rotation":
                    geometric.affine_p = 1.0
                elif name == "scale":
                    geometric.affine_p = 1.0
                elif name == "translate":
                    geometric.translate_width = 0.02
                    geometric.translate_height = 0.02
                    geometric.affine_p = 1.0
                elif name == "erase_scale":
                    geometric.erase_p = 1.0
                elif name == "mixup":
                    geometric.mixup_p = 1.0
                elif name == "flip":
                    geometric.flip_p = 0.5
        elif isinstance(geometric_aug, dict):
            geometric = from_dict(GeometricConfig, geometric_aug)
    return AugmentationConfig(intensity=intensity, geometric=geometric)


def get_backbone_config(backbone: Union[str, Dict] = "unet", **overrides) -> BackboneConfig:
    """Build the oneof backbone config from a preset name or dict (reference: :171)."""
    out = BackboneConfig()
    if isinstance(backbone, dict):
        name = next(iter(backbone))
        leaf_types = {
            "unet": UNetConfig, "convnext": ConvNextConfig,
            "swint": SwinTConfig, "pretrained": PretrainedConfig,
        }
        if name not in leaf_types:
            raise ValueError(
                f"Unknown backbone: {name}; one of {sorted(leaf_types)}"
            )
        leaf = from_dict(leaf_types[name], backbone[name])
        setattr(out, name, leaf)
        return out
    if backbone not in _BACKBONE_PRESETS:
        raise ValueError(
            f"Unknown backbone preset: {backbone}; one of {sorted(_BACKBONE_PRESETS)}"
        )
    leaf = _BACKBONE_PRESETS[backbone](**overrides)
    slot = "unet" if backbone.startswith("unet") else backbone.split("_")[0]
    setattr(out, slot, leaf)
    return out


def get_head_configs(head_configs: Union[str, Dict]) -> HeadConfig:
    """Build the oneof head config from a model-type name or dict (reference: :274)."""
    out = HeadConfig()
    if isinstance(head_configs, str):
        if head_configs not in _HEAD_WRAPPERS:
            raise ValueError(
                f"Unknown model type: {head_configs}; one of {sorted(_HEAD_WRAPPERS)}"
            )
        wrapper_cls, slot = _HEAD_WRAPPERS[head_configs]
        # Default leaves; config inference fills part names/edges at train time.
        import dataclasses as _dc

        wrapper = from_dict(wrapper_cls, {f.name: {} for f in _dc.fields(wrapper_cls)})
        setattr(out, slot, wrapper)
        return out
    # dict keyed by model type
    name = next(iter(head_configs))
    wrapper_cls, slot = _HEAD_WRAPPERS[name]
    setattr(out, slot, from_dict(wrapper_cls, head_configs[name]))
    return out


def get_data_config(
    train_labels_path: Optional[List[str]] = None,
    val_labels_path: Optional[List[str]] = None,
    validation_fraction: float = 0.1,
    scale: float = 1.0,
    ensure_rgb: bool = False,
    ensure_grayscale: bool = False,
    max_height: Optional[int] = None,
    max_width: Optional[int] = None,
    crop_size: Optional[int] = None,
    intensity_aug=None,
    geometric_aug=None,
    **kwargs,
) -> DataConfig:
    """Build a DataConfig from flat kwargs (reference: :506)."""
    cfg = DataConfig(
        train_labels_path=list(train_labels_path) if train_labels_path else None,
        val_labels_path=list(val_labels_path) if val_labels_path else None,
        validation_fraction=validation_fraction,
        preprocessing=PreprocessingConfig(
            scale=scale,
            ensure_rgb=ensure_rgb,
            ensure_grayscale=ensure_grayscale,
            max_height=max_height,
            max_width=max_width,
            crop_size=crop_size,
        ),
    )
    aug = get_aug_config(intensity_aug, geometric_aug)
    if aug is not None:
        cfg.augmentation_config = aug
        cfg.use_augmentations_train = True
    for k, v in kwargs.items():
        setattr(cfg, k, v)
    return cfg


def get_model_config(
    backbone: Union[str, Dict] = "unet",
    head_configs: Union[str, Dict] = "single_instance",
    init_weights: str = "default",
    **backbone_overrides,
) -> ModelConfig:
    """Build a ModelConfig from shorthands (reference: :634)."""
    return ModelConfig(
        init_weights=init_weights,
        backbone_config=get_backbone_config(backbone, **backbone_overrides),
        head_configs=get_head_configs(head_configs),
    )


def get_trainer_config(
    batch_size: int = 4,
    max_epochs: int = 100,
    learning_rate: float = 1e-4,
    optimizer: str = "Adam",
    save_ckpt: bool = False,
    ckpt_dir: Optional[str] = ".",
    run_name: Optional[str] = None,
    seed: Optional[int] = 42,
    **kwargs,
) -> TrainerConfig:
    """Build a TrainerConfig from flat kwargs (reference: :712)."""
    cfg = TrainerConfig(max_epochs=max_epochs, save_ckpt=save_ckpt, ckpt_dir=ckpt_dir,
                        run_name=run_name, seed=seed, optimizer_name=optimizer)
    cfg.train_data_loader.batch_size = batch_size
    cfg.val_data_loader.batch_size = batch_size
    cfg.optimizer.lr = learning_rate
    for k, v in kwargs.items():
        setattr(cfg, k, v)
    return cfg


def get_config(**kwargs) -> TrainingJobConfig:
    """One-shot builder: flat kwargs -> TrainingJobConfig."""
    data_keys = {
        "train_labels_path", "val_labels_path", "validation_fraction", "scale",
        "ensure_rgb", "ensure_grayscale", "max_height", "max_width", "crop_size",
        "intensity_aug", "geometric_aug", "use_same_data_for_val",
    }
    model_keys = {"backbone", "head_configs", "init_weights"}
    import dataclasses as _dc

    backbone_fields = {
        f.name
        for cls_ in (UNetConfig, ConvNextConfig, SwinTConfig)
        for f in _dc.fields(cls_)
    } - {"in_channels"}  # in_channels is inferred from the data
    data_kw = {k: v for k, v in kwargs.items() if k in data_keys}
    model_kw = {k: v for k, v in kwargs.items() if k in model_keys}
    backbone_kw = {k: v for k, v in kwargs.items() if k in backbone_fields}
    trainer_kw = {
        k: v
        for k, v in kwargs.items()
        if k not in data_keys | model_keys | backbone_fields
    }
    cfg = TrainingJobConfig(
        data_config=get_data_config(**data_kw),
        model_config=get_model_config(**model_kw, **backbone_kw),
        trainer_config=get_trainer_config(**trainer_kw),
    )
    # Propagate an explicit output_stride to head leaves so the kwargs API
    # gives "train at this stride" semantics in one knob.
    if "output_stride" in backbone_kw:
        hc = cfg.model_config.head_configs
        wrapper = getattr(hc, hc.which())
        import dataclasses as _dc2

        for f in _dc2.fields(wrapper):
            leaf = getattr(wrapper, f.name)
            if leaf is not None and hasattr(leaf, "output_stride"):
                leaf.output_stride = backbone_kw["output_stride"]
    return cfg
