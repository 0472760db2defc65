"""Config utilities (parity: reference sleap_nn/config/utils.py)."""

from __future__ import annotations

import math
from pathlib import Path
from typing import Optional

from sleap_nn_tpu.config.training_job_config import TrainingJobConfig


def get_model_type_from_cfg(cfg: TrainingJobConfig) -> str:
    """Infer the model type from which head leaf is set (reference: utils.py:74)."""
    return cfg.model_config.head_configs.which()


def get_backbone_type_from_cfg(cfg: TrainingJobConfig) -> str:
    """Infer the backbone type from which backbone leaf is set."""
    return cfg.model_config.backbone_config.which()


def get_backbone_config(cfg: TrainingJobConfig):
    bc = cfg.model_config.backbone_config
    return getattr(bc, bc.which())


def get_head_config(cfg: TrainingJobConfig):
    hc = cfg.model_config.head_configs
    return getattr(hc, hc.which())


def check_output_strides(cfg: TrainingJobConfig) -> TrainingJobConfig:
    """Ensure backbone output_stride covers the finest head stride.

    Mirrors reference check_output_strides (config/utils.py:106): the
    backbone's output stride is lowered to min(head strides) so every head
    has a feature map to bind to.
    """
    backbone_cfg = get_backbone_config(cfg)
    head_cfg = get_head_config(cfg)
    strides = []
    for leaf_name in ("confmaps", "pafs", "class_maps", "segmentation", "center", "offsets"):
        leaf = getattr(head_cfg, leaf_name, None)
        if leaf is not None and getattr(leaf, "output_stride", None) is not None:
            strides.append(leaf.output_stride)
    if strides:
        min_stride = min(strides)
        if backbone_cfg.output_stride > min_stride:
            backbone_cfg.output_stride = min_stride
        for s in strides:
            if s % backbone_cfg.output_stride != 0 or (
                s & (s - 1)
            ) != 0:  # power-of-two check
                raise ValueError(f"Head output strides must be powers of two; got {s}.")
    return cfg


def resolve_model_dir(path) -> Path:
    """Resolve a model dir or a file inside it to the dir containing
    training_config.yaml (reference: config/utils.py:11).

    Accepted forms (reference tests/inference/test_compat_shims.py): the
    dir itself (trailing slash fine), a ``*.ckpt`` inside it, a
    ``training_config.yaml``/``.yml``/``.json``, or any other file in the
    dir — all resolve to the containing model dir. (``load_model``
    additionally honors an explicitly-given ``.ckpt`` as the weights
    source.)
    """
    p = Path(path)
    if p.is_file() or (p.is_dir() and p.suffix.lower() == ".ckpt"):
        # Orbax checkpoints are directories named *.ckpt.
        p = p.parent
    if (p / "training_config.yaml").exists():
        return p
    if (p / "training_config.json").exists() and (p / "best_model.h5").exists():
        # SLEAP-v1 legacy model dir (Keras weights + jsonpickle config) —
        # the inference loader auto-converts (reference loaders.py:193-206).
        return p
    raise FileNotFoundError(f"No training_config.yaml under {path}")
