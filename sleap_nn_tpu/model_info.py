"""Model directory inspection (parity: reference sleap_nn/model_info.py:162)."""

from __future__ import annotations

from pathlib import Path
from typing import Dict

from sleap_nn_tpu.config import (
    TrainingJobConfig,
    get_backbone_config,
    get_backbone_type_from_cfg,
    get_model_type_from_cfg,
    resolve_model_dir,
)


def get_model_info(path) -> Dict:
    """Summarize a trained model dir: type, backbone, params, training log."""
    model_dir = resolve_model_dir(path)
    cfg = TrainingJobConfig.load_yaml(model_dir / "training_config.yaml")
    backbone_type = get_backbone_type_from_cfg(cfg)
    backbone = get_backbone_config(cfg)
    info = {
        "model_dir": str(model_dir),
        "model_type": get_model_type_from_cfg(cfg),
        "backbone": backbone_type,
        "total_params": cfg.model_config.total_params,
        "max_stride": backbone.max_stride,
        "output_stride": backbone.output_stride,
        "filters": getattr(backbone, "filters", None),
        "skeleton_nodes": [],
        "has_checkpoint": (model_dir / "best.ckpt").exists(),
        "epochs_trained": None,
        "best_val_loss": None,
    }
    skels = cfg.data_config.skeletons or []
    if skels:
        info["skeleton_nodes"] = [n["name"] for n in skels[0].get("nodes", [])]

    log = model_dir / "training_log.csv"
    if log.exists():
        import csv

        with open(log) as f:
            rows = list(csv.DictReader(f))
        if rows:
            info["epochs_trained"] = len(rows)
            vals = [float(r["val/loss"]) for r in rows if r.get("val/loss")]
            if vals:
                info["best_val_loss"] = min(vals)
    return info


def print_model_info(path):
    info = get_model_info(path)
    for k, v in info.items():
        print(f"{k}: {v}")
    return info
