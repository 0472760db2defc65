"""Model directory inspection (parity: reference sleap_nn/model_info.py:10-439).

``sleap-nn-tpu info <path>`` renders the same six sections as the reference:
Model Info (run name, type, backbone/head summaries, params, skeleton),
Data (train/val paths, preprocessing, augmentation), Training (optimizer,
scheduler, early stopping), Training Results (from training_log.csv),
Evaluation Metrics (from metrics.<split>.<idx>.npz, any of the three
historical naming conventions), and Files (dir listing
with sizes). Accepts either a model directory or a bare training-config
YAML (config-only sections in that case).
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional, Tuple

from sleap_nn_tpu.config import (
    TrainingJobConfig,
    get_backbone_config,
    get_backbone_type_from_cfg,
    get_model_type_from_cfg,
    resolve_model_dir,
)


# -- formatting helpers (reference model_info.py:10-45) ----------------------


def _format_param_count(count) -> str:
    if count is None:
        return "N/A"
    count = float(count)
    if count >= 1e6:
        return f"{count / 1e6:.2f}M"
    if count >= 1e3:
        return f"{count / 1e3:.1f}K"
    return str(int(count))


def _format_model_type(model_type: Optional[str]) -> str:
    if model_type is None:
        return "Unknown"
    return model_type.replace("_", " ").title()


def _format_file_size(size_bytes: int) -> str:
    size = float(size_bytes)
    for unit in ("B", "KB", "MB", "GB"):
        if size < 1024 or unit == "GB":
            return f"{size:.1f} {unit}" if unit != "B" else f"{int(size)} B"
        size /= 1024
    return f"{size:.1f} GB"


def _shorten_path(path: str, max_len: int = 50) -> str:
    if len(path) <= max_len:
        return path
    return "..." + path[-(max_len - 3):]


def _format_backbone_summary(cfg, backbone_type: Optional[str]) -> str:
    """One-line backbone summary (reference model_info.py:47)."""
    if backbone_type is None:
        return "Unknown"
    bb = get_backbone_config(cfg)
    if bb is None:
        return backbone_type
    if backbone_type == "unet":
        parts = [f"{bb.filters} filters"]
        if getattr(bb, "filters_rate", None) is not None:
            parts.append(f"{bb.filters_rate}x rate")
        parts.append(f"stride {bb.max_stride}")
        return f"UNet ({', '.join(parts)})"
    if backbone_type == "convnext":
        return f"ConvNeXt ({getattr(bb, 'model_type', 'custom')}, stride {bb.max_stride})"
    if backbone_type == "swint":
        return f"SwinT ({getattr(bb, 'model_type', 'custom')}, stride {bb.max_stride})"
    if backbone_type == "pretrained":
        return f"Pretrained ({getattr(bb, 'model_name', '?')})"
    return backbone_type


def _format_head_summary(cfg, model_type: Optional[str]) -> str:
    """One-line head summary (reference model_info.py:74)."""
    if model_type is None:
        return "Unknown"
    from sleap_nn_tpu.config.utils import get_head_config

    try:
        head_cfg = get_head_config(cfg)
    except Exception:
        return _format_model_type(model_type)
    parts = []
    confmaps = getattr(head_cfg, "confmaps", None)
    if confmaps is not None:
        parts.append(f"sigma={confmaps.sigma}")
        parts.append(f"output_stride={confmaps.output_stride}")
        part_names = getattr(confmaps, "part_names", None)
        if part_names:
            parts.append(f"{len(part_names)} parts")
    pafs = getattr(head_cfg, "pafs", None)
    if pafs is not None:
        parts.append(f"PAFs (sigma={pafs.sigma}, stride={pafs.output_stride})")
    seg = getattr(head_cfg, "segmentation", None)
    if seg is not None:
        parts.append(f"Segmentation (stride={seg.output_stride})")
    if parts:
        return f"ConfMaps ({', '.join(parts)})" if confmaps is not None else ", ".join(parts)
    return _format_model_type(model_type)


def _load_training_log(model_dir: Path) -> Optional[dict]:
    """Summary stats from training_log.csv (reference model_info.py:104)."""
    log_path = model_dir / "training_log.csv"
    if not log_path.exists():
        return None
    import csv

    with open(log_path) as f:
        rows = list(csv.DictReader(f))
    if not rows:
        return None

    def _safe_float(row, *keys):
        for key in keys:
            v = row.get(key, "")
            if v:
                try:
                    return float(v)
                except ValueError:
                    continue
        return None

    val_losses = []
    for row in rows:
        vl = _safe_float(row, "val_loss", "val/loss")
        ep = row.get("epoch")
        if vl is not None and ep is not None:
            try:
                val_losses.append((int(float(ep)), vl))
            except ValueError:
                continue
    last = rows[-1]
    best = min(val_losses, key=lambda x: x[1]) if val_losses else (None, None)
    try:
        epochs_trained = int(float(last["epoch"])) + 1 if "epoch" in last else len(rows)
    except ValueError:
        epochs_trained = len(rows)
    return {
        "epochs_trained": epochs_trained,
        "final_train_loss": _safe_float(last, "train_loss", "train/loss"),
        "final_val_loss": _safe_float(last, "val_loss", "val/loss"),
        "best_val_loss": best[1],
        "best_val_epoch": best[0],
        "final_lr": _safe_float(last, "learning_rate", "train/lr"),
    }


def _load_available_metrics(model_dir: Path) -> Tuple[Optional[dict], str]:
    """Most recent metrics npz, preferring val (reference :149).

    Split preference is val > train > test; within a split, all known filename
    spellings are candidates and the most recently modified file wins, so a
    re-run eval (or a hand-dropped metrics file) shadows an older one
    regardless of which naming convention produced it.
    """
    from sleap_nn_tpu.evaluation import load_metrics

    for split in ("val", "train", "test"):
        candidates = []
        for idx in range(4):
            for name in (
                f"metrics.{split}.{idx}.npz",          # reference new format
                f"{split}_{idx}_pred_metrics.npz",      # reference old format
                f"metrics.{split}_{idx}.npz",           # this repo pre-round-3
            ):
                p = model_dir / name
                if p.exists():
                    candidates.append(p)
        if candidates:
            latest = max(candidates, key=lambda p: p.stat().st_mtime)
            return load_metrics(latest), split
    return None, ""


# -- structured summary (kept for the Python API) ----------------------------


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
        "backbone_summary": _format_backbone_summary(cfg, backbone_type),
        "head_summary": _format_head_summary(cfg, get_model_type_from_cfg(cfg)),
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
    log = _load_training_log(model_dir)
    if log:
        info["epochs_trained"] = log["epochs_trained"]
        info["best_val_loss"] = log["best_val_loss"]
    return info


# -- rendered report (reference model_info.py:162) ---------------------------


def print_model_info(path):
    """Display model configuration + results in the reference's six tables."""
    from rich.console import Console
    from rich.table import Table

    console = Console()
    p = Path(path)
    if not p.exists():
        console.print(f"[red]Error:[/red] Path not found: {path}")
        raise SystemExit(1)

    if p.is_file() and p.suffix in (".yaml", ".yml"):
        cfg = TrainingJobConfig.load_yaml(p)
        is_model_dir = False
        model_dir = None
    else:
        try:
            model_dir = resolve_model_dir(p)
            cfg = TrainingJobConfig.load_yaml(model_dir / "training_config.yaml")
        except (FileNotFoundError, ValueError):
            console.print(
                f"[red]Error:[/red] No training_config.yaml found in {path}"
            )
            raise SystemExit(1)
        is_model_dir = True

    model_type = get_model_type_from_cfg(cfg)
    backbone_type = get_backbone_type_from_cfg(cfg)

    # --- Table 1: Model Info ---
    table = Table(title="Model Info", show_header=False)
    table.add_column("Property", style="cyan")
    table.add_column("Value", style="white")
    run_name = getattr(cfg.trainer_config, "run_name", None)
    if run_name:
        table.add_row("Run name", str(run_name))
    description = getattr(cfg, "description", None)
    if description:
        table.add_row("Description", str(description))
    table.add_row("Model type", _format_model_type(model_type))
    table.add_row("Backbone", _format_backbone_summary(cfg, backbone_type))
    table.add_row("Head", _format_head_summary(cfg, model_type))
    table.add_row(
        "Total parameters", _format_param_count(cfg.model_config.total_params)
    )
    skels = cfg.data_config.skeletons or []
    if skels:
        nodes = skels[0].get("nodes", [])
        edges = skels[0].get("edges", [])
        names = [n.get("name", str(n)) if isinstance(n, dict) else str(n) for n in nodes]
        table.add_row(
            "Skeleton",
            f"{len(nodes)} {'node' if len(nodes) == 1 else 'nodes'}, "
            f"{len(edges)} {'edge' if len(edges) == 1 else 'edges'}",
        )
        if names:
            table.add_row("Nodes", ", ".join(names))
    console.print(table)

    # --- Table 2: Data ---
    console.print()
    data_table = Table(title="Data", show_header=False)
    data_table.add_column("Property", style="cyan")
    data_table.add_column("Value", style="white")
    train_paths = cfg.data_config.train_labels_path or []
    if train_paths:
        for tp in train_paths:
            data_table.add_row("Training data", _shorten_path(str(tp)))
    else:
        data_table.add_row("Training data", "N/A")
    for vp in (cfg.data_config.val_labels_path or []):
        data_table.add_row("Validation data", _shorten_path(str(vp)))
    pre = cfg.data_config.preprocessing
    parts = [f"scale={pre.scale}"]
    if pre.max_height is not None and pre.max_width is not None:
        parts.append(f"{pre.max_height}x{pre.max_width}")
    parts.append(f"crop={pre.crop_size}" if pre.crop_size is not None else "no crop")
    data_table.add_row("Preprocessing", ", ".join(parts))
    aug = getattr(cfg.data_config, "use_augmentations_train", False)
    data_table.add_row("Augmentations", "Enabled" if aug else "Disabled")
    console.print(data_table)

    # --- Table 3: Training ---
    console.print()
    tr = cfg.trainer_config
    train_table = Table(title="Training", show_header=False)
    train_table.add_column("Property", style="cyan")
    train_table.add_column("Value", style="white")
    opt_name = getattr(tr, "optimizer_name", "Adam")
    lr = getattr(getattr(tr, "optimizer", None), "lr", None)
    train_table.add_row(
        "Optimizer", f"{opt_name} (lr={lr})" if lr is not None else str(opt_name)
    )
    if getattr(tr, "max_epochs", None) is not None:
        train_table.add_row("Max epochs", str(tr.max_epochs))
    bs = getattr(getattr(tr, "train_data_loader", None), "batch_size", None)
    if bs is not None:
        train_table.add_row("Batch size", str(bs))
    sched = getattr(tr, "lr_scheduler", None)
    step_lr = getattr(sched, "step_lr", None) if sched else None
    reduce_lr = getattr(sched, "reduce_lr_on_plateau", None) if sched else None
    if step_lr is not None:
        train_table.add_row(
            "LR scheduler",
            f"StepLR (step={getattr(step_lr, 'step_size', '?')}, "
            f"gamma={getattr(step_lr, 'gamma', '?')})",
        )
    elif reduce_lr is not None:
        train_table.add_row(
            "LR scheduler",
            f"ReduceLROnPlateau (factor={getattr(reduce_lr, 'factor', '?')}, "
            f"patience={getattr(reduce_lr, 'patience', '?')})",
        )
    else:
        train_table.add_row("LR scheduler", "None")
    es = getattr(tr, "early_stopping", None)
    if es is not None and getattr(es, "stop_training_on_plateau", False):
        train_table.add_row(
            "Early stopping",
            f"patience={getattr(es, 'patience', '?')}, "
            f"min_delta={getattr(es, 'min_delta', '?')}",
        )
    else:
        train_table.add_row("Early stopping", "Disabled")
    console.print(train_table)

    if not is_model_dir:
        return

    # --- Table 4: Training Results ---
    log_stats = _load_training_log(model_dir)
    if log_stats is not None:
        console.print()
        results_table = Table(title="Training Results", show_header=False)
        results_table.add_column("Property", style="cyan")
        results_table.add_column("Value", style="white")
        if log_stats["epochs_trained"] is not None:
            results_table.add_row("Epochs trained", str(log_stats["epochs_trained"]))
        if log_stats["final_train_loss"] is not None:
            results_table.add_row(
                "Final train loss", f"{log_stats['final_train_loss']:.6f}"
            )
        if log_stats["final_val_loss"] is not None:
            results_table.add_row(
                "Final val loss", f"{log_stats['final_val_loss']:.6f}"
            )
        if log_stats["best_val_loss"] is not None:
            results_table.add_row(
                "Best val loss",
                f"{log_stats['best_val_loss']:.6f} "
                f"(epoch {log_stats['best_val_epoch']})",
            )
        if log_stats["final_lr"] is not None:
            results_table.add_row("Final LR", f"{log_stats['final_lr']}")
        console.print(results_table)

    # --- Table 5: Evaluation Metrics ---
    metrics, split = _load_available_metrics(model_dir)
    if metrics is not None:
        console.print()
        metrics_table = Table(title=f"Evaluation Metrics ({split})", show_header=False)
        metrics_table.add_column("Metric", style="cyan")
        metrics_table.add_column("Value", style="white")

        def _fmt(key, fmt=".4f"):
            val = metrics.get(key)
            if val is None:
                return "N/A"
            try:
                return f"{float(val):{fmt}}"
            except (TypeError, ValueError):
                return str(val)

        metrics_table.add_row("mOKS", _fmt("mOKS.mOKS"))
        metrics_table.add_row("mAP (OKS)", _fmt("voc_metrics.oks_voc.mAP"))
        metrics_table.add_row("mAR (OKS)", _fmt("voc_metrics.oks_voc.mAR"))
        metrics_table.add_row("Avg distance (px)", _fmt("distance_metrics.avg", ".2f"))
        metrics_table.add_row("Median distance (px)", _fmt("distance_metrics.p50", ".2f"))
        metrics_table.add_row("P95 distance (px)", _fmt("distance_metrics.p95", ".2f"))
        metrics_table.add_row("mPCK", _fmt("pck_metrics.mPCK"))
        metrics_table.add_row("Vis. precision", _fmt("visibility_metrics.precision"))
        metrics_table.add_row("Vis. recall", _fmt("visibility_metrics.recall"))
        console.print(metrics_table)

    # --- Table 6: Files ---
    console.print()
    files_table = Table(title="Files")
    files_table.add_column("File", style="cyan")
    files_table.add_column("Size", style="white", justify="right")
    entries = sorted(
        (f for f in model_dir.iterdir() if not f.name.startswith(".")),
        key=lambda f: f.name,
    )
    for f in entries:
        if f.is_dir():
            # orbax checkpoints are directories; report their total size.
            size = sum(p.stat().st_size for p in f.rglob("*") if p.is_file())
            files_table.add_row(f.name + "/", _format_file_size(size))
        else:
            files_table.add_row(f.name, _format_file_size(f.stat().st_size))
    console.print(files_table)
