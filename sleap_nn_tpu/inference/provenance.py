"""Inference provenance attached to saved labels.

Parity target: reference sleap_nn/inference/provenance.py:18-290 —
``build_inference_provenance`` (model paths + config hashes, timestamps,
input lineage, frame selection, inference/tracking params, device, CLI
args, system info), ``build_tracking_only_provenance`` and
``merge_provenance`` — with TPU-native system fields (jax version, XLA
backend, device count) in place of the reference's CUDA/driver fields.
"""

from __future__ import annotations

import hashlib
import platform
import sys
import time
from datetime import datetime
from pathlib import Path
from typing import Any, Dict, List, Optional, Union


def _file_sha256(path: Path, limit: int = 1 << 24) -> Optional[str]:
    try:
        h = hashlib.sha256()
        with open(path, "rb") as f:
            h.update(f.read(limit))
        return h.hexdigest()
    except Exception:
        return None


def _posix(p) -> str:
    return Path(p).resolve().as_posix() if isinstance(p, (str, Path)) else str(p)


def _system_info_fields() -> Dict:
    """Compact TPU-native system summary for provenance (never raises)."""
    import jax

    info: Dict[str, Any] = {
        "python_version": sys.version.split()[0],
        "platform": platform.platform(),
        "jax_version": jax.__version__,
    }
    try:
        # Only report devices when a backend already exists: jax.devices()
        # INITIALIZES the platform, and on a host whose pinned accelerator
        # is remote-attached that dials the link — a tracking-only retrack
        # (no compute) would hang here if the link is down. Provenance is
        # a bystander; it must never be the first backend touch.
        from jax._src import xla_bridge as _xb

        initialized = getattr(_xb, "backends_are_initialized", lambda: True)()
        devs = jax.devices() if initialized else []
        info["accelerator"] = devs[0].platform if devs else None
        info["device_count"] = len(devs) if devs else None
    except Exception:
        info["accelerator"] = None
    return info


def build_inference_provenance(
    model_dirs: Optional[List] = None,
    stats: Optional[Dict] = None,
    extra: Optional[Dict] = None,
    *,
    model_type: Optional[str] = None,
    start_time: Optional[datetime] = None,
    end_time: Optional[datetime] = None,
    input_labels=None,
    input_path: Optional[Union[str, Path]] = None,
    frames_processed: Optional[int] = None,
    frames_total: Optional[int] = None,
    frame_selection_method: Optional[str] = None,
    inference_params: Optional[Dict[str, Any]] = None,
    tracking_params: Optional[Dict[str, Any]] = None,
    device: Optional[str] = None,
    cli_args: Optional[Dict[str, Any]] = None,
    include_system_info: bool = True,
) -> Dict:
    """Build the provenance dict stored on predicted Labels (reference: :18).

    ``model_dirs``/``stats``/``extra`` keep this module's original
    lightweight call shape (the predictor's per-run stats land under
    ``"stats"``); the keyword surface mirrors the reference builder.
    """
    import jax

    import sleap_nn_tpu

    prov: Dict[str, Any] = {}

    # Timestamps + runtime.
    if start_time is not None:
        prov["inference_start_timestamp"] = start_time.isoformat()
    if end_time is not None:
        prov["inference_end_timestamp"] = end_time.isoformat()
    if start_time is not None and end_time is not None:
        prov["inference_runtime_seconds"] = (end_time - start_time).total_seconds()

    prov["sleap_nn_tpu_version"] = sleap_nn_tpu.__version__
    prov["jax_version"] = jax.__version__
    prov["platform"] = platform.platform()
    prov["python"] = sys.version.split()[0]
    try:
        prov["backend"] = jax.devices()[0].platform if jax.devices() else None
    except Exception:
        prov["backend"] = None
    prov["timestamp"] = time.strftime("%Y-%m-%dT%H:%M:%S")

    # Model lineage: absolute POSIX paths + training-config hashes.
    if model_dirs is not None:
        models = []
        for d in model_dirs:
            d = Path(d)
            entry: Dict[str, Any] = {"path": str(d)}
            cfg = d / "training_config.yaml"
            if cfg.exists():
                entry["training_config_sha256"] = _file_sha256(cfg)
            models.append(entry)
        prov["models"] = models
        prov["model_paths"] = [_posix(m["path"]) for m in models]
    if model_type is not None:
        prov["model_type"] = model_type

    # Input data lineage.
    if input_path is not None:
        prov["source_file"] = _posix(input_path)
    if input_labels is not None and hasattr(input_labels, "provenance"):
        input_prov = dict(getattr(input_labels, "provenance") or {})
        if input_prov:
            prov["input_provenance"] = input_prov
            if "filename" in input_prov:
                prov["source_labels"] = input_prov["filename"]

    # Frame selection.
    if frames_processed is not None or frames_total is not None:
        frame_info: Dict[str, Any] = {}
        if frame_selection_method is not None:
            frame_info["method"] = frame_selection_method
        if frames_processed is not None:
            frame_info["frames_processed"] = frames_processed
        if frames_total is not None:
            frame_info["frames_total"] = frames_total
        prov["frame_selection"] = frame_info

    # Inference / tracking parameter capture (None values dropped).
    if inference_params is not None:
        clean = {
            k: (v.as_posix() if isinstance(v, Path) else v)
            for k, v in inference_params.items()
            if v is not None
        }
        if clean:
            prov["inference_config"] = clean
    if tracking_params is not None:
        clean = {k: v for k, v in tracking_params.items() if v is not None}
        if clean:
            prov["tracking_config"] = clean

    if device is not None:
        prov["device"] = device
    if cli_args is not None:
        clean = {k: v for k, v in cli_args.items() if v is not None}
        if clean:
            prov["cli_args"] = clean

    if include_system_info:
        try:
            prov["system_info"] = _system_info_fields()
        except Exception:
            pass  # provenance must never fail inference

    if stats:
        prov["stats"] = dict(stats)
    if extra:
        prov.update(extra)
    return prov


def build_tracking_only_provenance(
    input_labels=None,
    input_path: Optional[Union[str, Path]] = None,
    start_time: Optional[datetime] = None,
    end_time: Optional[datetime] = None,
    tracking_params: Optional[Dict[str, Any]] = None,
    frames_processed: Optional[int] = None,
    include_system_info: bool = True,
) -> Dict:
    """Provenance for a tracking-only run (no model inference; reference: :186)."""
    import sleap_nn_tpu

    prov: Dict[str, Any] = {}
    if start_time is not None:
        prov["tracking_start_timestamp"] = start_time.isoformat()
    if end_time is not None:
        prov["tracking_end_timestamp"] = end_time.isoformat()
    if start_time is not None and end_time is not None:
        prov["tracking_runtime_seconds"] = (end_time - start_time).total_seconds()
    prov["sleap_nn_tpu_version"] = sleap_nn_tpu.__version__
    prov["pipeline_type"] = "tracking_only"
    if input_path is not None:
        prov["source_file"] = _posix(input_path)
    if input_labels is not None and hasattr(input_labels, "provenance"):
        input_prov = dict(getattr(input_labels, "provenance") or {})
        if input_prov:
            prov["input_provenance"] = input_prov
            if "filename" in input_prov:
                prov["source_labels"] = input_prov["filename"]
    if frames_processed is not None:
        prov["frames_processed"] = frames_processed
    if tracking_params is not None:
        clean = {k: v for k, v in tracking_params.items() if v is not None}
        if clean:
            prov["tracking_config"] = clean
    if include_system_info:
        try:
            prov["system_info"] = _system_info_fields()
        except Exception:
            pass
    return prov


def merge_provenance(
    base_provenance: Dict[str, Any],
    additional: Dict[str, Any],
    overwrite: bool = True,
) -> Dict[str, Any]:
    """Merge provenance dicts without mutating either input (reference: :272)."""
    result = dict(base_provenance)
    for key, value in additional.items():
        if key not in result or overwrite:
            result[key] = value
    return result
