"""Inference provenance attached to saved labels.

Parity target: reference sleap_nn/inference/provenance.py:18 — model paths +
config hashes, package versions, timing stats, platform.
"""

from __future__ import annotations

import hashlib
import platform
import sys
import time
from pathlib import Path
from typing import Dict, List, Optional


def _file_sha256(path: Path, limit: int = 1 << 24) -> Optional[str]:
    try:
        h = hashlib.sha256()
        with open(path, "rb") as f:
            h.update(f.read(limit))
        return h.hexdigest()
    except Exception:
        return None


def build_inference_provenance(
    model_dirs: List, stats: Optional[Dict] = None, extra: Optional[Dict] = None
) -> Dict:
    """Build the provenance dict stored on predicted Labels."""
    import jax

    import sleap_nn_tpu

    models = []
    for d in model_dirs:
        d = Path(d)
        entry = {"path": str(d)}
        cfg = d / "training_config.yaml"
        if cfg.exists():
            entry["training_config_sha256"] = _file_sha256(cfg)
        models.append(entry)

    prov = {
        "sleap_nn_tpu_version": sleap_nn_tpu.__version__,
        "jax_version": jax.__version__,
        "platform": platform.platform(),
        "python": sys.version.split()[0],
        "backend": jax.devices()[0].platform if jax.devices() else None,
        "models": models,
        "model_paths": [m["path"] for m in models],
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S"),
    }
    if stats:
        prov["stats"] = dict(stats)
    if extra:
        prov.update(extra)
    return prov
