"""System / accelerator report (parity: reference sleap_nn/system_info.py).

Reports the JAX device topology (TPU chips / ICI mesh / CPU hosts) instead
of the reference's CUDA driver checks, plus a device smoke test.
"""

from __future__ import annotations

import platform
import sys
from typing import Dict


def get_system_info_dict() -> Dict:
    """Collect platform + device info (reference: system_info.py:207)."""
    import jax

    info = {
        "python": sys.version.split()[0],
        "platform": platform.platform(),
        "jax": jax.__version__,
        "backend": None,
        "devices": [],
        "device_count": 0,
        "process_index": 0,
        "process_count": 1,
    }
    try:
        devices = jax.devices()
        info["backend"] = devices[0].platform if devices else None
        info["devices"] = [str(d) for d in devices]
        info["device_count"] = len(devices)
        info["process_index"] = jax.process_index()
        info["process_count"] = jax.process_count()
    except Exception as e:
        info["error"] = str(e)
    for mod in ("flax", "optax", "numpy"):
        try:
            info[mod] = __import__(mod).__version__
        except Exception:
            info[mod] = None
    return info


def test_device_operations() -> Dict:
    """Smoke test: matmul on the default device (reference: system_info.py:278)."""
    import time

    import jax
    import jax.numpy as jnp

    out = {"ok": False}
    try:
        x = jnp.ones((256, 256))
        t0 = time.perf_counter()
        y = jax.jit(lambda a: a @ a)(x)
        jax.block_until_ready(y)
        out["ok"] = bool(float(y[0, 0]) == 256.0)
        out["elapsed_s"] = round(time.perf_counter() - t0, 4)
        out["device"] = str(y.device)
    except Exception as e:
        out["error"] = str(e)
    return out


def get_startup_info_string() -> str:
    info = get_system_info_dict()
    lines = [
        f"sleap-nn-tpu system report",
        f"  python: {info['python']}  jax: {info['jax']}  platform: {info['platform']}",
        f"  backend: {info['backend']}  devices: {info['device_count']}"
        f"  (process {info['process_index']}/{info['process_count']})",
    ]
    for d in info["devices"]:
        lines.append(f"    - {d}")
    smoke = test_device_operations()
    lines.append(f"  device smoke test: {'OK' if smoke.get('ok') else 'FAILED'} {smoke}")
    return "\n".join(lines)
