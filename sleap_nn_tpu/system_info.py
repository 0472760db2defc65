"""System / accelerator report (parity: reference sleap_nn/system_info.py).

Reports the JAX device topology (TPU chips / ICI mesh / CPU hosts) instead
of the reference's CUDA driver checks, plus a device smoke test, package
install provenance (editable / git / local / pip / conda), and a
jax<->jaxlib version-compatibility check standing in for the reference's
CUDA-driver compatibility matrix.
"""

from __future__ import annotations

import platform
import sys
from pathlib import Path
from typing import Dict, Optional, Tuple

#: Packages reported in ``get_system_info_dict()["packages"]``
#: (reference system_info.py PACKAGES, with the torch stack swapped for jax).
PACKAGES = (
    "jax", "jaxlib", "flax", "optax", "orbax-checkpoint", "chex",
    "einops", "numpy",
)


def shorten_path(path: str, max_len: int = 50) -> str:
    """Middle-ellipsis long paths for display (reference: system_info.py:28)."""
    s = str(path)
    if len(s) <= max_len:
        return s
    keep = max_len - 3
    head = keep // 2
    return s[:head] + "..." + s[len(s) - (keep - head):]


def get_package_location(name: str) -> Optional[str]:
    """Installed location of a package (reference: :143).

    Tries the imported module's ``__file__`` first, then falls back to the
    distribution metadata path for packages that cannot be imported.
    """
    mod_name = name.replace("-", "_")
    try:
        mod = __import__(mod_name)
        f = getattr(mod, "__file__", None)
        if f:
            return str(Path(f).parent)
    except Exception:
        pass
    try:
        from importlib import metadata

        dist = metadata.distribution(name)
        located = getattr(dist, "_path", None)
        if located is not None:
            return str(Path(located).parent)
    except Exception:
        pass
    return None


def get_package_info(name: str) -> Dict:
    """Version + location + install type for one package (reference: :216).

    ``install_type`` is one of ``editable`` / ``git`` / ``local`` /
    ``conda`` / ``pip`` / ``not_installed`` — resolved from the
    distribution's ``direct_url.json`` (PEP 610) and ``INSTALLER`` records.
    """
    from importlib import metadata

    info: Dict = {"name": name, "version": None, "location": None,
                  "install_type": "not_installed"}
    try:
        dist = metadata.distribution(name)
    except metadata.PackageNotFoundError:
        return info
    info["version"] = dist.version
    info["location"] = get_package_location(name)
    info["install_type"] = "pip"
    try:
        import json

        direct = dist.read_text("direct_url.json")
        if direct:
            d = json.loads(direct)
            if d.get("dir_info", {}).get("editable"):
                info["install_type"] = "editable"
            elif "vcs_info" in d:
                info["install_type"] = "git"
                info["vcs_url"] = d.get("url")
            elif d.get("url", "").startswith("file://"):
                info["install_type"] = "local"
    except Exception:
        pass
    try:
        installer = (dist.read_text("INSTALLER") or "").strip()
        if installer == "conda":
            info["install_type"] = "conda"
    except Exception:
        pass
    return info


def check_jax_jaxlib_compatibility() -> Tuple[Optional[bool], str]:
    """jax/jaxlib version agreement (the TPU stand-in for the reference's
    CUDA driver compatibility check, reference: :96-140).

    jax requires jaxlib of the same release series; a mismatched pair is
    the TPU-stack equivalent of an incompatible driver.
    """
    try:
        import jax
        import jaxlib
    except Exception as e:
        return None, f"jax/jaxlib not importable: {e}"
    jv, lv = jax.__version__, jaxlib.__version__
    j_parts, l_parts = jv.split("."), lv.split(".")
    if j_parts[:2] != l_parts[:2]:
        return False, (
            f"jax {jv} and jaxlib {lv} are from different release series; "
            "reinstall matching versions."
        )
    return True, f"jax {jv} / jaxlib {lv} compatible"


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
    info["packages"] = {name: get_package_info(name) for name in PACKAGES}
    ok, msg = check_jax_jaxlib_compatibility()
    info["jax_jaxlib_compatible"] = ok
    info["jax_jaxlib_message"] = msg
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


def get_startup_info_string(run_smoke_test: bool = True) -> str:
    """Human-readable startup banner (reference: system_info.py:413).

    Backend line reads ``TPU (N chips)`` / ``CPU only`` per the reference's
    accelerator strings; package rows show version, install type and a
    shortened location.
    """
    info = get_system_info_dict()
    backend = info["backend"]
    if backend == "tpu" or backend == "axon":
        accel = f"TPU ({info['device_count']} chip{'s' if info['device_count'] != 1 else ''})"
    elif backend == "cpu":
        accel = "CPU only"
    else:
        accel = f"{backend} ({info['device_count']} devices)"
    lines = [
        "sleap-nn-tpu system report",
        f"  python: {info['python']}  jax: {info['jax']}  platform: {info['platform']}",
        f"  accelerator: {accel}"
        f"  (process {info['process_index']}/{info['process_count']})",
    ]
    for d in info["devices"]:
        lines.append(f"    - {d}")
    lines.append(f"  {info['jax_jaxlib_message']}")
    for name, pkg in info["packages"].items():
        if pkg["version"] is None:
            lines.append(f"  {name}: not installed")
        else:
            loc = shorten_path(pkg["location"] or "?", 40)
            lines.append(
                f"  {name}: {pkg['version']} ({pkg['install_type']}, {loc})"
            )
    if run_smoke_test:
        smoke = test_device_operations()
        lines.append(
            f"  device smoke test: {'OK' if smoke.get('ok') else 'FAILED'} {smoke}"
        )
    return "\n".join(lines)


def print_system_info(run_smoke_test: bool = True) -> None:
    """Print the startup banner (reference: system_info.py:454)."""
    print(get_startup_info_string(run_smoke_test=run_smoke_test))
