"""System-info scenario matrix.

Parity target: reference tests/test_system_info.py — TestShortenPath,
TestGetPackageLocation/Info (editable/git/local/conda detection),
driver-compatibility checks (TPU analog: jax/jaxlib series agreement),
TestGetSystemInfoDict and the startup string variants — against
sleap_nn_tpu/system_info.py.
"""

from __future__ import annotations

import json
from types import SimpleNamespace

import pytest

import sleap_nn_tpu.system_info as si


# ------------------------------------------------------------- shorten_path


def test_short_path_unchanged():
    assert si.shorten_path("/a/b/c", 50) == "/a/b/c"


def test_long_path_truncated_with_middle_ellipsis():
    p = "/very/long/path/" + "x" * 80
    out = si.shorten_path(p, 30)
    assert len(out) == 30
    assert "..." in out
    assert out.startswith("/very")
    assert out.endswith("x")


def test_exact_length_unchanged():
    p = "a" * 50
    assert si.shorten_path(p, 50) == p


# ------------------------------------------------------- package locations


def test_package_location_importable():
    loc = si.get_package_location("numpy")
    assert loc and "numpy" in loc


def test_package_location_unknown_is_none():
    assert si.get_package_location("definitely-not-a-package-xyz") is None


def test_package_info_installed():
    info = si.get_package_info("numpy")
    assert info["version"]
    assert info["install_type"] in ("pip", "editable", "git", "local", "conda")
    assert info["location"]


def test_package_info_not_installed():
    info = si.get_package_info("definitely-not-a-package-xyz")
    assert info == {
        "name": "definitely-not-a-package-xyz", "version": None,
        "location": None, "install_type": "not_installed",
    }


class _FakeDist:
    version = "1.2.3"

    def __init__(self, records):
        self._records = records

    def read_text(self, name):
        return self._records.get(name)


def _patch_dist(monkeypatch, records):
    from importlib import metadata

    monkeypatch.setattr(
        metadata, "distribution", lambda name: _FakeDist(records)
    )


def test_package_info_editable_via_direct_url(monkeypatch):
    _patch_dist(monkeypatch, {
        "direct_url.json": json.dumps(
            {"url": "file:///src/pkg", "dir_info": {"editable": True}}
        )
    })
    assert si.get_package_info("numpy")["install_type"] == "editable"


def test_package_info_git_via_direct_url(monkeypatch):
    _patch_dist(monkeypatch, {
        "direct_url.json": json.dumps(
            {"url": "https://github.com/x/y", "vcs_info": {"vcs": "git"}}
        )
    })
    info = si.get_package_info("numpy")
    assert info["install_type"] == "git"
    assert info["vcs_url"] == "https://github.com/x/y"


def test_package_info_local_file_url(monkeypatch):
    _patch_dist(monkeypatch, {
        "direct_url.json": json.dumps({"url": "file:///downloads/pkg.whl"})
    })
    assert si.get_package_info("numpy")["install_type"] == "local"


def test_package_info_conda_via_installer(monkeypatch):
    _patch_dist(monkeypatch, {"INSTALLER": "conda\n"})
    assert si.get_package_info("numpy")["install_type"] == "conda"


def test_package_info_plain_pip(monkeypatch):
    _patch_dist(monkeypatch, {"INSTALLER": "pip\n"})
    assert si.get_package_info("numpy")["install_type"] == "pip"


# ----------------------------------------------- jax/jaxlib compatibility


def test_jax_jaxlib_compatible_in_env():
    ok, msg = si.check_jax_jaxlib_compatibility()
    assert ok is True
    assert "compatible" in msg


def test_jax_jaxlib_mismatch_detected(monkeypatch):
    import jax
    import jaxlib

    monkeypatch.setattr(jax, "__version__", "0.9.1")
    monkeypatch.setattr(jaxlib, "__version__", "0.4.30")
    ok, msg = si.check_jax_jaxlib_compatibility()
    assert ok is False
    assert "different release series" in msg


# ------------------------------------------------------ system info dict


def test_system_info_dict_expected_keys():
    info = si.get_system_info_dict()
    for k in ("python", "platform", "jax", "backend", "devices",
              "device_count", "process_index", "process_count", "packages",
              "jax_jaxlib_compatible"):
        assert k in info, k
    assert info["backend"] == "cpu"
    assert info["device_count"] == 8  # virtual CPU mesh from conftest


def test_system_info_packages_include_expected():
    pkgs = si.get_system_info_dict()["packages"]
    for name in ("jax", "flax", "optax", "numpy"):
        assert pkgs[name]["version"], name


# -------------------------------------------------------- startup string


def test_startup_string_cpu_only_wording():
    s = si.get_startup_info_string(run_smoke_test=False)
    assert "CPU only" in s
    assert "jax" in s
    assert "compatible" in s


def test_startup_string_tpu_wording(monkeypatch):
    monkeypatch.setattr(si, "get_system_info_dict", lambda: {
        "python": "3.12", "platform": "linux", "jax": "0.9",
        "backend": "tpu", "devices": ["TPU0"], "device_count": 4,
        "process_index": 0, "process_count": 1,
        "jax_jaxlib_message": "jax ok", "packages": {},
    })
    s = si.get_startup_info_string(run_smoke_test=False)
    assert "TPU (4 chips)" in s


def test_startup_string_single_chip_singular(monkeypatch):
    monkeypatch.setattr(si, "get_system_info_dict", lambda: {
        "python": "3.12", "platform": "linux", "jax": "0.9",
        "backend": "tpu", "devices": ["TPU0"], "device_count": 1,
        "process_index": 0, "process_count": 1,
        "jax_jaxlib_message": "jax ok", "packages": {},
    })
    assert "TPU (1 chip)" in si.get_startup_info_string(run_smoke_test=False)


def test_startup_string_lists_not_installed_packages(monkeypatch):
    monkeypatch.setattr(si, "get_system_info_dict", lambda: {
        "python": "3.12", "platform": "linux", "jax": "0.9",
        "backend": "cpu", "devices": [], "device_count": 0,
        "process_index": 0, "process_count": 1,
        "jax_jaxlib_message": "jax ok",
        "packages": {"ghost": {"version": None, "location": None,
                               "install_type": "not_installed"}},
    })
    assert "ghost: not installed" in si.get_startup_info_string(
        run_smoke_test=False
    )


def test_print_system_info_prints(capsys):
    si.print_system_info(run_smoke_test=False)
    out = capsys.readouterr().out
    assert "sleap-nn-tpu system report" in out


def test_smoke_test_runs_on_cpu():
    out = si.test_device_operations()
    assert out["ok"] is True
    assert out["elapsed_s"] >= 0
