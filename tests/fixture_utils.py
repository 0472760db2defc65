"""Shared test-fixture derivations (plain functions, importable anywhere)."""

from __future__ import annotations

import os
import tempfile
from pathlib import Path

FIXTURE = "/root/reference/tests/assets/datasets/minimal_instance.pkg.slp"

_SINGLE_DIR = Path(tempfile.gettempdir()) / "sleap_nn_tpu_test_fixtures"


def single_instance_fixture() -> str:
    """A single-instance variant of the minimal fixture (first user instance
    per frame), built once per machine under /tmp.

    single_instance training now hard-errors on multi-instance frames
    (reference parity); training-path tests use this derivation instead.
    """
    out = _SINGLE_DIR / "minimal_single_instance.pkg.slp"
    if out.exists():
        return str(out)
    _SINGLE_DIR.mkdir(parents=True, exist_ok=True)
    from sleap_nn_tpu.io import load_slp

    labels = load_slp(FIXTURE)
    for lf in labels.labeled_frames:
        lf.instances = lf.user_instances[:1]
    tmp = out.with_suffix(".tmp.slp")
    labels.save(str(tmp), embed=True)
    os.replace(tmp, out)  # atomic: safe under parallel test processes
    return str(out)
