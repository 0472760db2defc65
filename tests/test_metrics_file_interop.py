"""Metrics npz interop with the reference's files and naming conventions.

Parity target: reference evaluation.py:1999 ``load_metrics`` (model-dir
arg + split/dataset_idx, new/old naming, pickled-``metrics``/old-group npz
formats, test→val fallback) driven against the reference's OWN metrics
files in tests/assets/model_ckpts/single_instance_with_metrics — plus the
round-trip contract that files we write are readable by the reference's
loader logic (pickled ``metrics`` key first) and ship the ``.json``
sibling for non-Python consumers.
"""

import json
from pathlib import Path

import numpy as np
import pytest

from sleap_nn_tpu.evaluation import load_metrics, save_metrics_npz

REF_DIR = Path(
    "/root/reference/tests/assets/model_ckpts/single_instance_with_metrics"
)


# ── reading the reference's own files ────────────────────────────────────────


def test_loads_reference_npz_file_directly():
    m = load_metrics(REF_DIR / "test_pred_metrics.npz")
    # Nested (reference) access style:
    assert isinstance(m["mOKS"], dict) and "mOKS" in m["mOKS"]
    # Flat access style:
    assert np.isclose(float(m["mOKS.mOKS"]), float(m["mOKS"]["mOKS"]))
    for group in ("voc_metrics", "distance_metrics", "pck_metrics",
                  "visibility_metrics"):
        assert group in m


def test_loads_reference_model_dir_old_naming():
    # {split}_{idx}_pred_metrics.npz is the reference's OLD convention.
    m = load_metrics(REF_DIR, split="val", dataset_idx=0)
    assert "mOKS" in m


def test_reference_dir_test_split_resolves_directly():
    m_test = load_metrics(REF_DIR, split="test")
    direct = load_metrics(REF_DIR / "test_pred_metrics.npz")
    assert float(m_test["mOKS"]["mOKS"]) == float(direct["mOKS"]["mOKS"])


def test_test_to_val_fallback(tmp_path):
    save_metrics_npz({"mOKS": {"mOKS": 0.5}}, tmp_path / "metrics.val.0.npz")
    m = load_metrics(tmp_path, split="test")  # no test file -> val fallback
    assert float(m["mOKS"]["mOKS"]) == 0.5


def test_missing_metrics_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        load_metrics(tmp_path, split="val")


def test_legacy_repo_naming_still_found(tmp_path):
    # Files written by this repo before round 3: metrics.{split}_{idx}.npz.
    save_metrics_npz({"mOKS": {"mOKS": 0.7}}, tmp_path / "metrics.val_0.npz")
    m = load_metrics(tmp_path, split="val")
    assert float(m["mOKS"]["mOKS"]) == 0.7


# ── files we write are reference-readable ────────────────────────────────────


NESTED = {
    "mOKS": {"mOKS": 0.91},
    "voc_metrics": {"oks_voc.mAP": 0.5},
    "distance_metrics": {"avg": 2.5, "dists": np.array([1.0, 4.0])},
}


def test_saved_npz_has_pickled_metrics_key(tmp_path):
    p = tmp_path / "m.npz"
    save_metrics_npz(NESTED, p)
    with np.load(p, allow_pickle=True) as data:
        # The reference's _load_npz_metrics reads this key FIRST.
        nested = data["metrics"].item()
    assert nested["mOKS"]["mOKS"] == 0.91
    assert nested["voc_metrics"]["oks_voc.mAP"] == 0.5


def test_saved_npz_keeps_flat_keys(tmp_path):
    p = tmp_path / "m.npz"
    save_metrics_npz(NESTED, p)
    m = load_metrics(p)
    assert float(m["mOKS.mOKS"]) == 0.91
    assert float(m["distance_metrics.avg"]) == 2.5


def test_json_sibling_written_and_json_safe(tmp_path):
    p = tmp_path / "m.npz"
    save_metrics_npz(NESTED, p)
    sib = tmp_path / "m.json"
    assert sib.exists()
    d = json.loads(sib.read_text())
    assert d["mOKS"]["mOKS"] == 0.91
    # Bulk per-pair arrays are pruned from the JSON sibling (kept in the
    # npz) — reference _prune_json_bloat behavior.
    assert "dists" not in d["distance_metrics"]
    m = load_metrics(p)
    assert list(np.asarray(m["distance_metrics"]["dists"])) == [1.0, 4.0]


def test_json_sibling_nan_becomes_null(tmp_path):
    p = tmp_path / "m.npz"
    save_metrics_npz({"distance_metrics": {"avg": float("nan")}}, p)
    d = json.loads((tmp_path / "m.json").read_text())
    assert d["distance_metrics"]["avg"] is None


def test_json_sibling_numpy_nan_scalar_becomes_null(tmp_path):
    # np.generic NaN (the common "no matches" mOKS case) must serialize as
    # null, not a bare NaN token that JSON.parse rejects.
    p = tmp_path / "m.npz"
    save_metrics_npz(
        {"mOKS": {"mOKS": np.float64("nan"), "inf": np.float32("inf")}}, p
    )
    text = (tmp_path / "m.json").read_text()
    assert "NaN" not in text and "Infinity" not in text
    d = json.loads(text)
    assert d["mOKS"]["mOKS"] is None and d["mOKS"]["inf"] is None


def test_model_info_discovers_reference_fixture_metrics(capsys):
    # model_info's discovery covers the reference old naming now.
    from sleap_nn_tpu.model_info import _load_available_metrics

    metrics, split = _load_available_metrics(REF_DIR)
    assert metrics is not None and split == "val"
    assert "mOKS.mOKS" in metrics
