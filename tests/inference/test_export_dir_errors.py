"""Export-dir loading error matrix.

Reference scenario source: tests/inference/test_factory_export.py —
missing metadata/model file, unrecognized runtime, corrupted artifacts.
Targets sleap_nn_tpu/export/exporter.py::load_exported_model and
Predictor.from_export_dir (reference predictor.py:1124).
"""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from sleap_nn_tpu.export import export_model
from sleap_nn_tpu.export.exporter import ExportMetadata, load_exported_model
from sleap_nn_tpu.inference.predictor import Predictor

CKPTS = Path("/root/reference/tests/assets/model_ckpts")


@pytest.fixture(scope="module")
def export_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("exp") / "si"
    export_model(CKPTS / "minimal_instance_single_instance",
                 output_dir=out, batch_size=1, peak_threshold=0.1)
    return out


def test_missing_metadata_raises(tmp_path):
    with pytest.raises(FileNotFoundError, match="metadata.json"):
        load_exported_model(tmp_path)


def test_unknown_runtime_raises(export_dir):
    with pytest.raises(ValueError, match="Unknown runtime"):
        load_exported_model(export_dir, runtime="onnx")


def test_runtime_mismatch_raises(export_dir):
    with pytest.raises(ValueError, match="metadata names"):
        load_exported_model(export_dir, runtime="savedmodel")


def test_missing_artifact_raises(export_dir, tmp_path):
    broken = tmp_path / "broken"
    broken.mkdir()
    (broken / "metadata.json").write_text(
        (export_dir / "metadata.json").read_text())
    with pytest.raises(FileNotFoundError):
        load_exported_model(broken)


def test_corrupted_artifact_hash_mismatch(export_dir, tmp_path):
    broken = tmp_path / "corrupt"
    broken.mkdir()
    (broken / "metadata.json").write_text(
        (export_dir / "metadata.json").read_text())
    meta = ExportMetadata.from_json((export_dir / "metadata.json").read_text())
    blob = bytearray((export_dir / meta.artifact).read_bytes())
    blob[len(blob) // 2] ^= 0xFF
    (broken / meta.artifact).write_bytes(bytes(blob))
    with pytest.raises(ValueError, match="hash mismatch"):
        load_exported_model(broken)


def test_tampered_metadata_model_type(export_dir, tmp_path):
    tampered = tmp_path / "tampered"
    tampered.mkdir()
    meta = json.loads((export_dir / "metadata.json").read_text())
    meta["model_type"] = "hypermodel"
    (tampered / "metadata.json").write_text(json.dumps(meta))
    src = ExportMetadata.from_json((export_dir / "metadata.json").read_text())
    (tampered / src.artifact).write_bytes(
        (export_dir / src.artifact).read_bytes())
    with pytest.raises(ValueError, match="hypermodel|model_type|model type"):
        Predictor.from_export_dir(tampered)


def test_loaded_metadata_fields(export_dir):
    call, meta = load_exported_model(export_dir)
    assert meta.model_type == "single_instance"
    assert meta.format == "jax_export_stablehlo"
    assert len(meta.skeleton_nodes) == 2
    assert meta.artifact_sha256 and len(meta.artifact_sha256) == 64


def test_peak_threshold_mismatch_warns_on_export_dir(tmp_path, caplog):
    """--peak-threshold differing from the export-time baked value warns
    instead of being silently ignored (the graph thresholds on device)."""
    import logging

    from sleap_nn_tpu.export import export_model
    from sleap_nn_tpu.inference import predict
    from sleap_nn_tpu.io import load_slp

    out = export_model(
        "/root/reference/tests/assets/model_ckpts/minimal_instance_centroid",
        output_dir=tmp_path / "exp", batch_size=1, peak_threshold=0.3,
        verify=False,
    )
    labels = load_slp(
        "/root/reference/tests/assets/datasets/minimal_instance.pkg.slp"
    )
    with caplog.at_level(logging.WARNING, logger="sleap_nn_tpu"):
        predict(labels, [out], peak_threshold=0.05)
    warned = [r for r in caplog.records if "baked" in r.message]
    assert len(warned) == 1
    caplog.clear()
    with caplog.at_level(logging.WARNING, logger="sleap_nn_tpu"):
        predict(labels, [out], peak_threshold=0.3)  # matches: silent
    assert not [r for r in caplog.records if "baked" in r.message]


def test_refinement_and_max_peaks_mismatch_also_warn(tmp_path, caplog):
    import logging

    from sleap_nn_tpu.export import export_model
    from sleap_nn_tpu.inference import predict
    from sleap_nn_tpu.io import load_slp

    out = export_model(
        "/root/reference/tests/assets/model_ckpts/minimal_instance_centroid",
        output_dir=tmp_path / "exp", batch_size=1, peak_threshold=0.2,
        max_peaks=64, verify=False,
    )
    labels = load_slp(
        "/root/reference/tests/assets/datasets/minimal_instance.pkg.slp"
    )
    with caplog.at_level(logging.WARNING, logger="sleap_nn_tpu"):
        predict(labels, [out], peak_threshold=0.2, refinement="rough",
                max_peaks=10)
    msgs = [r.getMessage() for r in caplog.records if "baked" in r.message]
    assert any(m.startswith("refinement=") for m in msgs)
    assert any(m.startswith("max_peaks=") for m in msgs)
    assert not any(m.startswith("peak_threshold=") for m in msgs)
