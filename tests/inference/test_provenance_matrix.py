"""Provenance builder scenario matrix.

Parity target: reference tests/inference/test_provenance.py —
TestBuildInferenceProvenance / TestBuildTrackingOnlyProvenance /
TestMergeProvenance — against sleap_nn_tpu/inference/provenance.py.
"""

from __future__ import annotations

from datetime import datetime, timedelta
from pathlib import Path
from types import SimpleNamespace

import pytest

from sleap_nn_tpu.inference.provenance import (
    build_inference_provenance,
    build_tracking_only_provenance,
    merge_provenance,
)


def test_minimal_provenance_has_versions_and_backend():
    prov = build_inference_provenance()
    assert "sleap_nn_tpu_version" in prov
    assert "jax_version" in prov
    assert prov["python"]
    assert prov["backend"] == "cpu"  # conftest pins the CPU platform


def test_timestamps_and_runtime():
    t0 = datetime(2026, 8, 17, 12, 0, 0)
    t1 = t0 + timedelta(seconds=90)
    prov = build_inference_provenance(start_time=t0, end_time=t1)
    assert prov["inference_start_timestamp"] == t0.isoformat()
    assert prov["inference_end_timestamp"] == t1.isoformat()
    assert prov["inference_runtime_seconds"] == 90.0


def test_start_time_alone_no_runtime():
    prov = build_inference_provenance(start_time=datetime.now())
    assert "inference_start_timestamp" in prov
    assert "inference_runtime_seconds" not in prov


def test_model_paths_are_absolute_posix(tmp_path):
    d = tmp_path / "model"
    d.mkdir()
    prov = build_inference_provenance(model_dirs=[d])
    (p,) = prov["model_paths"]
    assert p.startswith("/") and "\\" not in p


def test_model_config_hash_recorded(tmp_path):
    d = tmp_path / "model"
    d.mkdir()
    (d / "training_config.yaml").write_text("a: 1\n")
    prov = build_inference_provenance(model_dirs=[d])
    assert len(prov["models"][0]["training_config_sha256"]) == 64


def test_model_type_recorded():
    assert build_inference_provenance(model_type="topdown")["model_type"] == "topdown"


def test_input_path_string_and_pathlib(tmp_path):
    f = tmp_path / "in.slp"
    f.write_text("")
    a = build_inference_provenance(input_path=str(f))
    b = build_inference_provenance(input_path=f)
    assert a["source_file"] == b["source_file"] == f.resolve().as_posix()


def test_input_labels_provenance_preserved():
    labels = SimpleNamespace(provenance={"filename": "orig.slp", "k": 1})
    prov = build_inference_provenance(input_labels=labels)
    assert prov["input_provenance"] == {"filename": "orig.slp", "k": 1}
    assert prov["source_labels"] == "orig.slp"


def test_empty_input_provenance_omitted():
    labels = SimpleNamespace(provenance={})
    prov = build_inference_provenance(input_labels=labels)
    assert "input_provenance" not in prov


def test_frame_selection_block():
    prov = build_inference_provenance(
        frames_processed=10, frames_total=100, frame_selection_method="range"
    )
    assert prov["frame_selection"] == {
        "method": "range", "frames_processed": 10, "frames_total": 100
    }


def test_inference_params_drop_none_and_posixify_paths(tmp_path):
    prov = build_inference_provenance(
        inference_params={
            "peak_threshold": 0.2, "unused": None, "out": tmp_path / "x"
        }
    )
    cfg = prov["inference_config"]
    assert cfg["peak_threshold"] == 0.2
    assert "unused" not in cfg
    assert cfg["out"] == (tmp_path / "x").as_posix()


def test_tracking_params_drop_none():
    prov = build_inference_provenance(
        tracking_params={"window_size": 5, "max_tracks": None}
    )
    assert prov["tracking_config"] == {"window_size": 5}


def test_device_and_cli_args():
    prov = build_inference_provenance(
        device="tpu:0", cli_args={"batch_size": 4, "unset": None}
    )
    assert prov["device"] == "tpu:0"
    assert prov["cli_args"] == {"batch_size": 4}


def test_system_info_included_by_default_and_excludable():
    with_info = build_inference_provenance()
    without = build_inference_provenance(include_system_info=False)
    assert "system_info" in with_info
    assert with_info["system_info"]["accelerator"] == "cpu"
    assert "system_info" not in without


def test_system_info_failure_never_raises(monkeypatch):
    import sleap_nn_tpu.inference.provenance as mod

    monkeypatch.setattr(
        mod, "_system_info_fields",
        lambda: (_ for _ in ()).throw(RuntimeError("boom")),
    )
    prov = build_inference_provenance()
    assert "system_info" not in prov


def test_stats_and_extra_compat_shape():
    prov = build_inference_provenance(
        model_dirs=[], stats={"fps": 100.0}, extra={"custom": True}
    )
    assert prov["stats"] == {"fps": 100.0}
    assert prov["custom"] is True


# ------------------------------------------------------------ tracking-only


def test_tracking_only_minimal():
    prov = build_tracking_only_provenance()
    assert prov["pipeline_type"] == "tracking_only"
    assert "sleap_nn_tpu_version" in prov


def test_tracking_only_timestamps_and_params():
    t0 = datetime(2026, 1, 1)
    t1 = t0 + timedelta(seconds=5)
    prov = build_tracking_only_provenance(
        start_time=t0, end_time=t1,
        tracking_params={"window_size": 5, "max_tracks": None},
        frames_processed=42,
    )
    assert prov["tracking_runtime_seconds"] == 5.0
    assert prov["tracking_config"] == {"window_size": 5}
    assert prov["frames_processed"] == 42


def test_tracking_only_preserves_input_provenance(tmp_path):
    labels = SimpleNamespace(provenance={"filename": "preds.slp"})
    prov = build_tracking_only_provenance(
        input_labels=labels, input_path=tmp_path / "preds.slp"
    )
    assert prov["source_labels"] == "preds.slp"
    assert prov["source_file"].endswith("preds.slp")


# ------------------------------------------------------------------- merge


def test_merge_overwrites_by_default():
    assert merge_provenance({"a": 1, "b": 2}, {"b": 3}) == {"a": 1, "b": 3}


def test_merge_no_overwrite_keeps_base():
    got = merge_provenance({"a": 1, "b": 2}, {"b": 3, "c": 4}, overwrite=False)
    assert got == {"a": 1, "b": 2, "c": 4}


def test_merge_does_not_mutate_inputs():
    base, add = {"a": 1}, {"b": 2}
    merge_provenance(base, add)
    assert base == {"a": 1} and add == {"b": 2}


# ------------------------------------------------------- end-to-end wiring


def test_track_only_cli_attaches_tracking_provenance(tmp_path):
    import numpy as np
    from click.testing import CliRunner

    from sleap_nn_tpu.cli import cli
    from sleap_nn_tpu.io import (
        LabeledFrame, Labels, PredictedInstance, Skeleton, load_slp,
    )

    skel = Skeleton(nodes=["a", "b"])
    lfs = [
        LabeledFrame(video=None, frame_idx=t, instances=[
            PredictedInstance(
                points=np.array([[10.0 + t, 10.0], [15.0, 10.0]]),
                skeleton=skel, point_scores=np.ones(2), score=1.0)
        ])
        for t in range(3)
    ]
    src = tmp_path / "preds.slp"
    Labels(lfs).save(str(src))
    out = tmp_path / "tracked.slp"
    r = CliRunner().invoke(
        cli, ["track-only", "-i", str(src), "-o", str(out)]
    )
    assert r.exit_code == 0, r.output
    re = load_slp(str(out))
    prov = re.provenance
    assert prov["pipeline_type"] == "tracking_only"
    assert prov["tracking_config"]["window_size"] == 5
    assert prov["frames_processed"] == 3
