"""CLI command/flag matrix (reference tests/cli/test_predict_command.py,
tests/test_cli.py model): every command's happy path, flag validation,
dual dash/underscore spellings, and a few true-subprocess entrypoint runs.
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest
from click.testing import CliRunner

from sleap_nn_tpu.cli import cli

FIXTURE = "/root/reference/tests/assets/datasets/minimal_instance.pkg.slp"
MP4 = "/root/reference/tests/assets/datasets/small_robot.mp4"
CKPTS = Path("/root/reference/tests/assets/model_ckpts")
SI = str(CKPTS / "minimal_instance_single_instance")
BU = str(CKPTS / "minimal_instance_bottomup")
CE = str(CKPTS / "minimal_instance_centroid")
CI = str(CKPTS / "minimal_instance_centered_instance")


def run_cli(args, ok=True):
    r = CliRunner().invoke(cli, args, catch_exceptions=False)
    if ok:
        assert r.exit_code == 0, r.output
    else:
        assert r.exit_code != 0, r.output
    return r


# ── flag validation (no inference executed) ──────────────────────────────────


def test_predict_requires_data_path():
    r = CliRunner().invoke(cli, ["predict", "-m", SI])
    assert r.exit_code != 0
    assert "data" in r.output.lower()


def test_predict_rejects_unknown_output_format():
    r = CliRunner().invoke(cli, [
        "predict", "-i", FIXTURE, "-m", SI, "--output-format", "csv",
    ])
    assert r.exit_code != 0


def test_predict_rejects_bad_embed_choice():
    r = CliRunner().invoke(cli, [
        "predict", "-i", FIXTURE, "-m", SI, "--embed", "maybe",
    ])
    assert r.exit_code != 0


def test_predict_underscore_spellings_accepted(tmp_path):
    run_cli([
        "predict", "--data_path", FIXTURE, "--model_paths", SI,
        "--output_path", str(tmp_path / "u.slp"), "--peak_threshold", "0.1",
        "--batch_size", "1", "--device", "cpu",
    ])
    assert (tmp_path / "u.slp").exists()


def test_predict_dash_spellings_accepted(tmp_path):
    run_cli([
        "predict", "--data-path", FIXTURE, "--model-paths", SI,
        "--output-path", str(tmp_path / "d.slp"), "--peak-threshold", "0.1",
        "--batch-size", "1", "--device", "cpu",
    ])
    assert (tmp_path / "d.slp").exists()


def test_predict_no_model_and_no_mask_backend_errors():
    r = CliRunner().invoke(cli, ["predict", "-i", FIXTURE])
    assert r.exit_code != 0


def test_track_only_requires_existing_file(tmp_path):
    r = CliRunner().invoke(cli, [
        "track-only", "-i", str(tmp_path / "missing.slp"),
    ])
    assert r.exit_code != 0


def test_eval_requires_both_paths():
    r = CliRunner().invoke(cli, ["eval", "--ground_truth_path", FIXTURE])
    assert r.exit_code != 0


def test_export_rejects_unknown_format(tmp_path):
    r = CliRunner().invoke(cli, [
        "export", SI, "-o", str(tmp_path / "e"), "--fmt", "onnx-trt",
    ])
    assert r.exit_code != 0


def test_train_requires_some_config_source():
    r = CliRunner().invoke(cli, ["train"])
    assert r.exit_code != 0
    assert "config" in r.output.lower()


def test_train_rejects_missing_config_file():
    r = CliRunner().invoke(cli, ["train", "--config", "/nonexistent.yaml"])
    assert r.exit_code != 0


def test_train_rejects_malformed_override(tmp_path):
    cfg = tmp_path / "c.yaml"
    cfg.write_text("data_config: {}\n")
    r = CliRunner().invoke(cli, ["train", str(cfg), "notakeyvalue"])
    assert r.exit_code != 0


# ── inference happy paths per family ─────────────────────────────────────────


def test_predict_topdown_pair(tmp_path):
    out = tmp_path / "td.slp"
    run_cli([
        "predict", "-i", FIXTURE, "-m", CE, "-m", CI, "-o", str(out),
        "--device", "cpu", "--batch-size", "1", "--max-instances", "4",
        "--peak-threshold", "0.1",
    ])
    from sleap_nn_tpu.io import load_slp

    assert load_slp(str(out)).labeled_frames


def test_predict_bottomup_with_paf_knobs(tmp_path):
    out = tmp_path / "bu.slp"
    run_cli([
        "predict", "-i", FIXTURE, "-m", BU, "-o", str(out),
        "--device", "cpu", "--batch-size", "1", "--peak-threshold", "0.1",
        "--n-points", "7", "--min-line-scores", "0.1",
        "--max-edge-length-ratio", "0.5",
    ])
    assert out.exists()


def test_predict_centroid_only_flag(tmp_path):
    out = tmp_path / "c.slp"
    run_cli([
        "predict", "-i", FIXTURE, "-m", CE, "-m", CI, "-o", str(out),
        "--centroid-only", "--device", "cpu", "--batch-size", "1",
        "--peak-threshold", "0.1",
    ])
    from sleap_nn_tpu.io import load_slp

    labels = load_slp(str(out))
    for lf in labels.labeled_frames:
        for inst in lf.predicted_instances:
            assert inst.numpy().shape[0] == 1  # single-node centroid insts


def test_predict_frames_subset_on_video(tmp_path):
    out = tmp_path / "f.slp"
    run_cli([
        "predict", "-i", MP4, "-m", SI, "-o", str(out),
        "--frames", "2-4", "--device", "cpu", "--batch-size", "2",
        "--peak-threshold", "0.05",
    ])
    from sleap_nn_tpu.io import load_slp

    idxs = {lf.frame_idx for lf in load_slp(str(out)).labeled_frames}
    assert idxs <= {2, 3, 4}


def test_predict_analysis_h5_output(tmp_path):
    out = tmp_path / "a.slp"
    run_cli([
        "predict", "-i", FIXTURE, "-m", SI, "-o", str(out),
        "--output-format", "slp", "--output-format", "analysis_h5",
        "--device", "cpu", "--batch-size", "1", "--peak-threshold", "0.1",
    ])
    assert out.exists()
    analysis = list(tmp_path.glob("*.analysis.h5")) + list(tmp_path.glob("*analysis*.h5"))
    assert analysis, list(tmp_path.iterdir())


def test_predict_gui_mode_emits_json_progress(tmp_path):
    r = run_cli([
        "predict", "-i", FIXTURE, "-m", SI, "-o", str(tmp_path / "g.slp"),
        "--gui", "--device", "cpu", "--batch-size", "1",
        "--peak-threshold", "0.1",
    ])
    json_lines = [l for l in r.output.splitlines() if l.startswith("{")]
    assert json_lines
    assert "n_processed" in json.loads(json_lines[0])


def test_predict_filters_apply(tmp_path):
    out = tmp_path / "filt.slp"
    run_cli([
        "predict", "-i", FIXTURE, "-m", SI, "-o", str(out),
        "--device", "cpu", "--batch-size", "1", "--peak-threshold", "0.1",
        "--filter-min-instance-score", "0.99999",
    ])
    from sleap_nn_tpu.io import load_slp

    # the harsh score filter drops everything (file may be empty of preds)
    n = sum(len(lf.predicted_instances)
            for lf in load_slp(str(out)).labeled_frames)
    assert n == 0


def test_eval_centroid_match_method(tmp_path):
    pred = tmp_path / "p.slp"
    run_cli([
        "predict", "-i", FIXTURE, "-m", SI, "-o", str(pred),
        "--device", "cpu", "--batch-size", "1", "--peak-threshold", "0.1",
    ])
    r = run_cli([
        "eval", "--ground_truth_path", FIXTURE, "--predicted_path", str(pred),
        "--match_method", "centroid",
    ])
    assert "precision" in r.output or "detection" in r.output


def test_eval_save_metrics_npz(tmp_path):
    pred = tmp_path / "p.slp"
    run_cli([
        "predict", "-i", FIXTURE, "-m", SI, "-o", str(pred),
        "--device", "cpu", "--batch-size", "1", "--peak-threshold", "0.1",
    ])
    npz = tmp_path / "metrics.npz"
    run_cli([
        "eval", "--ground_truth_path", FIXTURE, "--predicted_path", str(pred),
        "--save_metrics", str(npz),
    ])
    assert npz.exists()
    from sleap_nn_tpu.evaluation import load_metrics

    assert "mOKS.mOKS" in load_metrics(npz)


def test_system_command_reports_devices():
    r = run_cli(["system"])
    assert "cpu" in r.output.lower() or "tpu" in r.output.lower()


def test_config_show_resolved(tmp_path):
    r = run_cli(["config", FIXTURE, "--auto", "--show-yaml"])
    assert "data_config" in r.output


# ── true subprocess entrypoint runs ──────────────────────────────────────────


def _subprocess_cli(args, timeout=420):
    return subprocess.run(
        [sys.executable, "-m", "sleap_nn_tpu.cli", *args],
        capture_output=True, text=True, timeout=timeout,
        cwd=str(Path(__file__).resolve().parents[1]),
    )


def test_subprocess_help_lists_all_commands():
    r = _subprocess_cli(["--help"])
    assert r.returncode == 0
    for cmd in ("train", "predict", "track", "eval", "export", "system",
                "info", "config"):
        assert cmd in r.stdout


def test_subprocess_version():
    r = _subprocess_cli(["--version"])
    assert r.returncode == 0 and "sleap-nn-tpu" in r.stdout


def test_subprocess_predict_writes_slp(tmp_path):
    out = tmp_path / "sp.slp"
    r = _subprocess_cli([
        "predict", "-i", FIXTURE, "-m", SI, "-o", str(out),
        "--device", "cpu", "--batch-size", "1", "--peak-threshold", "0.1",
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    assert out.exists()


def test_subprocess_bad_flag_nonzero_exit():
    r = _subprocess_cli(["predict", "--definitely-not-a-flag"])
    assert r.returncode != 0
    assert "no such option" in (r.stderr + r.stdout).lower()
