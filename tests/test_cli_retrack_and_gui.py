"""CLI retrack-only short-circuit + GUI error-JSON matrix.

Parity target: reference tests/cli/test_predict_command.py retrack-only
dispatch/provenance scenarios and the run_guarded GUI error contract,
against sleap_nn_tpu/cli.py ``_run_retrack_only`` and the predict GUI
guard.
"""

from __future__ import annotations

import json

import numpy as np
import pytest
from click.testing import CliRunner

from sleap_nn_tpu.cli import cli
from sleap_nn_tpu.io import (
    LabeledFrame,
    Labels,
    PredictedInstance,
    Skeleton,
    Track,
    load_slp,
)

SKEL = Skeleton(nodes=["a", "b"])


def _preds_slp(tmp_path, n_frames=4, with_tracks=False):
    stale = Track(name="stale") if with_tracks else None
    lfs = []
    for t in range(n_frames):
        insts = [
            PredictedInstance(
                points=np.array([[10.0 + t, 10.0], [15.0 + t, 10.0]]),
                skeleton=SKEL, point_scores=np.ones(2), score=1.0,
                track=stale),
            PredictedInstance(
                points=np.array([[80.0, 80.0 + t], [85.0, 80.0 + t]]),
                skeleton=SKEL, point_scores=np.ones(2), score=0.9),
        ]
        lfs.append(LabeledFrame(video=None, frame_idx=t, instances=insts))
    labels = Labels(lfs)
    if with_tracks:
        labels.tracks = [stale]
    p = tmp_path / "preds.slp"
    labels.save(str(p))
    return p


def test_retrack_only_short_circuit_no_model_needed(tmp_path):
    src = _preds_slp(tmp_path)
    out = tmp_path / "retracked.slp"
    r = CliRunner().invoke(cli, [
        "predict", "-i", str(src), "-o", str(out), "--tracking",
    ])
    assert r.exit_code == 0, r.output
    assert "Retracked 4 frames" in r.output
    re = load_slp(str(out))
    assert len(re.tracks) == 2
    for lf in re.labeled_frames:
        assert all(i.track is not None for i in lf.predicted_instances)


def test_retrack_only_discards_stale_tracks(tmp_path):
    src = _preds_slp(tmp_path, with_tracks=True)
    out = tmp_path / "retracked.slp"
    r = CliRunner().invoke(cli, [
        "predict", "-i", str(src), "-o", str(out), "--tracking",
    ])
    assert r.exit_code == 0, r.output
    re = load_slp(str(out))
    names = {t.name for t in re.tracks}
    assert "stale" not in names
    assert len(re.tracks) == 2


def test_retrack_only_sets_tracking_provenance(tmp_path):
    src = _preds_slp(tmp_path)
    out = tmp_path / "retracked.slp"
    r = CliRunner().invoke(cli, [
        "predict", "-i", str(src), "-o", str(out), "--tracking",
        "--tracking-window-size", "7",
    ])
    assert r.exit_code == 0, r.output
    prov = load_slp(str(out)).provenance
    assert prov["pipeline_type"] == "tracking_only"
    assert prov["tracking_config"]["window_size"] == 7
    assert "tracking_runtime_seconds" in prov


def test_retrack_only_respects_frames_subset(tmp_path):
    src = _preds_slp(tmp_path, n_frames=6)
    out = tmp_path / "retracked.slp"
    r = CliRunner().invoke(cli, [
        "predict", "-i", str(src), "-o", str(out), "--tracking",
        "--frames", "0-2",
    ])
    assert r.exit_code == 0, r.output
    re = load_slp(str(out))
    assert len(re.labeled_frames) == 3


def test_retrack_only_gui_emits_done_json(tmp_path):
    src = _preds_slp(tmp_path)
    out = tmp_path / "retracked.slp"
    r = CliRunner().invoke(cli, [
        "predict", "-i", str(src), "-o", str(out), "--tracking", "--gui",
    ])
    assert r.exit_code == 0, r.output
    payloads = [json.loads(l) for l in r.output.splitlines()
                if l.startswith("{")]
    done = [p for p in payloads if p.get("done")]
    assert done and done[0]["n_tracks"] == 2


def test_no_tracking_no_model_still_usage_error(tmp_path):
    src = _preds_slp(tmp_path)
    r = CliRunner().invoke(cli, ["predict", "-i", str(src)])
    assert r.exit_code != 0
    assert "model-paths" in r.output or "model_paths" in r.output


def test_retrack_requires_slp_input(tmp_path):
    # A video path with --tracking but no models is NOT retrackable.
    r = CliRunner().invoke(cli, [
        "predict", "-i", "/nonexistent/video.mp4", "--tracking",
    ])
    assert r.exit_code != 0
    assert "tracking-only retrack" in r.output


def test_gui_failure_emits_error_json(tmp_path):
    src = _preds_slp(tmp_path)
    r = CliRunner().invoke(cli, [
        "predict", "-i", str(src), "-m", "/nonexistent/model", "--gui",
    ])
    assert r.exit_code != 0
    payloads = [json.loads(l) for l in r.output.splitlines()
                if l.startswith("{")]
    errs = [p for p in payloads if "error" in p]
    assert errs, r.output


def test_non_gui_failure_emits_no_json(tmp_path):
    src = _preds_slp(tmp_path)
    r = CliRunner().invoke(cli, [
        "predict", "-i", str(src), "-m", "/nonexistent/model",
    ])
    assert r.exit_code != 0
    assert not any(l.startswith('{"error"') for l in r.output.splitlines())


def test_retrack_gui_failure_emits_error_json(tmp_path):
    src = _preds_slp(tmp_path)
    r = CliRunner().invoke(cli, [
        "predict", "-i", str(src), "--tracking", "--gui",
        "--post_connect_single_breaks",  # no target/max_instances -> raises
    ])
    assert r.exit_code != 0
    payloads = [json.loads(l) for l in r.output.splitlines()
                if l.startswith("{")]
    assert any("error" in p for p in payloads), r.output


def test_retrack_honors_output_format_analysis_h5(tmp_path):
    # Analysis export needs a real video on the frames.
    base = load_slp(
        "/root/reference/tests/assets/datasets/minimal_instance.pkg.slp"
    )
    vid = base.videos[0]
    skel = base.skeletons[0]
    lfs = [
        LabeledFrame(video=vid, frame_idx=0, instances=[
            PredictedInstance(points=np.array([[10.0, 10.0], [15.0, 10.0]]),
                              skeleton=skel, point_scores=np.ones(2),
                              score=1.0)
        ])
    ]
    src = tmp_path / "vid_preds.slp"
    Labels(lfs, videos=[vid], skeletons=[skel]).save(str(src), embed=True)
    out = tmp_path / "retracked.slp"
    r = CliRunner().invoke(cli, [
        "predict", "-i", str(src), "-o", str(out), "--tracking",
        "--output-format", "slp", "--output-format", "analysis_h5",
    ])
    assert r.exit_code == 0, r.output
    assert out.exists()
    assert (tmp_path / "retracked.analysis.h5").exists()


def test_retrack_rejects_filter_flags(tmp_path):
    src = _preds_slp(tmp_path)
    r = CliRunner().invoke(cli, [
        "predict", "-i", str(src), "--tracking",
        "--filter-min-instance-score", "0.5",
    ])
    assert r.exit_code != 0
    assert "filter" in r.output


def test_retrack_rejects_only_suggested_frames(tmp_path):
    src = _preds_slp(tmp_path)
    r = CliRunner().invoke(cli, [
        "predict", "-i", str(src), "--tracking", "--only-suggested-frames",
    ])
    assert r.exit_code != 0
    assert "suggested" in r.output


def test_retrack_video_index_out_of_range_errors(tmp_path):
    src = _preds_slp(tmp_path)
    r = CliRunner().invoke(cli, [
        "predict", "-i", str(src), "--tracking", "--video-index", "7",
    ])
    assert r.exit_code != 0
    assert "out of range" in r.output


def test_retrack_gui_load_failure_emits_error_json(tmp_path):
    bad = tmp_path / "corrupt.slp"
    bad.write_bytes(b"not an hdf5 file")
    r = CliRunner().invoke(cli, [
        "predict", "-i", str(bad), "--tracking", "--gui",
    ])
    assert r.exit_code != 0
    payloads = [json.loads(l) for l in r.output.splitlines()
                if l.startswith("{")]
    assert any("error" in p for p in payloads), r.output


def test_gui_stdout_is_pure_json_with_info_logging(tmp_path):
    """GUI stdout carries ONLY JSON lines; library INFO logs go to stderr.

    Reference contract (tests/cli/test_predict_command.py
    ``test_predict_gui_redirects_logs_to_stderr``): the GUI parses stdout
    line-by-line, so the #610 observability lines must never leak there.
    Subprocess invocation gives true stream separation.
    """
    import subprocess
    import sys

    src = _preds_slp(tmp_path)
    out = tmp_path / "retracked.slp"
    r = subprocess.run(
        [sys.executable, "-m", "sleap_nn_tpu.cli", "predict",
         "-i", str(src), "-o", str(out), "--tracking", "--gui",
         "--device", "cpu"],
        capture_output=True, text=True, cwd="/root/repo", timeout=420,
    )
    assert r.returncode == 0, r.stderr
    for line in r.stdout.splitlines():
        if line.strip():
            json.loads(line)  # every stdout line must parse


def test_non_gui_info_lines_on_stderr_not_stdout(tmp_path):
    """Without --gui the run summary lands on stderr, keeping stdout for
    the human-facing result line (reference keeps loguru on stderr)."""
    import subprocess
    import sys

    src = _preds_slp(tmp_path)
    out = tmp_path / "retracked.slp"
    r = subprocess.run(
        [sys.executable, "-m", "sleap_nn_tpu.cli", "predict",
         "-i", str(src), "-o", str(out), "--tracking",
         "--device", "cpu"],
        capture_output=True, text=True, cwd="/root/repo", timeout=420,
    )
    assert r.returncode == 0, r.stderr
    assert "INFO" not in r.stdout
