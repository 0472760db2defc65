"""The complete user journey through the CLI, end to end on real fixtures:

    config --auto -> train -> predict -> track -> eval -> export -> predict
    (exported) -> track-only

One test drives each stage through the SAME interface a user types, with
artifacts flowing stage to stage (the reference's docs/workflows narrative
as an executable contract).
"""

import json
from pathlib import Path

import numpy as np
import pytest
pytestmark = pytest.mark.slow  # integration tier: real training loops / model builds / subprocesses

from click.testing import CliRunner

from sleap_nn_tpu.cli import cli

FIXTURE = "/root/reference/tests/assets/datasets/minimal_instance.pkg.slp"


@pytest.fixture(scope="module")
def journey_dir(tmp_path_factory):
    return tmp_path_factory.mktemp("journey")


@pytest.fixture(scope="module")
def runner():
    return CliRunner()


@pytest.fixture(scope="module")
def generated_config(journey_dir, runner):
    """Stage 1: auto-generate a config from the labels file."""
    out = journey_dir / "auto.yaml"
    r = runner.invoke(cli, ["config", FIXTURE, "--auto", "-o", str(out),
                            "--pipeline", "single_instance"])
    assert r.exit_code == 0, r.output
    import yaml

    cfg = yaml.safe_load(out.read_text())
    # Shrink the recommended model so the journey trains in seconds.
    # single_instance training hard-errors on multi-instance frames, so the
    # journey trains on the single-instance derivation of the fixture.
    from tests.fixture_utils import single_instance_fixture

    cfg["data_config"]["train_labels_path"] = [single_instance_fixture()]
    cfg["data_config"]["preprocessing"]["scale"] = 0.25
    cfg["data_config"]["use_same_data_for_val"] = True
    cfg["data_config"]["use_augmentations_train"] = False
    bb = cfg["model_config"]["backbone_config"]
    key = next(k for k, v in bb.items() if v)
    bb[key].update(filters=8, filters_rate=2.0, max_stride=8, output_stride=2)
    cfg["trainer_config"].update(
        max_epochs=25, min_train_steps_per_epoch=1,
        save_ckpt=True, ckpt_dir=str(journey_dir), run_name="journey_model",
        enable_progress_bar=False,
    )
    cfg["trainer_config"]["train_data_loader"] = {"batch_size": 1}
    cfg["trainer_config"]["val_data_loader"] = {"batch_size": 1}
    out.write_text(yaml.safe_dump(cfg))
    return out


@pytest.fixture(scope="module")
def trained(journey_dir, runner, generated_config):
    """Stage 2: train from the generated config."""
    r = runner.invoke(cli, ["train", str(generated_config)])
    assert r.exit_code == 0, r.output
    model_dir = journey_dir / "journey_model"
    assert (model_dir / "best.ckpt").exists()
    return model_dir


def test_stage_predict(journey_dir, runner, trained):
    out = journey_dir / "preds.slp"
    r = runner.invoke(cli, [
        "predict", "-i", FIXTURE, "-m", str(trained), "-o", str(out),
        "--peak-threshold", "0.1", "--batch-size", "1",
    ])
    assert r.exit_code == 0, r.output
    assert out.exists()
    from sleap_nn_tpu.io import load_slp

    labels = load_slp(str(out))
    assert sum(len(lf.predicted_instances) for lf in labels) >= 1


def test_stage_track_video(journey_dir, runner, trained):
    out = journey_dir / "tracked.slp"
    r = runner.invoke(cli, [
        "track", "-i",
        "/root/reference/tests/assets/datasets/small_robot.mp4",
        "-m", str(trained), "-o", str(out), "--frames", "0-4",
        "--peak-threshold", "0.05",
    ])
    assert r.exit_code == 0, r.output
    from sleap_nn_tpu.io import load_slp

    labels = load_slp(str(out))
    assert len(labels.tracks) >= 1


def test_stage_eval(journey_dir, runner, trained):
    preds = journey_dir / "preds.slp"
    assert preds.exists(), "predict stage must run first"
    r = runner.invoke(cli, [
        "eval", "-g", FIXTURE, "-p", str(preds), "--match-method", "oks",
        "--save-metrics", str(journey_dir / "metrics.npz"),
    ])
    assert r.exit_code == 0, r.output
    summary = json.loads(r.output.strip().splitlines()[-1])
    assert "mOKS" in summary
    assert (journey_dir / "metrics.npz").exists()


def test_stage_export_and_predict_exported(journey_dir, runner, trained):
    exp = journey_dir / "exported"
    r = runner.invoke(cli, ["export", str(trained), "-o", str(exp)])
    assert r.exit_code == 0, r.output
    assert (exp / "model.stablehlo").exists()

    out = journey_dir / "preds_exported.slp"
    r2 = runner.invoke(cli, [
        "predict", "-i", FIXTURE, "-m", str(exp), "-o", str(out),
    ])
    assert r2.exit_code == 0, r2.output
    from sleap_nn_tpu.io import load_slp

    exported_preds = load_slp(str(out))
    direct_preds = load_slp(str(journey_dir / "preds.slp"))
    # Exported and eager paths agree on what they found.
    a = sorted(round(float(p), 1) for lf in exported_preds
               for i in lf.predicted_instances for p in i.numpy().ravel()
               if np.isfinite(p))
    b = sorted(round(float(p), 1) for lf in direct_preds
               for i in lf.predicted_instances for p in i.numpy().ravel()
               if np.isfinite(p))
    if a and b:
        assert np.allclose(a, b, atol=1.0)


def test_stage_retrack_only(journey_dir, runner):
    tracked = journey_dir / "tracked.slp"
    assert tracked.exists(), "track stage must run first"
    out = journey_dir / "retracked.slp"
    r = runner.invoke(cli, [
        "track-only", "-i", str(tracked), "-o", str(out),
        "--window-size", "3", "--scoring-method", "oks",
    ])
    assert r.exit_code == 0, r.output
    from sleap_nn_tpu.io import load_slp

    assert len(load_slp(str(out)).tracks) >= 1


def test_stage_info_and_config_inspect(journey_dir, runner, trained):
    r = runner.invoke(cli, ["info", str(trained)])
    assert r.exit_code == 0, r.output
    # model type renders human-readably (reference _format_model_type)
    assert "Single Instance" in r.output
    r2 = runner.invoke(cli, [
        "config", str(trained / "training_config.yaml"),
    ])
    assert r2.exit_code == 0, r2.output
