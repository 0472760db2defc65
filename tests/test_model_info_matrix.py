"""model_info unit matrix against the reference's trained fixture dirs.

Parity target: reference model_info.py:162 ``print_model_info`` six-table
report + reference tests/test_model_info.py scenarios. The reference's
fixture checkpoint dirs (tests/assets/model_ckpts/*) carry the exact
training_config.yaml / training_log.csv / metrics npz layout our model dir
contract reproduces, so they drive the real discovery paths.
"""

from pathlib import Path

import pytest

from sleap_nn_tpu.model_info import get_model_info, print_model_info

CKPTS = Path("/root/reference/tests/assets/model_ckpts")

FAMILIES = {
    "minimal_instance_bottomup": "bottomup",
    "minimal_instance_centered_instance": "centered_instance",
    "minimal_instance_centroid": "centroid",
    "minimal_instance_multiclass_bottomup": "multi_class_bottomup",
    "minimal_instance_multiclass_centered_instance": "multi_class_topdown",
    "minimal_instance_single_instance": "single_instance",
}


@pytest.mark.parametrize("dirname,model_type", sorted(FAMILIES.items()))
def test_get_model_info_resolves_every_family(dirname, model_type):
    info = get_model_info(CKPTS / dirname)
    assert info["model_type"] == model_type
    assert info["backbone"] == "unet"
    assert info["has_checkpoint"] is True
    assert info["max_stride"] >= 2
    assert "unet" in info["backbone_summary"].lower()


def test_get_model_info_reads_training_log():
    info = get_model_info(CKPTS / "minimal_instance_bottomup")
    assert info["epochs_trained"] is not None and info["epochs_trained"] >= 1
    assert info["best_val_loss"] is not None and info["best_val_loss"] > 0


def test_get_model_info_skeleton_nodes():
    info = get_model_info(CKPTS / "minimal_instance_single_instance")
    assert len(info["skeleton_nodes"]) == 2  # two-node fly fixture


def test_print_model_info_renders_tables(capsys):
    print_model_info(CKPTS / "minimal_instance_bottomup")
    out = capsys.readouterr().out
    for heading in ("Model Info", "Model type", "Backbone", "Head"):
        assert heading in out, f"missing section {heading!r}"
    assert "Bottom-Up" in out or "bottomup" in out.lower()


def test_print_model_info_with_metrics_dir(capsys):
    print_model_info(CKPTS / "single_instance_with_metrics")
    out = capsys.readouterr().out
    assert "Model Info" in out
    # Metrics npz files present in this fixture must be surfaced.
    assert "metrics" in out.lower()


def test_print_model_info_accepts_bare_yaml(tmp_path, capsys):
    cfg = CKPTS / "minimal_instance_centroid" / "training_config.yaml"
    print_model_info(cfg)
    out = capsys.readouterr().out
    assert "Model Info" in out and "Centroid" in out


def test_print_model_info_missing_path_exits():
    with pytest.raises(SystemExit):
        print_model_info("/nonexistent/model/dir")


def test_print_model_info_dir_without_config_exits(tmp_path):
    with pytest.raises(SystemExit):
        print_model_info(tmp_path)
