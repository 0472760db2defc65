"""Config-generator TUI flow depth: screens, validation, memory gauge.

Reference scope: config_generator/tui/app.py screens (load / model-select /
configure / export) with per-field validation and a live memory gauge. The
prompt fallback linearizes the same flow, so it is the scriptable surface.
"""

from __future__ import annotations

import io

import pytest
import yaml

FIXTURE = "/root/reference/tests/assets/datasets/minimal_instance.pkg.slp"


def _run_prompt(monkeypatch, answers: str, capsys, default_out=None):
    monkeypatch.setattr("sys.stdin", io.StringIO(answers))
    from sleap_nn_tpu.config_generator.tui import launch_tui

    # Always seed a writable default output so a mis-sequenced answer list
    # can never save into the read-only reference tree.
    saved = launch_tui(FIXTURE, output_path=default_out)
    return saved, capsys.readouterr().out


def _prompt_order(pipeline="topdown", backbone="unet"):
    """The exact field order _prompt_flow asks in: model fields, then the
    chosen pipeline's sections — computed, not hardcoded, so adding TUI
    fields never silently shifts these tests."""
    from sleap_nn_tpu.config_generator import analyze_slp, recommend_config
    from sleap_nn_tpu.config_generator.tui import (
        _config_fields, _config_sections, _model_fields,
    )

    stats = analyze_slp(FIXTURE)
    rec = recommend_config(stats)
    names = [f.name for f in _model_fields(rec)]
    fields = _config_fields(FIXTURE, stats, rec)
    for sec in _config_sections(fields, pipeline=pipeline, backbone=backbone):
        names.extend(f.name for f in sec.fields)
    return names


def _script(by_name, pipeline="topdown", backbone="unet", confirm=""):
    """Answer string for _prompt_flow: per-field answers by NAME (a list
    gives a re-prompt sequence, e.g. invalid then valid)."""
    lines = []
    for name in _prompt_order(pipeline, backbone):
        v = by_name.get(name, "")
        lines.extend(v if isinstance(v, list) else [v])
    lines.append(confirm)
    return "\n".join(str(x) for x in lines) + "\n"


def test_prompt_flow_edits_every_knob(tmp_path, monkeypatch, capsys):
    out = tmp_path / "edited.yaml"
    answers = _script({
        "pipeline": "bottomup",
        "sigma": "3.5", "scale": "0.5",
        "output_stride": "4", "max_stride": "32",
        "filters": "16", "filters_rate": "2.0",
        "pafs_output_stride": "8",
        "batch_size": "8", "max_epochs": "50",
        "learning_rate": "0.0003",
        "rotation": "90", "augmentation": "off",
        "output": str(out),
    }, pipeline="bottomup")
    saved, printed = _run_prompt(monkeypatch, answers, capsys,
                                 default_out=str(tmp_path / "default.yaml"))
    assert saved == str(out)
    cfg = yaml.safe_load(out.read_text())
    unet = cfg["model_config"]["backbone_config"]["unet"]
    assert unet["filters"] == 16 and unet["filters_rate"] == 2.0
    assert unet["max_stride"] == 32 and unet["output_stride"] == 4
    bu = cfg["model_config"]["head_configs"]["bottomup"]
    assert bu["confmaps"]["sigma"] == 3.5
    assert bu["confmaps"]["output_stride"] == 4
    assert bu["pafs"]["output_stride"] == 8  # explicit PAF head stride
    assert cfg["data_config"]["preprocessing"]["scale"] == 0.5
    assert cfg["data_config"]["use_augmentations_train"] is False
    assert cfg["trainer_config"]["max_epochs"] == 50
    assert cfg["trainer_config"]["train_data_loader"]["batch_size"] == 8
    assert cfg["trainer_config"]["optimizer"]["lr"] == 0.0003
    # the memory gauge rendered live during configuration
    assert "memory [" in printed and "GB" in printed


def test_prompt_flow_validation_reprompts(tmp_path, monkeypatch, capsys):
    out = tmp_path / "valid.yaml"
    answers = _script({
        "sigma": ["-2", "4.0"],      # invalid then valid
        "max_stride": ["33", "64"],  # not a power of 2, then valid
        "output": str(out),
    })
    saved, printed = _run_prompt(monkeypatch, answers, capsys,
                                 default_out=str(tmp_path / "default.yaml"))
    assert saved == str(out)
    assert "must be in (0, 50]" in printed
    assert "power of 2" in printed
    cfg = yaml.safe_load(out.read_text())
    assert cfg["model_config"]["backbone_config"]["unet"]["max_stride"] == 64
    head = cfg["model_config"]["head_configs"]["centered_instance"]
    assert head["confmaps"]["sigma"] == 4.0


def test_prompt_flow_heads_and_tiling_knobs(tmp_path, monkeypatch, capsys):
    out = tmp_path / "knobs.yaml"
    answers = _script({
        "crop_size": "192",
        "affine_p": "0.7",
        "tiling": "on", "tile_size": "256", "tile_overlap": "32",
        "validation_fraction": "0.2",
        "output": str(out),
    })
    saved, _ = _run_prompt(monkeypatch, answers, capsys,
                           default_out=str(tmp_path / "default.yaml"))
    assert saved == str(out)
    cfg = yaml.safe_load(out.read_text())
    assert cfg["data_config"]["preprocessing"]["crop_size"] == 192
    aug = cfg["data_config"]["augmentation_config"]
    assert aug["geometric"]["affine_p"] == 0.7
    tiling = cfg["data_config"]["preprocessing"]["tiling"]
    assert tiling["enabled"] is True and tiling["tile_size"] == 256
    assert tiling["overlap"] == 32
    assert cfg["data_config"]["validation_fraction"] == 0.2


def test_prompt_flow_decline_save(tmp_path, monkeypatch, capsys):
    answers = _script({"output": str(tmp_path / "never.yaml")}, confirm="n")
    saved, _ = _run_prompt(monkeypatch, answers, capsys,
                           default_out=str(tmp_path / "default.yaml"))
    assert saved is None
    assert not (tmp_path / "never.yaml").exists()


def test_memory_gauge_tracks_batch_size():
    from sleap_nn_tpu.config_generator import analyze_slp, recommend_config
    from sleap_nn_tpu.config_generator.tui import (
        _config_fields, _memory_gauge, _model_fields,
    )

    stats = analyze_slp(FIXTURE)
    rec = recommend_config(stats)
    mf = _model_fields(rec)
    cf = _config_fields(FIXTURE, stats, rec)
    g_small = _memory_gauge(stats, mf, cf)
    for f in cf:
        if f.name == "batch_size":
            f.value = 512
    g_big = _memory_gauge(stats, mf, cf)
    assert g_small != g_big and "GB" in g_small

    def total(g):
        return float(g.split("] ")[1].split("/")[0])

    assert total(g_big) > total(g_small)


def test_yaml_preview_matches_saved_config(tmp_path):
    from sleap_nn_tpu.config_generator import analyze_slp, recommend_config
    from sleap_nn_tpu.config_generator.tui import (
        _apply_and_save, _config_fields, _model_fields, _yaml_preview,
    )

    stats = analyze_slp(FIXTURE)
    rec = recommend_config(stats)
    mf = _model_fields(rec)
    cf = _config_fields(FIXTURE, stats, rec)
    preview = _yaml_preview(FIXTURE, stats, rec, mf, cf)
    assert preview and not preview[0].startswith("(preview unavailable")
    for f in cf:
        if f.name == "output":
            f.value = str(tmp_path / "saved.yaml")
    saved = _apply_and_save(FIXTURE, stats, rec, mf, cf)
    text = open(saved).read().splitlines()
    assert preview[: len(text)][0] == text[0]


def test_field_validation_unit():
    from sleap_nn_tpu.config_generator.tui import _Field

    f = _Field("batch_size", 4, caster=int,
               validate=lambda v: None if v >= 1 else "must be >= 1")
    assert not f.set_text("zero") and "int" in f.error
    assert not f.set_text("0") and f.error == "must be >= 1"
    assert f.set_text("8") and f.value == 8 and f.error is None
    c = _Field("pipeline", "topdown", choices=["topdown", "bottomup"])
    c.cycle(1)
    assert c.value == "bottomup"
    c.cycle(1)
    assert c.value == "topdown"


def test_variant_field_applies_to_preset_encoders(tmp_path):
    """The model-select 'variant' knob lands in convnext/swint configs and
    is ignored for UNet."""
    from sleap_nn_tpu.config_generator import analyze_slp, recommend_config
    from sleap_nn_tpu.config_generator.tui import (
        _apply_and_save, _config_fields, _model_fields,
    )

    stats = analyze_slp(FIXTURE)
    rec = recommend_config(stats)
    mf = _model_fields(rec)
    by = {f.name: f for f in mf}
    by["backbone"].value = "convnext"
    by["variant"].value = "small"
    cf = _config_fields(FIXTURE, stats, rec)
    for f in cf:
        if f.name == "output":
            f.value = str(tmp_path / "cnx.yaml")
    out = _apply_and_save(FIXTURE, stats, rec, mf, cf)
    cfg = yaml.safe_load(open(out))
    assert cfg["model_config"]["backbone_config"]["convnext"]["model_type"] == "small"
    assert cfg["model_config"]["backbone_config"].get("unet") is None


def test_prompt_flow_trainer_and_deep_aug_knobs(tmp_path, monkeypatch, capsys):
    """Trainer section + augmentation detail land in the saved YAML
    (reference tui/app.py trainer & augmentation screens)."""
    out = tmp_path / "trainer.yaml"
    answers = _script({
        "optimizer": "adamw",
        "scheduler": "cosine_warmup",
        "early_stop_patience": "5",
        "seed": "1234",
        "run_name": "tui_run",
        "save_ckpt": "on",
        "use_wandb": "off",
        "ohkm": "on",
        "ohkm_ratio": "3.0",
        "max_epochs": "40",
        "rotation_p": "0.9",
        "translate_p": "0.25",
        "translate_frac": "0.1",
        "noise_p": "0.3",
        "noise_std": "0.05",
        "contrast_p": "0.4",
        "contrast_min": "0.6",
        "contrast_max": "1.8",
        "brightness_min": "0.85",
        "brightness_max": "1.3",
        "brightness_p": "0.2",
        "output": str(out),
    })
    saved, _ = _run_prompt(monkeypatch, answers, capsys,
                           default_out=str(tmp_path / "default.yaml"))
    assert saved == str(out)
    import yaml as _yaml

    cfg = _yaml.safe_load(out.read_text())
    tc = cfg["trainer_config"]
    assert tc["optimizer_name"] == "adamw"
    assert tc["lr_scheduler"]["cosine_annealing_warmup"]["max_epochs"] == 40
    assert tc["lr_scheduler"].get("reduce_lr_on_plateau") is None
    assert tc["early_stopping"]["patience"] == 5
    assert tc["early_stopping"]["stop_training_on_plateau"] is True
    assert tc["seed"] == 1234
    assert tc["run_name"] == "tui_run"
    assert tc["save_ckpt"] is True and tc["use_wandb"] is False
    ohkm = tc["online_hard_keypoint_mining"]
    assert ohkm["online_mining"] is True and ohkm["hard_to_easy_ratio"] == 3.0
    aug = cfg["data_config"]["augmentation_config"]
    geo, inten = aug["geometric"], aug["intensity"]
    assert geo["rotation_p"] == 0.9 and geo["translate_p"] == 0.25
    assert geo["translate_width"] == 0.1 and geo["translate_height"] == 0.1
    assert inten["gaussian_noise_p"] == 0.3
    assert inten["gaussian_noise_std"] == 0.05
    assert inten["contrast_min"] == 0.6 and inten["contrast_max"] == 1.8
    assert inten["brightness_min"] == 0.85 and inten["brightness_max"] == 1.3


def test_prompt_flow_scheduler_none_and_early_stop_off(tmp_path, monkeypatch,
                                                       capsys):
    out = tmp_path / "nosched.yaml"
    answers = _script({
        "scheduler": "none",
        "early_stop_patience": "0",
        "output": str(out),
    })
    saved, _ = _run_prompt(monkeypatch, answers, capsys,
                           default_out=str(tmp_path / "default.yaml"))
    cfg = yaml.safe_load((tmp_path / "nosched.yaml").read_text())
    tc = cfg["trainer_config"]
    sched = tc["lr_scheduler"]
    assert all(v is None for v in sched.values())
    assert tc["early_stopping"]["stop_training_on_plateau"] is False
