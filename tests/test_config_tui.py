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


def _run_prompt(monkeypatch, answers: str, capsys):
    monkeypatch.setattr("sys.stdin", io.StringIO(answers))
    from sleap_nn_tpu.config_generator.tui import launch_tui

    saved = launch_tui(FIXTURE)
    return saved, capsys.readouterr().out


def test_prompt_flow_edits_every_knob(tmp_path, monkeypatch, capsys):
    out = tmp_path / "edited.yaml"
    answers = "\n".join([
        "bottomup",      # pipeline
        "",              # backbone (keep unet)
        "3.5",           # sigma
        "0.5",           # scale
        "4",             # output_stride
        "32",            # max_stride
        "16",            # filters
        "2.0",           # filters_rate
        "8",             # batch_size
        "50",            # max_epochs
        "90",            # rotation
        "off",           # augmentation
        str(out),        # output path
        "",              # confirm save (default yes)
    ]) + "\n"
    saved, printed = _run_prompt(monkeypatch, answers, capsys)
    assert saved == str(out)
    cfg = yaml.safe_load(out.read_text())
    unet = cfg["model_config"]["backbone_config"]["unet"]
    assert unet["filters"] == 16 and unet["filters_rate"] == 2.0
    assert unet["max_stride"] == 32 and unet["output_stride"] == 4
    bu = cfg["model_config"]["head_configs"]["bottomup"]
    assert bu["confmaps"]["sigma"] == 3.5
    assert bu["confmaps"]["output_stride"] == 4
    assert bu["pafs"]["output_stride"] == 4  # lifted to match decoder
    assert cfg["data_config"]["preprocessing"]["scale"] == 0.5
    assert cfg["data_config"]["use_augmentations_train"] is False
    assert cfg["trainer_config"]["max_epochs"] == 50
    assert cfg["trainer_config"]["train_data_loader"]["batch_size"] == 8
    # the memory gauge rendered live during configuration
    assert "memory [" in printed and "GB" in printed


def test_prompt_flow_validation_reprompts(tmp_path, monkeypatch, capsys):
    out = tmp_path / "valid.yaml"
    answers = "\n".join([
        "", "",          # model select defaults
        "-2", "4.0",     # sigma: invalid then valid
        "", "",          # scale, output_stride
        "33", "64",      # max_stride: not a power of 2, then valid
        "", "", "", "", "", "",  # filters..augmentation defaults
        str(out), "",
    ]) + "\n"
    saved, printed = _run_prompt(monkeypatch, answers, capsys)
    assert saved == str(out)
    assert "must be in (0, 50]" in printed
    assert "power of 2" in printed
    cfg = yaml.safe_load(out.read_text())
    assert cfg["model_config"]["backbone_config"]["unet"]["max_stride"] == 64
    head = cfg["model_config"]["head_configs"]["centered_instance"]
    assert head["confmaps"]["sigma"] == 4.0


def test_prompt_flow_decline_save(tmp_path, monkeypatch, capsys):
    answers = "\n" * 12 + str(tmp_path / "never.yaml") + "\n" + "n\n"
    saved, _ = _run_prompt(monkeypatch, answers, capsys)
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
