"""Inference run-observability logging (reference issue #610 PR-B).

Parity target: reference tests/inference/test_issue_610_logging.py — the
Predictor emits three library-logger lines per run:

* ``Loaded inference model | ...`` at ``from_model_paths`` (spin-up header),
* ``Starting inference | ...`` once the provider is built,
* ``Inference complete | ...`` after the run (frames, instances/frame,
  throughput, tracking, output),

plus per-filter confirmation lines (reference predictor.py:1306). Fast unit
tests drive the formatting helpers directly; integration tests run a real
``predict()`` so all lines are asserted end-to-end.
"""

import logging
from pathlib import Path
from types import SimpleNamespace

import pytest

from sleap_nn_tpu.inference import predict
from sleap_nn_tpu.inference.filters import FilterConfig
from sleap_nn_tpu.inference.predictor import Predictor
from sleap_nn_tpu.inference.providers import LabelsProvider
from sleap_nn_tpu.io import load_slp

from tests.inference.test_e2e import FIXTURE

LOGGER = "sleap_nn_tpu"


def _bare_predictor(**attrs) -> Predictor:
    """A Predictor shell for driving the logging helpers directly."""
    p = Predictor.__new__(Predictor)
    p.model_type = attrs.pop("model_type", "centroid")
    for k, v in attrs.items():
        setattr(p, k, v)
    return p


# ─── _describe_source ────────────────────────────────────────────────────


def test_describe_source_str_passthrough():
    assert Predictor._describe_source("clip.mp4") == "clip.mp4"


def test_describe_source_path_stringified(tmp_path):
    p = tmp_path / "vid.slp"
    assert Predictor._describe_source(p) == str(p)


def test_describe_source_prefers_filename_attr():
    src = SimpleNamespace(filename="/data/session1.mp4")
    assert Predictor._describe_source(src) == "/data/session1.mp4"


def test_describe_source_falls_back_to_type_name():
    class Exotic:
        pass

    assert Predictor._describe_source(Exotic()) == "Exotic"


# ─── _log_inference_summary ──────────────────────────────────────────────


def test_summary_reports_frames_throughput_tracking(caplog):
    p = _bare_predictor()
    with caplog.at_level(logging.INFO, logger=LOGGER):
        p._log_inference_summary(n_frames=100, elapsed_s=4.0)
    (line,) = [r.message for r in caplog.records]
    assert line.startswith("Inference complete | ")
    assert "frames=100" in line
    assert "elapsed=4.0s" in line
    assert "throughput=25.0 fps" in line
    assert "tracking=False" in line
    assert "instances=" not in line  # objects omitted on the streaming path


def test_summary_objects_per_frame_and_output(caplog):
    p = _bare_predictor(tracking_active=True)
    with caplog.at_level(logging.INFO, logger=LOGGER):
        p._log_inference_summary(
            n_frames=4, elapsed_s=2.0, n_objects=10, output="out.slp"
        )
    (line,) = [r.message for r in caplog.records]
    assert "instances=10 (2.50/frame)" in line
    assert "tracking=True" in line
    assert line.endswith("output=out.slp")


def test_summary_masks_label_and_zero_guards(caplog):
    p = _bare_predictor()
    with caplog.at_level(logging.INFO, logger=LOGGER):
        p._log_inference_summary(
            n_frames=0, elapsed_s=0.0, n_objects=0, object_label="masks"
        )
    (line,) = [r.message for r in caplog.records]
    # Zero frames / zero elapsed must not divide-by-zero.
    assert "masks=0 (0.00/frame)" in line
    assert "throughput=0.0 fps" in line


# ─── _log_filter_config ──────────────────────────────────────────────────


def test_filter_log_silent_when_no_filters(caplog):
    p = _bare_predictor(filters=None)
    with caplog.at_level(logging.INFO, logger=LOGGER):
        p._log_filter_config()
    assert caplog.records == []


def test_filter_log_silent_when_filters_disabled(caplog):
    p = _bare_predictor(filters=FilterConfig())
    with caplog.at_level(logging.INFO, logger=LOGGER):
        p._log_filter_config()
    assert caplog.records == []


def test_filter_log_node_count_line(caplog):
    p = _bare_predictor(filters=FilterConfig(min_node_count=3))
    with caplog.at_level(logging.INFO, logger=LOGGER):
        p._log_filter_config()
    (line,) = [r.message for r in caplog.records]
    assert "node count" in line and "min_node_count=3" in line


def test_filter_log_confidence_line(caplog):
    p = _bare_predictor(
        filters=FilterConfig(min_instance_score=0.5, min_mean_node_score=0.2)
    )
    with caplog.at_level(logging.INFO, logger=LOGGER):
        p._log_filter_config()
    (line,) = [r.message for r in caplog.records]
    assert "confidence" in line
    assert "min_instance_score=0.5" in line
    assert "min_mean_node_score=0.2" in line


def test_filter_log_overlap_line_uppercases_method(caplog):
    p = _bare_predictor(
        filters=FilterConfig(overlap_method="oks", overlap_threshold=0.9)
    )
    with caplog.at_level(logging.INFO, logger=LOGGER):
        p._log_filter_config()
    (line,) = [r.message for r in caplog.records]
    assert "OKS threshold: 0.9" in line


def test_filter_log_centroid_distance_line(caplog):
    p = _bare_predictor(filters=FilterConfig(max_centroid_distance=12.5))
    with caplog.at_level(logging.INFO, logger=LOGGER):
        p._log_filter_config()
    (line,) = [r.message for r in caplog.records]
    assert "max_centroid_distance=12.5" in line


def test_filter_log_one_line_per_active_family(caplog):
    p = _bare_predictor(
        filters=FilterConfig(
            min_node_count=2,
            min_instance_score=0.1,
            overlap_method="iou",
            max_centroid_distance=5.0,
        )
    )
    with caplog.at_level(logging.INFO, logger=LOGGER):
        p._log_filter_config()
    assert len(caplog.records) == 4


# ─── _log_inference_start ────────────────────────────────────────────────


def test_start_line_from_labels_provider(caplog):
    labels = load_slp(FIXTURE)
    provider = LabelsProvider(labels, batch_size=2)
    p = _bare_predictor()
    with caplog.at_level(logging.INFO, logger=LOGGER):
        p._log_inference_start(FIXTURE, provider)
    (line,) = [r.message for r in caplog.records]
    assert line.startswith("Starting inference | ")
    assert f"source={FIXTURE}" in line
    assert f"frames={len(labels.labeled_frames)}" in line
    assert f"videos={len(labels.videos)}" in line
    assert "tracking=False" in line


def test_start_line_unknown_provider_defaults(caplog):
    p = _bare_predictor(tracking_active=True)
    provider = SimpleNamespace()  # no n_frames / lfs / labels / video
    with caplog.at_level(logging.INFO, logger=LOGGER):
        p._log_inference_start("x.mp4", provider)
    (line,) = [r.message for r in caplog.records]
    assert "frames=?" in line
    assert "videos=1" in line
    assert "tracking=True" in line


# ─── integration: the three lines end-to-end ─────────────────────────────


@pytest.fixture(scope="module")
def centroid_model(tiny_centroid_2ep_model):
    # session-shared 2-epoch centroid (structure over accuracy)
    return tiny_centroid_2ep_model


def test_predict_emits_all_three_lines(centroid_model, tmp_path, caplog):
    labels = load_slp(FIXTURE)
    out = tmp_path / "preds.slp"
    with caplog.at_level(logging.INFO, logger=LOGGER):
        predict(labels, [centroid_model], output_path=out, peak_threshold=0.2)
    msgs = [r.message for r in caplog.records]
    loaded = [m for m in msgs if m.startswith("Loaded inference model | ")]
    started = [m for m in msgs if m.startswith("Starting inference | ")]
    done = [m for m in msgs if m.startswith("Inference complete | ")]
    assert len(loaded) == 1 and len(started) == 1 and len(done) == 1
    assert "type=centroid" in loaded[0]
    assert "backbone=unet" in loaded[0]
    assert "batch_size=4" in loaded[0]
    assert "peak_threshold=0.2" in loaded[0]
    assert f"frames={len(labels.labeled_frames)}" in started[0]
    assert f"frames={len(labels.labeled_frames)}" in done[0]
    assert f"output={out}" in done[0]
    assert "tracking=False" in done[0]


def test_predict_spinup_header_precedes_start_line(centroid_model, caplog):
    labels = load_slp(FIXTURE)
    with caplog.at_level(logging.INFO, logger=LOGGER):
        predict(labels, [centroid_model], peak_threshold=0.2)
    msgs = [r.message for r in caplog.records]
    i_loaded = next(i for i, m in enumerate(msgs) if m.startswith("Loaded"))
    i_start = next(i for i, m in enumerate(msgs) if m.startswith("Starting"))
    i_done = next(i for i, m in enumerate(msgs) if m.startswith("Inference complete"))
    assert i_loaded < i_start < i_done


def test_predict_filter_confirmation_between_start_and_done(
    centroid_model, caplog
):
    labels = load_slp(FIXTURE)
    with caplog.at_level(logging.INFO, logger=LOGGER):
        predict(
            labels, [centroid_model], peak_threshold=0.2,
            filters=FilterConfig(min_instance_score=0.05),
        )
    msgs = [r.message for r in caplog.records]
    confirm = [m for m in msgs if "Filtering instances by confidence" in m]
    assert len(confirm) == 1
    assert "min_instance_score=0.05" in confirm[0]


def test_predict_tracking_flag_reflected_in_lines(centroid_model, caplog):
    # A lone-centroid prediction can't track (single node is fine for the
    # centroid tracker features), so use tracking over the instance output.
    labels = load_slp(FIXTURE)
    with caplog.at_level(logging.INFO, logger=LOGGER):
        predict(
            labels, [centroid_model], peak_threshold=0.2,
            tracking=True, max_instances=2,
        )
    msgs = [r.message for r in caplog.records]
    started = next(m for m in msgs if m.startswith("Starting inference"))
    done = next(m for m in msgs if m.startswith("Inference complete"))
    assert "tracking=True" in started
    assert "tracking=True" in done


def test_predict_raw_results_summary_omits_objects(centroid_model, caplog):
    labels = load_slp(FIXTURE)
    with caplog.at_level(logging.INFO, logger=LOGGER):
        predict(labels, [centroid_model], peak_threshold=0.2, make_labels=False)
    done = next(
        r.message for r in caplog.records
        if r.message.startswith("Inference complete")
    )
    assert "instances=" not in done


def test_cli_group_installs_library_log_handler():
    from sleap_nn_tpu.cli import cli

    lib = logging.getLogger(LOGGER)
    root = logging.getLogger()
    before = list(lib.handlers)
    root_before = list(root.handlers)
    try:
        for h in before:
            lib.removeHandler(h)
        # Simulate an unconfigured app: pytest installs root handlers, which
        # correctly suppress the CLI's fallback handler (propagation covers
        # the lines) — strip them for this check.
        for h in root_before:
            root.removeHandler(h)
        cli.callback()
        assert lib.handlers, "group callback should install a stderr handler"
        assert lib.level == logging.INFO
        # Idempotent: a second invocation must not stack handlers.
        cli.callback()
        assert len(lib.handlers) == 1
    finally:
        for h in list(lib.handlers):
            lib.removeHandler(h)
        for h in before:
            lib.addHandler(h)
        for h in root_before:
            root.addHandler(h)


def test_scoped_override_does_not_duplicate_spinup_header(
    centroid_model, caplog
):
    """Per-call return_confmaps replays the builder for a scoped layer; the
    replay must NOT emit a second 'Loaded inference model' header mid-run
    (review finding r3; docs promise one header per run)."""
    labels = load_slp(FIXTURE)
    from sleap_nn_tpu.inference.predictor import Predictor

    with caplog.at_level(logging.INFO, logger=LOGGER):
        p = Predictor.from_model_paths([centroid_model], peak_threshold=0.2)
        p.predict(labels, return_confmaps=True)
    loaded = [r.message for r in caplog.records
              if r.message.startswith("Loaded inference model")]
    assert len(loaded) == 1
