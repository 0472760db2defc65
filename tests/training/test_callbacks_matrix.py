"""Training-callback unit scenario matrix.

Reference scenario source: tests/training/test_callbacks.py — CSV logger
init/file ops/column handling, early-stopping arithmetic, progress metric
formatting, ZMQ log sanitization, epoch-end evaluation gating
(frequency/failure tolerance), and the TestMatchCentroids matrix.
Implementations under test: sleap_nn_tpu/training/callbacks.py and
sleap_nn_tpu/evaluation.py::match_centroids (reference callbacks.py:48,
:1030, :1100, :1198; evaluation.py:60).
"""

from __future__ import annotations

import csv
import math
from types import SimpleNamespace

import numpy as np
import pytest

from sleap_nn_tpu.evaluation import match_centroids
from sleap_nn_tpu.training.callbacks import (
    Callback,
    CSVLoggerCallback,
    EarlyStopping,
    EpochEndEvaluationCallback,
    ProgressCallback,
    _sanitize,
)


def read_csv(path):
    with open(path) as f:
        return list(csv.reader(f))


def stub_trainer(**kw):
    base = dict(should_stop=False, current_epoch=0)
    base.update(kw)
    return SimpleNamespace(**base)


# -- base protocol ------------------------------------------------------------


def test_base_callback_hooks_are_noops():
    cb = Callback()
    tr = stub_trainer()
    cb.on_train_start(tr)
    cb.on_train_end(tr)
    cb.on_epoch_start(tr, 0)
    cb.on_epoch_end(tr, 0, {})
    cb.on_batch_start(tr, 0)
    cb.on_batch_end(tr, 0, {})
    assert tr.should_stop is False


# -- CSVLoggerCallback --------------------------------------------------------


def test_csv_logger_writes_header_and_row(tmp_path):
    p = tmp_path / "log.csv"
    cb = CSVLoggerCallback(p)
    cb.on_epoch_end(stub_trainer(), 0, {"train/loss": 0.5, "val/loss": 0.6})
    rows = read_csv(p)
    assert rows[0] == ["epoch", "train/loss", "val/loss"]
    assert rows[1] == ["0", "0.5", "0.6"]


def test_csv_logger_custom_keys_are_fixed(tmp_path):
    p = tmp_path / "log.csv"
    cb = CSVLoggerCallback(p, keys=["epoch", "train/loss"])
    cb.on_epoch_end(stub_trainer(), 0, {"train/loss": 1.0, "surprise": 2.0})
    rows = read_csv(p)
    assert rows[0] == ["epoch", "train/loss"]
    assert rows[1] == ["0", "1.0"]  # 'surprise' never becomes a column


def test_csv_logger_columns_grow_with_new_metrics(tmp_path):
    # Periodic epoch-end eval introduces keys mid-run; earlier rows get "".
    p = tmp_path / "log.csv"
    cb = CSVLoggerCallback(p)
    cb.on_epoch_end(stub_trainer(), 0, {"train/loss": 1.0})
    cb.on_epoch_end(stub_trainer(), 1, {"train/loss": 0.9, "val/mOKS": 0.7})
    rows = read_csv(p)
    assert rows[0] == ["epoch", "train/loss", "val/mOKS"]
    assert rows[1] == ["0", "1.0", ""]
    assert rows[2] == ["1", "0.9", "0.7"]


def test_csv_logger_one_row_per_epoch_rewrite(tmp_path):
    p = tmp_path / "log.csv"
    cb = CSVLoggerCallback(p)
    for e in range(5):
        cb.on_epoch_end(stub_trainer(), e, {"train/loss": float(e)})
    rows = read_csv(p)
    assert len(rows) == 6 and [r[0] for r in rows[1:]] == list("01234")


# -- EarlyStopping ------------------------------------------------------------


def test_early_stopping_improvement_resets_wait():
    es = EarlyStopping(patience=2)
    tr = stub_trainer()
    es.on_epoch_end(tr, 0, {"val/loss": 1.0})
    es.on_epoch_end(tr, 1, {"val/loss": 1.0})  # wait=1
    es.on_epoch_end(tr, 2, {"val/loss": 0.5})  # improvement, wait=0
    es.on_epoch_end(tr, 3, {"val/loss": 0.5})  # wait=1
    assert tr.should_stop is False
    es.on_epoch_end(tr, 4, {"val/loss": 0.5})  # wait=2 -> stop
    assert tr.should_stop is True


def test_early_stopping_min_delta_counts_tiny_gains_as_plateau():
    es = EarlyStopping(patience=1, min_delta=0.1)
    tr = stub_trainer()
    es.on_epoch_end(tr, 0, {"val/loss": 1.0})
    es.on_epoch_end(tr, 1, {"val/loss": 0.95})  # gain < min_delta -> plateau
    assert tr.should_stop is True
    assert es.best == 1.0


def test_early_stopping_disabled_never_stops():
    es = EarlyStopping(patience=0, enabled=False)
    tr = stub_trainer()
    for e in range(5):
        es.on_epoch_end(tr, e, {"val/loss": 1.0})
    assert tr.should_stop is False


def test_early_stopping_missing_monitor_is_ignored():
    es = EarlyStopping(patience=1)
    tr = stub_trainer()
    for e in range(5):
        es.on_epoch_end(tr, e, {"train/loss": 1.0})
    assert tr.should_stop is False and es.best == math.inf


def test_early_stopping_custom_monitor():
    es = EarlyStopping(monitor="val/dist.avg", patience=1)
    tr = stub_trainer()
    es.on_epoch_end(tr, 0, {"val/dist.avg": 3.0})
    es.on_epoch_end(tr, 1, {"val/dist.avg": 4.0})
    assert tr.should_stop is True


# -- ProgressCallback ---------------------------------------------------------


def test_progress_prints_sorted_numeric_metrics(capsys):
    cb = ProgressCallback()
    cb.on_epoch_start(stub_trainer(), 0)
    cb.on_epoch_end(stub_trainer(), 0,
                    {"b": 2.0, "a": 1.0, "name": "skipme", "c": 3})
    out = capsys.readouterr().out
    assert "Epoch 0: a=1, b=2, c=3" in out
    assert "skipme" not in out


def test_progress_formats_small_values_compactly(capsys):
    cb = ProgressCallback()
    cb.on_epoch_start(stub_trainer(), 1)
    cb.on_epoch_end(stub_trainer(), 1, {"loss": 1.2345678e-7})
    out = capsys.readouterr().out
    assert "loss=1.2346e-07" in out


def test_progress_disabled_prints_nothing(capsys):
    cb = ProgressCallback(enabled=False)
    cb.on_epoch_end(stub_trainer(), 0, {"loss": 1.0})
    assert capsys.readouterr().out == ""


# -- ZMQ log sanitization -----------------------------------------------------


def test_sanitize_floats_numeric_and_preserves_rest():
    out = _sanitize({"a": np.float32(0.5), "b": 2, "c": "text", "d": None})
    assert out["a"] == 0.5 and isinstance(out["a"], float)
    assert out["b"] == 2.0 and isinstance(out["b"], float)
    assert out["c"] == "text" and out["d"] is None


def test_sanitize_empty_and_none():
    assert _sanitize({}) == {}
    assert _sanitize(None) == {}


# -- EpochEndEvaluationCallback gating ---------------------------------------


def make_eval_cb(frequency, monkeypatch, result=None, raise_=False):
    cb = EpochEndEvaluationCallback(trainer=None, frequency=frequency)
    calls = []

    def fake_evaluate(trainer):
        calls.append(trainer)
        if raise_:
            raise RuntimeError("eval exploded")
        return dict(result or {})

    monkeypatch.setattr(cb, "_evaluate", fake_evaluate)
    return cb, calls


def test_epoch_end_eval_respects_frequency(monkeypatch):
    cb, calls = make_eval_cb(3, monkeypatch, result={"val/mOKS": 0.5})
    logs = [dict() for _ in range(6)]
    for e in range(6):
        cb.on_epoch_end(stub_trainer(), e, logs[e])
    # fires on epochs 2 and 5 ((epoch+1) % 3 == 0)
    assert len(calls) == 2
    assert logs[2] == {"val/mOKS": 0.5} and logs[5] == {"val/mOKS": 0.5}
    assert logs[0] == {} and logs[1] == {} and logs[3] == {}


def test_epoch_end_eval_frequency_floor_is_one(monkeypatch):
    cb, calls = make_eval_cb(0, monkeypatch)
    for e in range(3):
        cb.on_epoch_end(stub_trainer(), e, {})
    assert len(calls) == 3


def test_epoch_end_eval_failure_never_breaks_training(monkeypatch, capsys):
    cb, _ = make_eval_cb(1, monkeypatch, raise_=True)
    logs = {"train/loss": 1.0}
    cb.on_epoch_end(stub_trainer(), 0, logs)  # must not raise
    assert logs == {"train/loss": 1.0}
    assert "epoch-end eval failed" in capsys.readouterr().out


# -- match_centroids matrix (reference TestMatchCentroids) --------------------


def test_match_perfect():
    g = np.array([[10.0, 10.0], [50.0, 50.0]])
    pairs, fn, fp = match_centroids(g, g.copy())
    assert {(r, c) for r, c, _ in pairs} == {(0, 0), (1, 1)}
    assert all(d == 0.0 for _, _, d in pairs)
    assert fn == [] and fp == []


def test_match_close_within_threshold():
    g = np.array([[10.0, 10.0]])
    p = np.array([[13.0, 14.0]])
    pairs, fn, fp = match_centroids(g, p, threshold=10.0)
    assert len(pairs) == 1 and pairs[0][2] == pytest.approx(5.0)


def test_no_match_beyond_threshold():
    g = np.array([[0.0, 0.0]])
    p = np.array([[100.0, 100.0]])
    pairs, fn, fp = match_centroids(g, p, threshold=50.0)
    assert pairs == [] and fn == [0] and fp == [0]


def test_more_predictions_than_gt():
    g = np.array([[10.0, 10.0]])
    p = np.array([[11.0, 10.0], [80.0, 80.0], [200.0, 200.0]])
    pairs, fn, fp = match_centroids(g, p, threshold=20.0)
    assert [(r, c) for r, c, _ in pairs] == [(0, 0)]
    assert fn == [] and sorted(fp) == [1, 2]


def test_more_gt_than_predictions():
    g = np.array([[10.0, 10.0], [80.0, 80.0], [200.0, 200.0]])
    p = np.array([[81.0, 80.0]])
    pairs, fn, fp = match_centroids(g, p, threshold=20.0)
    assert [(r, c) for r, c, _ in pairs] == [(1, 0)]
    assert sorted(fn) == [0, 2] and fp == []


def test_empty_predictions():
    g = np.array([[1.0, 2.0], [3.0, 4.0]])
    pairs, fn, fp = match_centroids(g, np.zeros((0, 2)))
    assert pairs == [] and fn == [0, 1] and fp == []


def test_empty_gt():
    p = np.array([[1.0, 2.0]])
    pairs, fn, fp = match_centroids(np.zeros((0, 2)), p)
    assert pairs == [] and fn == [] and fp == [0]


def test_both_empty():
    pairs, fn, fp = match_centroids(np.zeros((0, 2)), np.zeros((0, 2)))
    assert pairs == [] and fn == [] and fp == []


def test_hungarian_optimal_matching_not_greedy():
    # Greedy nearest-first would pair gt0->p0 (dist 5) and strand gt1
    # (dist to p1 = 60 > threshold miss?); optimal pairs gt0->p1, gt1->p0
    # minimizing total cost. Mirrors the reference's optimality scenario.
    g = np.array([[0.0, 0.0], [10.0, 0.0]])
    p = np.array([[6.0, 0.0], [4.0, 0.0]])
    pairs, fn, fp = match_centroids(g, p, threshold=50.0)
    total = sum(d for _, _, d in pairs)
    assert {(r, c) for r, c, _ in pairs} == {(0, 1), (1, 0)}
    assert total == pytest.approx(4.0 + 4.0)
    assert fn == [] and fp == []


def test_match_centroids_nan_rows_never_match():
    g = np.array([[np.nan, np.nan], [10.0, 10.0]])
    p = np.array([[10.0, 10.0]])
    pairs, fn, fp = match_centroids(g, p, threshold=5.0)
    assert [(r, c) for r, c, _ in pairs] == [(1, 0)]
    assert fn == [0]
