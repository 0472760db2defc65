"""Aux surface matrix: provenance, incremental writer, streaming pool,
system info, mesh helpers, pallas parity.

Reference scenario sources: tests/inference/test_provenance.py,
test_writer.py, test_streaming.py; tests/test_system_info.py.
"""

from __future__ import annotations

import os
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sleap_nn_tpu.inference.provenance import build_inference_provenance
from sleap_nn_tpu.inference.writer import IncrementalLabelsWriter
from sleap_nn_tpu.io import LabeledFrame, Labels, PredictedInstance, Skeleton

SKEL = Skeleton(nodes=["a", "b"])


def frames(n, offset=0):
    return [
        LabeledFrame(None, i + offset, [PredictedInstance(
            points=np.array([[float(i), 1.0], [2.0, float(i)]]),
            skeleton=SKEL, point_scores=np.ones(2), score=0.5)])
        for i in range(n)
    ]


# ── provenance ───────────────────────────────────────────────────────────────


def test_provenance_carries_versions_and_hashes(tmp_path):
    d = tmp_path / "model"
    d.mkdir()
    (d / "training_config.yaml").write_text("data_config: {}\n")
    prov = build_inference_provenance([d], stats={"fps": 10.0})
    assert prov["sleap_nn_tpu_version"]
    assert prov["jax_version"]
    assert prov["models"][0]["path"] == str(d)
    assert len(prov["models"][0]["training_config_sha256"]) == 64
    assert prov["stats"]["fps"] == 10.0
    assert prov["model_paths"] == [str(d)]


def test_provenance_hash_changes_with_config(tmp_path):
    d = tmp_path / "m"
    d.mkdir()
    cfg = d / "training_config.yaml"
    cfg.write_text("a: 1\n")
    h1 = build_inference_provenance([d])["models"][0]["training_config_sha256"]
    cfg.write_text("a: 2\n")
    h2 = build_inference_provenance([d])["models"][0]["training_config_sha256"]
    assert h1 != h2


def test_provenance_missing_config_tolerated(tmp_path):
    prov = build_inference_provenance([tmp_path])
    assert "training_config_sha256" not in prov["models"][0]


def test_provenance_extra_fields_merge(tmp_path):
    prov = build_inference_provenance([], extra={"custom": "yes"})
    assert prov["custom"] == "yes"


# ── incremental writer ───────────────────────────────────────────────────────


def test_writer_flushes_at_interval(tmp_path):
    out = tmp_path / "w.slp"
    w = IncrementalLabelsWriter(out, flush_every=3)
    w.add_frames(frames(2))
    assert not w.tmp_path.exists()  # below the interval
    w.add_frames(frames(1, offset=2))
    assert w.tmp_path.exists()  # interval reached -> temp flushed
    from sleap_nn_tpu.io import load_slp

    partial = load_slp(str(w.tmp_path))
    assert len(partial.labeled_frames) == 3
    w.finalize()
    assert out.exists() and not w.tmp_path.exists()


def test_writer_finalize_atomic_and_complete(tmp_path):
    out = tmp_path / "w.slp"
    with IncrementalLabelsWriter(out, flush_every=100) as w:
        w.add_frames(frames(5))
    from sleap_nn_tpu.io import load_slp

    labels = load_slp(str(out))
    assert len(labels.labeled_frames) == 5
    assert sorted(lf.frame_idx for lf in labels.labeled_frames) == list(range(5))


def test_writer_context_exit_on_error_keeps_tmp(tmp_path):
    out = tmp_path / "w.slp"
    try:
        with IncrementalLabelsWriter(out, flush_every=1) as w:
            w.add_frames(frames(2))
            raise RuntimeError("crash")
    except RuntimeError:
        pass
    # crash before finalize: the temp survives for recovery, no final file
    assert w.tmp_path.exists() and not out.exists()


def test_writer_provenance_written(tmp_path):
    out = tmp_path / "w.slp"
    with IncrementalLabelsWriter(out, flush_every=10,
                                 provenance={"k": "v"}) as w:
        w.add_frames(frames(1))
    from sleap_nn_tpu.io import load_slp

    assert load_slp(str(out)).provenance.get("k") == "v"


# ── streaming pool ───────────────────────────────────────────────────────────


def test_group_batch_host_roundtrip():
    from sleap_nn_tpu.inference.paf_grouping import PAFScorer
    from sleap_nn_tpu.inference.streaming import group_batch_host

    scorer = PAFScorer(part_names=["a", "b"], edges=[("a", "b")], pafs_stride=2)
    k = scorer.k_per_node
    peaks = np.full((1, 2, k, 2), np.nan, np.float32)
    vals = np.zeros((1, 2, k), np.float32)
    peaks[0, 0, 0] = [2.0, 2.0]
    peaks[0, 1, 0] = [6.0, 6.0]
    vals[0, :, 0] = 0.9
    scores = np.full((1, 1, k, k), -np.inf, np.float32)
    scores[0, 0, 0, 0] = 0.8
    out = group_batch_host(
        {"grouped_peaks": peaks, "grouped_vals": vals, "scores": scores,
         "lift": 1.0},
        scorer, max_instances=None,
    )
    assert len(out["pred_keypoints"][0]) == 1
    np.testing.assert_allclose(out["pred_keypoints"][0][0],
                               [[2, 2], [6, 6]])
    assert np.isclose(out["pred_instance_scores"][0][0], 0.8)


def test_paf_pool_fifo_order():
    from sleap_nn_tpu.inference.paf_grouping import PAFScorer
    from sleap_nn_tpu.inference.streaming import PafGroupingPool

    scorer = PAFScorer(part_names=["a", "b"], edges=[("a", "b")], pafs_stride=2)
    k = scorer.k_per_node

    def payload(x):
        peaks = np.full((1, 2, k, 2), np.nan, np.float32)
        peaks[0, 0, 0] = [x, x]
        peaks[0, 1, 0] = [x + 1, x + 1]
        vals = np.zeros((1, 2, k), np.float32)
        vals[0, :, 0] = 0.9
        scores = np.full((1, 1, k, k), -np.inf, np.float32)
        scores[0, 0, 0, 0] = 0.9
        return {"grouped_peaks": peaks, "grouped_vals": vals,
                "scores": scores, "lift": 1.0}

    with PafGroupingPool(2, scorer, None) as pool:
        for i in range(4):
            pool.submit(i, payload(float(i * 10)))
        got = list(pool.iter_completed())
    assert [o for o, _ in got] == [0, 1, 2, 3]  # FIFO despite 2 workers
    for ordinal, res in got:
        np.testing.assert_allclose(
            res["pred_keypoints"][0][0][0], [ordinal * 10] * 2)


# ── system info / mesh ───────────────────────────────────────────────────────


def test_system_info_dict_contents():
    from sleap_nn_tpu.system_info import get_system_info_dict

    info = get_system_info_dict()
    assert info["jax"]
    assert info["device_count"] >= 1
    assert info["devices"]


def test_device_smoke_test_passes():
    from sleap_nn_tpu.system_info import test_device_operations as smoke

    out = smoke()
    assert out["ok"] is True


def test_mesh_helpers_shard_and_replicate():
    from sleap_nn_tpu.parallel.mesh import get_mesh, replicate, shard_batch

    mesh = get_mesh()
    assert mesh.devices.size == len(jax.devices())
    batch = {"x": np.arange(16, dtype=np.float32).reshape(8, 2),
             "n": np.float32(3.0)}
    out = shard_batch(batch, mesh)
    assert out["x"].shape == (8, 2)
    np.testing.assert_allclose(np.asarray(out["x"]), batch["x"])
    assert out["n"].sharding.is_fully_replicated


# ── pallas kernels vs XLA reference ──────────────────────────────────────────


def test_pallas_nms_matches_xla(monkeypatch):
    from sleap_nn_tpu.ops.pallas_kernels import nms_scores_pallas
    from sleap_nn_tpu.ops.peaks import nms_max_pool

    rng = np.random.default_rng(0)
    cms = jnp.asarray(rng.random((2, 32, 32, 3)).astype(np.float32))
    got = np.asarray(nms_scores_pallas(cms, 0.3, interpret=True))
    is_peak = (cms > nms_max_pool(cms)) & (cms > 0.3)
    want = np.where(np.asarray(is_peak), np.asarray(cms), -np.inf)
    np.testing.assert_allclose(got, want)


def test_pallas_confmaps_match_xla(monkeypatch):
    from sleap_nn_tpu.ops.confmaps import make_confmaps
    from sleap_nn_tpu.ops.grid import make_grid_vectors
    from sleap_nn_tpu.ops.pallas_kernels import make_multi_confmaps_pallas

    rng = np.random.default_rng(1)
    pts = jnp.asarray(rng.uniform(0, 30, (2, 3, 2, 2)).astype(np.float32))
    xv, yv = make_grid_vectors(32, 32, 1)
    got = np.asarray(make_multi_confmaps_pallas(pts, xv, yv, 2.0,
                                                interpret=True))
    want = np.asarray(jnp.max(make_confmaps(pts, xv, yv, 2.0), axis=-4))
    np.testing.assert_allclose(got, want, atol=1e-5)
