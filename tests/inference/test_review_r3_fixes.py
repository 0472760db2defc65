"""Regression tests for the round-3 code-review findings.

One test per finding: legacy-shim PAF kwargs forwarding, bottomup
return_confmaps carry-through, pred_paf_graph host-coordinate lifting,
remote-fetch failure hygiene + timeout, sam_legacy checkpoint validation,
group_sample match exposure (no duplicate Hungarian), the shared
negative-frame predicate, and positional from_model_paths compatibility.
"""

from __future__ import annotations

import urllib.error
import warnings
from pathlib import Path

import numpy as np
import pytest

CKPTS = Path("/root/reference/tests/assets/model_ckpts")


# -- finding 1: legacy shim forwards PAF grouping kwargs ----------------------


def test_legacy_shim_forwards_paf_kwargs():
    from sleap_nn_tpu.inference.predictors import BottomUpPredictor

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        p = BottomUpPredictor.from_trained_models(
            str(CKPTS / "minimal_instance_bottomup"),
            max_edge_length_ratio=0.5,
            min_line_scores=0.05,
            n_points=7,
            dist_penalty_weight=2.0,
        )
    scorer = p.layer.paf_scorer
    assert scorer.min_line_scores == 0.05
    assert scorer.max_edge_length_ratio == 0.5
    assert scorer.n_points == 7
    assert scorer.dist_penalty_weight == 2.0


# -- finding 2: bottomup return_confmaps reaches the output dicts -------------


def test_bottomup_return_confmaps_in_results():
    from sleap_nn_tpu.inference.predictor import Predictor

    p = Predictor.from_model_paths(
        [str(CKPTS / "minimal_instance_bottomup")], batch_size=2,
        return_confmaps=True, peak_threshold=0.1,
    )
    imgs = np.random.RandomState(0).randint(
        0, 255, (2, 384, 384, 1), np.uint8)
    out = p.layer.predict(imgs)
    assert "confmaps" in out and "pafs" in out
    assert np.asarray(out["confmaps"]).shape[0] == 2
    # and through the pool payload path too
    payload = p.layer.device_to_payload(p.layer.predict_async(imgs))
    assert "confmaps" in payload and "pafs" in payload


# -- finding 3: pred_paf_graph peaks lifted with host resize ------------------


def test_lift_host_coords_lifts_paf_graph():
    from sleap_nn_tpu.inference.predictor import Predictor

    peaks = np.array([[2.0, 4.0], [6.0, 8.0]])
    out = {
        "pred_keypoints": [np.array([[2.0, 4.0]])],
        "pred_paf_graph": [
            (peaks, np.array([0]), np.array([[0, 1]]), np.array([0.9]))
        ],
    }
    lifted = Predictor._lift_host_coords(out, 0.5)
    np.testing.assert_allclose(lifted["pred_keypoints"][0], [[4.0, 8.0]])
    g_peaks, e, ep, ls = lifted["pred_paf_graph"][0]
    np.testing.assert_allclose(g_peaks, peaks / 0.5)
    assert e.tolist() == [0] and ls.tolist() == [pytest.approx(0.9)]


# -- finding 4: remote fetch failure hygiene + timeout ------------------------


def test_fetch_remote_failure_leaves_no_temp_file(monkeypatch, tmp_path):
    import sleap_nn_tpu.inference.run as run_mod

    def exploding_urlopen(req, timeout=None):
        raise urllib.error.URLError("no route")

    import urllib.request as ur

    monkeypatch.setattr(ur, "urlopen", exploding_urlopen)
    monkeypatch.setenv("TMPDIR", str(tmp_path))
    import tempfile

    tempfile.tempdir = None  # re-read TMPDIR
    try:
        with pytest.raises(urllib.error.URLError):
            run_mod.fetch_remote_data("https://host/file.slp")
    finally:
        tempfile.tempdir = None
    assert list(tmp_path.glob("sleap_nn_tpu_remote_*")) == []


def test_fetch_remote_passes_timeout(monkeypatch):
    import io

    import sleap_nn_tpu.inference.run as run_mod

    seen = {}

    def fake_urlopen(req, timeout=None):
        seen["timeout"] = timeout
        return io.BytesIO(b"x")

    import urllib.request as ur

    monkeypatch.setattr(ur, "urlopen", fake_urlopen)
    out = run_mod.fetch_remote_data("https://host/file.slp", timeout=7.5)
    Path(out).unlink(missing_ok=True)
    assert seen["timeout"] == 7.5


# -- finding 5: sam_legacy checkpoint validation ------------------------------


def test_sam_legacy_rejects_hub_model_id():
    from sleap_nn_tpu.inference.sam.backends import SamLegacyBackend

    with pytest.raises(ValueError, match="LOCAL"):
        SamLegacyBackend.from_checkpoint("facebook/sam-vit-huge")


@pytest.mark.parametrize("name,expect", [
    ("sam_vit_b_01ec64.pth", "vit_b"),
    ("sam_vit_l_0b3195.pth", "vit_l"),
    ("sam_vit_h_4b8939.pth", "vit_h"),
    ("custom_checkpoint.pth", "vit_h"),
])
def test_sam_legacy_infers_model_type(name, expect):
    from sleap_nn_tpu.inference.sam.backends import SamLegacyBackend

    assert SamLegacyBackend._infer_model_type(name) == expect


# -- finding 6: group_sample exposes its matches ------------------------------


def test_group_sample_return_matches_no_recompute():
    from sleap_nn_tpu.inference.paf_grouping import (
        PAFScorer,
        match_candidates_dense,
    )

    rng = np.random.RandomState(1)
    k, n_nodes = 4, 2
    scorer = PAFScorer(part_names=["a", "b"], edges=[("a", "b")],
                       min_line_scores=0.1)
    scores = rng.uniform(0.2, 1.0, (1, k, k)).astype(np.float32)
    gp = rng.uniform(0, 100, (n_nodes, k, 2)).astype(np.float32)
    gv = rng.uniform(0.5, 1.0, (n_nodes, k)).astype(np.float32)

    pts, vals, inst_scores, matches = scorer.group_sample(
        gp, gv, scores, return_matches=True)
    pts2, vals2, inst_scores2 = scorer.group_sample(gp, gv, scores)
    np.testing.assert_allclose(pts, pts2)
    expected = match_candidates_dense(scores, scorer.min_line_scores)
    assert sorted((e, s, d) for e, s, d, _ in matches) == sorted(
        (e, s, d) for e, s, d, _ in expected)


# -- finding 7: one shared negative-frame predicate ---------------------------


def test_negative_frame_predicate_is_shared():
    from sleap_nn_tpu.io.model import (
        LabeledFrame,
        Labels,
        is_negative_frame,
        Skeleton,
        Instance,
    )

    sk = Skeleton(["a", "b"])
    empty = LabeledFrame(None, 0, [])
    full = LabeledFrame(None, 1, [Instance(np.zeros((2, 2)), sk)])
    assert is_negative_frame(empty) and not is_negative_frame(full)
    lab = Labels(labeled_frames=[empty, full], videos=[], skeletons=[sk])
    assert lab.negative_frames == [empty]


# -- finding 8: positional from_model_paths keeps working ---------------------


def test_from_model_paths_accepts_positional_options():
    from sleap_nn_tpu.inference.predictor import Predictor

    p = Predictor.from_model_paths(
        [str(CKPTS / "minimal_instance_single_instance")], 0.1)
    assert p.layer.post.peak_threshold == 0.1
    # the _ctor record stays keyword-only for scoped replay
    assert p._ctor[1].get("peak_threshold") == 0.1
