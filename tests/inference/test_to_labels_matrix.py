"""Predictor.to_labels conversion + run.predict source-scoping matrix.

Reference scenario sources: tests/inference/test_outputs.py
(Outputs.to_instances behaviors) and run.predict's frame/label scoping
options (only_labeled/only_predicted/exclude_user_labeled/video_index).
"""

from __future__ import annotations

from pathlib import Path
from types import SimpleNamespace

import numpy as np
import pytest

from sleap_nn_tpu.inference.predictor import Predictor
from sleap_nn_tpu.io import (
    Instance,
    LabeledFrame,
    Labels,
    PredictedInstance,
    Skeleton,
)
from sleap_nn_tpu.io.video import Video

CKPTS = Path("/root/reference/tests/assets/model_ckpts")
FIXTURE = "/root/reference/tests/assets/datasets/minimal_instance.pkg.slp"

SKEL = Skeleton(nodes=["a", "b"])


def bare_predictor(model_type):
    p = Predictor.__new__(Predictor)
    p.model_type = model_type
    p.skeleton = SKEL
    p.models = []
    p.batch_size = 1
    return p


def test_to_labels_single_instance_basic():
    p = bare_predictor("single_instance")
    out = {
        "frame_inds": np.array([0, 1]),
        "video_inds": np.array([0, 0]),
        "valid": np.array([True, True]),
        "pred_keypoints": np.array([
            [[[1.0, 2.0], [3.0, 4.0]]],
            [[[5.0, 6.0], [7.0, 8.0]]],
        ]),
        "pred_peak_values": np.array([[[0.9, 0.8]], [[0.7, 0.6]]]),
    }
    labels = p.to_labels([out])
    assert len(labels.labeled_frames) == 2
    inst = labels.labeled_frames[0].predicted_instances[0]
    np.testing.assert_allclose(inst.numpy(), [[1, 2], [3, 4]])
    assert np.isclose(inst.score, (0.9 + 0.8) / 2)


def test_to_labels_invalid_rows_skipped():
    p = bare_predictor("single_instance")
    out = {
        "frame_inds": np.array([0, 0]),
        "video_inds": np.array([0, 0]),
        "valid": np.array([True, False]),  # pad row
        "pred_keypoints": np.array([
            [[[1.0, 2.0], [3.0, 4.0]]],
            [[[9.0, 9.0], [9.0, 9.0]]],
        ]),
        "pred_peak_values": np.ones((2, 1, 2)),
    }
    labels = p.to_labels([out])
    assert len(labels.labeled_frames) == 1


def test_to_labels_all_nan_instance_dropped():
    p = bare_predictor("single_instance")
    out = {
        "frame_inds": np.array([0]),
        "video_inds": np.array([0]),
        "valid": np.array([True]),
        "pred_keypoints": np.full((1, 1, 2, 2), np.nan),
        "pred_peak_values": np.zeros((1, 1, 2)),
    }
    labels = p.to_labels([out])
    assert labels.labeled_frames == []


def test_to_labels_topdown_instance_validity():
    p = bare_predictor("topdown")
    out = {
        "frame_inds": np.array([0]),
        "video_inds": np.array([0]),
        "valid": np.array([True]),
        "pred_keypoints": np.array([[
            [[1.0, 1.0], [2.0, 2.0]],
            [[5.0, 5.0], [6.0, 6.0]],
        ]]),
        "pred_peak_values": np.ones((1, 2, 2)),
        "instance_valid": np.array([[True, False]]),
    }
    labels = p.to_labels([out])
    assert len(labels.labeled_frames[0].predicted_instances) == 1


def test_to_labels_multiclass_tracks_named_by_class():
    p = bare_predictor("multi_class_bottomup")
    p.class_names = ["female", "male"]
    out = {
        "frame_inds": np.array([0]),
        "video_inds": np.array([0]),
        "valid": np.array([True]),
        "pred_keypoints": np.array([[
            [[1.0, 1.0], [2.0, 2.0]],
            [[5.0, 5.0], [6.0, 6.0]],
        ]]),
        "pred_peak_values": np.ones((1, 2, 2)),
        "pred_class_probs": np.array([[[0.9, 0.1], [0.2, 0.8]]])[0][None],
    }
    labels = p.to_labels([out])
    names = sorted(i.track.name
                   for i in labels.labeled_frames[0].predicted_instances)
    assert names == ["female", "male"]
    assert sorted(t.name for t in labels.tracks) == ["female", "male"]


def test_to_labels_bottomup_scores_carried():
    p = bare_predictor("bottomup")
    out = {
        "frame_inds": np.array([0]),
        "video_inds": np.array([0]),
        "valid": np.array([True]),
        "pred_keypoints": [[np.array([[1.0, 1.0], [2.0, 2.0]])]],
        "pred_peak_values": [[np.array([0.5, 0.6])]],
        "pred_instance_scores": [[1.7]],
    }
    labels = p.to_labels([out])
    inst = labels.labeled_frames[0].predicted_instances[0]
    assert np.isclose(inst.score, 1.7)


def test_to_labels_centroid_output_modes():
    for mode, want_insts, want_cents in (
        ("instance", 1, 0), ("centroid", 0, 1), ("both", 1, 1),
    ):
        p = bare_predictor("centroid")
        p.skeleton = Skeleton(nodes=["centroid"])
        p.centroid_output = mode
        out = {
            "frame_inds": np.array([0]),
            "video_inds": np.array([0]),
            "valid": np.array([True]),
            "pred_centroids": np.array([[[10.0, 12.0]]]),
            "centroid_vals": np.array([[0.8]]),
            "centroid_valid": np.array([[True]]),
        }
        labels = p.to_labels([out])
        lf = labels.labeled_frames[0]
        assert len(lf.predicted_instances) == want_insts, mode
        assert len(getattr(lf, "centroids", [])) == want_cents, mode


def test_to_labels_videos_routed_by_index():
    p = bare_predictor("single_instance")
    va, vb = Video(filename="a.mp4"), Video(filename="b.mp4")
    src = Labels([], videos=[va, vb], skeletons=[SKEL])
    out = {
        "frame_inds": np.array([3, 4]),
        "video_inds": np.array([0, 1]),
        "valid": np.array([True, True]),
        "pred_keypoints": np.ones((2, 1, 2, 2)),
        "pred_peak_values": np.ones((2, 1, 2)),
    }
    labels = p.to_labels([out], labels_src=src)
    by_frame = {lf.frame_idx: lf.video for lf in labels.labeled_frames}
    assert by_frame[3] is va and by_frame[4] is vb
    assert labels.videos == [va, vb]


def test_to_labels_attaches_provenance():
    p = bare_predictor("single_instance")
    p.last_stats = {"fps": 123.0}
    labels = p.to_labels([])
    assert labels.provenance["stats"]["fps"] == 123.0
    assert "sleap_nn_tpu_version" in labels.provenance


# ── run.predict source scoping (uses a real tiny model) ──────────────────────


@pytest.fixture(scope="module")
def si_model():
    p = CKPTS / "minimal_instance_single_instance"
    if not p.exists():
        pytest.skip("reference ckpts unavailable")
    return str(p)


def test_predict_only_labeled_frames_scoping(si_model):
    from sleap_nn_tpu.inference import predict
    from sleap_nn_tpu.io import load_slp

    labels = load_slp(FIXTURE)
    lf = labels.labeled_frames[0]
    pred_only = LabeledFrame(lf.video, 1, [PredictedInstance(
        points=np.ones((2, 2)), skeleton=labels.skeletons[0],
        point_scores=np.ones(2), score=0.5)])
    mixed = Labels([lf, pred_only], videos=labels.videos,
                   skeletons=labels.skeletons)
    out = predict(mixed, [si_model], only_labeled_frames=True,
                  peak_threshold=0.0)
    assert {f.frame_idx for f in out.labeled_frames} <= {lf.frame_idx}


def test_predict_exclude_user_labeled_scoping(si_model):
    from sleap_nn_tpu.inference import predict
    from sleap_nn_tpu.io import load_slp

    labels = load_slp(FIXTURE)  # its only frame is user-labeled
    out = predict(labels, [si_model], exclude_user_labeled=True,
                  peak_threshold=0.0)
    assert out.labeled_frames == []


def test_predict_video_index_out_of_range_errors(si_model):
    from sleap_nn_tpu.inference import predict
    from sleap_nn_tpu.io import load_slp

    with pytest.raises(ValueError, match="video_index"):
        predict(load_slp(FIXTURE), [si_model], video_index=5)


def test_scoped_return_confmaps_does_not_mutate_predictor():
    """predict(return_confmaps=True) applies to a scoped copy only: the raw
    outputs carry confmaps for that call, and a subsequent plain call on the
    SAME predictor does not (reference predictor.py:2198 scoped overrides)."""
    from sleap_nn_tpu.io import load_slp

    p = Predictor.from_model_paths(
        [CKPTS / "minimal_instance_single_instance"],
        batch_size=2, peak_threshold=0.1,
    )
    labels = load_slp(FIXTURE)
    with_cms = p.predict(labels, make_labels=False, return_confmaps=True)
    assert any("confmaps" in out for out in with_cms)
    assert p.layer.post.return_confmaps is False  # untouched
    plain = p.predict(labels, make_labels=False)
    assert not any("confmaps" in out for out in plain)


def test_scoped_override_noop_returns_same_layer():
    p = Predictor.from_model_paths(
        [CKPTS / "minimal_instance_single_instance"], batch_size=2)
    assert p._scoped_postprocess_layer() is p.layer
    assert p._scoped_postprocess_layer(return_confmaps=None) is p.layer
    assert p._scoped_postprocess_layer(return_confmaps=False) is p.layer


def test_preprocess_config_rejects_both_rgb_and_grayscale():
    """ensure_rgb + ensure_grayscale together is a construction-time error
    (reference finding 9, tests/inference/test_issue_584.py:40)."""
    from sleap_nn_tpu.inference.layers import PreprocessConfig

    with pytest.raises(ValueError, match="cannot both be True"):
        PreprocessConfig(ensure_rgb=True, ensure_grayscale=True)
    PreprocessConfig(ensure_rgb=True)
    PreprocessConfig(ensure_grayscale=True)
    PreprocessConfig()


def test_return_paf_graph_emits_matched_candidate_graph():
    """predict(return_paf_graph=True) on a bottomup model adds the per-sample
    matched PAF candidate graph (peaks, edge_inds, edge_peak_inds,
    line_scores) to the raw outputs; plain calls stay graph-free
    (reference legacy-parity debug output, streaming.py GroupingParams)."""
    from sleap_nn_tpu.io import load_slp

    p = Predictor.from_model_paths(
        [CKPTS / "minimal_instance_bottomup"], batch_size=2,
        peak_threshold=0.1,
    )
    labels = load_slp(FIXTURE)
    out = p.predict(labels, make_labels=False, return_paf_graph=True)
    assert "pred_paf_graph" in out[0]
    peaks, edge_inds, edge_peak_inds, line_scores = out[0]["pred_paf_graph"][0]
    assert peaks.ndim == 3 and peaks.shape[-1] == 2  # (n_nodes, K, 2)
    assert edge_peak_inds.shape == (len(edge_inds), 2)
    assert line_scores.shape == (len(edge_inds),)
    assert p.layer.post.return_paf_graph is False  # scoped, not mutated
    plain = p.predict(labels, make_labels=False)
    assert "pred_paf_graph" not in plain[0]
