"""Centroid-only prediction scenario matrix.

Parity target: reference tests/inference/test_centroid_only.py — lone
centroid model prediction collapses to a single-node skeleton, the
``--centroid-output`` emit modes (instance / centroid / both), slp
round-trip of centroid records, the emit+tracking hard-error, and the
``--centroid_only`` stage-1-only switch on a topdown pair.
"""

import numpy as np
import pytest
pytestmark = pytest.mark.slow  # integration tier: real training loops / model builds / subprocesses


from sleap_nn_tpu.inference import predict
from sleap_nn_tpu.inference.predictor import Predictor
from sleap_nn_tpu.io import load_slp

from tests.inference.test_e2e import FIXTURE, _train


@pytest.fixture(scope="module")
def centroid_model(trained_centroid_model):
    # Same recipe as the session-scoped model — reuse (one training/session).
    return trained_centroid_model


@pytest.fixture(scope="module")
def gt():
    labels = load_slp(FIXTURE)
    return labels, labels[0].numpy()


def test_lone_centroid_collapses_to_single_node_skeleton(centroid_model, gt):
    labels, _ = gt
    out = predict(labels, [centroid_model], make_labels=True, peak_threshold=0.2)
    lf = out[0]
    assert len(lf.predicted_instances) == 2
    for inst in lf.predicted_instances:
        assert inst.numpy().shape == (1, 2)
        assert [n for n in inst.skeleton.node_names] == ["centroid"]


def test_lone_centroid_instance_score_is_centroid_confidence(centroid_model, gt):
    labels, _ = gt
    out = predict(labels, [centroid_model], make_labels=True, peak_threshold=0.2)
    for inst in out[0].predicted_instances:
        assert 0.0 < inst.score <= 1.5


def test_centroid_output_centroid_emits_records_not_instances(centroid_model, gt):
    labels, gt_pts = gt
    out = predict(labels, [centroid_model], make_labels=True,
                  peak_threshold=0.2, centroid_output="centroid")
    lf = out[0]
    assert len(lf.predicted_instances) == 0
    assert len(lf.centroids) == 2
    gt_cents = np.nanmean(gt_pts, axis=1)
    for c in lf.centroids:
        assert c.point.shape == (2,)
        assert 0.0 < c.score <= 1.5
        d = np.linalg.norm(gt_cents - c.point, axis=-1).min()
        assert d < 4.0


def test_centroid_output_both_emits_matching_pairs(centroid_model, gt):
    labels, _ = gt
    out = predict(labels, [centroid_model], make_labels=True,
                  peak_threshold=0.2, centroid_output="both")
    lf = out[0]
    assert len(lf.predicted_instances) == 2
    assert len(lf.centroids) == 2
    inst_pts = np.sort(
        np.array([i.numpy()[0] for i in lf.predicted_instances]), axis=0
    )
    cent_pts = np.sort(np.array([c.point for c in lf.centroids]), axis=0)
    np.testing.assert_allclose(inst_pts, cent_pts, atol=1e-5)


def test_centroid_records_round_trip_through_slp(centroid_model, gt, tmp_path):
    labels, _ = gt
    out = predict(labels, [centroid_model], make_labels=True,
                  peak_threshold=0.2, centroid_output="both")
    p = tmp_path / "cents.slp"
    out.save(str(p))
    re = load_slp(str(p))
    lf0, re0 = out[0], re[0]
    assert len(re0.centroids) == len(lf0.centroids) == 2
    got = np.sort(np.array([c.point for c in re0.centroids]), axis=0)
    want = np.sort(np.array([c.point for c in lf0.centroids]), axis=0)
    np.testing.assert_allclose(got, want, atol=1e-5)
    assert len(re0.predicted_instances) == 2


@pytest.mark.parametrize("mode", ["centroid", "both"])
def test_centroid_output_with_tracking_raises_before_inference(mode, gt):
    labels, _ = gt
    # The guard must fire before models load: a bogus model path proves it.
    with pytest.raises(ValueError, match="Tracking is incompatible"):
        predict(labels, ["/nonexistent/model"], make_labels=True,
                centroid_output=mode, tracking=True)


def test_centroid_only_switch_keeps_stage_one_from_pair(centroid_model, gt):
    # centroid_only with a lone centroid checkpoint: valid, stage-1 only.
    labels, _ = gt
    out = predict(labels, [centroid_model], make_labels=True,
                  peak_threshold=0.2, centroid_only=True)
    lf = out[0]
    assert len(lf.predicted_instances) == 2
    for inst in lf.predicted_instances:
        assert inst.numpy().shape == (1, 2)


def test_centroid_only_without_centroid_model_raises(tmp_path_factory, gt):
    si = _train("single_instance", tmp_path_factory.mktemp("si_fast"), epochs=2)
    with pytest.raises(ValueError, match="centroid"):
        Predictor.from_model_paths([si], centroid_only=True)


def test_min_instance_score_filter_applies_to_centroid_only(centroid_model, gt):
    labels, _ = gt
    full = predict(labels, [centroid_model], make_labels=True, peak_threshold=0.2)
    n_full = len(full[0].predicted_instances)
    assert n_full == 2
    from sleap_nn_tpu.inference.filters import FilterConfig

    filtered = predict(labels, [centroid_model], make_labels=True,
                       peak_threshold=0.2,
                       filters=FilterConfig(min_instance_score=2.0))
    # Every instance scores < 2.0, so the whole frame is filtered away.
    assert len(filtered.labeled_frames) == 0


def test_predict_rejects_typo_kwargs_instead_of_swallowing(gt):
    labels, _ = gt
    # Regression: **tracker_kwargs used to silently absorb any unknown
    # keyword (e.g. a misspelled filter knob), making typos no-ops.
    with pytest.raises(TypeError, match="min_instance_scor"):
        predict(labels, ["/nonexistent/model"], make_labels=True,
                min_instance_scor=2.0)


def test_centroid_only_labels_trackable_with_centroid_features(centroid_model, gt):
    from sleap_nn_tpu.tracking import run_tracker

    labels, _ = gt
    out = predict(labels, [centroid_model], make_labels=True, peak_threshold=0.2)
    tracked = run_tracker(out, features="centroids",
                          scoring_method="euclidean_dist")
    for lf in tracked.labeled_frames:
        for inst in lf.predicted_instances:
            assert inst.track is not None
