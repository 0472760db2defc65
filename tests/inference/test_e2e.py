"""End-to-end train -> predict tests: overfit the fixture, recover keypoints.

This is the OKS-parity foundation: a tiny UNet overfit on the single fixture
frame must reproduce the GT keypoints through the full predict path
(preprocess -> forward -> peaks -> coordinate lift -> Labels).
"""

import numpy as np
import pytest
pytestmark = pytest.mark.slow  # integration tier: real training loops / model builds / subprocesses


from sleap_nn_tpu.config import TrainingJobConfig, apply_overrides
from sleap_nn_tpu.inference import predict
from sleap_nn_tpu.inference.predictor import Predictor
from sleap_nn_tpu.io import load_slp
from sleap_nn_tpu.training import ModelTrainer

FIXTURE = "/root/reference/tests/assets/datasets/minimal_instance.pkg.slp"


def _train(model_type: str, out_dir, epochs=80, **overrides):
    """Delegates to the shared overfit recipe (tests/fixture_utils.py)."""
    from tests.fixture_utils import train_tiny_model

    return train_tiny_model(model_type, out_dir, epochs=epochs, **overrides)


@pytest.fixture(scope="module")
def gt():
    labels = load_slp(FIXTURE)
    return labels, labels[0].numpy()  # (2 inst, 2 nodes, 2)


# The four overfit models are trained ONCE per session (tests/conftest.py)
# and shared across modules; these aliases keep this module's historical
# fixture names.
@pytest.fixture(scope="module")
def single_instance_model(trained_single_instance_model):
    return trained_single_instance_model


@pytest.fixture(scope="module")
def centroid_model(trained_centroid_model):
    return trained_centroid_model


@pytest.fixture(scope="module")
def centered_instance_model(trained_centered_instance_model):
    return trained_centered_instance_model


@pytest.fixture(scope="module")
def bottomup_model(trained_bottomup_model):
    return trained_bottomup_model


def _best_instance_error(pred_pts, gt_pts):
    """Min-over-GT-instances mean point distance for one predicted instance."""
    errs = []
    for g in gt_pts:
        d = np.linalg.norm(pred_pts - g, axis=-1)
        errs.append(np.nanmean(d))
    return np.nanmin(errs)


def test_single_instance_predict(single_instance_model, gt):
    labels, gt_pts = gt
    out = predict(labels, [single_instance_model], make_labels=True)
    assert len(out) == 1
    lf = out[0]
    assert len(lf.predicted_instances) == 1
    pred = lf.predicted_instances[0]
    # Single-instance model on a 2-instance frame learns the max-blob; the
    # prediction must land on ONE of the GT instances' nodes.
    err = _best_instance_error(pred.numpy(), gt_pts)
    assert err < 3.0, (pred.numpy(), gt_pts)
    assert pred.score > 0.3
    # Round trip through slp.
    out.save("/tmp/test_si_preds.slp")
    re = load_slp("/tmp/test_si_preds.slp")
    np.testing.assert_allclose(re[0].predicted_instances[0].numpy(), pred.numpy())


def test_centroid_predict(centroid_model, gt):
    labels, gt_pts = gt
    out = predict(labels, [centroid_model], make_labels=True, peak_threshold=0.2)
    lf = out[0]
    cents = np.array([inst.numpy()[0] for inst in lf.predicted_instances])
    gt_cents = np.nanmean(gt_pts, axis=1)
    assert len(cents) == 2, cents
    for g in gt_cents:
        d = np.linalg.norm(cents - g, axis=-1).min()
        assert d < 4.0, (cents, gt_cents)


def test_topdown_predict(centroid_model, centered_instance_model, gt):
    labels, gt_pts = gt
    out = predict(
        labels,
        [centroid_model, centered_instance_model],
        make_labels=True,
        max_instances=4,
    )
    lf = out[0]
    preds = lf.predicted_instances
    assert len(preds) == 2, preds
    for g in gt_pts:
        best = min(np.nanmean(np.linalg.norm(p.numpy() - g, axis=-1)) for p in preds)
        assert best < 4.0, (g, [p.numpy() for p in preds])


def test_bottomup_predict(bottomup_model, gt):
    labels, gt_pts = gt
    out = predict(labels, [bottomup_model], make_labels=True, peak_threshold=0.2)
    lf = out[0]
    preds = lf.predicted_instances
    assert len(preds) == 2, [p.numpy() for p in preds]
    for g in gt_pts:
        best = min(np.nanmean(np.linalg.norm(p.numpy() - g, axis=-1)) for p in preds)
        assert best < 4.0, (g, [p.numpy() for p in preds])
    # Instances have grouping scores.
    assert all(p.score != 0 for p in preds)


def test_predict_on_video(single_instance_model):
    # mp4 inference end-to-end (different source size than training -> sizematch).
    out = predict(
        "/root/reference/tests/assets/datasets/small_robot.mp4",
        [single_instance_model],
        frames=list(range(4)),
        make_labels=True,
        peak_threshold=0.05,
    )
    assert len(out.videos) == 1
    for lf in out:
        assert lf.frame_idx < 4


def test_predict_raw_results(single_instance_model, gt):
    labels, _ = gt
    results = predict(labels, [single_instance_model], make_labels=False)
    assert isinstance(results, list)
    assert "pred_keypoints" in results[0]


def test_bottomup_paf_pool_parity(bottomup_model, gt):
    """paf_workers>0 must produce identical instances to the inline path."""
    labels, _ = gt
    inline = predict(labels, [bottomup_model], make_labels=True, peak_threshold=0.2)
    pooled = predict(labels, [bottomup_model], make_labels=True, peak_threshold=0.2,
                     paf_workers=2)
    a = sorted(inline[0].predicted_instances, key=lambda p: np.nansum(p.numpy()))
    b = sorted(pooled[0].predicted_instances, key=lambda p: np.nansum(p.numpy()))
    assert len(a) == len(b) == 2
    for pa, pb in zip(a, b):
        np.testing.assert_allclose(pa.numpy(), pb.numpy(), equal_nan=True)
        assert pa.score == pb.score


def test_bottomup_export_roundtrip(bottomup_model, gt, tmp_path):
    """Exported bottomup graph + host grouping matches the live predictor."""
    from sleap_nn_tpu.export import export_model
    from sleap_nn_tpu.inference.predictor import Predictor

    labels, _ = gt
    live = predict(labels, [bottomup_model], make_labels=True, peak_threshold=0.2)

    out_dir = export_model(bottomup_model, tmp_path / "exp", batch_size=1,
                           peak_threshold=0.2)
    p = Predictor.from_export_dir(out_dir)
    exported = p.predict(labels)

    a = sorted(live[0].predicted_instances, key=lambda i: np.nansum(i.numpy()))
    b = sorted(exported[0].predicted_instances, key=lambda i: np.nansum(i.numpy()))
    assert len(a) == len(b) == 2
    for ia, ib in zip(a, b):
        np.testing.assert_allclose(ia.numpy(), ib.numpy(), atol=1e-3, equal_nan=True)


def test_predict_only_suggested_frames(single_instance_model, gt):
    from sleap_nn_tpu.io.model import SuggestionFrame

    labels, _ = gt
    labels.suggestions = [SuggestionFrame(video=labels.videos[0], frame_idx=0)]
    out = predict(labels, [single_instance_model], only_suggested_frames=True,
                  peak_threshold=0.05)
    assert len(out) == 1 and out[0].frame_idx == 0
    assert len(out[0].predicted_instances) == 1

    labels.suggestions = []
    import pytest
    with pytest.raises(ValueError, match="no suggestions"):
        predict(labels, [single_instance_model], only_suggested_frames=True)


def test_video_index_and_centroid_threshold(centroid_model, centered_instance_model, gt):
    labels, _ = gt
    # Unreachable stage-1 threshold -> no centroids -> no instances.
    out = predict(labels, [centroid_model, centered_instance_model],
                  centroid_peak_threshold=2.0)
    assert sum(len(lf.predicted_instances) for lf in out) == 0
    # Normal threshold finds both instances.
    out2 = predict(labels, [centroid_model, centered_instance_model])
    assert len(out2[0].predicted_instances) == 2

    # video_index scoping: index 0 works, out of range raises.
    out3 = predict(labels, [centroid_model, centered_instance_model], video_index=0)
    assert len(out3[0].predicted_instances) == 2
    import pytest
    with pytest.raises(ValueError, match="out of range"):
        predict(labels, [centroid_model, centered_instance_model], video_index=3)


def test_centered_instance_only_gt_centroids(centered_instance_model, gt):
    """Centered-instance-only model uses GT centroids from the .slp source."""
    labels, gt_pts = gt
    out = predict(labels, [centered_instance_model], peak_threshold=0.1)
    lf = out[0]
    assert len(lf.predicted_instances) == 2
    for g in gt_pts:
        best = min(
            np.nanmean(np.linalg.norm(p.numpy() - g, axis=-1))
            for p in lf.predicted_instances
        )
        assert best < 4.0

    # A video source has no GT centroids -> actionable error.
    import pytest
    with pytest.raises(ValueError, match="GROUND-TRUTH"):
        predict("/root/reference/tests/assets/datasets/small_robot.mp4",
                [centered_instance_model], frames=[0])


def test_gt_centroids_carry_source_scores(centered_instance_model, gt):
    """GT-peaks inference reports the source centroid confidence as the
    instance score: PredictedInstance scores carry through, user instances
    report 1.0 (reference finding 14, tests/inference/test_issue_582.py)."""
    from sleap_nn_tpu.io import LabeledFrame, Labels, PredictedInstance

    src, _ = gt
    skel = src.skeletons[0]
    user_inst = src[0].instances[0]
    pred_inst = PredictedInstance(
        points=src[0].instances[1].numpy(), skeleton=skel,
        point_scores=np.ones(2), score=0.37,
    )
    labels = Labels(
        [LabeledFrame(src[0].video, 0, [user_inst, pred_inst])],
        videos=src.videos, skeletons=[skel],
    )
    out = predict(labels, [centered_instance_model], peak_threshold=0.1)
    scores = sorted(p.score for p in out[0].predicted_instances)
    assert scores[0] == pytest.approx(0.37, abs=1e-6)
    assert scores[1] == pytest.approx(1.0, abs=1e-6)
