"""Tests for the .slp reader/writer and labels model."""

import numpy as np
import pytest

from sleap_nn_tpu.io import (
    Instance,
    LabeledFrame,
    Labels,
    PredictedInstance,
    Skeleton,
    Track,
    Video,
    load_slp,
    save_slp,
)


def test_load_minimal_instance(minimal_instance_slp):
    labels = load_slp(minimal_instance_slp)
    assert len(labels) == 1
    lf = labels[0]
    assert len(lf.instances) == 2
    assert all(not isinstance(i, PredictedInstance) for i in lf.instances)

    skel = labels.skeleton
    assert skel.node_names == ["A", "B"]
    assert skel.edge_inds == [(0, 1)]

    pts = lf.instances[0].numpy()
    assert pts.shape == (2, 2)
    assert not np.isnan(pts).any()

    # Embedded image decode.
    img = lf.image
    assert img.shape == (384, 384, 1)
    assert img.dtype == np.uint8


def test_load_small_robot(small_robot_slp):
    labels = load_slp(small_robot_slp)
    assert len(labels) >= 1
    assert len(labels.skeleton.node_names) >= 2
    for lf in labels:
        assert lf.numpy().shape[-1] == 2


def test_video_mp4(small_robot_mp4):
    video = Video.from_filename(str(small_robot_mp4))
    n, h, w, c = video.shape
    assert n > 0 and h > 0 and w > 0
    img = video[0]
    assert img.shape == (h, w, c)
    assert img.dtype == np.uint8
    two = video[[0, 1]]
    assert two.shape == (2, h, w, c)


def test_roundtrip_user_and_predicted(tmp_path, minimal_instance_slp):
    labels = load_slp(minimal_instance_slp)
    skel = labels.skeleton
    track = Track(name="animal0", spawned_on=0)
    pred = PredictedInstance(
        points=np.array([[10.0, 20.0], [30.5, 40.5]]),
        skeleton=skel,
        point_scores=np.array([0.9, 0.8]),
        score=0.85,
        track=track,
        tracking_score=0.7,
    )
    labels[0].instances.append(pred)
    labels.tracks.append(track)

    out = tmp_path / "roundtrip.slp"
    save_slp(out, labels)
    loaded = load_slp(out)

    assert len(loaded) == 1
    lf = loaded[0]
    assert len(lf.user_instances) == 2
    assert len(lf.predicted_instances) == 1
    p = lf.predicted_instances[0]
    np.testing.assert_allclose(p.numpy(), pred.numpy())
    np.testing.assert_allclose(p.point_scores, [0.9, 0.8])
    assert p.score == pytest.approx(0.85, abs=1e-6)
    assert p.tracking_score == pytest.approx(0.7, abs=1e-6)
    assert p.track is not None and p.track.name == "animal0"
    assert loaded.skeleton.node_names == ["A", "B"]
    assert loaded.skeleton.edge_inds == [(0, 1)]


def test_roundtrip_with_embed(tmp_path, minimal_instance_slp):
    labels = load_slp(minimal_instance_slp)
    out = tmp_path / "embedded.slp"
    save_slp(out, labels, embed=True)
    loaded = load_slp(out)
    img = loaded[0].image
    assert img.shape == (384, 384, 1)
    orig = labels[0].image
    np.testing.assert_array_equal(img, orig)


def test_symmetries_roundtrip(tmp_path):
    skel = Skeleton(
        nodes=["head", "left", "right", "tail"],
        edges=[(0, 1), (0, 2), (0, 3)],
        symmetries=[(1, 2)],
    )
    inst = Instance(points=np.array([[0, 0], [1, 1], [2, 2], [3, 3]], dtype=float), skeleton=skel)
    labels = Labels(labeled_frames=[LabeledFrame(video=None, frame_idx=0, instances=[inst])])
    out = tmp_path / "sym.slp"
    save_slp(out, labels)
    loaded = load_slp(out)
    assert loaded.skeleton.symmetry_inds == [(1, 2)]
    assert loaded.skeleton.edge_inds == [(0, 1), (0, 2), (0, 3)]


def test_make_training_splits(minimal_instance_slp):
    labels = load_slp(minimal_instance_slp)
    # Duplicate frames so the split has something to work with.
    lf = labels[0]
    for i in range(9):
        labels.append(LabeledFrame(video=lf.video, frame_idx=i + 1, instances=lf.instances))
    train, val = labels.make_training_splits(0.8, 0.2, seed=42)
    assert len(train) == 8
    assert len(val) == 2
    train2, val2 = labels.make_training_splits(0.8, 0.2, seed=42)
    assert [lf.frame_idx for lf in train2] == [lf.frame_idx for lf in train]


def test_instance_helpers():
    skel = Skeleton(nodes=["a", "b", "c"])
    inst = Instance(points=np.array([[0.0, 0.0], [2.0, 2.0], [np.nan, np.nan]]), skeleton=skel)
    assert inst.n_visible == 2
    np.testing.assert_allclose(inst.centroid(), [1.0, 1.0])
    np.testing.assert_allclose(inst.bounding_box(), [0, 0, 2, 2])


def test_every_reference_slp_fixture_loads():
    """Sweep: every .slp the reference ships (format_id 1.1 legacy
    predictions through 1.3) loads cleanly — 1.1 prediction files predate
    the tracking_score column (defaulted to 0.0, like sleap-io)."""
    import glob

    paths = sorted(
        glob.glob("/root/reference/tests/assets/**/*.slp", recursive=True)
    )
    if not paths:
        pytest.skip("reference assets unavailable")
    for p in paths:
        labels = load_slp(p)
        assert labels.labeled_frames is not None, p


def test_format_1_1_predictions_default_tracking_score():
    p = ("/root/reference/tests/assets/legacy_models/"
         "minimal_instance.UNet.centroid/labels_pr.train.slp")
    import os

    if not os.path.exists(p):
        pytest.skip("reference assets unavailable")
    labels = load_slp(p)
    preds = [i for lf in labels.labeled_frames for i in lf.predicted_instances]
    assert preds
    assert all(i.tracking_score == 0.0 for i in preds)
