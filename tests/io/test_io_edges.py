"""IO edge cases: degenerate labels files, NaN flows, track/provenance
round-trips, structural parity checks against the reference fixture.
"""

import json

import h5py
import numpy as np
import pytest

from sleap_nn_tpu.io import (
    Instance,
    LabeledFrame,
    Labels,
    PredictedInstance,
    Skeleton,
    Track,
    load_slp,
    save_slp,
)

SKEL = Skeleton(nodes=["a", "b"], edges=[("a", "b")])
REF_FIXTURE = "/root/reference/tests/assets/datasets/minimal_instance.pkg.slp"


def test_empty_labels_roundtrip(tmp_path):
    p = tmp_path / "empty.slp"
    Labels([]).save(str(p))
    back = load_slp(str(p))
    assert len(back) == 0
    assert back.labeled_frames == []


def test_all_nan_instance_roundtrip(tmp_path):
    pts = np.full((2, 2), np.nan)
    inst = Instance(points=pts, skeleton=SKEL)
    labels = Labels([LabeledFrame(video=None, frame_idx=0, instances=[inst])])
    p = tmp_path / "nan.slp"
    labels.save(str(p))
    back = load_slp(str(p))
    got = back.labeled_frames[0].instances[0].numpy()
    assert np.isnan(got).all()
    assert not back.labeled_frames[0].instances[0].visible.any()


def test_partial_nan_visibility_roundtrip(tmp_path):
    pts = np.array([[5.0, 6.0], [np.nan, np.nan]])
    inst = PredictedInstance(points=pts, skeleton=SKEL,
                             point_scores=np.array([0.9, 0.0]), score=0.9)
    labels = Labels([LabeledFrame(video=None, frame_idx=3, instances=[inst])])
    p = tmp_path / "partial.slp"
    labels.save(str(p))
    back = load_slp(str(p))
    got = back.labeled_frames[0].predicted_instances[0]
    np.testing.assert_allclose(got.numpy()[0], [5.0, 6.0])
    assert np.isnan(got.numpy()[1]).all()
    assert got.visible.tolist() == [True, False]
    assert got.point_scores[0] == pytest.approx(0.9)


def test_track_identity_preserved_across_frames(tmp_path):
    t1, t2 = Track("alpha"), Track("beta")
    lfs = []
    for fi in range(3):
        a = PredictedInstance(points=np.array([[1.0 * fi, 0], [2, 2]]),
                              skeleton=SKEL, point_scores=np.ones(2),
                              score=0.5, track=t1)
        b = PredictedInstance(points=np.array([[9.0, 9], [8, 8]]),
                              skeleton=SKEL, point_scores=np.ones(2),
                              score=0.5, track=t2)
        lfs.append(LabeledFrame(video=None, frame_idx=fi, instances=[a, b]))
    labels = Labels(lfs)
    labels.tracks = [t1, t2]
    p = tmp_path / "tracks.slp"
    labels.save(str(p))
    back = load_slp(str(p))
    assert [t.name for t in back.tracks] == ["alpha", "beta"]
    # The SAME object identity is shared across frames after reload.
    first = back.labeled_frames[0].instances[0].track
    assert all(lf.instances[0].track is first for lf in back.labeled_frames)


def test_from_predicted_link_roundtrip(tmp_path):
    pred = PredictedInstance(points=np.array([[1.0, 1], [2, 2]]), skeleton=SKEL,
                             point_scores=np.ones(2), score=0.7)
    user = Instance(points=np.array([[1.0, 1], [2, 2]]), skeleton=SKEL,
                    from_predicted=pred)
    labels = Labels([LabeledFrame(video=None, frame_idx=0,
                                  instances=[pred, user])])
    p = tmp_path / "linked.slp"
    labels.save(str(p))
    back = load_slp(str(p))
    lf = back.labeled_frames[0]
    user_back = [i for i in lf.instances
                 if not isinstance(i, PredictedInstance)][0]
    assert isinstance(user_back.from_predicted, PredictedInstance)


def test_provenance_roundtrip(tmp_path):
    labels = Labels([])
    labels.provenance = {"sleap_nn_tpu": "test", "args": {"batch": 4}}
    p = tmp_path / "prov.slp"
    labels.save(str(p))
    back = load_slp(str(p))
    assert back.provenance.get("sleap_nn_tpu") == "test"
    assert back.provenance.get("args", {}).get("batch") == 4


def test_structural_parity_with_reference_fixture(tmp_path):
    """Written .slp matches the reference container's dataset dtypes and
    format_id (the drop-in structural contract)."""
    labels = load_slp(REF_FIXTURE)
    out = tmp_path / "parity.slp"
    labels.save(str(out))
    with h5py.File(REF_FIXTURE) as ref, h5py.File(out) as got:
        for ds in ("frames", "instances", "points", "pred_points"):
            assert got[ds].dtype == ref[ds].dtype, ds
        assert got["metadata"].attrs["format_id"] == \
            ref["metadata"].attrs["format_id"]


def test_reference_fixture_metadata_json_valid(tmp_path):
    labels = load_slp(REF_FIXTURE)
    out = tmp_path / "meta.slp"
    labels.save(str(out))
    with h5py.File(out) as f:
        meta = json.loads(f["metadata"].attrs["json"])
    skels = meta.get("skeletons", [])
    assert skels, "metadata json must carry the skeleton"


def test_multi_skeleton_file(tmp_path):
    s1 = Skeleton(nodes=["a", "b"])
    s2 = Skeleton(nodes=["x", "y", "z"])
    lf1 = LabeledFrame(video=None, frame_idx=0,
                       instances=[Instance(np.ones((2, 2)), s1)])
    lf2 = LabeledFrame(video=None, frame_idx=1,
                       instances=[Instance(np.ones((3, 2)), s2)])
    labels = Labels([lf1, lf2])
    labels.skeletons = [s1, s2]
    p = tmp_path / "two_skel.slp"
    labels.save(str(p))
    back = load_slp(str(p))
    assert len(back.skeletons) == 2
    assert len(back.labeled_frames[0].instances[0].points) == 2
    assert len(back.labeled_frames[1].instances[0].points) == 3


def test_instance_dict_construction():
    inst = Instance(points={"a": (1.0, 2.0)}, skeleton=SKEL)
    np.testing.assert_allclose(inst.points[0], [1.0, 2.0])
    assert np.isnan(inst.points[1]).all()
    assert inst.n_visible == 1


def test_labels_helpers():
    lf = LabeledFrame(video=None, frame_idx=0, instances=[
        Instance(np.ones((2, 2)), SKEL),
        PredictedInstance(np.ones((2, 2)), SKEL, point_scores=np.ones(2)),
    ])
    labels = Labels([lf])
    assert lf.has_user_instances and lf.has_predicted_instances
    assert len(lf.user_instances) == 1
    assert len(lf.predicted_instances) == 1
    lf.remove_predictions()
    assert not lf.has_predicted_instances
    assert len(labels) == 1


def test_save_load_unicode_path(tmp_path):
    p = tmp_path / "данные_测试.slp"
    Labels([LabeledFrame(video=None, frame_idx=0,
                         instances=[Instance(np.ones((2, 2)), SKEL)])]).save(str(p))
    assert len(load_slp(str(p))) == 1


def test_video_backend_json_roundtrip(tmp_path):
    """Media-video backend metadata survives save/load (path + shape)."""
    from sleap_nn_tpu.io.video import Video

    mp4 = "/root/reference/tests/assets/datasets/small_robot.mp4"
    video = Video(mp4)
    inst = PredictedInstance(np.ones((2, 2)), SKEL, point_scores=np.ones(2))
    labels = Labels([LabeledFrame(video=video, frame_idx=0, instances=[inst])])
    labels.videos = [video]
    p = tmp_path / "vid.slp"
    labels.save(str(p))
    back = load_slp(str(p))
    assert len(back.videos) == 1
    assert str(back.videos[0].filename).endswith("small_robot.mp4")
    img = back.labeled_frames[0].image
    assert img.shape == (320, 560, 3)
