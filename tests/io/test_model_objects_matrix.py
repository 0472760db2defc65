"""Labels-model object behavior matrix: Instance/Skeleton semantics and
output-format normalization.

Reference scenario source: sleap-io's object contracts (the reference
depends on them; this build owns the model classes, so their semantics are
asserted directly).
"""

from __future__ import annotations

import numpy as np
import pytest

from sleap_nn_tpu.inference.run import _normalize_output_formats
from sleap_nn_tpu.io import (
    Instance,
    LabeledFrame,
    Labels,
    PredictedInstance,
    Skeleton,
)

SKEL = Skeleton(nodes=["head", "thorax", "tail"],
                edges=[("head", "thorax"), ("thorax", "tail")])


def test_instance_from_points_dict_by_node_name():
    inst = Instance(points={"head": (1.0, 2.0), "tail": (5.0, 6.0)},
                    skeleton=SKEL)
    pts = inst.numpy()
    np.testing.assert_allclose(pts[0], [1, 2])
    assert np.isnan(pts[1]).all()  # thorax unset
    np.testing.assert_allclose(pts[2], [5, 6])
    assert inst.n_visible == 2


def test_instance_visibility_masks_numpy():
    inst = Instance(points=np.array([[1.0, 1.0], [2.0, 2.0], [3.0, 3.0]]),
                    skeleton=SKEL, visible=np.array([True, False, True]))
    pts = inst.numpy()
    assert np.isnan(pts[1]).all()
    raw = inst.numpy(invisible_as_nan=False)
    np.testing.assert_allclose(raw[1], [2, 2])


def test_instance_centroid_anchor_fallback():
    inst = Instance(points=np.array([[0.0, 0.0], [np.nan, np.nan], [4.0, 4.0]]),
                    skeleton=SKEL)
    np.testing.assert_allclose(inst.centroid(), [2.0, 2.0])
    np.testing.assert_allclose(inst.centroid(anchor="head"), [0.0, 0.0])
    # anchor invisible -> mean fallback
    np.testing.assert_allclose(inst.centroid(anchor="thorax"), [2.0, 2.0])


def test_instance_bounding_box():
    inst = Instance(points=np.array([[1.0, 2.0], [5.0, 8.0], [np.nan, np.nan]]),
                    skeleton=SKEL)
    np.testing.assert_allclose(inst.bounding_box(), [1, 2, 5, 8])
    empty = Instance(points=np.full((3, 2), np.nan), skeleton=SKEL)
    assert empty.is_empty() and np.isnan(empty.bounding_box()).all()


def test_predicted_instance_defaults():
    p = PredictedInstance(points=np.ones((3, 2)), skeleton=SKEL)
    assert p.score == 0.0 and p.tracking_score == 0.0
    np.testing.assert_allclose(p.point_scores, 0.0)
    assert "PredictedInstance" in repr(p)


def test_skeleton_index_and_edge_inds():
    assert SKEL.index("thorax") == 1
    assert len(SKEL) == 3
    assert SKEL.edge_inds == [(0, 1), (1, 2)]


def test_skeleton_unknown_node_errors():
    with pytest.raises((KeyError, ValueError)):
        SKEL.index("wing")


def test_labeled_frame_instance_views():
    lf = LabeledFrame(None, 0, [
        Instance(points=np.ones((3, 2)), skeleton=SKEL),
        PredictedInstance(points=np.ones((3, 2)), skeleton=SKEL),
    ])
    assert len(lf.user_instances) == 1
    assert len(lf.predicted_instances) == 1
    assert lf.has_user_instances and lf.has_predicted_instances


def test_labels_len_and_indexing():
    lfs = [LabeledFrame(None, i, [Instance(points=np.ones((3, 2)),
                                           skeleton=SKEL)]) for i in range(3)]
    labels = Labels(lfs, skeletons=[SKEL])
    assert len(labels) == 3
    assert labels[1].frame_idx == 1


def test_normalize_output_formats():
    assert _normalize_output_formats("slp") == {"slp"}
    assert _normalize_output_formats(["slp", "analysis_h5"]) == {
        "slp", "analysis_h5"}
    with pytest.raises(ValueError, match="Unknown output_format"):
        _normalize_output_formats("csv")


def test_track_equality_is_identity():
    from sleap_nn_tpu.io import Track

    a, b = Track(name="x"), Track(name="x")
    assert a is not b
    inst = PredictedInstance(points=np.ones((3, 2)), skeleton=SKEL, track=a)
    assert inst.track is a and inst.track is not b
