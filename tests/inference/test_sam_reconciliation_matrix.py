"""SAM reconciliation scenario matrix.

Reference scenario source: tests/inference/sam/test_reconciliation.py —
cost-matrix edge cases, predicate gates, swap detection, id-map construction,
anchor-name propagation (forward/backward/nearest), majority voting, and the
empty/degenerate-input contracts. Implementations under test live in
sleap_nn_tpu/inference/sam/reconciliation.py (parity target: reference
sleap_nn/inference/sam/reconciliation.py:175,459,706,781).
"""

from __future__ import annotations

import numpy as np
import pytest

from sleap_nn_tpu.inference.sam.reconciliation import (
    IDReconciler,
    MaskReconciler,
    MatchContext,
    TrackNameResolver,
    default_match_predicate,
    majority_vote_names,
    require_centroid_proximity,
    require_min_fraction_inside,
    require_min_keypoints_inside,
    require_reasonable_mask_area,
)
from sleap_nn_tpu.io.model import Instance, Skeleton, Track

H = W = 64


@pytest.fixture
def skel():
    return Skeleton(["head", "thorax", "abdomen", "tail"])


def rect_mask(x0, y0, x1, y1, h=H, w=W):
    m = np.zeros((h, w), bool)
    m[y0:y1, x0:x1] = True
    return m


def pose(skel, pts, track=None):
    return Instance(np.asarray(pts, float), skel,
                    track=Track(track) if track else None)


def ctx(**kw):
    base = dict(frame_idx=0, obj_id=0, cost=-3.0, keypoints_inside=3,
                keypoints_visible=4, mask_area=5000, mask_centroid=(10.0, 10.0))
    base.update(kw)
    return MatchContext(**base)


# -- IDReconciler: cost matrix ------------------------------------------------


def test_default_predicate_is_min_three_inside(skel):
    rec = IDReconciler(skeleton=skel)
    assert len(rec.match_predicates) == 1
    p = rec.match_predicates[0]
    assert p(None, None, ctx(keypoints_inside=3))
    assert not p(None, None, ctx(keypoints_inside=2))


def test_cost_matrix_counts_visible_keypoints_inside(skel):
    masks = np.stack([rect_mask(0, 0, 32, 32), rect_mask(32, 32, 64, 64)])
    # all 4 points in mask 0's quadrant
    a = pose(skel, [[5, 5], [10, 10], [15, 15], [20, 20]])
    # 2 points in each quadrant
    b = pose(skel, [[5, 5], [10, 10], [40, 40], [50, 50]])
    cost = IDReconciler(skeleton=skel).compute_cost_matrix([a, b], masks)
    assert cost.tolist() == [[-4.0, 0.0], [-2.0, -2.0]]


def test_cost_matrix_empty_poses_and_masks(skel):
    rec = IDReconciler(skeleton=skel)
    assert rec.compute_cost_matrix([], np.zeros((2, H, W), bool)).shape == (0, 2)
    a = pose(skel, [[5, 5], [6, 6], [7, 7], [8, 8]])
    assert rec.compute_cost_matrix([a], np.zeros((0, H, W), bool)).shape == (1, 0)


def test_cost_matrix_nan_keypoints_not_counted(skel):
    masks = rect_mask(0, 0, 64, 64)[None]
    a = pose(skel, [[5, 5], [np.nan, np.nan], [7, 7], [np.nan, 3]])
    cost = IDReconciler(skeleton=skel).compute_cost_matrix([a], masks)
    assert cost[0, 0] == -2.0


def test_cost_matrix_out_of_bounds_keypoints_ignored(skel):
    masks = rect_mask(0, 0, 64, 64)[None]
    a = pose(skel, [[-3, 5], [500, 5], [7, -1], [8, 8]])
    cost = IDReconciler(skeleton=skel).compute_cost_matrix([a], masks)
    assert cost[0, 0] == -1.0


def test_cost_matrix_all_nan_pose_row_is_zero(skel):
    masks = rect_mask(0, 0, 64, 64)[None]
    a = pose(skel, np.full((4, 2), np.nan))
    cost = IDReconciler(skeleton=skel).compute_cost_matrix([a], masks)
    assert cost[0, 0] == 0.0


def test_cost_matrix_exclude_nodes_removes_their_votes(skel):
    masks = rect_mask(0, 0, 64, 64)[None]
    a = pose(skel, [[5, 5], [6, 6], [7, 7], [8, 8]])
    rec = IDReconciler(skeleton=skel, exclude_nodes={"tail", "head"})
    assert rec.compute_cost_matrix([a], masks)[0, 0] == -2.0


def test_cost_matrix_vectorized_parity_bruteforce(skel):
    rng = np.random.RandomState(3)
    masks = np.stack([rect_mask(0, 0, 30, 64), rect_mask(30, 0, 64, 64),
                      rect_mask(10, 20, 50, 60)])
    poses = [pose(skel, rng.uniform(0, 64, (4, 2))) for _ in range(5)]
    cost = IDReconciler(skeleton=skel).compute_cost_matrix(poses, masks)
    for i, p in enumerate(poses):
        for j, m in enumerate(masks):
            n = sum(
                bool(m[int(y), int(x)])
                for x, y in p.numpy()
                if np.isfinite([x, y]).all() and 0 <= int(x) < W and 0 <= int(y) < H
            )
            assert cost[i, j] == -n


# -- IDReconciler: match_frame ------------------------------------------------


def two_animal_frame(skel):
    masks = np.stack([rect_mask(0, 0, 32, 64), rect_mask(32, 0, 64, 64)])
    a = pose(skel, [[5, 5], [10, 10], [15, 15], [20, 20]], track="animal1")
    b = pose(skel, [[40, 5], [45, 10], [50, 15], [55, 20]], track="animal2")
    return [a, b], masks, np.array([10, 11])


def test_match_frame_assigns_by_hungarian(skel):
    poses, masks, oids = two_animal_frame(skel)
    rec = IDReconciler(skeleton=skel)
    got = rec.match_frame(0, poses, masks, oids)
    assert {(a.pose_track_name, a.obj_id) for a in got} == {
        ("animal1", 10), ("animal2", 11)}
    assert all(a.confidence == 1.0 for a in got)


def test_match_frame_empty_inputs_return_empty(skel):
    rec = IDReconciler(skeleton=skel)
    assert rec.match_frame(0, [], np.zeros((1, H, W)), np.array([0])) == []
    a = pose(skel, [[5, 5], [6, 6], [7, 7], [8, 8]])
    assert rec.match_frame(0, [a], np.zeros((0, H, W)), np.array([])) == []
    assert rec.get_assignments() == []


def test_match_frame_accumulates_history(skel):
    poses, masks, oids = two_animal_frame(skel)
    rec = IDReconciler(skeleton=skel)
    rec.match_frame(0, poses, masks, oids)
    rec.match_frame(1, poses, masks, oids)
    assert len(rec.get_assignments()) == 4
    assert sorted({a.frame_idx for a in rec.get_assignments()}) == [0, 1]


def test_match_frame_length_mismatch_raises(skel):
    poses, masks, _ = two_animal_frame(skel)
    rec = IDReconciler(skeleton=skel)
    with pytest.raises(ValueError, match="match_frame"):
        rec.match_frame(0, poses, masks, np.array([1]))
    with pytest.raises(ValueError, match="scores"):
        rec.match_frame(0, poses, masks, np.array([1, 2]), scores=np.array([0.5]))


def test_match_frame_squeezes_channel_axis(skel):
    poses, masks, oids = two_animal_frame(skel)
    got = IDReconciler(skeleton=skel).match_frame(0, poses, masks[:, None], oids)
    assert len(got) == 2


def test_match_frame_predicate_rejection_drops_assignment(skel):
    poses, masks, oids = two_animal_frame(skel)
    rec = IDReconciler(skeleton=skel,
                       match_predicates=[require_min_keypoints_inside(5)])
    assert rec.match_frame(0, poses, masks, oids) == []
    assert rec.get_assignments() == []


def test_match_frame_partial_confidence(skel):
    # 2 of 4 visible keypoints inside -> confidence 0.5 (passes k>=1 gate).
    masks = rect_mask(0, 0, 32, 64)[None]
    a = pose(skel, [[5, 5], [10, 10], [50, 15], [55, 20]])
    rec = IDReconciler(skeleton=skel, match_predicates=[default_match_predicate])
    got = rec.match_frame(0, [a], masks, np.array([3]))
    assert len(got) == 1 and got[0].confidence == 0.5


def test_match_frame_ignore_gt_tracks_strips_names(skel):
    poses, masks, oids = two_animal_frame(skel)
    rec = IDReconciler(skeleton=skel, ignore_gt_tracks=True)
    got = rec.match_frame(0, poses, masks, oids)
    assert len(got) == 2 and all(a.pose_track_name is None for a in got)
    assert rec.build_id_map() == {}


def test_match_frame_mask_scores_recorded(skel):
    poses, masks, oids = two_animal_frame(skel)
    rec = IDReconciler(skeleton=skel)
    got = rec.match_frame(0, poses, masks, oids, scores=np.array([0.7, 0.9]))
    by_oid = {a.obj_id: a.mask_score for a in got}
    assert by_oid == {10: pytest.approx(0.7), 11: pytest.approx(0.9)}


def test_clear_resets_history(skel):
    poses, masks, oids = two_animal_frame(skel)
    rec = IDReconciler(skeleton=skel)
    rec.match_frame(0, poses, masks, oids)
    rec.clear()
    assert rec.get_assignments() == []
    assert rec.detect_swaps() == []
    assert rec.build_id_map() == {}


# -- IDReconciler: swaps and id map -------------------------------------------


def test_detect_swaps_none_when_stable(skel):
    poses, masks, oids = two_animal_frame(skel)
    rec = IDReconciler(skeleton=skel)
    for fi in range(3):
        rec.match_frame(fi, poses, masks, oids)
    assert rec.detect_swaps() == []


def test_detect_swaps_reports_frame_and_ids(skel):
    poses, masks, oids = two_animal_frame(skel)
    rec = IDReconciler(skeleton=skel)
    rec.match_frame(0, poses, masks, oids)
    rec.match_frame(1, poses, masks, oids)
    # producer swapped the object ids at frame 2
    rec.match_frame(2, poses, masks, oids[::-1].copy())
    swaps = {(s.track_name, s.frame_idx, s.old_obj_id, s.new_obj_id)
             for s in rec.detect_swaps()}
    assert swaps == {("animal1", 2, 10, 11), ("animal2", 2, 11, 10)}


def test_detect_swaps_unnamed_assignments_ignored(skel):
    poses, masks, oids = two_animal_frame(skel)
    rec = IDReconciler(skeleton=skel, ignore_gt_tracks=True)
    rec.match_frame(0, poses, masks, oids)
    rec.match_frame(1, poses, masks, oids[::-1].copy())
    assert rec.detect_swaps() == []


def test_build_id_map_per_frame(skel):
    poses, masks, oids = two_animal_frame(skel)
    rec = IDReconciler(skeleton=skel)
    rec.match_frame(0, poses, masks, oids)
    rec.match_frame(4, poses, masks, oids[::-1].copy())
    id_map = rec.build_id_map()
    assert id_map[0] == {10: "animal1", 11: "animal2"}
    assert id_map[4] == {11: "animal1", 10: "animal2"}


# -- predicates ---------------------------------------------------------------


def test_default_predicate_pass_and_fail():
    assert default_match_predicate(None, None, ctx(keypoints_inside=1))
    assert not default_match_predicate(None, None, ctx(keypoints_inside=0))


@pytest.mark.parametrize("inside,visible,ok", [
    (3, 4, True), (2, 4, False), (0, 0, False), (4, 4, True)])
def test_require_min_fraction_inside(inside, visible, ok):
    p = require_min_fraction_inside(0.75)
    got = p(None, None, ctx(keypoints_inside=inside, keypoints_visible=visible))
    assert got is ok


@pytest.mark.parametrize("area,ok", [
    (999, False), (1000, True), (500_000, True), (500_001, False)])
def test_require_reasonable_mask_area(area, ok):
    p = require_reasonable_mask_area()
    assert p(None, None, ctx(mask_area=area)) is ok


def test_require_centroid_proximity(skel):
    p = require_centroid_proximity(max_dist=10.0)
    near = pose(skel, [[8, 8], [12, 12], [8, 12], [12, 8]])  # centroid (10,10)
    far = pose(skel, [[50, 50], [54, 54], [50, 54], [54, 50]])
    assert p(near, None, ctx(mask_centroid=(10.0, 10.0)))
    assert not p(far, None, ctx(mask_centroid=(10.0, 10.0)))


def test_require_centroid_proximity_nan_pose_fails(skel):
    p = require_centroid_proximity(max_dist=1e9)
    allnan = pose(skel, np.full((4, 2), np.nan))
    assert not p(allnan, None, ctx(mask_centroid=(0.0, 0.0)))


def test_predicates_compose_conjunctively(skel):
    poses, masks, oids = two_animal_frame(skel)
    rec = IDReconciler(
        skeleton=skel,
        match_predicates=[require_min_keypoints_inside(1),
                          require_reasonable_mask_area(min_area=10**7)],
    )
    assert rec.match_frame(0, poses, masks, oids) == []


# -- MaskReconciler -----------------------------------------------------------


def test_compute_iou_values():
    a = rect_mask(0, 0, 32, 64)       # area 2048
    b = rect_mask(16, 0, 48, 64)      # overlap 16*64=1024, union 3072
    assert MaskReconciler.compute_iou(a, b) == pytest.approx(1024 / 3072)
    assert MaskReconciler.compute_iou(a, a) == 1.0
    assert MaskReconciler.compute_iou(np.zeros((4, 4)), np.zeros((4, 4))) == 0.0


def test_mask_cost_matrix_parity_with_pairwise_iou():
    rng = np.random.RandomState(0)
    ins = rng.rand(3, 20, 20) > 0.5
    outs = rng.rand(4, 20, 20) > 0.5
    cost = MaskReconciler().compute_cost_matrix(ins, outs)
    for i in range(3):
        for j in range(4):
            assert cost[i, j] == pytest.approx(
                -MaskReconciler.compute_iou(ins[i], outs[j]))


def test_mask_cost_matrix_empty_and_channel_squeeze():
    rec = MaskReconciler()
    assert rec.compute_cost_matrix(np.zeros((0, 8, 8)), np.zeros((2, 8, 8))).shape == (0, 2)
    ins = np.ones((1, 8, 8), bool)
    outs = np.ones((2, 1, 8, 8), bool)
    assert rec.compute_cost_matrix(ins, outs).shape == (1, 2)


def test_mask_match_frame_min_iou_gate():
    a = rect_mask(0, 0, 32, 64)
    b = rect_mask(31, 0, 63, 64)  # tiny overlap with a
    rec = MaskReconciler(min_iou=0.5)
    got = rec.match_frame(0, np.stack([a]), np.array([1]),
                          np.stack([b]), np.array([9]))
    assert got == []
    rec2 = MaskReconciler(min_iou=0.01)
    got2 = rec2.match_frame(0, np.stack([a]), np.array([1]),
                            np.stack([b]), np.array([9]))
    assert len(got2) == 1 and got2[0].obj_id == 9 and got2[0].iou > 0


def test_mask_match_frame_names_and_swaps():
    a = rect_mask(0, 0, 32, 64)
    b = rect_mask(32, 0, 64, 64)
    rec = MaskReconciler(min_iou=0.3, track_names={1: "left", 2: "right"})
    rec.match_frame(0, np.stack([a, b]), np.array([1, 2]),
                    np.stack([a, b]), np.array([100, 101]))
    # same produced masks, but the producer relabeled them at frame 1
    rec.match_frame(1, np.stack([a, b]), np.array([1, 2]),
                    np.stack([a, b]), np.array([101, 100]))
    id_map = rec.build_id_map()
    assert id_map[0] == {100: "left", 101: "right"}
    assert id_map[1] == {101: "left", 100: "right"}
    swaps = {(s.track_name, s.frame_idx) for s in rec.detect_swaps()}
    assert swaps == {("left", 1), ("right", 1)}


def test_mask_unnamed_track_falls_back_to_track_id():
    a = rect_mask(0, 0, 32, 64)
    rec = MaskReconciler(min_iou=0.3)
    rec.match_frame(0, a[None], np.array([7]), a[None], np.array([50]))
    assert rec.build_id_map() == {0: {50: "track_7"}}


def test_mask_iou_stats():
    rec = MaskReconciler()
    assert rec.get_iou_stats() == {"min": 0.0, "max": 0.0, "mean": 0.0, "median": 0.0}
    a = rect_mask(0, 0, 32, 64)
    b = rect_mask(16, 0, 48, 64)
    rec.match_frame(0, np.stack([a]), np.array([1]), np.stack([a]), np.array([5]))
    rec.match_frame(1, np.stack([a]), np.array([1]), np.stack([b]), np.array([5]))
    st = rec.get_iou_stats()
    assert st["max"] == 1.0 and 0 < st["min"] < 1.0
    assert st["mean"] == pytest.approx((st["min"] + st["max"]) / 2)
    rec.clear()
    assert rec.get_assignments() == []


# -- TrackNameResolver --------------------------------------------------------


ANCHORS = {10: {0: "alice", 1: "bob"}, 20: {0: "bob", 1: "alice"}}


def test_resolver_empty():
    r = TrackNameResolver()
    assert r.get_mapping_at_frame(5) == {}
    assert r.get_track_name(5, 3) == "track_3"
    assert r.resolve_all_frames(10) == {}
    assert r.get_anchor_frames() == []
    assert r.get_anchor_source(0) == (None, "none")


def test_resolver_anchor_frames_sorted():
    r = TrackNameResolver(gt_anchors={20: {0: "b"}, 10: {0: "a"}, 15: {0: "c"}})
    assert r.get_anchor_frames() == [10, 15, 20]


def test_resolver_nearest_anchor_rules():
    r = TrackNameResolver(gt_anchors=ANCHORS)
    # before first anchor -> first; after last -> last
    assert r.get_mapping_at_frame(0) == ANCHORS[10]
    assert r.get_mapping_at_frame(99) == ANCHORS[20]
    # nearest wins; exact midpoint ties to the earlier anchor
    assert r.get_mapping_at_frame(12) == ANCHORS[10]
    assert r.get_mapping_at_frame(18) == ANCHORS[20]
    assert r.get_mapping_at_frame(15) == ANCHORS[10]


def test_resolver_get_track_name_priorities():
    r = TrackNameResolver(gt_anchors=ANCHORS, fallback_names={5: "fallback5"})
    assert r.get_track_name(10, 0) == "alice"
    assert r.get_track_name(10, 5) == "fallback5"
    assert r.get_track_name(10, 9, default="dflt") == "dflt"
    assert r.get_track_name(10, 9) == "track_9"


def test_resolver_anchor_source_directions():
    r = TrackNameResolver(gt_anchors=ANCHORS)
    assert r.get_anchor_source(10) == (10, "anchor")
    assert r.get_anchor_source(12) == (10, "forward")
    assert r.get_anchor_source(18) == (20, "backward")


def test_resolver_resolve_all_frames():
    r = TrackNameResolver(gt_anchors=ANCHORS)
    allf = r.resolve_all_frames(25)
    assert len(allf) == 25
    assert allf[0] == ANCHORS[10] and allf[24] == ANCHORS[20]
    assert allf[15] == ANCHORS[10] and allf[16] == ANCHORS[20]


def test_resolver_aggregates():
    r = TrackNameResolver(gt_anchors=ANCHORS)
    assert r.get_all_track_names() == {"alice", "bob"}
    assert r.get_all_obj_ids() == {0, 1}
    # canonical = first-seen in frame order
    assert r.get_canonical_mapping() == {0: "alice", 1: "bob"}


def test_resolver_from_reconciler_and_id_map(skel):
    poses, masks, oids = two_animal_frame(skel)
    rec = IDReconciler(skeleton=skel)
    rec.match_frame(3, poses, masks, oids)
    r = TrackNameResolver.from_reconciler(rec, fallback_names={99: "x"})
    assert r.get_anchor_frames() == [3]
    assert r.get_track_name(0, 10) == "animal1"
    assert r.get_track_name(0, 99) == "x"
    r2 = TrackNameResolver.from_id_map({1: {2: "z"}})
    assert r2.get_track_name(50, 2) == "z"


# -- majority vote ------------------------------------------------------------


def test_majority_vote_strict_majority_wins():
    id_map = {0: {7: "a"}, 1: {7: "a"}, 2: {7: "b"}}
    canonical, ambiguous = majority_vote_names(id_map)
    assert canonical == {7: "a"} and ambiguous == set()


def test_majority_vote_tie_is_ambiguous():
    id_map = {0: {7: "a"}, 1: {7: "b"}}
    canonical, ambiguous = majority_vote_names(id_map)
    assert canonical == {} and ambiguous == {7}


def test_majority_vote_mixed_ids():
    id_map = {0: {1: "a", 2: "b"}, 1: {1: "a", 2: "c"}}
    canonical, ambiguous = majority_vote_names(id_map)
    assert canonical == {1: "a"} and ambiguous == {2}
