"""Tests for the SAM prompted-segmentation subsystem.

Model weights are not downloadable in this environment, so a deterministic
fake backend (capsule masks around the prompt points) exercises the full
orchestration: prompts -> layer -> run_sam_segmentation -> .slp round-trip ->
overlay, plus the torch-less reconciliation/retrack path.
"""

import numpy as np
import pytest

from sleap_nn_tpu.inference.sam import (
    HFSamBackend,
    IDReconciler,
    MaskBackend,
    MaskReconciler,
    SamSegmentationLayer,
    TrackNameResolver,
    cleanup_speckle,
    disjointify,
    get_mask_backend,
    majority_vote_names,
    own_containment,
    pick_candidate,
    require_min_fraction_inside,
    require_min_keypoints_inside,
    retrack,
    run_sam_segmentation,
)
from sleap_nn_tpu.inference.sam.prompts import (
    PROMPT_MODES,
    keypoint_box,
    prompt_for_instance,
    visible_keypoints,
)
from sleap_nn_tpu.io import load_slp
from sleap_nn_tpu.io.model import (
    Instance,
    LabeledFrame,
    Labels,
    PredictedInstance,
    Skeleton,
    Track,
)


class DiskBackend(MaskBackend):
    """Deterministic fake: a filled disk around each prompt's point/box center."""

    pred_iou_min = 0.88

    def __init__(self, radius=12, score=0.95):
        self.radius = radius
        self.score = score

    def masks(self, image, prompts):
        h, w = image.shape[:2]
        yy, xx = np.mgrid[:h, :w]
        out, scores = [], []
        for p in prompts:
            if p.point_coords is not None:
                cx, cy = p.point_coords.mean(axis=0)
            else:
                cx = (p.box[0] + p.box[2]) / 2
                cy = (p.box[1] + p.box[3]) / 2
            out.append((xx - cx) ** 2 + (yy - cy) ** 2 <= self.radius**2)
            scores.append(self.score)
        return out, scores


def disk(h, w, cx, cy, r):
    yy, xx = np.mgrid[:h, :w]
    return (xx - cx) ** 2 + (yy - cy) ** 2 <= r * r


# ---------------------------------------------------------------------------
# Prompts
# ---------------------------------------------------------------------------


def test_prompt_builders():
    kpts = np.array([[10.0, 20.0], [30.0, 40.0], [np.nan, np.nan]])
    assert len(visible_keypoints(kpts)) == 2

    p = prompt_for_instance("pose", (100, 100), keypoints=kpts)
    assert p.mode == "pose" and len(p.point_coords) == 2
    # Padded box: margin = max(15, 0.6*20) = 15 -> x0 = 10-15 clamped to 0.
    np.testing.assert_allclose(p.box, [0.0, 5.0, 45.0, 55.0])

    c = prompt_for_instance("centroid", (100, 100), keypoints=kpts)
    assert c.box is None and c.point_coords.shape == (1, 2)
    np.testing.assert_allclose(c.point_coords[0], [20.0, 30.0])

    b = prompt_for_instance("box", (100, 100), keypoints=kpts)
    assert b.point_coords is None and b.box is not None

    # pose falls back to centroid point with no visible keypoints.
    f = prompt_for_instance("pose", (100, 100), keypoints=None, centroid=np.array([5.0, 5.0]))
    assert f.mode == "centroid"

    with pytest.raises(ValueError):
        prompt_for_instance("pose", (100, 100))
    with pytest.raises(ValueError):
        prompt_for_instance("blob", (100, 100), keypoints=kpts)


def test_keypoint_box_min_margin_degenerate():
    box = keypoint_box(np.array([[50.0, 50.0]]), (100, 100))
    np.testing.assert_allclose(box, [35.0, 35.0, 65.0, 65.0])


# ---------------------------------------------------------------------------
# Backend helpers
# ---------------------------------------------------------------------------


def test_pick_candidate_rejects_arena_mask():
    h = w = 64
    small = disk(h, w, 32, 32, 5)
    arena = np.ones((h, w), bool)
    masks = np.stack([arena, small])
    # Arena has the higher score but exceeds 1.5x the reject-box area.
    box = np.array([27.0, 27.0, 37.0, 37.0])
    assert pick_candidate(masks, np.array([0.99, 0.9]), box) == 1
    # All rejected -> smallest survives.
    assert pick_candidate(np.stack([arena, arena | small]), np.array([0.5, 0.9]),
                          np.array([0, 0, 2.0, 2.0])) == 0


def test_own_containment_and_cleanup():
    m = disk(50, 50, 25, 25, 10)
    kpts = np.array([[25.0, 25.0], [45.0, 45.0]])
    assert own_containment(m, kpts) == 0.5
    assert own_containment(m, np.empty((0, 2))) == 0.0

    # Speckled mask: main blob + distant speck; cleanup keeps the blob.
    speckled = m.copy()
    speckled[2, 2] = True
    cleaned = cleanup_speckle(speckled, np.array([[25.0, 25.0]]))
    assert not cleaned[2, 2] and cleaned[25, 25]
    # Empty in, empty out.
    assert not cleanup_speckle(np.zeros((10, 10), bool), np.zeros((0, 2))).any()


def test_disjointify_voronoi():
    h = w = 40
    m1 = disk(h, w, 15, 20, 10)
    m2 = disk(h, w, 25, 20, 10)
    k1, k2 = np.array([[15.0, 20.0]]), np.array([[25.0, 20.0]])
    d1, d2 = disjointify([m1, m2], [k1, k2])
    assert not (d1 & d2).any()
    assert d1[20, 15] and d2[20, 25]
    # Contested midline pixels went to the nearer keypoint.
    assert d1[20, 19] and d2[20, 21]


def test_backend_registry():
    with pytest.raises(ValueError):
        get_mask_backend(None)
    with pytest.raises(ValueError):
        get_mask_backend("dino")
    with pytest.raises(ImportError):
        get_mask_backend("sam3")
    assert issubclass(HFSamBackend, MaskBackend)


# ---------------------------------------------------------------------------
# Layer + orchestration + .slp mask round-trip
# ---------------------------------------------------------------------------


def make_pose_labels():
    skel = Skeleton(nodes=["a", "b"], edges=[("a", "b")])
    img = np.full((96, 96, 1), 30, np.uint8)

    class ArrayVideo:
        filename = "fake.mp4"
        shape = (1, 96, 96, 1)

        def __getitem__(self, i):
            return img

        def to_backend_json(self):
            return {"backend": {"filename": self.filename}}

    t1, t2 = Track(name="animal1"), Track(name="animal2")
    i1 = PredictedInstance.from_numpy(
        points=np.array([[20.0, 20.0], [30.0, 25.0]]), skeleton=skel,
        point_scores=np.ones(2), score=0.9)
    i1.track = t1
    i2 = PredictedInstance.from_numpy(
        points=np.array([[70.0, 70.0], [60.0, 65.0]]), skeleton=skel,
        point_scores=np.ones(2), score=0.8)
    i2.track = t2
    lf = LabeledFrame(video=ArrayVideo(), frame_idx=0, instances=[i1, i2])
    return Labels(labeled_frames=[lf], videos=[lf.video], skeletons=[skel],
                  tracks=[t1, t2])


def test_sam_layer_and_run(tmp_path):
    labels = make_pose_labels()
    backend = DiskBackend()
    layer = SamSegmentationLayer(backend, prompt_mode="pose")
    pairs = layer.masks_for_frame(labels[0].image, labels[0].instances)
    assert len(pairs) == 2
    sm, src = pairs[0]
    assert sm.mask.shape == (96, 96) and sm.track.name == "animal1"
    assert src is labels[0].instances[0]
    # The mask covers its own keypoints.
    assert own_containment(sm.mask, np.array([[20.0, 20.0], [30.0, 25.0]])) == 1.0

    with pytest.raises(ValueError):
        SamSegmentationLayer(backend, prompt_mode="wavelet")

    out = run_sam_segmentation(
        labels, "sam", backend=backend,
        output_path=tmp_path / "masks.slp",
        overlay_path=tmp_path / "overlay.png",
    )
    assert len(out) == 1 and len(out[0].masks) == 2
    assert len(out[0].instances) == 2  # poses retained for correction
    assert (tmp_path / "overlay.png").exists()

    # Masks round-trip through the .slp extension.
    back = load_slp(str(tmp_path / "masks.slp"))
    assert len(back[0].masks) == 2
    np.testing.assert_array_equal(back[0].masks[0].mask, out[0].masks[0].mask)
    assert back[0].masks[0].track.name == "animal1"
    assert abs(back[0].masks[0].score - 0.95) < 1e-6


def test_run_sam_validates_backend_name():
    labels = make_pose_labels()
    with pytest.raises(ValueError):
        run_sam_segmentation(labels, "dino", backend=DiskBackend())


# ---------------------------------------------------------------------------
# Reconciliation
# ---------------------------------------------------------------------------


def make_reconciliation_fixture():
    """Two tracked poses + two masks per frame; obj ids swap at frame 2."""
    skel = Skeleton(nodes=["a", "b", "c"])
    t1, t2 = Track(name="animal1"), Track(name="animal2")
    h = w = 64

    frames, masks, obj_ids = [], [], []
    for fi in range(4):
        p1 = np.array([[15.0, 15.0], [18.0, 15.0], [15.0, 18.0]])
        p2 = np.array([[45.0, 45.0], [48.0, 45.0], [45.0, 48.0]])
        i1 = Instance(points=p1, skeleton=skel, track=t1)
        i2 = Instance(points=p2, skeleton=skel, track=t2)
        frames.append(LabeledFrame(video=None, frame_idx=fi, instances=[i1, i2]))
        m1 = disk(h, w, 16, 16, 8)
        m2 = disk(h, w, 46, 46, 8)
        if fi < 2:
            masks.append(np.stack([m1, m2])); obj_ids.append(np.array([0, 1]))
        else:  # the mask producer swaps its object ids
            masks.append(np.stack([m2, m1])); obj_ids.append(np.array([0, 1]))
    return skel, frames, masks, obj_ids


def test_id_reconciler_match_and_swaps():
    skel, frames, masks, obj_ids = make_reconciliation_fixture()
    rec = IDReconciler(skeleton=skel)
    for i, lf in enumerate(frames):
        got = rec.match_frame(i, list(lf.instances), masks[i], obj_ids[i])
        assert len(got) == 2
        assert all(a.confidence == 1.0 for a in got)
    # animal1 was obj 0 on frames 0-1 then obj 1 (the producer swapped).
    swaps = rec.detect_swaps()
    assert {(s.track_name, s.frame_idx) for s in swaps} == {
        ("animal1", 2), ("animal2", 2)}
    id_map = rec.build_id_map()
    assert id_map[0] == {0: "animal1", 1: "animal2"}
    assert id_map[3] == {1: "animal1", 0: "animal2"}

    # Strict predicate rejects everything (only 3 kpts inside).
    rec2 = IDReconciler(skeleton=skel,
                        match_predicates=[require_min_keypoints_inside(4)])
    assert rec2.match_frame(0, list(frames[0].instances), masks[0], obj_ids[0]) == []

    with pytest.raises(ValueError):
        rec.match_frame(9, list(frames[0].instances), masks[0], np.array([0]))


def test_mask_reconciler_iou():
    h = w = 48
    a = disk(h, w, 12, 12, 6)
    b = disk(h, w, 36, 36, 6)
    rec = MaskReconciler(min_iou=0.3, track_names={7: "left", 8: "right"})
    got = rec.match_frame(0, np.stack([a, b]), np.array([7, 8]),
                          np.stack([b, a]), np.array([100, 101]))
    assert len(got) == 2
    by_tid = {g.input_track_id: g for g in got}
    assert by_tid[7].obj_id == 101 and by_tid[8].obj_id == 100
    assert by_tid[7].iou == 1.0
    stats = rec.get_iou_stats()
    assert stats["mean"] == 1.0
    # Non-overlapping pair is rejected by min_iou.
    rec2 = MaskReconciler(min_iou=0.3)
    assert rec2.match_frame(0, a[None], np.array([1]), b[None], np.array([2])) == []
    assert MaskReconciler.compute_iou(np.zeros((4, 4)), np.zeros((4, 4))) == 0.0


def test_track_name_resolver():
    resolver = TrackNameResolver.from_id_map(
        {0: {1: "a", 2: "b"}, 10: {1: "b", 2: "a"}},
        fallback_names={9: "spare"},
    )
    assert resolver.get_track_name(2, 1) == "a"      # nearest anchor 0
    assert resolver.get_track_name(8, 1) == "b"      # nearest anchor 10
    assert resolver.get_track_name(3, 9) == "spare"  # fallback
    assert resolver.get_track_name(3, 42) == "track_42"
    assert resolver.get_anchor_source(0) == (0, "anchor")
    assert resolver.get_anchor_source(7) == (10, "backward")
    assert resolver.get_anchor_source(12) == (10, "forward")
    assert resolver.get_all_track_names() == {"a", "b"}
    assert resolver.get_canonical_mapping() == {1: "a", 2: "b"}
    assert len(resolver.resolve_all_frames(12)) == 12

    canonical, ambiguous = majority_vote_names(
        {0: {1: "a"}, 5: {1: "a"}, 9: {1: "b"}, 12: {2: "c"}})
    assert canonical == {1: "a", 2: "c"} and ambiguous == set()
    _, amb2 = majority_vote_names({0: {1: "a"}, 9: {1: "b"}})
    assert amb2 == {1}


# ---------------------------------------------------------------------------
# Retrack
# ---------------------------------------------------------------------------


def test_retrack_fixes_swapped_tracks():
    skel, frames, masks, obj_ids = make_reconciliation_fixture()
    # The poses after frame 1 carry SWAPPED identities (tracker error): the
    # left animal is labeled animal2. Only frame 0 is a trusted user anchor;
    # later frames hold predictions.
    t1 = frames[0].instances[0].track
    t2 = frames[0].instances[1].track
    for lf in frames[1:]:
        preds = []
        for inst in lf.instances:
            p = PredictedInstance(points=inst.points, skeleton=skel, score=0.9)
            preds.append(p)
        preds[0].track, preds[1].track = t2, t1  # swapped by the tracker
        lf.instances = preds

    # Identity-consistent masks: obj 0 follows the left animal in EVERY frame.
    masks = [np.stack([disk(64, 64, 16, 16, 8), disk(64, 64, 46, 46, 8)])] * 4
    obj_ids = [np.array([0, 1])] * 4

    result = retrack(frames, masks, obj_ids, skel, in_place=True)
    assert result.anchor_frames == [0]
    assert result.num_matched == 8
    assert result.canonical_map == {0: "animal1", 1: "animal2"}
    # The swapped predictions were corrected back.
    for lf in frames[1:]:
        assert lf.instances[0].track.name == "animal1"
        assert lf.instances[1].track.name == "animal2"
    assert result.num_relabeled == 6  # 2 instances x 3 swapped frames

    # in_place=False leaves inputs untouched.
    frames[1].instances[0].track = t2
    r2 = retrack(frames, masks, obj_ids, skel, in_place=False)
    assert frames[1].instances[0].track is t2
    assert r2.labeled_frames[1].instances[0].track.name == "animal1"

    with pytest.raises(ValueError):
        retrack(frames[:2], masks, obj_ids, skel)


def test_retrack_strips_padding():
    skel, frames, masks, obj_ids = make_reconciliation_fixture()
    padded_masks = [np.concatenate([m, np.zeros((1,) + m.shape[1:], bool)]) for m in masks]
    padded_ids = [np.concatenate([o, [-1]]) for o in obj_ids]
    scores = [np.array([0.9, 0.8, 0.0])] * 4
    result = retrack(frames, padded_masks, padded_ids, skel, scores=scores)
    assert result.num_matched == 8
    assert all(a.mask_score in (0.9, 0.8) for a in result.assignments)
