"""Augmentation matrix: flips, affine image/keypoint consistency, erase,
mixup, intensity chains, mask co-transforms, RNG determinism.

Reference scenario source: tests/data/test_augmentation.py (joint
image+keypoint transforms, symmetric-node swaps, probability gating).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sleap_nn_tpu.data.augmentation import (
    apply_flip_augmentation,
    apply_geometric_augmentation,
    apply_intensity_augmentation,
    apply_random_erase,
    transform_points,
    warp_image,
)


def img_with_dot(b=1, h=32, w=32, x=8, y=12):
    img = np.zeros((b, h, w, 1), np.float32)
    img[:, y, x, 0] = 1.0
    return jnp.asarray(img)


KEY = jax.random.PRNGKey(7)


def test_flip_p0_never_flips():
    img = img_with_dot()
    pts = jnp.array([[[8.0, 12.0]]])
    out_img, out_pts, _ = apply_flip_augmentation(KEY, img, pts, flip_p=0.0)
    np.testing.assert_array_equal(np.asarray(out_img), np.asarray(img))
    np.testing.assert_array_equal(np.asarray(out_pts), np.asarray(pts))


def test_flip_p1_mirrors_image_and_points_consistently():
    img = img_with_dot(x=8, y=12)
    pts = jnp.array([[[8.0, 12.0]]])
    out_img, out_pts, _ = apply_flip_augmentation(KEY, img, pts, flip_p=1.0)
    assert float(out_img[0, 12, 31 - 8, 0]) == 1.0
    np.testing.assert_allclose(np.asarray(out_pts)[0, 0], [31 - 8, 12])


def test_flip_swaps_symmetric_nodes():
    img = img_with_dot()
    pts = jnp.array([[[5.0, 5.0], [20.0, 5.0], [10.0, 10.0]]])  # l, r, mid
    _, out_pts, _ = apply_flip_augmentation(
        KEY, img, pts, flip_p=1.0, symmetric_inds=[(0, 1)])
    got = np.asarray(out_pts)[0]
    # left node receives the mirrored RIGHT point and vice versa
    np.testing.assert_allclose(got[0], [31 - 20, 5])
    np.testing.assert_allclose(got[1], [31 - 5, 5])
    np.testing.assert_allclose(got[2], [31 - 10, 10])


def test_flip_cotransforms_masks():
    img = img_with_dot()
    mask = np.zeros((1, 32, 32, 1), np.float32)
    mask[0, :, :16] = 1.0
    _, _, out_mask = apply_flip_augmentation(
        KEY, img, jnp.zeros((1, 1, 2)), flip_p=1.0, masks=jnp.asarray(mask))
    assert float(out_mask[0, 0, 0, 0]) == 0.0
    assert float(out_mask[0, 0, 31, 0]) == 1.0


def test_affine_rotation_moves_image_and_points_together():
    img = img_with_dot(x=24, y=16)
    pts = jnp.array([[[24.0, 16.0]]])
    out_img, out_pts = apply_geometric_augmentation(
        KEY, img, pts, rotation_min=90.0, rotation_max=90.0, affine_p=1.0,
        scale_min=1.0, scale_max=1.0)
    got = np.asarray(out_pts)[0, 0]
    # the warped image's max must land where the transformed point says
    flat = np.asarray(out_img)[0, :, :, 0]
    py, px = np.unravel_index(np.argmax(flat), flat.shape)
    assert abs(px - got[0]) <= 1.5 and abs(py - got[1]) <= 1.5


def test_affine_scale_expands_distance_from_center():
    img = img_with_dot()
    pts = jnp.array([[[8.0, 12.0]]])
    _, out_pts = apply_geometric_augmentation(
        KEY, img, pts, rotation_min=0.0, rotation_max=0.0,
        scale_min=2.0, scale_max=2.0, affine_p=1.0)
    center = np.array([15.5, 15.5])
    d_in = np.linalg.norm(np.array([8.0, 12.0]) - center)
    d_out = np.linalg.norm(np.asarray(out_pts)[0, 0] - center)
    assert np.isclose(d_out, 2 * d_in, rtol=0.05)


def test_affine_identity_when_p_zero():
    img = img_with_dot()
    pts = jnp.array([[[8.0, 12.0]]])
    out_img, out_pts = apply_geometric_augmentation(
        KEY, img, pts, affine_p=0.0, flip_p=0.0, erase_p=0.0, mixup_p=0.0)
    np.testing.assert_array_equal(np.asarray(out_img), np.asarray(img))
    np.testing.assert_array_equal(np.asarray(out_pts), np.asarray(pts))


def test_random_erase_zeroes_a_rectangle():
    img = jnp.ones((1, 32, 32, 1))
    out = apply_random_erase(KEY, img, 0.05, 0.1, 1.0, 1.0, erase_p=1.0)
    arr = np.asarray(out)
    assert arr.min() == 0.0
    erased = (arr == 0).sum()
    assert 0 < erased < arr.size * 0.5


def test_random_erase_p0_noop():
    img = jnp.ones((1, 16, 16, 1))
    out = apply_random_erase(KEY, img, 0.05, 0.1, 1.0, 1.0, erase_p=0.0)
    np.testing.assert_array_equal(np.asarray(out), 1.0)


def test_mixup_blends_with_rolled_batch():
    a = np.zeros((2, 8, 8, 1), np.float32)
    a[0] = 1.0  # sample0 white, sample1 black
    out, _ = apply_geometric_augmentation(
        KEY, jnp.asarray(a), jnp.zeros((2, 1, 2)),
        affine_p=0.0, flip_p=0.0, erase_p=0.0,
        mixup_p=1.0, mixup_lambda_min=0.2, mixup_lambda_max=0.2)
    got = np.asarray(out)
    assert np.allclose(got[0], 0.8)  # 0.8*white + 0.2*black
    assert np.allclose(got[1], 0.2)


def test_intensity_brightness_shift():
    img = jnp.full((1, 8, 8, 1), 0.5)
    out = apply_intensity_augmentation(
        KEY, img, brightness_min=1.2, brightness_max=1.2, brightness_p=1.0)
    assert np.asarray(out).mean() > 0.55


def test_intensity_uniform_noise_bounds():
    img = jnp.full((1, 8, 8, 1), 0.5)
    out = apply_intensity_augmentation(
        KEY, img, uniform_noise_min=0.1, uniform_noise_max=0.2,
        uniform_noise_p=1.0)
    delta = np.asarray(out) - 0.5
    assert (delta >= 0.1 - 1e-6).all() and (delta <= 0.2 + 1e-6).all()


def test_intensity_gaussian_noise_statistics():
    img = jnp.full((1, 64, 64, 1), 0.5)
    out = apply_intensity_augmentation(
        KEY, img, gaussian_noise_mean=0.0, gaussian_noise_std=0.05,
        gaussian_noise_p=1.0)
    delta = np.asarray(out) - 0.5
    assert abs(delta.mean()) < 0.01
    assert 0.03 < delta.std() < 0.07


def test_same_key_is_deterministic():
    img = img_with_dot()
    pts = jnp.array([[[8.0, 12.0]]])
    kwargs = dict(rotation_min=-30.0, rotation_max=30.0, affine_p=1.0,
                  flip_p=0.5, erase_p=0.5)
    a_img, a_pts = apply_geometric_augmentation(KEY, img, pts, **kwargs)
    b_img, b_pts = apply_geometric_augmentation(KEY, img, pts, **kwargs)
    np.testing.assert_array_equal(np.asarray(a_img), np.asarray(b_img))
    np.testing.assert_array_equal(np.asarray(a_pts), np.asarray(b_pts))


def test_different_keys_differ():
    img = img_with_dot()
    pts = jnp.array([[[8.0, 12.0]]])
    kwargs = dict(rotation_min=-30.0, rotation_max=30.0, affine_p=1.0)
    _, a_pts = apply_geometric_augmentation(jax.random.PRNGKey(1), img, pts, **kwargs)
    _, b_pts = apply_geometric_augmentation(jax.random.PRNGKey(2), img, pts, **kwargs)
    assert not np.allclose(np.asarray(a_pts), np.asarray(b_pts))


def test_per_sample_independent_randomness():
    """Batched augmentation draws per-sample parameters, not one shared."""
    img = jnp.asarray(np.tile(np.asarray(img_with_dot()), (8, 1, 1, 1)))
    pts = jnp.tile(jnp.array([[[8.0, 12.0]]]), (8, 1, 1))
    _, out_pts = apply_geometric_augmentation(
        KEY, img, pts, rotation_min=-45.0, rotation_max=45.0, affine_p=1.0)
    got = np.asarray(out_pts)[:, 0]
    assert len({tuple(np.round(p, 3)) for p in got}) > 4


def test_nan_keypoints_stay_nan_through_affine():
    img = img_with_dot()
    pts = jnp.array([[[8.0, 12.0], [jnp.nan, jnp.nan]]])
    _, out_pts = apply_geometric_augmentation(
        KEY, img, pts, rotation_min=30.0, rotation_max=30.0, affine_p=1.0)
    got = np.asarray(out_pts)[0]
    assert np.isfinite(got[0]).all()
    assert np.isnan(got[1]).all()


def test_masks_follow_affine_warp():
    img = img_with_dot()
    mask = np.zeros((1, 32, 32, 1), np.float32)
    mask[0, 10:20, 10:20] = 1.0
    out = apply_geometric_augmentation(
        KEY, img, jnp.zeros((1, 1, 2)),
        rotation_min=90.0, rotation_max=90.0, affine_p=1.0,
        masks=jnp.asarray(mask))
    assert len(out) == 3
    m = np.asarray(out[2])
    assert set(np.unique(m)) <= {0.0, 1.0}  # stays binary (nearest warp)
    assert 50 <= m.sum() <= 150  # area roughly preserved under rotation


def test_flip_without_symmetries_warns_once(capsys):
    """build_pipeline_context warns when flip aug is on but the skeleton
    defines no symmetries (left/right nodes would go unswapped)."""
    from sleap_nn_tpu.config import TrainingJobConfig, apply_overrides
    from sleap_nn_tpu.data.pipeline import build_pipeline_context
    from sleap_nn_tpu.io import load_slp

    FIXTURE = "/root/reference/tests/assets/datasets/minimal_instance.pkg.slp"
    labels = load_slp(FIXTURE)  # A-B skeleton, no symmetries
    cfg = TrainingJobConfig()
    cfg.data_config.train_labels_path = [FIXTURE]
    cfg.data_config.use_augmentations_train = True
    apply_overrides(cfg, {
        "model_config.backbone_config.unet.max_stride": 8,
        "model_config.head_configs.single_instance.confmaps.output_stride": 2,
        "data_config.augmentation_config.geometric.flip_p": 1.0,
    })
    build_pipeline_context(cfg, labels, "single_instance")
    assert "defines no symmetries" in capsys.readouterr().out


def test_flip_with_symmetries_does_not_warn(capsys):
    from sleap_nn_tpu.config import TrainingJobConfig, apply_overrides
    from sleap_nn_tpu.data.pipeline import build_pipeline_context
    from sleap_nn_tpu.io import load_slp

    FIXTURE = "/root/reference/tests/assets/datasets/minimal_instance.pkg.slp"
    labels = load_slp(FIXTURE)
    labels.skeletons[0].symmetries = [
        labels.skeletons[0]._as_symmetry(("A", "B"))
    ]
    cfg = TrainingJobConfig()
    cfg.data_config.train_labels_path = [FIXTURE]
    cfg.data_config.use_augmentations_train = True
    apply_overrides(cfg, {
        "model_config.backbone_config.unet.max_stride": 8,
        "model_config.head_configs.single_instance.confmaps.output_stride": 2,
        "data_config.augmentation_config.geometric.flip_p": 1.0,
    })
    ctx = build_pipeline_context(cfg, labels, "single_instance")
    assert "defines no symmetries" not in capsys.readouterr().out
    assert ctx.symmetric_inds == ((0, 1),)
