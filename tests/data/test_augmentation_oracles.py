"""Augmentation correctness vs geometric oracles: image and points must
transform CONSISTENTLY (the property that actually matters for training).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sleap_nn_tpu.data.augmentation import (
    apply_flip_augmentation,
    apply_geometric_augmentation,
    apply_intensity_augmentation,
    apply_random_erase,
    transform_points,
    warp_image,
    _affine_matrices,
)


def _peak_image(h=64, w=64, x=20, y=30):
    """One bright pixel blob; its argmax tracks the geometric transform."""
    img = np.zeros((1, h, w, 1), np.float32)
    img[0, y - 1:y + 2, x - 1:x + 2, 0] = 1.0
    return jnp.asarray(img)


def test_rotation_moves_image_and_points_together():
    key = jax.random.PRNGKey(3)
    img = _peak_image()
    pts = jnp.asarray([[[[20.0, 30.0]]]])  # (B, I, N, 2)
    out_img, out_pts, *_ = apply_geometric_augmentation(
        key, img, pts,
        rotation_min=25.0, rotation_max=25.0, rotation_p=1.0,
        scale_min=1.0, scale_max=1.0,
    )
    p = np.asarray(out_pts).reshape(2)
    blob = np.asarray(out_img)[0, ..., 0]
    iy, ix = np.unravel_index(np.argmax(blob), blob.shape)
    # The warped blob's argmax lands where the transformed point says.
    assert abs(ix - p[0]) <= 2.0 and abs(iy - p[1]) <= 2.0
    # And the point actually moved.
    assert not np.allclose(p, [20.0, 30.0], atol=0.5)


def test_scale_zooms_consistently():
    key = jax.random.PRNGKey(5)
    img = _peak_image(x=12, y=12)
    pts = jnp.asarray([[[[12.0, 12.0]]]])
    out_img, out_pts, *_ = apply_geometric_augmentation(
        key, img, pts,
        rotation_min=0.0, rotation_max=0.0,
        scale_min=1.5, scale_max=1.5, scale_p=1.0,
    )
    p = np.asarray(out_pts).reshape(2)
    blob = np.asarray(out_img)[0, ..., 0]
    iy, ix = np.unravel_index(np.argmax(blob), blob.shape)
    assert abs(ix - p[0]) <= 2.0 and abs(iy - p[1]) <= 2.0
    # 1.5x zoom about the center pushes an off-center point outward.
    c = 31.5
    r_before = np.hypot(12 - c, 12 - c)
    r_after = np.hypot(p[0] - c, p[1] - c)
    assert r_after > r_before * 1.3


def test_translation_shifts_points_exactly():
    key = jax.random.PRNGKey(7)
    b, h, w = 1, 64, 64
    mats = _affine_matrices(
        key, b, h, w,
        0.0, 0.0, None,       # rotation range, p
        1.0, 1.0, None,       # scale range, p
        0.25, 0.0, 1.0,       # translate_width frac, height, p
        0.0,
    )
    pts = jnp.asarray([[[10.0, 10.0]]])
    out = np.asarray(transform_points(pts, mats)).reshape(2)
    # Pure horizontal translation: y unchanged, x shifted <= 0.25*W.
    assert out[1] == pytest.approx(10.0, abs=1e-3)
    assert abs(out[0] - 10.0) <= 0.25 * w + 1e-3


def test_flip_is_exact_mirror_with_symmetric_swap():
    key = jax.random.PRNGKey(0)
    img = _peak_image(x=10, y=20)
    # two symmetric nodes (left, right)
    pts = jnp.asarray([[[[10.0, 20.0], [50.0, 20.0]]]])
    out_img, out_pts, _ = apply_flip_augmentation(
        key, img, pts, symmetric_inds=((0, 1),), flip_p=1.0
    )
    p = np.asarray(out_pts)[0, 0]
    w = img.shape[2]
    # Node 0 now holds the mirrored RIGHT node, node 1 the mirrored LEFT.
    assert p[0, 0] == pytest.approx(w - 1 - 50.0, abs=1e-3)
    assert p[1, 0] == pytest.approx(w - 1 - 10.0, abs=1e-3)
    # The image mirrored too: blob moved to w-1-10.
    blob = np.asarray(out_img)[0, ..., 0]
    iy, ix = np.unravel_index(np.argmax(blob), blob.shape)
    assert ix == pytest.approx(w - 1 - 10, abs=1)


def test_warp_identity_matrix_is_noop():
    img = _peak_image()
    eye = jnp.broadcast_to(jnp.eye(3), (1, 3, 3))
    out = warp_image(img, eye)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)


def test_random_erase_zeroes_a_region_only():
    key = jax.random.PRNGKey(11)
    img = jnp.ones((2, 32, 32, 1))
    out = apply_random_erase(
        key, img, scale_min=0.05, scale_max=0.05,
        ratio_min=1.0, ratio_max=1.0, erase_p=1.0,
    )
    out = np.asarray(out)
    frac_zero = (out == 0).mean(axis=(1, 2, 3))
    assert (frac_zero > 0).all()
    assert (frac_zero < 0.3).all()  # a patch, not the whole image


def test_intensity_aug_preserves_range_and_shape():
    key = jax.random.PRNGKey(13)
    img = jnp.asarray(np.random.default_rng(0).random((2, 32, 32, 1)),
                      jnp.float32)
    out = apply_intensity_augmentation(
        key, img,
        uniform_noise_min=0.0, uniform_noise_max=0.05, uniform_noise_p=1.0,
        gaussian_noise_mean=0.0, gaussian_noise_std=0.02, gaussian_noise_p=1.0,
        contrast_min=0.8, contrast_max=1.2, contrast_p=1.0,
        brightness_min=0.9, brightness_max=1.1, brightness_p=1.0,
    )
    out = np.asarray(out if not isinstance(out, tuple) else out[0])
    assert out.shape == (2, 32, 32, 1)
    assert np.isfinite(out).all()
    assert not np.allclose(out, np.asarray(img))  # something happened


def test_nan_points_stay_nan_through_geometry():
    key = jax.random.PRNGKey(17)
    img = _peak_image()
    pts = np.full((1, 1, 2, 2), np.nan, np.float32)
    pts[0, 0, 0] = [20.0, 30.0]
    out_img, out_pts, *_ = apply_geometric_augmentation(
        key, img, jnp.asarray(pts),
        rotation_min=30.0, rotation_max=30.0, rotation_p=1.0,
    )
    p = np.asarray(out_pts)[0, 0]
    assert np.isfinite(p[0]).all()
    assert np.isnan(p[1]).all()  # invisible node stays invisible
