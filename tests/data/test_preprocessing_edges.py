"""Preprocessing edge cases: normalization dtypes, channel coercion,
sizematcher odd dims, stride padding (reference data/normalization.py +
data/resizing.py test model).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from sleap_nn_tpu.data.normalization import (
    apply_channel_config,
    ensure_grayscale,
    ensure_rgb,
    normalize_image,
    rgb_to_grayscale,
)
from sleap_nn_tpu.data.resizing import (
    apply_pad_to_stride,
    apply_resizer,
    apply_sizematcher,
    find_padding_for_stride,
    resize_image,
)


def test_normalize_uint8_to_unit_float():
    img = jnp.asarray(np.array([[[[0], [255]]]], np.uint8))
    out = np.asarray(normalize_image(img))
    assert out.dtype == np.float32
    assert out.min() == pytest.approx(0.0)
    assert out.max() == pytest.approx(1.0)


def test_normalize_float_passthrough_range():
    img = jnp.asarray(np.full((1, 2, 2, 1), 0.5, np.float32))
    out = np.asarray(normalize_image(img))
    assert out.max() <= 1.0 and out.min() >= 0.0


def test_rgb_to_grayscale_luma_weights():
    # Pure channels map to the ITU-601 luma weights.
    img = np.zeros((1, 1, 3, 3), np.float32)
    img[0, 0, 0] = [1, 0, 0]
    img[0, 0, 1] = [0, 1, 0]
    img[0, 0, 2] = [0, 0, 1]
    g = np.asarray(rgb_to_grayscale(jnp.asarray(img)))[0, 0, :, 0]
    assert g[0] == pytest.approx(0.2989, abs=1e-3)
    assert g[1] == pytest.approx(0.587, abs=1e-3)
    assert g[2] == pytest.approx(0.114, abs=1e-3)


def test_ensure_rgb_replicates_gray():
    img = jnp.ones((1, 4, 4, 1))
    out = np.asarray(ensure_rgb(img))
    assert out.shape == (1, 4, 4, 3)
    assert (out[..., 0] == out[..., 2]).all()


def test_ensure_grayscale_idempotent():
    img = jnp.ones((1, 4, 4, 1))
    out = np.asarray(ensure_grayscale(img))
    assert out.shape == (1, 4, 4, 1)


def test_apply_channel_config_conflicts_and_noop():
    img = jnp.ones((1, 4, 4, 3))
    out = np.asarray(apply_channel_config(img, False, True))
    assert out.shape[-1] == 1
    out2 = np.asarray(apply_channel_config(img, False, False))
    assert out2.shape[-1] == 3


def test_find_padding_for_stride():
    assert find_padding_for_stride(100, 100, 32) == (28, 28)
    assert find_padding_for_stride(64, 64, 32) == (0, 0)
    assert find_padding_for_stride(65, 33, 16) == (15, 15)


def test_apply_pad_to_stride_shapes():
    img = jnp.ones((1, 100, 90, 1))
    out = np.asarray(apply_pad_to_stride(img, 32))
    assert out.shape[1] % 32 == 0 and out.shape[2] % 32 == 0
    # Padding is zeros at the bottom/right.
    assert out[0, -1, -1, 0] == 0.0
    assert out[0, 0, 0, 0] == 1.0


def test_resize_image_scale_shapes():
    img = jnp.ones((1, 64, 48, 1))
    out = np.asarray(resize_image(img, 0.5))
    assert out.shape == (1, 32, 24, 1)
    same = np.asarray(resize_image(img, 1.0))
    assert same.shape == (1, 64, 48, 1)


def test_apply_resizer_scales_points_too():
    img = jnp.ones((1, 64, 64, 1))
    pts = jnp.asarray([[[10.0, 20.0]]])
    img2, pts2 = apply_resizer(img, pts, scale=0.5)
    assert np.asarray(img2).shape == (1, 32, 32, 1)
    np.testing.assert_allclose(np.asarray(pts2)[0, 0], [5.0, 10.0])


def test_apply_sizematcher_downscales_to_cap():
    img = jnp.ones((1, 128, 256, 1))
    out, eff = apply_sizematcher(img, max_height=64, max_width=128)
    assert np.asarray(out).shape[1] <= 64
    assert np.asarray(out).shape[2] <= 128
    assert float(eff) == pytest.approx(0.5)


def test_apply_sizematcher_upscales_small_images():
    # Smaller-than-cap inputs scale UP to fill the target box (the
    # reference sizematcher contract), reporting eff_scale > 1.
    img = jnp.ones((1, 50, 60, 1))
    out, eff = apply_sizematcher(img, max_height=64, max_width=64)
    assert np.asarray(out).shape[1:3] == (64, 64)
    assert float(np.asarray(eff).reshape(-1)[0]) == pytest.approx(64 / 60)


def test_apply_sizematcher_noop_when_unset():
    img = jnp.ones((1, 50, 60, 1))
    out, eff = apply_sizematcher(img, None, None)
    assert np.asarray(out).shape == (1, 50, 60, 1)
    assert float(eff) == 1.0
