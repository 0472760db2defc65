"""Architecture-estimate canonical-value matrix.

Parity target: reference tests/test_architecture_estimates.py — the web
app's RF_TABLE values, encoder/decoder block counts, animal-size stride
selection, web-app max_stride buckets, crop/pad math — against
sleap_nn_tpu/config_generator/architecture_estimates.py.
"""

from __future__ import annotations

import pytest

from sleap_nn_tpu.config_generator.architecture_estimates import (
    compute_max_stride_for_animal_size,
    compute_pad_to_stride,
    compute_receptive_field,
    compute_suggested_crop_size,
    decoder_blocks,
    encoder_blocks,
    estimate_unet_params,
    recommend_default_max_stride,
)


@pytest.mark.parametrize(
    "max_stride,expected_rf",
    [(8, 36), (16, 76), (32, 156), (64, 316), (128, 636)],
)
def test_receptive_field_canonical_table(max_stride, expected_rf):
    assert compute_receptive_field(max_stride) == expected_rf


def test_receptive_field_minimum_stride():
    # convs (3,3) + pool (2): rf = 1 + 2 + 2 + 1 = 6.
    assert compute_receptive_field(2) == 6


@pytest.mark.parametrize("bad", [0, 15, -8, 1])
def test_receptive_field_invalid_stride_raises(bad):
    with pytest.raises(ValueError):
        compute_receptive_field(bad)


@pytest.mark.parametrize(
    "max_stride,expected", [(8, 3), (16, 4), (32, 5), (64, 6), (128, 7)]
)
def test_encoder_blocks(max_stride, expected):
    assert encoder_blocks(max_stride) == expected


@pytest.mark.parametrize(
    "max_stride,output_stride,expected",
    [(16, 1, 4), (16, 2, 3), (32, 4, 3), (64, 1, 6), (32, 1, 5)],
)
def test_decoder_blocks(max_stride, output_stride, expected):
    assert decoder_blocks(max_stride, output_stride) == expected


def test_decoder_blocks_zero_output_stride_falls_back():
    assert decoder_blocks(16, 0) == encoder_blocks(16)


@pytest.mark.parametrize(
    "animal_size,expected",
    [(30, 8), (50, 16), (100, 32), (200, 64), (400, 128), (700, 128)],
)
def test_max_stride_picks_smallest_covering(animal_size, expected):
    assert compute_max_stride_for_animal_size(animal_size) == expected


def test_max_stride_huge_animal_falls_back_to_largest():
    assert compute_max_stride_for_animal_size(10_000) == 128


def test_max_stride_custom_candidates():
    assert compute_max_stride_for_animal_size(50, candidates=(16, 32)) == 16
    assert compute_max_stride_for_animal_size(500, candidates=(16, 32)) == 32


@pytest.mark.parametrize(
    "avg_size,scale,expected",
    [
        (30, 1.0, 8), (39.9, 1.0, 8), (40, 1.0, 16), (60, 1.0, 16),
        (100, 1.0, 16), (100.1, 1.0, 32), (200, 1.0, 32),
        (200, 0.5, 16), (50, 0.5, 8), (300, 0.5, 32),
    ],
)
def test_default_max_stride_web_app_buckets(avg_size, scale, expected):
    assert recommend_default_max_stride(avg_size, scale) == expected


# ------------------------------------------------------------- param count


def test_unet_params_grow_with_max_stride():
    small = estimate_unet_params(filters=32, max_stride=8, output_stride=1)
    big = estimate_unet_params(filters=32, max_stride=32, output_stride=1)
    assert big > small * 2


def test_unet_params_output_stride_affects_decoder_depth():
    os1 = estimate_unet_params(filters=32, max_stride=16, output_stride=1)
    os4 = estimate_unet_params(filters=32, max_stride=16, output_stride=4)
    assert os1 > os4


def test_unet_params_in_channels_first_layer_delta():
    gray = estimate_unet_params(filters=32, max_stride=16, in_channels=1)
    rgb = estimate_unet_params(filters=32, max_stride=16, in_channels=3)
    # RGB adds exactly (3-1)*32*9 params in the first conv.
    assert rgb - gray == 2 * 32 * 9


def test_unet_params_match_real_model_ballpark():
    # Typical config lands in the reference's 1-2M window.
    params = estimate_unet_params(
        filters=32, filters_rate=1.5, max_stride=16, output_stride=1,
        in_channels=1, head_channels=24,
    )
    assert 1_000_000 < params < 2_000_000


# ----------------------------------------------------------- crop/pad math


def test_pad_to_stride_multiples_unchanged():
    assert compute_pad_to_stride(64, 128, 16) == (64, 128)


def test_pad_to_stride_rounds_up():
    assert compute_pad_to_stride(65, 129, 16) == (80, 144)


def test_pad_to_stride_32():
    assert compute_pad_to_stride(100, 100, 32) == (128, 128)


def test_crop_size_rounds_to_stride():
    got = compute_suggested_crop_size(70, 16)
    assert got % 16 == 0 and got >= 70


def test_crop_size_respects_min():
    assert compute_suggested_crop_size(10, 16, min_crop_size=100) >= 100


def test_crop_size_grows_with_rotation():
    flat = compute_suggested_crop_size(100, 16, rotation_max=0.0)
    rot = compute_suggested_crop_size(100, 16, rotation_max=45.0)
    assert rot > flat
