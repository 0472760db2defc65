"""Data-config range validation matrix.

Reference scenario source: tests/config/test_data_config.py
(validate_proportion, invalid scale) and test_tiling.py field validators —
enforced here centrally in verify_training_cfg (reference attrs validators,
data_config.py:16,123-141,179,214-269).
"""

from __future__ import annotations

import pytest

from sleap_nn_tpu.config import TrainingJobConfig, apply_overrides
from sleap_nn_tpu.config.training_job_config import verify_training_cfg

REF_CFG = ("/root/reference/tests/assets/model_ckpts/"
           "minimal_instance_single_instance/training_config.yaml")


def cfg_with(**overrides):
    cfg = TrainingJobConfig.load_yaml(REF_CFG)
    apply_overrides(cfg, {k.replace("__", "."): v for k, v in overrides.items()})
    return cfg


def test_reference_config_passes():
    verify_training_cfg(cfg_with())


@pytest.mark.parametrize("scale", [0.0, -0.5])
def test_preprocessing_scale_rejects_nonpositive(scale):
    cfg = cfg_with(**{"data_config__preprocessing__scale": scale})
    with pytest.raises(ValueError, match="scale must be > 0"):
        verify_training_cfg(cfg)


@pytest.mark.parametrize("field,value", [
    ("min_overlap_fraction", 1.5),
    ("min_overlap_fraction", -0.1),
    ("cpu_thresh", 2.0),
    ("center_jitter", -0.5),
    ("tile_fg_fraction", 1.01),
])
def test_tiling_proportions_rejected(field, value):
    cfg = cfg_with(**{f"data_config__preprocessing__tiling__{field}": value})
    with pytest.raises(ValueError, match=field):
        verify_training_cfg(cfg)


@pytest.mark.parametrize("value", [0.0, 1.5, -0.2])
def test_tiling_sigma_scale_bounds(value):
    cfg = cfg_with(**{"data_config__preprocessing__tiling__sigma_scale": value})
    with pytest.raises(ValueError, match="sigma_scale"):
        verify_training_cfg(cfg)


def test_tiling_min_visible_keypoints_nonnegative():
    cfg = cfg_with(
        **{"data_config__preprocessing__tiling__min_visible_keypoints": -1})
    with pytest.raises(ValueError, match="min_visible_keypoints"):
        verify_training_cfg(cfg)


@pytest.mark.parametrize("field,value", [
    ("uniform_noise_p", 1.2),
    ("gaussian_noise_p", -0.1),
    ("contrast_p", 7.0),
    ("brightness_p", -1.0),
])
def test_intensity_probabilities_rejected(field, value):
    cfg = cfg_with(
        **{f"data_config__augmentation_config__intensity__{field}": value})
    with pytest.raises(ValueError, match=field):
        verify_training_cfg(cfg)


@pytest.mark.parametrize("field,value", [
    ("rotation_p", 1.5),
    ("affine_p", -0.5),
    ("erase_p", 2.0),
    ("mixup_p", -0.01),
    ("flip_p", 1.0001),
])
def test_geometric_probabilities_rejected(field, value):
    cfg = cfg_with(
        **{f"data_config__augmentation_config__geometric__{field}": value})
    with pytest.raises(ValueError, match=field):
        verify_training_cfg(cfg)


def test_negative_intensity_bounds_rejected():
    cfg = cfg_with(
        **{"data_config__augmentation_config__intensity__contrast_min": -0.5})
    with pytest.raises(ValueError, match="contrast_min"):
        verify_training_cfg(cfg)


def test_valid_probabilities_pass():
    cfg = cfg_with(**{
        "data_config__augmentation_config__geometric__rotation_p": 1.0,
        "data_config__augmentation_config__geometric__flip_p": 0.5,
        "data_config__augmentation_config__intensity__contrast_p": 0.0,
    })
    verify_training_cfg(cfg)


def test_no_augmentation_config_is_fine():
    cfg = cfg_with()
    cfg.data_config.augmentation_config = None
    verify_training_cfg(cfg)


# ── tiling enum + optional-positive-int validation (reference
#    tests/config/test_tiling.py blend/sampling/accumulator_device/
#    optional-positive-int classes) ─────────────────────────────────────────

TP = "data_config.preprocessing.tiling."


@pytest.mark.parametrize("value", ["gaussian", "pyramid", "constant"])
def test_tiling_blend_valid(value):
    verify_training_cfg(cfg_with(**{f"{TP}blend".replace(".", "__"): value}))


@pytest.mark.parametrize("value", ["hann", "linear", "flat", "GAUSSIAN"])
def test_tiling_blend_invalid(value):
    with pytest.raises(ValueError, match="tiling.blend"):
        verify_training_cfg(cfg_with(**{f"{TP}blend".replace(".", "__"): value}))


@pytest.mark.parametrize("value", ["foreground", "grid"])
def test_tiling_sampling_valid(value):
    verify_training_cfg(cfg_with(**{f"{TP}sampling".replace(".", "__"): value}))


@pytest.mark.parametrize("value", ["random", "fg"])
def test_tiling_sampling_invalid(value):
    with pytest.raises(ValueError, match="tiling.sampling"):
        verify_training_cfg(
            cfg_with(**{f"{TP}sampling".replace(".", "__"): value})
        )


@pytest.mark.parametrize("value", ["auto", "cpu", "cuda", "device"])
def test_tiling_accumulator_device_valid(value):
    """'cuda' stays loadable for reference-config compatibility."""
    verify_training_cfg(
        cfg_with(**{f"{TP}accumulator_device".replace(".", "__"): value})
    )


def test_tiling_accumulator_device_invalid():
    with pytest.raises(ValueError, match="tiling.accumulator_device"):
        verify_training_cfg(
            cfg_with(**{f"{TP}accumulator_device".replace(".", "__"): "gpu0"})
        )


@pytest.mark.parametrize(
    "field", ["tile_size", "tile_batch_size", "samples_per_frame",
              "steps_per_epoch"],
)
@pytest.mark.parametrize("value", [0, -4])
def test_tiling_optional_positive_int_invalid(field, value):
    with pytest.raises(ValueError, match=f"tiling.{field}"):
        verify_training_cfg(cfg_with(**{f"{TP}{field}".replace(".", "__"): value}))


def test_tiling_overlap_zero_is_valid_abutting_tiles():
    """overlap=0 stays loadable: the trainer floors it with a warning and
    inference tiling accepts abutting tiles (review finding r3)."""
    verify_training_cfg(cfg_with(**{f"{TP}overlap".replace(".", "__"): 0}))


def test_tiling_overlap_negative_invalid():
    with pytest.raises(ValueError, match="tiling.overlap"):
        verify_training_cfg(cfg_with(**{f"{TP}overlap".replace(".", "__"): -8}))


@pytest.mark.parametrize(
    "field,value",
    [("tile_size", 256), ("overlap", 32), ("tile_batch_size", 4),
     ("samples_per_frame", 2), ("steps_per_epoch", 100)],
)
def test_tiling_optional_positive_int_valid_and_none(field, value):
    verify_training_cfg(cfg_with(**{f"{TP}{field}".replace(".", "__"): value}))
    # None (unset) is always allowed.
    cfg = cfg_with()
    setattr(cfg.data_config.preprocessing.tiling, field, None)
    verify_training_cfg(cfg)
