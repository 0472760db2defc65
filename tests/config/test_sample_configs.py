"""The shipped sample-config set stays valid and in sync with its builder."""

from pathlib import Path

import pytest

from sleap_nn_tpu.config import TrainingJobConfig, verify_training_cfg
from sleap_nn_tpu.config.sample_configs import (
    SAMPLE_DIR,
    SAMPLES,
    sample_yaml,
)


def test_sample_dir_has_every_sample():
    assert SAMPLE_DIR.is_dir()
    on_disk = {p.stem for p in SAMPLE_DIR.glob("*.yaml")}
    assert on_disk == set(SAMPLES), (
        "docs/sample_configs/ out of sync with SAMPLES — regenerate with "
        "`python -m sleap_nn_tpu.config.sample_configs`"
    )


@pytest.mark.parametrize("name", sorted(SAMPLES))
def test_sample_config_current_and_loadable(name):
    path = SAMPLE_DIR / f"{name}.yaml"
    assert path.read_text() == sample_yaml(name), (
        f"{path} is stale — regenerate with "
        "`python -m sleap_nn_tpu.config.sample_configs`"
    )
    cfg = TrainingJobConfig.load_yaml(str(path))
    verify_training_cfg(cfg)
    # Exactly one backbone + one head family set.
    assert cfg.model_config.backbone_config.which()
    assert cfg.model_config.head_configs.which()


def test_throughput_sample_carries_fast_knobs():
    cfg = TrainingJobConfig.load_yaml(str(
        SAMPLE_DIR
        / "config_topdown_centered_instance_unet_medium_rf_throughput.yaml"
    ))
    assert cfg.model_config.backbone_config.unet.output_stride == 4
    assert cfg.data_config.preprocessing.crop_size == 128
    assert (cfg.model_config.head_configs.centered_instance
            .confmaps.output_stride == 4)
