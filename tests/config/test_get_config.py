"""Kwargs -> config builder tests (including a train-through check)."""

import pytest

from sleap_nn_tpu.config import verify_training_cfg
from sleap_nn_tpu.config.get_config import (
    get_aug_config,
    get_backbone_config,
    get_config,
    get_head_configs,
    get_trainer_config,
)

FIXTURE = "/root/reference/tests/assets/datasets/minimal_instance.pkg.slp"
from tests.fixture_utils import single_instance_fixture
SI_FIXTURE = single_instance_fixture()


def test_get_aug_config_shorthands():
    aug = get_aug_config(intensity_aug="brightness", geometric_aug=["rotation", "flip"])
    assert aug.intensity.brightness_p == 1.0
    assert aug.geometric.affine_p == 1.0
    assert aug.geometric.flip_p == 0.5
    assert get_aug_config() is None
    aug2 = get_aug_config(intensity_aug={"contrast_p": 0.7, "contrast_min": 0.8})
    assert aug2.intensity.contrast_p == 0.7


def test_get_backbone_config_presets():
    b = get_backbone_config("unet_large_rf")
    assert b.which() == "unet"
    assert b.unet.filters_rate == 2.0
    b2 = get_backbone_config("convnext_small")
    assert b2.which() == "convnext" and b2.convnext.model_type == "small"
    b3 = get_backbone_config("swint_base")
    assert b3.swint.model_type == "base"
    with pytest.raises(ValueError):
        get_backbone_config("resnet")
    b4 = get_backbone_config({"unet": {"filters": 12, "max_stride": 8}})
    assert b4.unet.filters == 12


def test_get_head_configs():
    h = get_head_configs("bottomup")
    assert h.which() == "bottomup"
    assert h.bottomup.confmaps is not None and h.bottomup.pafs is not None
    h2 = get_head_configs({"single_instance": {"confmaps": {"sigma": 3.0}}})
    assert h2.single_instance.confmaps.sigma == 3.0
    with pytest.raises(ValueError):
        get_head_configs("psychic")


@pytest.mark.slow
def test_get_config_one_shot_trains(tmp_path):
    from sleap_nn_tpu.train import run_training

    cfg = get_config(
        train_labels_path=[SI_FIXTURE],
        use_same_data_for_val=True,
        scale=0.25,
        backbone="unet",
        head_configs="single_instance",
        filters=8,
        max_stride=8,
        output_stride=2,
        batch_size=1,
        max_epochs=2,
        min_train_steps_per_epoch=1,
        save_ckpt=True,
        ckpt_dir=str(tmp_path),
        run_name="kw",
        enable_progress_bar=False,
    )
    verify_training_cfg(cfg)
    trainer = run_training(cfg)
    assert (tmp_path / "kw" / "best.ckpt").exists()


@pytest.mark.slow
def test_train_kwargs_route_through_builders(tmp_path):
    """Python-API train() maps reference kwargs (backbone_config as dict,
    scale, use_augmentations_train) into the config builders instead of
    dumping them on trainer_config (reference train.py:535)."""
    from sleap_nn_tpu.train import train

    train(
        train_labels_path=SI_FIXTURE,
        use_same_data_for_val=True,
        backbone_config={"unet": {"filters": 8, "filters_rate": 2.0,
                                  "max_stride": 8, "output_stride": 2}},
        head_configs={"single_instance": {"confmaps": {"output_stride": 2}}},
        scale=0.25,
        use_augmentations_train=False,
        max_epochs=1, min_train_steps_per_epoch=1, batch_size=1,
        save_ckpt=True, ckpt_dir=str(tmp_path), run_name="kwargs_route",
        enable_progress_bar=False,
    )
    md = tmp_path / "kwargs_route"
    assert (md / "best.ckpt").exists()
    import yaml

    saved = yaml.safe_load((md / "training_config.yaml").read_text())
    assert saved["data_config"]["preprocessing"]["scale"] == 0.25
    assert saved["model_config"]["backbone_config"]["unet"]["filters"] == 8


def test_get_backbone_config_pretrained():
    c = get_backbone_config({"pretrained": {"model_name": "/x", "freeze": True}})
    assert c.pretrained.model_name == "/x" and c.pretrained.freeze
    assert get_backbone_config("pretrained").pretrained is not None
    with pytest.raises(ValueError, match="Unknown backbone"):
        get_backbone_config({"resnext": {}})
