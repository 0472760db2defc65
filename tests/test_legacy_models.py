"""Legacy SLEAP v1 keras-model import tests against the real legacy fixtures."""

from pathlib import Path

import numpy as np
import pytest

from sleap_nn_tpu.legacy_models import (
    legacy_config_mapper,
    load_keras_weights,
    load_legacy_model,
)

LEGACY = Path("/root/reference/tests/assets/legacy_models")


def test_load_keras_weights():
    w = load_keras_weights(LEGACY / "minimal_robot.UNet.single_instance/best_model.h5")
    assert "stack0_enc0_conv0" in w
    assert w["stack0_enc0_conv0"]["kernel"].shape == (3, 3, 3, 8)
    assert "SingleInstanceConfmapsHead_0" in w


def test_legacy_config_mapping():
    import json

    legacy = json.loads(
        (LEGACY / "minimal_robot.UNet.single_instance/training_config.json").read_text()
    )
    cfg = legacy_config_mapper(legacy)
    assert cfg.model_config.backbone_config.unet.filters == 8
    assert cfg.model_config.backbone_config.unet.max_stride == 4
    assert cfg.model_config.head_configs.single_instance.confmaps.part_names == ["A", "B"]
    assert cfg.data_config.preprocessing.scale == 0.5
    assert cfg.trainer_config.optimizer.lr == 0.001
    assert cfg.trainer_config.lr_scheduler.reduce_lr_on_plateau is not None
    skel = cfg.data_config.skeletons[0]
    assert [n["name"] for n in skel["nodes"]] == ["A", "B"]


@pytest.mark.parametrize(
    "fixture",
    ["minimal_robot.UNet.single_instance", "minimal_instance.UNet.centered_instance"],
)
def test_load_legacy_model_full(fixture):
    import jax
    import jax.numpy as jnp

    model, params, cfg, report = load_legacy_model(LEGACY / fixture)
    # Every encoder/decoder/head conv maps; only unsupported extras skip.
    assert len(report["mapped"]) >= 8, report
    unexpected = [s for s in report["skipped"] if "OffsetRefinement" not in s]
    assert not unexpected, unexpected

    # The imported weights actually flow: forward on ones differs from zeros.
    bc = cfg.model_config.backbone_config.unet
    size = bc.max_stride * 8
    x = jnp.ones((1, size, size, bc.in_channels))
    out = model.apply(params, x)
    head_out = list(out.values())[0]
    assert np.isfinite(np.asarray(head_out)).all()
    assert float(jnp.abs(head_out).max()) > 0

    # Specific weights placed exactly.
    w = load_keras_weights(LEGACY / f"{fixture}/best_model.h5")
    tree = params["params"]["backbone"]
    np.testing.assert_array_equal(
        np.asarray(tree["stack0_enc"]["enc0"]["conv0"]["kernel"]),
        w["stack0_enc0_conv0"]["kernel"],
    )
