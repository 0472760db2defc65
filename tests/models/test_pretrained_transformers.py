"""Swinv2 + ViT/DINOv2 pretrained-backbone parity and Case-B mode.

Same strategy as test_pretrained.py: build TINY randomly-initialized HF
backbones from configs, ``save_pretrained`` locally, and check the flax
encoders + weight importer reproduce the torch forward numerically.
Reference scope: sleap_nn/architectures/pretrained.py Case A (Swinv2
hierarchical decoder) and Case B (isotropic ViTs -> encoder-only,
reference pretrained.py:100-140,409).
"""

from __future__ import annotations

import numpy as np
import pytest
pytestmark = pytest.mark.slow  # integration tier: real training loops / model builds / subprocesses


jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

transformers = pytest.importorskip("transformers")

FIXTURE = "/root/reference/tests/assets/datasets/minimal_instance.pkg.slp"


@pytest.fixture(scope="module")
def swinv2_snapshot(tmp_path_factory):
    import torch
    from transformers import Swinv2Backbone, Swinv2Config

    cfg = Swinv2Config(
        embed_dim=16,
        depths=[1, 2, 1, 1],
        num_heads=[2, 2, 2, 2],
        window_size=4,
        image_size=32,
        patch_size=4,
        num_channels=3,
        out_features=["stage1", "stage2", "stage3", "stage4"],
    )
    torch.manual_seed(0)
    model = Swinv2Backbone(cfg).eval()
    out = tmp_path_factory.mktemp("swinv2_snap")
    model.save_pretrained(out)
    return model, out


@pytest.fixture(scope="module")
def dinov2_snapshot(tmp_path_factory):
    import torch
    from transformers import Dinov2Backbone, Dinov2Config

    cfg = Dinov2Config(
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=2,
        intermediate_size=64,
        patch_size=8,
        image_size=32,
        num_channels=3,
        apply_layernorm=True,
        reshape_hidden_states=True,
        out_features=["stage2"],
    )
    torch.manual_seed(0)
    model = Dinov2Backbone(cfg).eval()
    out = tmp_path_factory.mktemp("dinov2_snap")
    model.save_pretrained(out)
    return model, out


def _flax_feats(snapshot_dir, x_nhwc):
    from sleap_nn_tpu.models.pretrained import (
        build_encoder,
        load_hf_encoder_params,
        resolve_hf_config,
    )

    arch_cfg, snap = resolve_hf_config(str(snapshot_dir))
    assert snap is not None
    enc = build_encoder(arch_cfg)
    variables = enc.init(jax.random.PRNGKey(0), jnp.zeros_like(jnp.asarray(x_nhwc)))
    variables, loaded = load_hf_encoder_params(str(snapshot_dir), variables)
    assert loaded
    feats = jax.jit(enc.apply)(variables, jnp.asarray(x_nhwc))
    return [np.asarray(f) for f in feats]


def test_swinv2_encoder_matches_transformers(swinv2_snapshot):
    """Shifted-window cosine attention + CPB + patch merging, bit-level."""
    import torch

    model, snap = swinv2_snapshot
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        want = [
            f.numpy().transpose(0, 2, 3, 1)
            for f in model(torch.from_numpy(x.transpose(0, 3, 1, 2))).feature_maps
        ]
    got = _flax_feats(snap, x)
    assert len(got) == len(want) == 4
    for g, w in zip(got, want):
        assert g.shape == w.shape
        np.testing.assert_allclose(g, w, atol=5e-4)


def test_dinov2_encoder_matches_transformers(dinov2_snapshot):
    """CLS+pos embed, pre-norm + LayerScale blocks, final LN, reshape."""
    import torch

    model, snap = dinov2_snapshot
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        want = [
            f.numpy().transpose(0, 2, 3, 1)
            for f in model(torch.from_numpy(x.transpose(0, 3, 1, 2))).feature_maps
        ]
    got = _flax_feats(snap, x)
    assert len(got) == len(want) == 1
    assert got[0].shape == want[0].shape == (2, 4, 4, 32)
    np.testing.assert_allclose(got[0], want[0], atol=5e-4)


def test_dinov2_pos_interpolation_matches_torch(dinov2_snapshot):
    """Non-native input size: bicubic pos-embed interpolation parity."""
    import torch

    model, snap = dinov2_snapshot
    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, 48, 48, 3)).astype(np.float32)
    with torch.no_grad():
        want = (
            model(torch.from_numpy(x.transpose(0, 3, 1, 2)))
            .feature_maps[0].numpy().transpose(0, 2, 3, 1)
        )
    got = _flax_feats(snap, x)[0]
    assert got.shape == want.shape == (1, 6, 6, 32)
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_vit_encoder_matches_transformers(tmp_path):
    """Plain ViT (no LayerScale) maps onto the same flax module."""
    import torch
    from transformers import ViTConfig, ViTModel

    cfg = ViTConfig(
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=2,
        intermediate_size=64,
        patch_size=8,
        image_size=32,
        num_channels=3,
    )
    torch.manual_seed(0)
    model = ViTModel(cfg, add_pooling_layer=False).eval()
    snap = tmp_path / "vit_snap"
    model.save_pretrained(snap)
    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        tokens = model(torch.from_numpy(x.transpose(0, 3, 1, 2))).last_hidden_state
    want = tokens[:, 1:].numpy().reshape(2, 4, 4, 32)
    got = _flax_feats(snap, x)[0]
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=5e-4)


def test_swinv2_decoder_backbone_and_training(swinv2_snapshot, tmp_path):
    """Case A: Swinv2 pyramid feeds the SLEAP decoder and trains e2e."""
    from sleap_nn_tpu.config import TrainingJobConfig, apply_overrides
    from sleap_nn_tpu.config.model_config import PretrainedConfig
    from sleap_nn_tpu.models.pretrained import PretrainedBackbone
    from sleap_nn_tpu.training import ModelTrainer

    _, snap = swinv2_snapshot
    bb = PretrainedBackbone.from_config(
        PretrainedConfig(model_name=str(snap), output_stride=4)
    )
    assert bb.mode == "decoder"
    assert bb.pyramid_strides == (4, 8, 16, 32)

    from tests.fixture_utils import single_instance_fixture

    cfg = TrainingJobConfig()
    cfg.data_config.train_labels_path = [single_instance_fixture()]
    cfg.data_config.use_same_data_for_val = True
    cfg.data_config.use_augmentations_train = False
    cfg.data_config.preprocessing.scale = 0.25
    apply_overrides(cfg, {
        "model_config.backbone_config.pretrained.model_name": str(snap),
        "model_config.backbone_config.pretrained.output_stride": 4,
        "model_config.head_configs.single_instance.confmaps.output_stride": 4,
    })
    cfg.trainer_config.max_epochs = 1
    cfg.trainer_config.min_train_steps_per_epoch = 2
    cfg.trainer_config.train_data_loader.batch_size = 1
    cfg.trainer_config.val_data_loader.batch_size = 1
    cfg.trainer_config.save_ckpt = False
    cfg.trainer_config.ckpt_dir = str(tmp_path)
    cfg.trainer_config.run_name = "swinv2_run"
    cfg.trainer_config.enable_progress_bar = False
    trainer = ModelTrainer.get_model_trainer_from_config(cfg)
    trainer.setup()
    history = trainer.train()
    assert np.isfinite(history[-1]["train/loss"])


def test_dinov2_encoder_only_mode_and_training(dinov2_snapshot, tmp_path):
    """Case B: isotropic ViT resolves to encoder-only; heads bind to the
    bottleneck; a fixture model trains (reference pretrained.py:100-140)."""
    from sleap_nn_tpu.config import TrainingJobConfig, apply_overrides
    from sleap_nn_tpu.config.model_config import PretrainedConfig
    from sleap_nn_tpu.models import Model
    from sleap_nn_tpu.models.pretrained import PretrainedBackbone
    from sleap_nn_tpu.training import ModelTrainer

    _, snap = dinov2_snapshot
    bb = PretrainedBackbone.from_config(PretrainedConfig(model_name=str(snap)))
    assert bb.mode == "encoder"
    assert bb.stride_to_filters == {}
    assert bb.max_stride == 8  # the patch stride
    assert bb.middle_channels == 32

    # Heads route to middle_output when there is no decoder.
    model = Model.from_config(
        "pretrained",
        PretrainedConfig(model_name=str(snap)),
        {"confmaps": {"part_names": ["A", "B"], "sigma": 2.5, "output_stride": 8}},
        "single_instance",
    )
    x = jnp.zeros((1, 32, 32, 1))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = jax.jit(model.apply)(variables, x)
    assert out["SingleInstanceConfmapsHead"].shape == (1, 4, 4, 2)

    from tests.fixture_utils import single_instance_fixture

    cfg = TrainingJobConfig()
    cfg.data_config.train_labels_path = [single_instance_fixture()]
    cfg.data_config.use_same_data_for_val = True
    cfg.data_config.use_augmentations_train = False
    cfg.data_config.preprocessing.scale = 0.25
    apply_overrides(cfg, {
        "model_config.backbone_config.pretrained.model_name": str(snap),
        "model_config.head_configs.single_instance.confmaps.output_stride": 8,
    })
    cfg.trainer_config.max_epochs = 1
    cfg.trainer_config.min_train_steps_per_epoch = 2
    cfg.trainer_config.train_data_loader.batch_size = 1
    cfg.trainer_config.val_data_loader.batch_size = 1
    cfg.trainer_config.save_ckpt = False
    cfg.trainer_config.ckpt_dir = str(tmp_path)
    cfg.trainer_config.run_name = "dinov2_run"
    cfg.trainer_config.enable_progress_bar = False
    trainer = ModelTrainer.get_model_trainer_from_config(cfg)
    trainer.setup()
    history = trainer.train()
    assert np.isfinite(history[-1]["train/loss"])


def test_forced_decoder_mode_on_isotropic_raises(dinov2_snapshot):
    from sleap_nn_tpu.config.model_config import PretrainedConfig
    from sleap_nn_tpu.models.pretrained import PretrainedBackbone

    _, snap = dinov2_snapshot
    with pytest.raises(ValueError, match="isotropic"):
        PretrainedBackbone.from_config(
            PretrainedConfig(model_name=str(snap), mode="decoder")
        )


def test_builtin_offline_configs_for_new_families():
    from sleap_nn_tpu.models.pretrained import build_encoder, resolve_hf_config

    for name, mt in (
        ("microsoft/swinv2-tiny-patch4-window8-256", "swinv2"),
        ("facebook/dinov2-base", "dinov2"),
        ("google/vit-base-patch16-224", "vit"),
    ):
        cfg, snap = resolve_hf_config(name)
        assert snap is None and cfg["model_type"] == mt
        build_encoder(cfg)  # constructs without error