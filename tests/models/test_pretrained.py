"""Pretrained (HF) backbone family: encoder parity, decoder wiring, training.

Parity strategy: the environment has `transformers` (torch) but no network,
so tests build TINY randomly-initialized HF backbones from configs, save
them locally with ``save_pretrained`` (safetensors), then check this
package's flax encoders + weight importer reproduce the torch forward
numerically. Reference: sleap_nn/architectures/pretrained.py:111-502.
"""

from __future__ import annotations

import numpy as np
import pytest
pytestmark = pytest.mark.slow  # integration tier: real training loops / model builds / subprocesses


jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def cnv2_snapshot(tmp_path_factory):
    import torch
    from transformers import ConvNextV2Backbone, ConvNextV2Config

    cfg = ConvNextV2Config(
        depths=[1, 1, 2, 1],
        hidden_sizes=[8, 16, 24, 32],
        num_channels=3,
        out_features=["stage1", "stage2", "stage3", "stage4"],
        out_indices=[1, 2, 3, 4],
    )
    torch.manual_seed(0)
    model = ConvNextV2Backbone(cfg).eval()
    out = tmp_path_factory.mktemp("cnv2_snap")
    model.save_pretrained(out)
    return model, out


@pytest.fixture(scope="module")
def resnet_snapshot(tmp_path_factory):
    import torch
    from transformers import ResNetBackbone, ResNetConfig

    cfg = ResNetConfig(
        depths=[1, 1, 1, 1],
        hidden_sizes=[8, 16, 24, 32],
        embedding_size=8,
        layer_type="bottleneck",
        out_features=["stage1", "stage2", "stage3", "stage4"],
        out_indices=[1, 2, 3, 4],
    )
    torch.manual_seed(0)
    model = ResNetBackbone(cfg).eval()
    out = tmp_path_factory.mktemp("resnet_snap")
    model.save_pretrained(out)
    return model, out


def _flax_encoder_outputs(snapshot_dir, x_nhwc):
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


@pytest.mark.parametrize("which", ["cnv2", "resnet"])
def test_encoder_matches_transformers(which, cnv2_snapshot, resnet_snapshot):
    import torch

    model, snap = cnv2_snapshot if which == "cnv2" else resnet_snapshot
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        want = [
            f.numpy().transpose(0, 2, 3, 1)
            for f in model(torch.from_numpy(x.transpose(0, 3, 1, 2))).feature_maps
        ]
    got = _flax_encoder_outputs(snap, x)
    assert len(got) == len(want) == 4
    for g, w in zip(got, want):
        assert g.shape == w.shape
        np.testing.assert_allclose(g, w, atol=2e-4)


def test_pretrained_backbone_forward_and_heads(cnv2_snapshot):
    """Probe-built decoder produces per-stride outputs a head can bind to."""
    from sleap_nn_tpu.config.model_config import PretrainedConfig
    from sleap_nn_tpu.models import Model
    from sleap_nn_tpu.models.pretrained import PretrainedBackbone

    _, snap = cnv2_snapshot
    cfg = PretrainedConfig(model_name=str(snap), output_stride=2, up_interpolate=True)
    bb = PretrainedBackbone.from_config(cfg)
    assert bb.pyramid_strides == (4, 8, 16, 32)
    assert bb.max_stride == 32
    assert 2 in bb.stride_to_filters and 32 in bb.stride_to_filters

    model = Model.from_config(
        "pretrained",
        cfg,
        {"confmaps": {"part_names": ["A", "B"], "sigma": 2.5, "output_stride": 2}},
        "single_instance",
    )
    x = jnp.zeros((1, 64, 64, 1))  # grayscale: Model replicates to 3ch
    variables = model.init(jax.random.PRNGKey(0), x)
    out = jax.jit(model.apply)(variables, x)
    assert out["SingleInstanceConfmapsHead"].shape == (1, 32, 32, 2)


def test_pretrained_resolve_builtin_offline():
    from sleap_nn_tpu.models.pretrained import resolve_hf_config

    cfg, snap = resolve_hf_config("facebook/convnextv2-nano-22k-224")
    assert snap is None and cfg["model_type"] == "convnextv2"
    with pytest.raises(ValueError, match="Cannot resolve"):
        resolve_hf_config("nonexistent/model-id")


def test_pretrained_training_with_freeze(cnv2_snapshot, tmp_path):
    """Train one epoch on the fixture: loss finite, frozen encoder unmoved."""
    from sleap_nn_tpu.config import TrainingJobConfig, apply_overrides
    from sleap_nn_tpu.training import ModelTrainer

    _, snap = cnv2_snapshot
    from tests.fixture_utils import single_instance_fixture

    cfg = TrainingJobConfig()
    cfg.data_config.train_labels_path = [single_instance_fixture()]
    cfg.data_config.use_same_data_for_val = True
    cfg.data_config.use_augmentations_train = False
    cfg.data_config.preprocessing.scale = 0.25
    apply_overrides(cfg, {
        "model_config.backbone_config.pretrained.model_name": str(snap),
        "model_config.backbone_config.pretrained.output_stride": 4,
        "model_config.backbone_config.pretrained.freeze": True,
        "model_config.head_configs.single_instance.confmaps.output_stride": 4,
    })
    cfg.trainer_config.max_epochs = 1
    cfg.trainer_config.min_train_steps_per_epoch = 2
    cfg.trainer_config.train_data_loader.batch_size = 1
    cfg.trainer_config.val_data_loader.batch_size = 1
    cfg.trainer_config.save_ckpt = True
    cfg.trainer_config.ckpt_dir = str(tmp_path)
    cfg.trainer_config.run_name = "pretrained_run"
    cfg.trainer_config.enable_progress_bar = False

    trainer = ModelTrainer.get_model_trainer_from_config(cfg)
    trainer.setup()
    before = jax.device_get(trainer.params)
    history = trainer.train()
    assert np.isfinite(history[-1]["train/loss"])
    after = jax.device_get(trainer.params)

    def subtree(tree, *names):
        for n in names:
            tree = tree[n]
        return tree

    enc_b = jax.tree_util.tree_leaves(subtree(before, "params", "backbone", "encoder"))
    enc_a = jax.tree_util.tree_leaves(subtree(after, "params", "backbone", "encoder"))
    for b, a in zip(enc_b, enc_a):
        np.testing.assert_array_equal(b, a)  # frozen
    dec_b = jax.tree_util.tree_leaves(subtree(before, "params", "backbone", "dec"))
    dec_a = jax.tree_util.tree_leaves(subtree(after, "params", "backbone", "dec"))
    assert any(not np.array_equal(b, a) for b, a in zip(dec_b, dec_a))  # trained


def test_out_indices_subsets_pyramid():
    """out_indices restricts which encoder stages feed the decoder."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from types import SimpleNamespace
    from sleap_nn_tpu.models.pretrained import PretrainedBackbone

    def cfg(**over):
        base = dict(
            model_name="facebook/convnextv2-nano-22k-224",
            output_stride=4, filters_rate=2.0, convs_per_block=2,
            kernel_size=3, up_interpolate=True, normalize=True,
            image_mean=None, image_std=None, out_indices=None,
        )
        base.update(over)
        return SimpleNamespace(**base)

    full = PretrainedBackbone.from_config(cfg())
    sub = PretrainedBackbone.from_config(cfg(out_indices=[0, 1, 2]))
    assert len(sub.pyramid_strides) == 3
    assert sub.max_stride < full.max_stride  # deepest stage dropped
    # The subset model initializes and runs.
    x = jnp.zeros((1, 64, 64, 3))
    params = sub.init(jax.random.PRNGKey(0), x)
    out = sub.apply(params, x)
    assert any(np.asarray(v).ndim == 4 for v in jax.tree_util.tree_leaves(out))

    import pytest as _pytest
    with _pytest.raises(ValueError, match="out_indices"):
        PretrainedBackbone.from_config(cfg(out_indices=[0, 9]))


def test_revision_pinning_errors_on_unknown(tmp_path, monkeypatch):
    from sleap_nn_tpu.models.pretrained import find_local_snapshot

    # Build a fake HF cache layout with two snapshots.
    cache = tmp_path / ".cache/huggingface/hub"
    slug = cache / "models--org--model/snapshots"
    for sha in ("aaaa1111", "bbbb2222"):
        d = slug / sha
        d.mkdir(parents=True)
        (d / "config.json").write_text("{}")
    monkeypatch.setattr("pathlib.Path.home", lambda: tmp_path)

    snap = find_local_snapshot("org/model")
    assert snap is not None and snap.name == "bbbb2222"  # newest by sort
    pinned = find_local_snapshot("org/model", revision="aaaa")
    assert pinned.name == "aaaa1111"
    import pytest as _pytest
    with _pytest.raises(FileNotFoundError, match="revision"):
        find_local_snapshot("org/model", revision="cccc")
