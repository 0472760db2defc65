"""The reference's PUBLISHED sample configs load unchanged and build models.

The reference ships 16 user-facing sample configs (reference
docs/sample_configs/*.yaml, linked from its training guide) covering every
pipeline family, backbone, and the medium/large receptive-field UNet presets.
A sleap-nn user switching to this framework should be able to point
``train`` at their existing config file — so each sample must parse through
``TrainingJobConfig.load_yaml``, validate, resolve exactly one
backbone/model type, and instantiate a real flax model.

Complements tests/config/test_generated_config_goldens.py (which covers the
config-generator's machine-written goldens); these are the hand-written,
comment-heavy docs configs with nulls for train-time-inferred fields.
"""

from pathlib import Path

import pytest
pytestmark = pytest.mark.slow  # integration tier: real training loops / model builds / subprocesses


from sleap_nn_tpu.config import (
    TrainingJobConfig,
    get_backbone_config,
    get_backbone_type_from_cfg,
    get_head_config,
    get_model_type_from_cfg,
    verify_training_cfg,
)

SAMPLES = Path("/root/reference/docs/sample_configs")
ALL = sorted(p.name for p in SAMPLES.glob("*.yaml"))


def test_sample_set_is_complete():
    # The reference publishes 16 sample configs; a rename/addition upstream
    # should surface here rather than silently shrinking coverage.
    assert len(ALL) == 16, ALL


@pytest.mark.parametrize("name", ALL)
def test_sample_loads_and_validates(name):
    cfg = TrainingJobConfig.load_yaml(SAMPLES / name)
    verify_training_cfg(cfg)
    assert get_backbone_type_from_cfg(cfg)
    assert get_model_type_from_cfg(cfg)


@pytest.mark.parametrize("name", ALL)
def test_sample_builds_model(name):
    """Every sample's hyperparameters instantiate a real flax model."""
    import jax
    import jax.numpy as jnp

    from sleap_nn_tpu.models import Model

    cfg = TrainingJobConfig.load_yaml(SAMPLES / name)
    model_type = get_model_type_from_cfg(cfg)
    head = get_head_config(cfg)
    # Train-time-inferred fields are null in the docs configs; inject the
    # same placeholders the trainer's _infer_config fills from labels.
    for leaf_name in ("class_maps", "class_vectors"):
        leaf = getattr(head, leaf_name, None)
        if leaf is not None and getattr(leaf, "classes", None) is None:
            leaf.classes = ["track_0", "track_1"]
    for leaf_name in ("confmaps", "centroid", "class_maps"):
        leaf = getattr(head, leaf_name, None)
        if leaf is not None and hasattr(leaf, "part_names"):
            if leaf.part_names is None:
                leaf.part_names = ["A", "B"]
    pafs = getattr(head, "pafs", None)
    if pafs is not None and getattr(pafs, "edges", None) is None:
        pafs.edges = [("A", "B")]

    backbone_type = get_backbone_type_from_cfg(cfg)
    bb = get_backbone_config(cfg)
    if backbone_type == "pretrained":
        # No network in CI: random-init the published HF architecture from
        # its preset table instead of downloading weights.
        bb.weights = False

    model = Model.from_config(backbone_type, bb, head, model_type)
    max_stride = getattr(bb, "max_stride", None) or 32
    size = int(max_stride) * 2
    in_ch = getattr(bb, "in_channels", None) or 1
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, size, size, in_ch))
    )
    out = model.apply(params, jnp.zeros((1, size, size, in_ch)))
    assert isinstance(out, dict) and out
