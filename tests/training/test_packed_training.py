"""Training with packed (space-to-depth) level-0 execution.

trainer_config.packed_level0=True must train the SAME model (identical
param tree, checkpoints interchangeable) with per-epoch losses matching
the plain layout to float tolerance — the transform is exact, so the
whole optimization trajectory coincides.
"""

from pathlib import Path

import numpy as np
import pytest
pytestmark = pytest.mark.slow  # integration tier: real training loops / model builds / subprocesses


from tests.training.test_trainer import make_cfg
from sleap_nn_tpu.training import ModelTrainer


def _train(tmp_path, packed, run_name):
    cfg = make_cfg("single_instance", tmp_path)
    cfg.trainer_config.packed_level0 = packed
    cfg.trainer_config.run_name = run_name
    cfg.trainer_config.max_epochs = 1
    trainer = ModelTrainer.get_model_trainer_from_config(cfg)
    trainer.train()
    return trainer


def test_packed_training_matches_plain(tmp_path):
    t_plain = _train(tmp_path, False, "plain")
    t_packed = _train(tmp_path, True, "packed")

    assert t_packed.model.backbone.packed_levels >= 1
    assert t_plain.model.backbone.packed_levels == 0

    # Identical param trees -> checkpoints are interchangeable.
    import jax

    k1 = [jax.tree_util.keystr(k) for k, _ in
          jax.tree_util.tree_leaves_with_path(t_plain.params)]
    k2 = [jax.tree_util.keystr(k) for k, _ in
          jax.tree_util.tree_leaves_with_path(t_packed.params)]
    assert k1 == k2

    # Same seed + exact transform -> the training trajectory coincides.
    for (_, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(t_plain.params),
        jax.tree_util.tree_leaves_with_path(t_packed.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_packed_checkpoint_loads_into_plain_inference(tmp_path):
    _train(tmp_path, True, "packed_ckpt")
    from sleap_nn_tpu.inference.loaders import load_model

    loaded = load_model(Path(tmp_path) / "packed_ckpt")
    # Loader builds the plain model; packed-trained params apply unchanged.
    import jax.numpy as jnp

    x = jnp.zeros((1, 16, 16, 1), jnp.float32)
    out = loaded.model.apply(loaded.params, x)
    assert "SingleInstanceConfmapsHead" in out


def test_packed_auto_is_off_on_cpu(tmp_path):
    t = _train(tmp_path, None, "auto")
    # Tests run on the CPU platform: auto must resolve to plain layout.
    assert t.model.backbone.packed_levels == 0
