"""Negative-loss weighting semantics in the fused train/val steps.

Reference scenario source: tests/data/test_negative_frames.py
(TestNegativeLossWeighting): sample weights scale the TRAIN loss only —
the validation loss stays unweighted so val/loss-driven checkpoint
selection and early stopping are comparable across weight settings.
"""

from __future__ import annotations

import numpy as np
import pytest

from tests.training.test_trainer import FIXTURE, make_cfg

from sleap_nn_tpu.training import ModelTrainer


@pytest.fixture(scope="module")
def trainer(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("negweight")
    cfg = make_cfg("single_instance", tmp)
    cfg.trainer_config.save_ckpt = False
    tr = ModelTrainer.get_model_trainer_from_config(cfg)
    tr.setup()
    return tr


def batch_with_weight(trainer, w):
    import jax.numpy as jnp

    batch = trainer.train_ds.make_batch([0, 0])
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    batch["sample_weight"] = jnp.asarray([1.0, float(w)], jnp.float32)
    return batch


def step_on_copies(trainer, batch, key):
    # _train_step donates params/opt_state — pass deep copies so the
    # trainer's own buffers survive for the next call.
    import jax

    copy = lambda t: jax.tree_util.tree_map(lambda x: x.copy(), t)
    return trainer._train_step(copy(trainer.params), copy(trainer.opt_state),
                               batch, key)


def test_train_loss_scales_with_sample_weight(trainer):
    import jax

    key = jax.random.PRNGKey(0)
    _, _, loss_w1, _ = step_on_copies(trainer, batch_with_weight(trainer, 1.0), key)
    _, _, loss_w01, _ = step_on_copies(trainer, batch_with_weight(trainer, 0.1), key)
    assert float(loss_w01) < float(loss_w1)


def test_val_loss_ignores_sample_weight(trainer):
    loss_w1, _ = trainer._val_step(trainer.params, batch_with_weight(trainer, 1.0))
    loss_w01, _ = trainer._val_step(trainer.params, batch_with_weight(trainer, 0.1))
    assert float(loss_w1) == pytest.approx(float(loss_w01), rel=1e-6)


def test_val_loss_still_respects_padding_mask(trainer):
    import jax.numpy as jnp

    batch = batch_with_weight(trainer, 1.0)
    full, _ = trainer._val_step(trainer.params, batch)
    masked = dict(batch)
    masked["batch_mask"] = jnp.asarray([True, False])
    half, _ = trainer._val_step(trainer.params, masked)
    # Same duplicated sample: masking one row must not change the mean loss,
    # but the mask IS applied (an all-False mask zeroes it).
    none_batch = dict(batch)
    none_batch["batch_mask"] = jnp.asarray([False, False])
    zero, _ = trainer._val_step(trainer.params, none_batch)
    assert float(half) == pytest.approx(float(full), rel=1e-5)
    assert float(zero) == pytest.approx(0.0, abs=1e-8)


def test_all_negative_train_batch_finite(trainer):
    import jax

    batch = batch_with_weight(trainer, 1.0)
    import jax.numpy as jnp

    batch["sample_weight"] = jnp.asarray([0.25, 0.25], jnp.float32)
    _, _, loss, parts = step_on_copies(trainer, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    assert all(np.isfinite(float(v)) for v in parts.values())
