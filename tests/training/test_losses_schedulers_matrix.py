"""Loss function + LR scheduler math matrix with numpy oracles.

Reference scenario source: tests/training/test_losses.py /
test_schedulers.py — value-level checks (not smoke) for OHKM selection,
BCE-dice terms, masked smooth-L1, CE with untracked rows, and every
scheduler's curve including plateau cooldown semantics.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sleap_nn_tpu.training.losses import (
    bce_dice_on_probs,
    categorical_crossentropy,
    compute_bce_dice_loss,
    compute_masked_smooth_l1,
    compute_ohkm_loss,
    mse_loss,
)
from sleap_nn_tpu.training.schedulers import (
    LinearWarmupCosineAnnealingLR,
    LinearWarmupLinearDecayLR,
    ReduceLROnPlateau,
    Scheduler,
    StepLR,
)


# ── mse ──────────────────────────────────────────────────────────────────────


def test_mse_matches_numpy():
    a = np.arange(12, dtype=np.float32).reshape(2, 3, 2)
    b = a + 2.0
    assert np.isclose(float(mse_loss(jnp.asarray(b), jnp.asarray(a))), 4.0)


def test_mse_batch_mask_excludes_padded_rows():
    y = np.zeros((2, 4, 4, 1), np.float32)
    p = np.ones((2, 4, 4, 1), np.float32)
    p[1] = 100.0  # padded row: must not contribute
    masked = float(mse_loss(jnp.asarray(p), jnp.asarray(y),
                            jnp.array([True, False])))
    assert np.isclose(masked, 1.0)


def test_mse_all_masked_is_finite():
    y = jnp.zeros((1, 2, 2, 1))
    out = float(mse_loss(y + 5, y, jnp.array([False])))
    assert np.isfinite(out)


# ── OHKM ─────────────────────────────────────────────────────────────────────


def _ohkm_setup(per_channel_losses):
    """Build (gt, pr) whose per-channel summed square error equals the
    requested values exactly (single pixel per channel differs)."""
    c = len(per_channel_losses)
    gt = np.zeros((1, 4, 4, c), np.float32)
    pr = np.zeros((1, 4, 4, c), np.float32)
    for i, l in enumerate(per_channel_losses):
        pr[0, 0, 0, i] = math.sqrt(l)
    return jnp.asarray(gt), jnp.asarray(pr)


def test_ohkm_selects_hard_channels_only():
    # losses [16, 1, 1, 1]: ratio 16 -> 1 hard, min_hard=2 selects top-2.
    gt, pr = _ohkm_setup([16.0, 1.0, 1.0, 1.0])
    got = float(compute_ohkm_loss(gt, pr, hard_to_easy_ratio=2.0,
                                  min_hard_keypoints=2, loss_scale=5.0))
    expect = (16.0 + 1.0) * 5.0 / (1 * 4 * 4 * 2)
    assert np.isclose(got, expect, rtol=1e-5)


def test_ohkm_max_hard_caps_selection():
    gt, pr = _ohkm_setup([16.0, 15.0, 14.0, 1.0])
    got = float(compute_ohkm_loss(gt, pr, hard_to_easy_ratio=2.0,
                                  min_hard_keypoints=1, max_hard_keypoints=2,
                                  loss_scale=1.0))
    expect = (16.0 + 15.0) / (1 * 4 * 4 * 2)
    assert np.isclose(got, expect, rtol=1e-5)


def test_ohkm_jit_safe():
    gt, pr = _ohkm_setup([4.0, 1.0])
    f = jax.jit(lambda a, b: compute_ohkm_loss(a, b))
    assert np.isfinite(float(f(gt, pr)))


# ── bce-dice ─────────────────────────────────────────────────────────────────


def test_bce_dice_perfect_logits_near_zero():
    y = np.zeros((1, 8, 8, 1), np.float32)
    y[0, 2:6, 2:6, 0] = 1.0
    logits = np.where(y > 0, 20.0, -20.0).astype(np.float32)
    loss = float(compute_bce_dice_loss(jnp.asarray(logits), jnp.asarray(y)))
    assert loss < 1e-3


def test_bce_dice_wrong_prediction_large():
    y = np.zeros((1, 8, 8, 1), np.float32)
    y[0, :4] = 1.0
    logits = np.where(y > 0, -10.0, 10.0).astype(np.float32)
    loss = float(compute_bce_dice_loss(jnp.asarray(logits), jnp.asarray(y)))
    assert loss > 1.0


def test_bce_dice_pos_weight_upweights_fn():
    y = np.zeros((1, 8, 8, 1), np.float32)
    y[0, 0, 0, 0] = 1.0
    logits = np.full_like(y, -5.0)  # predicts background everywhere
    plain = float(compute_bce_dice_loss(jnp.asarray(logits), jnp.asarray(y)))
    weighted = float(compute_bce_dice_loss(jnp.asarray(logits), jnp.asarray(y),
                                           pos_weight=10.0))
    assert weighted > plain


def test_bce_dice_on_probs_matches_logits_version():
    rng = np.random.default_rng(0)
    y = (rng.random((2, 8, 8, 1)) > 0.5).astype(np.float32)
    logits = rng.normal(size=(2, 8, 8, 1)).astype(np.float32)
    probs = 1.0 / (1.0 + np.exp(-logits))
    a = float(compute_bce_dice_loss(jnp.asarray(logits), jnp.asarray(y)))
    b = float(bce_dice_on_probs(jnp.asarray(probs), jnp.asarray(y)))
    assert np.isclose(a, b, atol=1e-4)


# ── masked smooth-L1 ─────────────────────────────────────────────────────────


def test_smooth_l1_quadratic_and_linear_regions():
    y = jnp.zeros((1, 1, 2, 1))
    p = jnp.asarray(np.array([[[[0.5], [3.0]]]], np.float32))
    m = jnp.ones((1, 1, 2, 1))
    got = float(compute_masked_smooth_l1(p, y, m))
    expect = (0.5 * 0.25 + (3.0 - 0.5)) / 2
    assert np.isclose(got, expect, rtol=1e-6)


def test_smooth_l1_mask_zero_gives_zero():
    p = jnp.ones((1, 4, 4, 2)) * 100
    y = jnp.zeros((1, 4, 4, 2))
    out = float(compute_masked_smooth_l1(p, y, jnp.zeros((1, 4, 4, 1))))
    assert out == 0.0


def test_smooth_l1_only_masked_pixels_count():
    y = jnp.zeros((1, 1, 2, 1))
    p = jnp.asarray(np.array([[[[10.0], [0.5]]]], np.float32))
    m = jnp.asarray(np.array([[[[0.0], [1.0]]]], np.float32))
    got = float(compute_masked_smooth_l1(p, y, m))
    assert np.isclose(got, 0.5 * 0.25, rtol=1e-6)


# ── categorical CE ───────────────────────────────────────────────────────────


def test_ce_correct_prediction_near_zero():
    probs = jnp.asarray([[0.99, 0.01], [0.01, 0.99]])
    onehot = jnp.asarray([[1.0, 0.0], [0.0, 1.0]])
    assert float(categorical_crossentropy(probs, onehot)) < 0.02


def test_ce_untracked_rows_excluded():
    probs = jnp.asarray([[0.5, 0.5], [0.9, 0.1]])
    onehot = jnp.asarray([[0.0, 0.0], [1.0, 0.0]])  # row 0 untracked
    got = float(categorical_crossentropy(probs, onehot))
    assert np.isclose(got, -math.log(0.9), rtol=1e-5)


def test_ce_all_untracked_finite():
    probs = jnp.full((3, 4), 0.25)
    onehot = jnp.zeros((3, 4))
    assert np.isfinite(float(categorical_crossentropy(probs, onehot)))


# ── schedulers ───────────────────────────────────────────────────────────────


def test_constant_scheduler():
    s = Scheduler(1e-3)
    assert s.step(0) == s.step(50) == 1e-3


def test_step_lr_curve():
    s = StepLR(1.0, step_size=3, gamma=0.1)
    assert [s.step(e) for e in range(7)] == pytest.approx(
        [1.0, 1.0, 1.0, 0.1, 0.1, 0.1, 0.01])


def test_plateau_waits_patience_then_cuts():
    s = ReduceLROnPlateau(1.0, factor=0.5, patience=2, threshold=0.0,
                          cooldown=0)
    lrs = [s.step(e, val_metric=1.0) for e in range(5)]
    # epoch 0 sets best; epochs 1-2 are bad (patience 2); epoch 3 cuts.
    assert lrs[:3] == [1.0, 1.0, 1.0]
    assert lrs[3] == 0.5


def test_plateau_improvement_resets_counter():
    s = ReduceLROnPlateau(1.0, factor=0.5, patience=1, threshold=0.0,
                          cooldown=0)
    s.step(0, 1.0)
    s.step(1, 1.0)   # bad 1
    s.step(2, 0.5)   # improvement resets
    lr = s.step(3, 0.6)  # bad 1 again, within patience
    assert lr == 1.0


def test_plateau_cooldown_suppresses_counting():
    s = ReduceLROnPlateau(1.0, factor=0.5, patience=0, threshold=0.0,
                          cooldown=2)
    s.step(0, 1.0)
    assert s.step(1, 1.0) == 0.5   # immediate cut (patience 0)
    # two cooldown epochs: bad epochs don't count
    assert s.step(2, 1.0) == 0.5
    assert s.step(3, 1.0) == 0.5
    assert s.step(4, 1.0) == 0.25  # counting resumes after cooldown


def test_plateau_min_lr_floor():
    s = ReduceLROnPlateau(1e-3, factor=0.1, patience=0, cooldown=0,
                          min_lr=1e-4)
    s.step(0, 1.0)
    for e in range(1, 6):
        lr = s.step(e, 1.0)
    assert lr == pytest.approx(1e-4)


def test_plateau_rel_threshold_mode():
    s = ReduceLROnPlateau(1.0, factor=0.5, patience=0, cooldown=0,
                          threshold=0.1, threshold_mode="rel")
    s.step(0, 1.0)
    # 0.95 is NOT better under rel threshold 0.1 (needs < 0.9)
    assert s.step(1, 0.95) == 0.5


def test_warmup_cosine_curve():
    s = LinearWarmupCosineAnnealingLR(1.0, warmup_epochs=2, max_epochs=10,
                                      warmup_start_lr=0.0, eta_min=0.0)
    assert s.step(0) == 0.0
    assert s.step(1) == pytest.approx(0.5)
    assert s.step(2) == pytest.approx(1.0)
    mid = s.step(6)  # halfway through anneal
    assert mid == pytest.approx(0.5, abs=1e-6)
    assert s.step(10) == pytest.approx(0.0, abs=1e-9)
    assert s.step(99) == pytest.approx(0.0, abs=1e-9)  # clamped past end


def test_warmup_linear_decay_curve():
    s = LinearWarmupLinearDecayLR(1.0, warmup_epochs=2, max_epochs=10,
                                  warmup_start_lr=0.2, end_lr=0.0)
    assert s.step(0) == pytest.approx(0.2)
    assert s.step(2) == pytest.approx(1.0)
    assert s.step(6) == pytest.approx(0.5)
    assert s.step(10) == pytest.approx(0.0)
