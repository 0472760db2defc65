"""Unit tests: loss functions vs numpy oracles, scheduler curves.

Parity targets: reference sleap_nn/training/losses.py:8-150 (OHKM,
BCE-dice, smooth-L1) and the four scheduler families
(training/schedulers.py / reference lightning configure_optimizers).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from sleap_nn_tpu.training.losses import (
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
    StepLR,
    make_scheduler,
)

rng = np.random.default_rng(7)


def test_mse_loss_matches_numpy():
    a = rng.normal(size=(2, 8, 8, 3)).astype(np.float32)
    b = rng.normal(size=(2, 8, 8, 3)).astype(np.float32)
    got = float(mse_loss(jnp.asarray(a), jnp.asarray(b)))
    assert got == pytest.approx(np.mean((a - b) ** 2), rel=1e-5)


def test_mse_loss_batch_mask_excludes_padded_rows():
    a = rng.normal(size=(4, 4, 4, 1)).astype(np.float32)
    b = np.zeros_like(a)
    mask = np.array([1, 1, 0, 0], np.float32)
    got = float(mse_loss(jnp.asarray(a), jnp.asarray(b), jnp.asarray(mask)))
    want = np.mean(a[:2] ** 2)  # only unmasked rows contribute
    assert got == pytest.approx(want, rel=1e-5)


def test_ohkm_selects_hard_channels():
    """OHKM equals the explicit numpy top-k mining at several ratios."""
    b, h, w, c = 2, 6, 6, 5
    y_gt = rng.random((b, h, w, c)).astype(np.float32)
    y_pr = y_gt.copy()
    # Make channels 1 and 3 clearly hard.
    y_pr[..., 1] += 1.0
    y_pr[..., 3] += 0.7

    for ratio, min_k, max_k in [(2.0, 2, None), (1.01, 1, 3), (100.0, 3, None)]:
        got = float(compute_ohkm_loss(
            jnp.asarray(y_gt), jnp.asarray(y_pr),
            hard_to_easy_ratio=ratio, min_hard_keypoints=min_k,
            max_hard_keypoints=max_k, loss_scale=5.0,
        ))
        # numpy oracle: reference losses.py:8 semantics
        l = np.sum((y_pr - y_gt) ** 2, axis=(0, 1, 2))
        n_hard = int(np.sum(l / l.min() >= ratio))
        k = min(max(n_hard, min_k), max_k if max_k else c)
        top = np.sort(l)[::-1][:k]
        want = np.sum(top) * 5.0 / (b * h * w * k)
        assert got == pytest.approx(want, rel=1e-4), (ratio, min_k, max_k)


def test_bce_dice_loss_known_values():
    # Perfect prediction at saturating logits -> loss near the dice floor.
    y = np.zeros((1, 8, 8, 1), np.float32)
    y[0, 2:6, 2:6, 0] = 1.0
    logits_good = np.where(y > 0, 20.0, -20.0).astype(np.float32)
    good = float(compute_bce_dice_loss(jnp.asarray(logits_good), jnp.asarray(y)))
    logits_bad = -logits_good
    bad = float(compute_bce_dice_loss(jnp.asarray(logits_bad), jnp.asarray(y)))
    assert good < 0.01
    assert bad > 1.0


def test_bce_dice_pos_weight_upweights_foreground():
    y = np.zeros((1, 8, 8, 1), np.float32)
    y[0, :2, :2, 0] = 1.0
    miss_fg = np.full_like(y, -5.0)  # predicts all background
    base = float(compute_bce_dice_loss(jnp.asarray(miss_fg), jnp.asarray(y)))
    weighted = float(compute_bce_dice_loss(
        jnp.asarray(miss_fg), jnp.asarray(y), pos_weight=10.0))
    assert weighted > base


def test_masked_smooth_l1_matches_numpy():
    pred = rng.normal(size=(2, 6, 6, 2)).astype(np.float32) * 3
    gt = rng.normal(size=(2, 6, 6, 2)).astype(np.float32)
    mask = (rng.random((2, 6, 6, 1)) > 0.5).astype(np.float32)
    got = float(compute_masked_smooth_l1(
        jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(mask)))
    m = np.broadcast_to(mask, pred.shape)
    d = (pred - gt) * m
    sl1 = np.where(np.abs(d) < 1, 0.5 * d**2, np.abs(d) - 0.5)
    want = sl1.sum() / max(m.sum(), 1)
    assert got == pytest.approx(want, rel=1e-4)


def test_masked_smooth_l1_all_masked_is_zero():
    pred = jnp.ones((1, 4, 4, 2))
    gt = jnp.zeros((1, 4, 4, 2))
    mask = jnp.zeros((1, 4, 4, 1))
    assert float(compute_masked_smooth_l1(pred, gt, mask)) == 0.0


def test_categorical_crossentropy_ignores_untracked_rows():
    probs = jnp.asarray([[0.9, 0.1], [0.5, 0.5]])
    onehot = jnp.asarray([[1.0, 0.0], [0.0, 0.0]])  # row 2 untracked
    got = float(categorical_crossentropy(probs, onehot))
    assert got == pytest.approx(-np.log(0.9), rel=1e-4)


# -- schedulers ---------------------------------------------------------------


def test_step_lr_decays_by_gamma():
    s = StepLR(base_lr=1.0, step_size=3, gamma=0.1)
    lrs = [s.step(e) for e in range(9)]
    assert lrs[0] == pytest.approx(1.0)
    assert lrs[3] == pytest.approx(0.1)
    assert lrs[6] == pytest.approx(0.01)


def test_plateau_reduces_after_patience():
    s = ReduceLROnPlateau(base_lr=1.0, factor=0.5, patience=2, threshold=1e-4)
    lr = s.step(0, val_metric=1.0)
    assert lr == pytest.approx(1.0)
    # No improvement for > patience epochs -> LR halves.
    lrs = [s.step(e, val_metric=1.0) for e in range(1, 6)]
    assert min(lrs) <= 0.5
    # An improvement resets the bad-epoch counter.
    s2 = ReduceLROnPlateau(base_lr=1.0, factor=0.5, patience=2)
    for e, m in enumerate([1.0, 0.9, 0.8, 0.7, 0.6]):
        lr = s2.step(e, val_metric=m)
    assert lr == pytest.approx(1.0)


def test_warmup_cosine_shape():
    s = LinearWarmupCosineAnnealingLR(base_lr=1.0, warmup_epochs=5, max_epochs=50)
    lrs = [s.step(e) for e in range(50)]
    # Rises through warmup, then monotonically decays.
    assert lrs[1] < lrs[4] <= max(lrs)
    assert all(a >= b - 1e-9 for a, b in zip(lrs[5:], lrs[6:]))
    assert lrs[-1] < 0.05


def test_warmup_linear_decay_endpoints():
    s = LinearWarmupLinearDecayLR(base_lr=2.0, warmup_epochs=4, max_epochs=20)
    lrs = [s.step(e) for e in range(20)]
    assert max(lrs) == pytest.approx(2.0, rel=1e-2)
    assert lrs[-1] <= lrs[4]


def test_make_scheduler_dispatch():
    # None config -> constant LR.
    s = make_scheduler(None, base_lr=1e-3, max_epochs=10)
    assert s.step(0) == pytest.approx(1e-3)
    assert s.step(9) == pytest.approx(1e-3)

    class LRCfg:
        step_lr = None
        reduce_lr_on_plateau = None
        cosine_annealing_warmup = None
        linear_warmup_linear_decay = None

    # All-None oneof -> constant LR too.
    s2 = make_scheduler(LRCfg(), base_lr=2e-4, max_epochs=10)
    assert s2.step(5) == pytest.approx(2e-4)


def test_seg_head_loss_weights_honored():
    """SegmentationHeadConfig bce/dice/pos weights flow into compute_loss."""
    import jax.numpy as jnp
    from sleap_nn_tpu.models.heads import SegmentationHead
    from sleap_nn_tpu.training.losses import compute_loss

    y = np.zeros((1, 8, 8, 1), np.float32)
    y[0, :2, :2, 0] = 1.0
    p = np.full_like(y, 0.1)  # mostly-background prediction
    preds = {"SegmentationHead": jnp.asarray(p)}
    targets = {"segmentation": jnp.asarray(y)}

    base_head = SegmentationHead(output_stride=2)
    w_head = SegmentationHead(output_stride=2, bce_weight=1.0, dice_weight=0.0,
                              bce_pos_weight=10.0)
    base, _ = compute_loss(preds, targets, (base_head,))
    weighted, _ = compute_loss(preds, targets, (w_head,))
    assert float(weighted) != pytest.approx(float(base))
    # Pure-dice head zeroes the BCE term entirely.
    dice_head = SegmentationHead(output_stride=2, bce_weight=0.0, dice_weight=1.0)
    dice_only, _ = compute_loss(preds, targets, (dice_head,))
    from sleap_nn_tpu.training.losses import bce_dice_on_probs

    want = bce_dice_on_probs(jnp.asarray(p), jnp.asarray(y),
                             bce_weight=0.0, dice_weight=1.0)
    assert float(dice_only) == pytest.approx(float(want))


def test_crop_padding_grows_auto_crop_size():
    from sleap_nn_tpu.config import TrainingJobConfig, apply_overrides
    from sleap_nn_tpu.data.pipeline import build_pipeline_context
    from sleap_nn_tpu.io import load_slp

    FIXTURE = "/root/reference/tests/assets/datasets/minimal_instance.pkg.slp"
    labels = load_slp(FIXTURE)

    def ctx(pad):
        cfg = TrainingJobConfig()
        cfg.data_config.use_augmentations_train = False
        apply_overrides(cfg, {
            "model_config.backbone_config.unet.max_stride": 8,
            "model_config.head_configs.centered_instance.confmaps.output_stride": 2,
        })
        cfg.data_config.preprocessing.crop_padding = pad
        return build_pipeline_context(cfg, labels, "centered_instance")

    base = ctx(None).crop_size
    padded = ctx(64).crop_size
    # Padding enlarges the auto-computed crop (exact delta interacts with
    # min_crop_size: max(bbox, min_crop - pad) + pad, stride-rounded).
    assert padded > base
    assert padded % 8 == 0
    assert padded - base >= 24


def test_amsgrad_optimizer_selection():
    """optimizer.amsgrad routes adam to optax.amsgrad; adamw+amsgrad errors."""
    from sleap_nn_tpu.config import TrainingJobConfig, apply_overrides
    from sleap_nn_tpu.training import ModelTrainer

    from tests.fixture_utils import single_instance_fixture

    FIXTURE = single_instance_fixture()

    def cfg_for(opt, amsgrad):
        cfg = TrainingJobConfig()
        cfg.data_config.train_labels_path = [FIXTURE]
        cfg.data_config.use_same_data_for_val = True
        cfg.data_config.use_augmentations_train = False
        cfg.data_config.preprocessing.scale = 0.25
        apply_overrides(cfg, {
            "model_config.backbone_config.unet.filters": 8,
            "model_config.backbone_config.unet.max_stride": 8,
            "model_config.backbone_config.unet.output_stride": 2,
            "model_config.head_configs.single_instance.confmaps.output_stride": 2,
        })
        cfg.trainer_config.optimizer_name = opt
        cfg.trainer_config.optimizer.amsgrad = amsgrad
        cfg.trainer_config.save_ckpt = False
        cfg.trainer_config.enable_progress_bar = False
        return cfg

    t = ModelTrainer.get_model_trainer_from_config(cfg_for("adam", True))
    t.setup()  # builds the optax.amsgrad transform without error
    assert t.tx is not None

    with pytest.raises(ValueError, match="amsgrad"):
        ModelTrainer.get_model_trainer_from_config(cfg_for("adamw", True)).setup()


def test_centroid_source_user_rejected():
    from sleap_nn_tpu.config import TrainingJobConfig, apply_overrides
    from sleap_nn_tpu.training import ModelTrainer

    FIXTURE = "/root/reference/tests/assets/datasets/minimal_instance.pkg.slp"
    cfg = TrainingJobConfig()
    cfg.data_config.train_labels_path = [FIXTURE]
    cfg.data_config.use_same_data_for_val = True
    cfg.data_config.use_augmentations_train = False
    apply_overrides(cfg, {
        "model_config.backbone_config.unet.max_stride": 8,
        "model_config.head_configs.centroid.confmaps.output_stride": 2,
        "model_config.head_configs.centroid.confmaps.centroid_source": "user",
    })
    with pytest.raises(ValueError, match="centroid_source"):
        ModelTrainer.get_model_trainer_from_config(cfg)
