"""Loss functions (parity: reference sleap_nn/training/losses.py:8-150 and
the per-model-type loss assembly in training/lightning_modules.py).

All losses are pure jax, channel-last, and jit-safe: OHKM's dynamic top-k is
re-expressed as a rank mask so shapes stay static on TPU.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


def mse_loss(
    y_pred: jnp.ndarray, y_gt: jnp.ndarray, batch_mask: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """Mean squared error; optional per-sample mask (padded loader rows)."""
    se = (y_pred - y_gt) ** 2
    if batch_mask is None:
        return jnp.mean(se)
    w = batch_mask.astype(se.dtype).reshape((-1,) + (1,) * (se.ndim - 1))
    denom = jnp.maximum(jnp.sum(w) * (se.size / se.shape[0]), 1.0)
    return jnp.sum(se * w) / denom


def compute_ohkm_loss(
    y_gt: jnp.ndarray,
    y_pr: jnp.ndarray,
    hard_to_easy_ratio: float = 2.0,
    min_hard_keypoints: int = 2,
    max_hard_keypoints: Optional[int] = None,
    loss_scale: float = 5.0,
) -> jnp.ndarray:
    """Online hard keypoint mining (reference: losses.py:8).

    Channel-last ``(B, H, W, C)``. The reference's dynamic ``topk(k)`` is
    replaced by a rank mask (same selected set) so the computation has
    static shapes under jit.
    """
    b, h, w, c = y_gt.shape
    loss = (y_pr - y_gt) ** 2
    l = jnp.sum(loss, axis=(0, 1, 2))  # (C,)

    best_loss = jnp.min(l)
    is_hard = (l / best_loss) >= hard_to_easy_ratio
    n_hard = jnp.sum(is_hard.astype(jnp.int32))

    max_hard = c if max_hard_keypoints is None else min(max_hard_keypoints, c)
    k = jnp.minimum(jnp.maximum(n_hard, min_hard_keypoints), max_hard)

    # Rank channels by loss descending; include the top-k.
    order = jnp.argsort(-l)
    ranks = jnp.argsort(order)  # rank of each channel
    include = ranks < k
    k_loss = jnp.sum(l * include) * loss_scale
    n_elements = b * h * w * k
    return k_loss / n_elements


def compute_bce_dice_loss(
    y_pred_logits: jnp.ndarray,
    y_gt: jnp.ndarray,
    bce_weight: float = 0.5,
    dice_weight: float = 0.5,
    smooth: float = 1.0,
    pos_weight: Optional[float] = None,
) -> jnp.ndarray:
    """BCE-with-logits + Dice (reference: losses.py:64). (B, H, W, 1)."""
    z, y = y_pred_logits, y_gt
    # log-sum-exp stable BCE with optional positive weight.
    log_sig = jax.nn.log_sigmoid(z)
    log_one_minus = jax.nn.log_sigmoid(-z)
    pw = 1.0 if pos_weight is None else pos_weight
    bce = -(pw * y * log_sig + (1 - y) * log_one_minus)
    bce_loss = jnp.mean(bce)

    p = jax.nn.sigmoid(z)
    intersection = jnp.sum(p * y, axis=(1, 2))
    union = jnp.sum(p, axis=(1, 2)) + jnp.sum(y, axis=(1, 2))
    dice = (2.0 * intersection + smooth) / (union + smooth)
    dice_loss = 1.0 - jnp.mean(dice)
    return bce_weight * bce_loss + dice_weight * dice_loss


def compute_masked_smooth_l1(
    y_pred: jnp.ndarray, y_gt: jnp.ndarray, mask: jnp.ndarray
) -> jnp.ndarray:
    """Smooth-L1 on masked pixels only (reference: losses.py:108)."""
    mask_e = jnp.broadcast_to(mask, y_pred.shape)
    diff = (y_pred - y_gt) * mask_e
    abs_d = jnp.abs(diff)
    sl1 = jnp.where(abs_d < 1.0, 0.5 * diff**2, abs_d - 0.5)
    n_valid = jnp.sum(mask_e)
    return jnp.where(n_valid > 0, jnp.sum(sl1) / jnp.maximum(n_valid, 1.0), 0.0)


def categorical_crossentropy(
    y_pred_probs: jnp.ndarray, y_gt_onehot: jnp.ndarray, eps: float = 1e-7
) -> jnp.ndarray:
    """CE on softmax outputs; all-zero GT rows (untracked) contribute 0."""
    logp = jnp.log(jnp.clip(y_pred_probs, eps, 1.0))
    per_sample = -jnp.sum(y_gt_onehot * logp, axis=-1)
    valid = jnp.sum(y_gt_onehot, axis=-1) > 0
    n = jnp.maximum(jnp.sum(valid), 1)
    return jnp.sum(per_sample * valid) / n


# ---------------------------------------------------------------------------
# Per-model-type loss assembly
# ---------------------------------------------------------------------------

_HEAD_TARGETS = {
    "SingleInstanceConfmapsHead": "confmaps",
    "CentroidConfmapsHead": "confmaps",
    "CenteredInstanceConfmapsHead": "confmaps",
    "MultiInstanceConfmapsHead": "confmaps",
    "PartAffinityFieldsHead": "pafs",
    "ClassMapsHead": "class_maps",
    "ClassVectorsHead": "class_vectors",
    "SegmentationHead": "segmentation",
    "InstanceCenterHead": "center_heatmap",
    "CenterOffsetHead": "center_offsets",
}


def bce_dice_on_probs(p: jnp.ndarray, y: jnp.ndarray, bce_weight=0.5, dice_weight=0.5,
                      smooth: float = 1.0, eps: float = 1e-7,
                      pos_weight: Optional[float] = None) -> jnp.ndarray:
    """BCE + Dice on sigmoid OUTPUTS (our SegmentationHead emits probs).

    ``pos_weight`` upweights the foreground BCE term (the
    ``bce_pos_weight`` config knob for class-imbalanced masks).
    """
    p = jnp.clip(p, eps, 1 - eps)
    pw = 1.0 if pos_weight is None else pos_weight
    bce = -jnp.mean(pw * y * jnp.log(p) + (1 - y) * jnp.log(1 - p))
    inter = jnp.sum(p * y, axis=(1, 2))
    union = jnp.sum(p, axis=(1, 2)) + jnp.sum(y, axis=(1, 2))
    dice = (2 * inter + smooth) / (union + smooth)
    return bce_weight * bce + dice_weight * (1.0 - jnp.mean(dice))


def compute_loss(
    preds: Dict[str, jnp.ndarray],
    targets: Dict[str, jnp.ndarray],
    heads: Sequence,
    batch_mask: Optional[jnp.ndarray] = None,
    ohkm: Optional[dict] = None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Weighted sum of per-head losses + per-head breakdown.

    Mirrors the reference lightning modules: MSE per confmap/PAF/class-map
    head scaled by ``loss_weight``; CE for class vectors; optional OHKM on
    the (first) confmap head (reference: lightning_modules.py:1005-1035).
    """
    total = 0.0
    parts: Dict[str, jnp.ndarray] = {}
    for head in heads:
        name = head.name
        target_key = _HEAD_TARGETS.get(name)
        if target_key is None or target_key not in targets:
            continue
        y = targets[target_key]
        y_hat = preds[name]
        if name == "ClassVectorsHead":
            part = categorical_crossentropy(y_hat, y)
            # DIAGNOSTIC: identity accuracy over valid (tracked) rows —
            # reference TopDownMultiClass logs class accuracy each epoch.
            valid = jnp.sum(y, axis=-1) > 0
            hit = (jnp.argmax(y_hat, axis=-1) == jnp.argmax(y, axis=-1))
            parts["class_accuracy"] = (
                jnp.sum(hit * valid) / jnp.maximum(jnp.sum(valid), 1)
            )
        elif name == "SegmentationHead":
            part = bce_dice_on_probs(
                y_hat, y,
                bce_weight=getattr(head, "bce_weight", 0.5),
                dice_weight=getattr(head, "dice_weight", 0.5),
                pos_weight=getattr(head, "bce_pos_weight", None),
            )
        elif name == "CenterOffsetHead":
            mask = targets.get("offsets_mask")
            part = compute_masked_smooth_l1(y_hat, y, mask if mask is not None else jnp.ones_like(y[..., :1]))
        else:
            part = mse_loss(y_hat, y, batch_mask)
            if ohkm and ohkm.get("online_mining") and target_key == "confmaps":
                part = part + compute_ohkm_loss(
                    y,
                    y_hat,
                    hard_to_easy_ratio=ohkm.get("hard_to_easy_ratio", 2.0),
                    min_hard_keypoints=ohkm.get("min_hard_keypoints", 2),
                    max_hard_keypoints=ohkm.get("max_hard_keypoints"),
                    loss_scale=ohkm.get("loss_scale", 5.0),
                )
        weight = 1.0 if head.loss_weight is None else head.loss_weight
        total = total + weight * part
        parts[name] = part
    _add_confmap_fg_bg_diagnostics(preds, targets, heads, parts)
    return total, parts


def _add_confmap_fg_bg_diagnostics(preds, targets, heads, parts,
                                   threshold: float = 0.5) -> None:
    """DIAGNOSTIC ONLY: confmap MSE split by GT foreground/background.

    Gaussian targets are ~98% near-zero background, so the plain MSE is
    dominated by the background term; logging the split (reference
    lightning_modules.py:684 ``_log_confmap_fg_bg_loss``) shows the
    imbalance evolving. Keys: ``confmap_loss_fg`` / ``confmap_loss_bg``
    (mean squared error over each pixel class) and ``confmap_fg_frac``.
    Values ride the aux dict — they are never added to the optimized loss.
    """
    if "confmaps" not in targets:
        return
    cm_head = next(
        (h for h in heads
         if _HEAD_TARGETS.get(h.name) == "confmaps" and h.name in preds),
        None,
    )
    if cm_head is None:
        return
    y = targets["confmaps"]
    se = (preds[cm_head.name] - y) ** 2
    fg = (y > threshold).astype(se.dtype)
    bg = (y < threshold).astype(se.dtype)
    n_fg, n_bg = fg.sum(), bg.sum()
    parts["confmap_loss_fg"] = jnp.where(n_fg > 0, (se * fg).sum() / jnp.maximum(n_fg, 1.0), 0.0)
    parts["confmap_loss_bg"] = jnp.where(n_bg > 0, (se * bg).sum() / jnp.maximum(n_bg, 1.0), 0.0)
    parts["confmap_fg_frac"] = fg.mean()
