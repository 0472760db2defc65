"""Segmentation inference: center peaks + offset-based pixel grouping.

Parity target: reference sleap_nn/inference/segmentation.py:12-904 —
center-heatmap peak finding, per-pixel offset voting to group foreground
pixels into instance masks, and small-fragment cleanup. The voting step is
a dense device-side argmin over detected centers (static shapes); cleanup
(connected components) stays host-side via scipy.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sleap_nn_tpu.io.model import SegmentationMask
from sleap_nn_tpu.ops.peaks import find_local_peaks


def find_center_peaks(
    center_heatmap: jnp.ndarray,
    threshold: float = 0.2,
    max_peaks: int = 50,
):
    """Instance-center detections on the center heatmap (reference: :12).

    Args:
        center_heatmap: ``(B, H, W, 1)``.

    Returns:
        ``(centers (B, K, 2), vals (B, K), valid (B, K))`` in heatmap grid
        coords.
    """
    points, vals, channels, valid = find_local_peaks(
        center_heatmap, threshold=threshold, refinement="integral", max_peaks=max_peaks
    )
    return points, vals, valid


def group_instances_from_offsets(
    fg_mask: jnp.ndarray,
    offsets: jnp.ndarray,
    centers: jnp.ndarray,
    centers_valid: jnp.ndarray,
    output_stride: int = 2,
    max_center_dist: float = 64.0,
) -> jnp.ndarray:
    """Assign each fg pixel to its voted center (reference: :63).

    Each foreground pixel votes ``pixel + offset``; it joins the nearest
    detected center within ``max_center_dist`` px.

    Args:
        fg_mask: ``(B, H, W, 1)`` probabilities or binary.
        offsets: ``(B, H, W, 2)`` (dx, dy) in ORIGINAL pixels.
        centers: ``(B, K, 2)`` in ORIGINAL pixel coords.

    Returns:
        ``(B, K, H, W)`` bool instance masks (grid resolution).
    """
    b, h, w, _ = fg_mask.shape
    xx = jnp.arange(w, dtype=jnp.float32) * output_stride + output_stride / 2.0
    yy = jnp.arange(h, dtype=jnp.float32) * output_stride + output_stride / 2.0
    gx, gy = jnp.meshgrid(xx, yy)
    voted_x = gx[None] + offsets[..., 0]
    voted_y = gy[None] + offsets[..., 1]  # (B, H, W)

    dx = voted_x[:, None] - centers[..., 0][:, :, None, None]  # (B, K, H, W)
    dy = voted_y[:, None] - centers[..., 1][:, :, None, None]
    d2 = dx**2 + dy**2
    d2 = jnp.where(centers_valid[:, :, None, None], d2, jnp.inf)
    nearest = jnp.argmin(d2, axis=1)  # (B, H, W)
    near_d2 = jnp.min(d2, axis=1)

    fg = fg_mask[..., 0] > 0.5
    ok = fg & (near_d2 <= max_center_dist**2)
    k = centers.shape[1]
    inst = (nearest[:, None] == jnp.arange(k)[None, :, None, None]) & ok[:, None]
    return inst


def mask_cleanup(mask: np.ndarray, min_area: int = 16) -> np.ndarray:
    """Keep only the largest connected component and drop tiny masks
    (reference: :240)."""
    from scipy import ndimage

    labeled, n = ndimage.label(mask)
    if n == 0:
        return np.zeros_like(mask, dtype=bool)
    sizes = ndimage.sum(mask, labeled, index=np.arange(1, n + 1))
    best = int(np.argmax(sizes)) + 1
    out = labeled == best
    if out.sum() < min_area:
        return np.zeros_like(mask, dtype=bool)
    return out


def upsample_mask(mask: np.ndarray, output_stride: int, out_hw: Tuple[int, int]) -> np.ndarray:
    """Nearest-neighbor upsample a grid-resolution mask to image resolution."""
    up = np.repeat(np.repeat(mask, output_stride, axis=0), output_stride, axis=1)
    return up[: out_hw[0], : out_hw[1]]


class BottomUpSegmentationLayer:
    """fg + centers + offsets -> instance masks (reference: :785)."""

    def __init__(self, backend, pre, post, seg_output_stride=2, center_output_stride=2,
                 offsets_output_stride=2, max_center_dist=64.0, min_mask_area=16,
                 max_instances: int = 50):
        from sleap_nn_tpu.inference.layers import preprocess_images

        self.backend = backend
        self.pre = pre
        self.post = post
        self.seg_output_stride = seg_output_stride
        self.min_mask_area = min_mask_area
        post_cfg = post

        def fn(images):
            x, eff_scale = preprocess_images(pre, images)
            preds = self.backend(x)
            fg = preds["SegmentationHead"]
            centers_hm = preds["InstanceCenterHead"]
            offsets = preds["CenterOffsetHead"]
            pts, vals, valid = find_center_peaks(
                centers_hm, threshold=post_cfg.peak_threshold, max_peaks=max_instances
            )
            centers_px = pts * center_output_stride  # scaled-image pixels
            inst = group_instances_from_offsets(
                fg, offsets, centers_px, valid,
                output_stride=seg_output_stride,
                max_center_dist=max_center_dist,
            )
            return {
                "instance_masks": inst,
                "fg": fg,
                "centers": centers_px / (pre.scale * eff_scale),
                "center_vals": vals,
                "center_valid": valid,
                "eff_scale": eff_scale,
            }

        self._fn = jax.jit(fn)

    def predict_async(self, images):
        return self._fn(jnp.asarray(images))

    def finalize(self, dev) -> Dict:
        dev = jax.device_get(dev)
        b = dev["instance_masks"].shape[0]
        out_masks: List[List[SegmentationMask]] = []
        for i in range(b):
            frame_masks = []
            for k in range(dev["instance_masks"].shape[1]):
                if not dev["center_valid"][i, k]:
                    continue
                m = mask_cleanup(dev["instance_masks"][i, k], self.min_mask_area)
                if m.any():
                    frame_masks.append(
                        SegmentationMask(m, score=float(dev["center_vals"][i, k]))
                    )
            out_masks.append(frame_masks)
        return {
            "pred_masks": out_masks,
            "pred_centroids": dev["centers"],
            "centroid_vals": dev["center_vals"],
            "centroid_valid": dev["center_valid"],
        }

    def predict(self, images):
        return self.finalize(self.predict_async(images))


class SemanticSegmentationLayer:
    """Whole-frame foreground mask (reference: semantic path)."""

    def __init__(self, backend, pre, post, seg_output_stride=2):
        from sleap_nn_tpu.inference.layers import preprocess_images

        self.backend = backend
        self.pre = pre
        self.post = post
        self.seg_output_stride = seg_output_stride

        def fn(images):
            x, eff_scale = preprocess_images(pre, images)
            preds = self.backend(x)
            return {"fg": preds["SegmentationHead"], "eff_scale": eff_scale}

        self._fn = jax.jit(fn)

    def predict_async(self, images):
        return self._fn(jnp.asarray(images))

    def finalize(self, dev) -> Dict:
        dev = jax.device_get(dev)
        fg = dev["fg"][..., 0] > 0.5
        return {
            "pred_masks": [
                [SegmentationMask(fg[i], score=float(dev["fg"][i].mean()))]
                if fg[i].any()
                else []
                for i in range(fg.shape[0])
            ],
            "fg_probs": dev["fg"],
        }

    def predict(self, images):
        return self.finalize(self.predict_async(images))


class TopDownSegmentationLayer:
    """Two-stage crop-centered instance segmentation.

    Parity target: reference layers/topdown_segmentation.py:40-280
    (``CenteredInstanceMaskLayer`` + ``TopDownSegmentationLayer``). Stage 1 is
    the centroid model; stage 2 runs a ``centered_instance_segmentation``
    model on fixed-size per-instance crops and binarizes the
    ``SegmentationHead`` logits into one foreground mask per crop. Both
    stages plus the crop gather fuse into ONE jitted XLA program (static
    ``max_instances`` crop batch with a validity mask — no dynamic shapes);
    the host side only upsamples each crop mask and pastes it at its
    full-frame location.

    Per-crop score = mean foreground probability over the predicted mask
    (a mask-quality signal; empty crops score 0 and are dropped).
    """

    def __init__(self, centroid_layer, seg_backend, seg_pre, seg_output_stride: int = 2,
                 fg_threshold: float = 0.5, max_instances: int = 20,
                 crop_size: int = 160, min_mask_area: int = 16):
        from sleap_nn_tpu.inference.layers import preprocess_images
        from sleap_nn_tpu.ops.crops import crop_bboxes, make_centered_bboxes

        self.centroid_layer = centroid_layer
        self.seg_pre = seg_pre
        self.seg_output_stride = seg_output_stride
        self.fg_threshold = fg_threshold
        self.max_instances = max_instances
        self.crop_size = crop_size
        self.min_mask_area = min_mask_area

        crop = crop_size
        max_inst = max_instances
        c = centroid_layer

        def full(images):
            cres = c._fn(images)
            cres = {k: (v[:, :max_inst] if k in (
                "centroids_scaled", "pred_centroids", "centroid_vals", "centroid_valid"
            ) else v) for k, v in cres.items()}
            x2, eff2 = preprocess_images(seg_pre, images)
            ratio = (seg_pre.scale * eff2) / (c.pre.scale * cres["eff_scale"])
            cent2 = jnp.nan_to_num(cres["centroids_scaled"] * ratio, nan=-1e6)

            b, k = cent2.shape[:2]
            flat_c = cent2.reshape(b * k, 2)
            bboxes = make_centered_bboxes(flat_c, crop, crop)
            sample_inds = jnp.repeat(jnp.arange(b), k)
            crops = crop_bboxes(x2, bboxes, sample_inds, crop, crop)

            logits = seg_backend(crops)["SegmentationHead"][..., 0]  # (b*k, h, w)
            probs = jax.nn.sigmoid(logits)
            masks = probs > fg_threshold
            denom = jnp.maximum(masks.sum(axis=(1, 2)), 1.0)
            scores = jnp.where(
                masks.any(axis=(1, 2)),
                (probs * masks).sum(axis=(1, 2)) / denom,
                0.0,
            )

            # Integer-floored bbox top-left matching crop_bboxes' gather.
            half = jnp.array([crop // 2, crop // 2], dtype=flat_c.dtype)
            top_left = jnp.trunc((flat_c - (crop - 1) / 2.0) + half) - half

            h = masks.shape[1]
            return {
                "crop_masks": masks.reshape(b, k, h, h),
                "crop_scores": scores.reshape(b, k),
                "top_left": top_left.reshape(b, k, 2),
                "valid": cres["centroid_valid"],
                "pred_centroids": cres["pred_centroids"],
                "centroid_vals": cres["centroid_vals"],
                "stage2_scale": seg_pre.scale * eff2,
                "orig_hw": jnp.array(images.shape[1:3], jnp.int32),
            }

        self._fn = jax.jit(full)

    def predict_async(self, images):
        return self._fn(jnp.asarray(images))

    def finalize(self, dev) -> Dict:
        """Upsample each crop mask and paste it at its full-frame location.

        Image-space placement: the crop content came from ``top_left`` in
        stage-2 scaled space, so ``origin = top_left / s`` and the crop span
        is ``crop / s`` with ``s = seg_pre.scale * eff_scale``; the head mask
        (crop/stride px) is resized by ``stride / s``.
        """
        import cv2

        dev = jax.device_get(dev)
        b, k = dev["crop_masks"].shape[:2]
        H, W = (int(x) for x in dev["orig_hw"])
        s = np.broadcast_to(np.asarray(dev["stage2_scale"]).reshape(-1), (b,))
        out_masks: List[List[SegmentationMask]] = []
        for i in range(b):
            frame_masks = []
            span = self.crop_size / float(s[i])
            for j in range(k):
                if not dev["valid"][i, j] or not dev["crop_masks"][i, j].any():
                    continue
                size = max(1, int(round(span)))
                up = cv2.resize(
                    dev["crop_masks"][i, j].astype(np.uint8), (size, size),
                    interpolation=cv2.INTER_NEAREST,
                ).astype(bool)
                canvas = np.zeros((H, W), bool)
                ox = int(round(float(dev["top_left"][i, j, 0]) / float(s[i])))
                oy = int(round(float(dev["top_left"][i, j, 1]) / float(s[i])))
                y0, x0 = max(0, oy), max(0, ox)
                y1, x1 = min(H, oy + size), min(W, ox + size)
                if y1 <= y0 or x1 <= x0:
                    continue
                canvas[y0:y1, x0:x1] = up[y0 - oy:y1 - oy, x0 - ox:x1 - ox]
                canvas = mask_cleanup(canvas, self.min_mask_area)
                if canvas.any():
                    frame_masks.append(
                        SegmentationMask(canvas, score=float(dev["crop_scores"][i, j]))
                    )
            out_masks.append(frame_masks)
        return {
            "pred_masks": out_masks,
            "pred_centroids": dev["pred_centroids"],
            "centroid_vals": dev["centroid_vals"],
            "centroid_valid": dev["valid"],
        }

    def predict(self, images):
        return self.finalize(self.predict_async(images))
