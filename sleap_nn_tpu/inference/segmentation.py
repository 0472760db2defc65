"""Segmentation inference: center peaks + offset-based pixel grouping.

Parity target: reference sleap_nn/inference/segmentation.py:12-904 —
center-heatmap peak finding, per-pixel offset voting to group foreground
pixels into instance masks, and small-fragment cleanup. The voting step is
a dense device-side argmin over detected centers (static shapes); cleanup
(connected components) stays host-side via scipy.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sleap_nn_tpu.io.model import SegmentationMask
from sleap_nn_tpu.ops.peaks import find_local_peaks


def find_center_peaks(
    center_heatmap: jnp.ndarray,
    threshold: float = 0.2,
    max_peaks: int = 50,
    nms_kernel: int = 3,
):
    """Instance-center detections on the center heatmap (reference: :12).

    Args:
        center_heatmap: ``(B, H, W, 1)``.
        nms_kernel: odd NMS window; >3 merges nearby duplicate centers (the
            ``--center_nms_kernel`` knob, reference cli.py:2467).

    Returns:
        ``(centers (B, K, 2), vals (B, K), valid (B, K))`` in heatmap grid
        coords.
    """
    points, vals, channels, valid = find_local_peaks(
        center_heatmap, threshold=threshold, refinement="integral",
        max_peaks=max_peaks, nms_kernel=nms_kernel,
    )
    return points, vals, valid


def group_instances_from_offsets(
    fg_mask: jnp.ndarray,
    offsets: jnp.ndarray,
    centers: jnp.ndarray,
    centers_valid: jnp.ndarray,
    output_stride: int = 2,
    max_center_dist: float = 64.0,
    fg_threshold: float = 0.5,
    distance_gate_alpha: Optional[float] = None,
) -> jnp.ndarray:
    """Assign each fg pixel to its voted center (reference: :63).

    Each foreground pixel votes ``pixel + offset``; it joins the nearest
    detected center within ``max_center_dist`` px.

    Args:
        fg_mask: ``(B, H, W, 1)`` probabilities or binary.
        offsets: ``(B, H, W, 2)`` (dx, dy) in ORIGINAL pixels.
        centers: ``(B, K, 2)`` in ORIGINAL pixel coords.
        distance_gate_alpha: adaptive stray-pixel filter (the
            ``--distance_gate_alpha`` knob, reference cli.py:2497): after
            the argmin grouping, drop pixels whose voted center lies more
            than ``alpha * sqrt(area / pi)`` (the mask's equivalent-circle
            radius) from the assigned center. Scale-free; ``None`` keeps
            the plain argmin grouping.

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

    fg = fg_mask[..., 0] > fg_threshold
    ok = fg & (near_d2 <= max_center_dist**2)
    k = centers.shape[1]
    inst = (nearest[:, None] == jnp.arange(k)[None, :, None, None]) & ok[:, None]
    if distance_gate_alpha is not None:
        # Second pass: per-instance area (converted to center-coord pixel
        # units) sets an equivalent-circle radius gate on pixel->center
        # distance. Static shapes; two cheap reductions.
        area_px = inst.sum(axis=(2, 3)).astype(jnp.float32) * float(output_stride) ** 2
        r2 = (float(distance_gate_alpha) ** 2) * area_px / jnp.pi  # (B, K)
        inst = inst & (d2 <= r2[:, :, None, None])
    return inst


def _disk_structure(radius: int) -> np.ndarray:
    """Elliptical (disk) structuring element of the given pixel radius."""
    yy, xx = np.ogrid[-radius:radius + 1, -radius:radius + 1]
    return (xx * xx + yy * yy) <= radius * radius


def mask_cleanup(mask: np.ndarray, min_area: int = 16, radius: int = 0,
                 fill_holes: bool = False) -> np.ndarray:
    """Keep only the largest connected component and drop tiny masks
    (reference: :240).

    ``radius`` > 0 first applies a morphological open -> close with a disk
    kernel of that radius (despeckles / closes pinholes; the
    ``--mask_cleanup_radius`` knob, reference cli.py:2485). ``fill_holes``
    additionally fills interior holes of the surviving component (the
    reference ``--mask_cleanup`` behavior).
    """
    from scipy import ndimage

    if radius > 0 and mask.any():
        st = _disk_structure(int(radius))
        mask = ndimage.binary_opening(mask, structure=st)
        mask = ndimage.binary_closing(mask, structure=st)
    labeled, n = ndimage.label(mask)
    if n == 0:
        return np.zeros_like(mask, dtype=bool)
    sizes = ndimage.sum(mask, labeled, index=np.arange(1, n + 1))
    best = int(np.argmax(sizes)) + 1
    out = labeled == best
    if fill_holes:
        out = ndimage.binary_fill_holes(out)
    if out.sum() < min_area:
        return np.zeros_like(mask, dtype=bool)
    return out


def mask_to_polygon(mask: np.ndarray, epsilon_frac: float = 0.01,
                    scale: float = 1.0) -> Optional[np.ndarray]:
    """Largest-contour polygon outline of a bool mask, (N, 2) (x, y).

    Douglas-Peucker simplification with tolerance ``epsilon_frac`` x the
    contour perimeter (0 disables); coordinates are multiplied by ``scale``
    (grid -> image px). The ``--mask_output polygon`` representation
    (reference cli.py:2588-2611). Returns ``None`` for empty/degenerate
    masks.
    """
    import cv2

    contours, _ = cv2.findContours(
        np.ascontiguousarray(mask, dtype=np.uint8),
        cv2.RETR_EXTERNAL,
        cv2.CHAIN_APPROX_SIMPLE,
    )
    if not contours:
        return None
    cnt = max(contours, key=cv2.contourArea)
    if epsilon_frac > 0:
        eps = float(epsilon_frac) * cv2.arcLength(cnt, True)
        cnt = cv2.approxPolyDP(cnt, eps, True)
    if len(cnt) < 3:
        return None
    return cnt.reshape(-1, 2).astype(np.float64) * float(scale)


def upsample_mask(mask: np.ndarray, output_stride: int, out_hw: Tuple[int, int]) -> np.ndarray:
    """Nearest-neighbor upsample a grid-resolution mask to image resolution."""
    up = np.repeat(np.repeat(mask, output_stride, axis=0), output_stride, axis=1)
    return up[: out_hw[0], : out_hw[1]]


def crop_valid_grid(
    mask: np.ndarray, orig_hw, eff_scale: float, scale: float, stride: int
) -> np.ndarray:
    """Crop a grid-resolution mask to the rows/cols that cover real image.

    The network grid spans the pad-to-stride extent of the *scaled* input
    (sizematch pad + stride pad are bottom/right zeros); resizing the whole
    grid to the original (W, H) would stretch that pad into the image and
    compress mask content toward the top-left. Crop to
    ``ceil(round(orig*eff)*scale / stride)`` first (the same valid extent
    ``upsample_mask``'s out_hw crop uses, expressed in grid cells).
    """
    h, w = (int(v) for v in np.asarray(orig_hw).reshape(-1)[:2])
    sh = int(round(h * eff_scale))
    sw = int(round(w * eff_scale))
    gh = -(-int(round(sh * scale)) // stride)  # ceil div
    gw = -(-int(round(sw * scale)) // stride)
    return mask[:gh, :gw]


class BottomUpSegmentationLayer:
    """fg + centers + offsets -> instance masks (reference: :785)."""

    def __init__(self, backend, pre, post, seg_output_stride=2, center_output_stride=2,
                 offsets_output_stride=2, max_center_dist=64.0, min_mask_area=0,
                 max_instances: int = 50, merge_fragments: bool = False,
                 merge_method: str = "greedy", fg_threshold: float = 0.5,
                 center_nms_kernel: int = 3,
                 distance_gate_alpha: Optional[float] = None,
                 mask_cleanup: bool = True, mask_cleanup_radius: int = 0,
                 merge_dilate: int = 1, merge_w_valley: float = 1.0,
                 merge_w_offset: float = 0.25,
                 merge_thresholds: Sequence[float] = (0.85, 0.6, 0.4),
                 full_res_masks: bool = False):
        from sleap_nn_tpu.inference.layers import preprocess_images

        self.backend = backend
        self.pre = pre
        self.post = post
        self.seg_output_stride = seg_output_stride
        self.min_mask_area = min_mask_area
        self.merge_fragments = bool(merge_fragments)
        self.merge_method = merge_method
        self.do_mask_cleanup = bool(mask_cleanup)
        self.mask_cleanup_radius = int(mask_cleanup_radius)
        self.merge_dilate = int(merge_dilate)
        self.merge_w_valley = float(merge_w_valley)
        self.merge_w_offset = float(merge_w_offset)
        self.merge_thresholds = tuple(merge_thresholds)
        self.full_res_masks = bool(full_res_masks)
        post_cfg = post
        want_merge = self.merge_fragments

        def fn(images):
            x, eff_scale = preprocess_images(pre, images)
            preds = self.backend(x)
            fg = preds["SegmentationHead"]
            centers_hm = preds["InstanceCenterHead"]
            offsets = preds["CenterOffsetHead"]
            pts, vals, valid = find_center_peaks(
                centers_hm, threshold=post_cfg.peak_threshold,
                max_peaks=max_instances, nms_kernel=center_nms_kernel,
            )
            centers_px = pts * center_output_stride  # scaled-image pixels
            inst = group_instances_from_offsets(
                fg, offsets, centers_px, valid,
                output_stride=seg_output_stride,
                max_center_dist=max_center_dist,
                fg_threshold=fg_threshold,
                distance_gate_alpha=distance_gate_alpha,
            )
            out = {
                "instance_masks": inst,
                "fg": fg,
                "centers": centers_px / (pre.scale * eff_scale),
                "center_vals": vals,
                "center_valid": valid,
                "eff_scale": eff_scale,
                "orig_hw": jnp.array(images.shape[1:3], jnp.int32),
            }
            if want_merge:
                # Extra host payload only when the fragment-merge will run.
                out["centers_scaled"] = centers_px
                out["center_heatmap"] = centers_hm[..., 0]
                out["offsets"] = offsets
            return out

        from sleap_nn_tpu.inference.layers import jit_layer

        self._fn = jit_layer([self.backend], fn)

    def predict_async(self, images):
        return self._fn(jnp.asarray(images))

    def finalize(self, dev) -> Dict:
        dev = jax.device_get(dev)
        b = dev["instance_masks"].shape[0]
        # A center detection only counts as an instance if its grouped mask
        # survives (otherwise weak heatmap maxima become phantom centroids).
        valid = np.asarray(dev["center_valid"], bool).copy()
        out_masks: List[List[SegmentationMask]] = []
        # ``min_mask_area`` is an ORIGINAL-image-pixel floor (reference
        # layers/segmentation.py:228); masks are filtered at grid resolution
        # where one grid px covers grid_lift^2 image px — ceil keeps the
        # floor exact-or-conservative (#618 unit invariance).
        eff_all = float(np.asarray(dev["eff_scale"]).reshape(-1)[0])
        grid_lift = self.seg_output_stride / (
            getattr(getattr(self, "pre", None), "scale", 1.0) * eff_all
        )
        area_floor = max(
            1, int(np.ceil(self.min_mask_area / (grid_lift ** 2)))
        )
        for i in range(b):
            cands = []
            for k in range(dev["instance_masks"].shape[1]):
                if not valid[i, k]:
                    continue
                m = np.asarray(dev["instance_masks"][i, k], bool)
                if m.sum() < area_floor:
                    valid[i, k] = False
                    continue
                cands.append(
                    {
                        "mask": m,
                        "center": (
                            tuple(np.asarray(dev["centers_scaled"][i, k]))
                            if self.merge_fragments
                            else (0.0, 0.0)
                        ),
                        "score": float(dev["center_vals"][i, k]),
                    }
                )
            if self.merge_fragments and len(cands) >= 2:
                cands = merge_instances(
                    cands,
                    np.asarray(dev["center_heatmap"][i]),
                    np.asarray(dev["offsets"][i]),
                    self.seg_output_stride,
                    method=self.merge_method,
                    dilate_iters=getattr(self, "merge_dilate", 1),
                    w_valley=getattr(self, "merge_w_valley", 1.0),
                    w_offset=getattr(self, "merge_w_offset", 0.25),
                    thresholds=getattr(self, "merge_thresholds", (0.85, 0.6, 0.4)),
                )
            frame_masks = []
            lift = 1.0 if getattr(self, "full_res_masks", False) else grid_lift
            for c in cands:
                if getattr(self, "do_mask_cleanup", True):
                    m = mask_cleanup(
                        c["mask"], area_floor,
                        radius=getattr(self, "mask_cleanup_radius", 0),
                        fill_holes=True,
                    )
                else:
                    m = c["mask"] if c["mask"].sum() >= area_floor else None
                if m is None or not m.any():
                    continue
                if getattr(self, "full_res_masks", False):
                    m = BottomUpSegmentationLayer._to_full_res(self, m, dev, i)
                # Stride encoding (#618): grid-res masks carry their
                # mask-px -> image-px factor so save/eval decode correctly.
                frame_masks.append(
                    SegmentationMask(m, score=c["score"], scale=lift)
                )
            out_masks.append(frame_masks)
        return {
            "pred_masks": out_masks,
            "pred_centroids": dev["centers"],
            "centroid_vals": dev["center_vals"],
            "centroid_valid": valid,
            # grid px -> ORIGINAL image px factor for downstream consumers
            # (polygon outlines, analysis tools); same value stamped on each
            # SegmentationMask above — one formula, one place.
            "mask_scale": 1.0 if getattr(self, "full_res_masks", False)
            else grid_lift,
        }

    def _to_full_res(self, mask: np.ndarray, dev, i: int) -> np.ndarray:
        """Resize one grid-res mask to ORIGINAL image resolution.

        ``--full_res_masks`` (reference cli.py:2576): the grid covers the
        scaled input (``pre.scale * eff_scale``) at ``seg_output_stride``, so
        one grid cell spans ``stride / scale`` original pixels. The grid also
        covers the sizematch/stride padding — crop to the valid extent before
        resizing or the pad stretches into the image.
        """
        import cv2

        H, W = (int(v) for v in np.asarray(dev["orig_hw"]).reshape(-1)[:2])
        eff = float(np.asarray(dev["eff_scale"]).reshape(-1)[0])
        scale = float(getattr(getattr(self, "pre", None), "scale", 1.0) or 1.0)
        mask = crop_valid_grid(
            mask, dev["orig_hw"], eff, scale, self.seg_output_stride
        )
        return cv2.resize(
            mask.astype(np.uint8), (W, H), interpolation=cv2.INTER_NEAREST
        ).astype(bool)

    def predict(self, images):
        return self.finalize(self.predict_async(images))


class SemanticSegmentationLayer:
    """Whole-frame foreground mask (reference: semantic path)."""

    def __init__(self, backend, pre, post, seg_output_stride=2,
                 fg_threshold: float = 0.5, full_res_masks: bool = False):
        from sleap_nn_tpu.inference.layers import preprocess_images

        self.backend = backend
        self.pre = pre
        self.post = post
        self.seg_output_stride = seg_output_stride
        self.fg_threshold = fg_threshold
        self.full_res_masks = bool(full_res_masks)

        def fn(images):
            x, eff_scale = preprocess_images(pre, images)
            preds = self.backend(x)
            return {
                "fg": preds["SegmentationHead"],
                "eff_scale": eff_scale,
                "orig_hw": jnp.array(images.shape[1:3], jnp.int32),
            }

        from sleap_nn_tpu.inference.layers import jit_layer

        self._fn = jit_layer([self.backend], fn)

    def predict_async(self, images):
        return self._fn(jnp.asarray(images))

    def finalize(self, dev) -> Dict:
        dev = jax.device_get(dev)
        fg = dev["fg"][..., 0] > getattr(self, "fg_threshold", 0.5)
        if getattr(self, "full_res_masks", False):
            import cv2

            H, W = (int(v) for v in np.asarray(dev["orig_hw"]).reshape(-1)[:2])
            eff_ = float(np.asarray(dev.get("eff_scale", 1.0)).reshape(-1)[0])
            scale_ = float(
                getattr(getattr(self, "pre", None), "scale", 1.0) or 1.0
            )
            stride_ = int(getattr(self, "seg_output_stride", 1) or 1)
            fg = np.stack([
                cv2.resize(
                    crop_valid_grid(
                        f, dev["orig_hw"], eff_, scale_, stride_
                    ).astype(np.uint8),
                    (W, H), interpolation=cv2.INTER_NEAREST,
                ).astype(bool)
                for f in fg
            ])
        eff = float(np.asarray(dev.get("eff_scale", 1.0)).reshape(-1)[0])
        sem_lift = (
            1.0 if getattr(self, "full_res_masks", False)
            else getattr(self, "seg_output_stride", 1)
            / (getattr(getattr(self, "pre", None), "scale", 1.0) * eff)
        )
        return {
            "pred_masks": [
                [SegmentationMask(fg[i], score=float(dev["fg"][i].mean()),
                                  scale=sem_lift)]
                if fg[i].any()
                else []
                for i in range(fg.shape[0])
            ],
            "fg_probs": dev["fg"],
            "mask_scale": sem_lift,
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
                 crop_size: int = 160, min_mask_area: int = 0):
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
            cres = c._fn.raw(images)
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

        from sleap_nn_tpu.inference.layers import jit_layer

        self._fn = jit_layer([centroid_layer.backend, seg_backend], full)

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


# --------------------------------------------------------------------------- #
# Fragment merge: RAG over candidate masks + greedy / multicut agglomeration.
#
# Parity target: reference segmentation.py:410-780. Failure mode addressed:
# one animal split into >=2 adjacent masks because two surviving center peaks
# each claimed a half. The pieces are re-fused by scoring each TOUCHING pair
# with a center-heatmap ridge signal (a deep valley between two centers means
# two animals -> don't merge) blended with offset-agreement (do both masks'
# pixels vote for one shared center?). Inert unless merge_fragments is on.
# --------------------------------------------------------------------------- #


def mask_predicted_centers(
    mask: np.ndarray, offsets: np.ndarray, output_stride: int
) -> np.ndarray:
    """Offset-voted center (x, y) px for every fg pixel of a grid-res mask.

    ``offsets`` is ``(H, W, 2)`` channel-last; the pixel-center convention
    matches :func:`group_instances_from_offsets` (``grid*stride + stride/2``).
    """
    ys, xs = np.nonzero(mask)
    if len(ys) == 0:
        return np.zeros((0, 2), np.float64)
    px = xs * float(output_stride) + output_stride / 2.0
    py = ys * float(output_stride) + output_stride / 2.0
    return np.stack([px + offsets[ys, xs, 0], py + offsets[ys, xs, 1]], axis=1)


def contact_fraction(a: np.ndarray, b: np.ndarray, dilate_iters: int = 1) -> float:
    """Symmetric touch fraction; >=1 dilation since candidate masks are disjoint."""
    from scipy.ndimage import binary_dilation

    iters = max(1, int(dilate_iters))
    da = binary_dilation(a, iterations=iters)
    db = binary_dilation(b, iterations=iters)
    overlap = int((da & b).sum() + (a & db).sum())
    if overlap == 0:
        return 0.0
    return overlap / max(1, min(int(a.sum()), int(b.sum())))


def center_valley_ridge(
    heatmap: np.ndarray,
    ca: Tuple[float, float],
    cb: Tuple[float, float],
    peak_a: float,
    peak_b: float,
    n_samples: int = 48,
) -> float:
    """Ridge score along the center-line (grid coords), interior 70% only.

    ~1 = the heatmap stays high between the two centers (one body -> merge);
    ~0 = it dips to background (two animals -> keep apart).
    """
    h, w = heatmap.shape
    t = np.linspace(0.0, 1.0, n_samples)[int(0.15 * n_samples):int(0.85 * n_samples)]
    if len(t) == 0:
        return 1.0
    xi = np.clip(np.round(ca[0] + (cb[0] - ca[0]) * t).astype(int), 0, w - 1)
    yi = np.clip(np.round(ca[1] + (cb[1] - ca[1]) * t).astype(int), 0, h - 1)
    return float(np.clip(heatmap[yi, xi].min() / max(1e-6, min(peak_a, peak_b)), 0.0, 1.0))


def offset_agreement(pa: np.ndarray, pb: np.ndarray, output_stride: int) -> float:
    """~1 when both masks' pixels vote for one shared center; ~0 a body apart."""
    if len(pa) == 0 or len(pb) == 0:
        return 0.0
    sep = float(np.hypot(*(pa.mean(0) - pb.mean(0))))
    spread = float(0.5 * (pa.std(0).mean() + pb.std(0).mean()))
    scale = max(spread, float(output_stride))
    return float(np.exp(-(sep ** 2) / (2.0 * (2.0 * scale) ** 2)))


def build_merge_rag(
    instances: List[Dict],
    center_heatmap: np.ndarray,
    offsets: np.ndarray,
    output_stride: int,
    dilate_iters: int = 1,
    w_valley: float = 1.0,
    w_offset: float = 0.25,
    contact_floor: float = 1e-3,
) -> Dict[Tuple[int, int], float]:
    """Edges (i<j) -> affinity in [0,1]; only touching pairs get an edge.

    affinity = contact_gate * (w_valley*ridge + w_offset*agree)/(w_valley+w_offset)
    with the contact gate saturating at contact=0.05. With both weights 0 the
    affinity collapses to the raw contact gate (over-merges; ablation only).
    """
    n = len(instances)
    voted = [mask_predicted_centers(i["mask"], offsets, output_stride) for i in instances]
    half = output_stride / 2.0
    edges: Dict[Tuple[int, int], float] = {}
    wsum = w_valley + w_offset
    for i in range(n):
        for j in range(i + 1, n):
            contact = contact_fraction(instances[i]["mask"], instances[j]["mask"], dilate_iters)
            if contact <= contact_floor:
                continue
            gate = min(1.0, contact / 0.05)
            if wsum <= 0:
                edges[(i, j)] = gate
                continue
            # Invert the grid->px convention so the sampled line has no
            # half-cell offset.
            ca = tuple((c - half) / output_stride for c in instances[i]["center"])
            cb = tuple((c - half) / output_stride for c in instances[j]["center"])
            ridge = center_valley_ridge(
                center_heatmap, ca, cb, instances[i]["score"], instances[j]["score"]
            )
            agree = offset_agreement(voted[i], voted[j], output_stride)
            edges[(i, j)] = float(gate * (w_valley * ridge + w_offset * agree) / wsum)
    return edges


class _UnionFind:
    def __init__(self, n: int):
        self.parent = list(range(n))

    def find(self, x: int) -> int:
        while self.parent[x] != x:
            self.parent[x] = self.parent[self.parent[x]]
            x = self.parent[x]
        return x

    def union(self, a: int, b: int):
        self.parent[self.find(b)] = self.find(a)

    def groups(self, n: int) -> List[set]:
        out: Dict[int, set] = {}
        for i in range(n):
            out.setdefault(self.find(i), set()).add(i)
        return list(out.values())


def _materialize_groups(groups: List[set], instances: List[Dict]) -> List[Dict]:
    """OR each group's masks; keep the best-scoring member's center/score."""
    out = []
    for g in groups:
        members = sorted(g)
        best = max(members, key=lambda k: instances[k]["score"])
        mask = np.zeros_like(instances[members[0]]["mask"])
        for k in members:
            mask |= instances[k]["mask"]
        out.append({"mask": mask, "center": instances[best]["center"],
                    "score": instances[best]["score"]})
    return out


def merge_greedy_affinity(
    instances: List[Dict],
    edges: Dict[Tuple[int, int], float],
    thresholds: Sequence[float] = (0.85, 0.6, 0.4),
) -> List[Dict]:
    """Greedy decreasing-threshold agglomeration; super-node affinity = mean."""
    n = len(instances)
    uf = _UnionFind(n)
    aff: Dict[Tuple[int, int], List[float]] = {k: [v] for k, v in edges.items()}

    def rekey():
        new: Dict[Tuple[int, int], List[float]] = {}
        for (a, b), vals in aff.items():
            ra, rb = uf.find(a), uf.find(b)
            if ra != rb:
                new.setdefault((min(ra, rb), max(ra, rb)), []).extend(vals)
        return new

    for thr in thresholds:
        while True:
            live = [((a, b), float(np.mean(v))) for (a, b), v in aff.items()
                    if uf.find(a) != uf.find(b)]
            if not live:
                break
            (a, b), best = max(live, key=lambda kv: kv[1])
            if best < thr:
                break
            uf.union(uf.find(a), uf.find(b))
            aff = rekey()
    return _materialize_groups(uf.groups(n), instances)


def merge_multicut_greedy(
    instances: List[Dict],
    edges: Dict[Tuple[int, int], float],
    join_bias: float = 0.5,
) -> List[Dict]:
    """Greedy correlation clustering: contract the most-attractive edge while
    any positive logit-cost edge remains; parallel edge costs sum."""
    import math

    def logit(p: float) -> float:
        p = min(max(p, 1e-4), 1 - 1e-4)
        return math.log(p / (1 - p))

    n = len(instances)
    uf = _UnionFind(n)
    cost: Dict[Tuple[int, int], float] = {
        k: logit(v) - logit(join_bias) for k, v in edges.items()
    }
    while True:
        live = [((a, b), c) for (a, b), c in cost.items() if uf.find(a) != uf.find(b)]
        live = [kv for kv in live if kv[1] > 0.0]
        if not live:
            break
        (a, b), _ = max(live, key=lambda kv: kv[1])
        uf.union(uf.find(a), uf.find(b))
        new: Dict[Tuple[int, int], float] = {}
        for (x, y), c in cost.items():
            rx, ry = uf.find(x), uf.find(y)
            if rx != ry:
                k = (min(rx, ry), max(rx, ry))
                new[k] = new.get(k, 0.0) + c
        cost = new
    return _materialize_groups(uf.groups(n), instances)


def merge_instances(
    instances: List[Dict],
    center_heatmap: np.ndarray,
    offsets: np.ndarray,
    output_stride: int,
    method: str = "greedy",
    dilate_iters: int = 1,
    w_valley: float = 1.0,
    w_offset: float = 0.25,
    thresholds: Sequence[float] = (0.85, 0.6, 0.4),
    join_bias: float = 0.5,
) -> List[Dict]:
    """Fuse over-segmented fragments of one animal via a RAG over masks."""
    if len(instances) < 2:
        return list(instances)
    edges = build_merge_rag(
        instances, center_heatmap, offsets, output_stride,
        dilate_iters=dilate_iters, w_valley=w_valley, w_offset=w_offset,
    )
    if not edges:
        return list(instances)
    if method == "multicut":
        return merge_multicut_greedy(instances, edges, join_bias=join_bias)
    return merge_greedy_affinity(instances, edges, thresholds=thresholds)
