"""Inference layers: preprocess -> backend -> postprocess per model family.

Parity target: reference sleap_nn/inference/layers/ (base.py:30,
single_instance.py:35, centroid.py:43, centered_instance.py:39,
topdown.py:35, bottomup.py:44). Each layer's device path (preprocess +
forward + peak finding (+ PAF scoring)) is one jitted function with static
shapes; coordinates are lifted back to original-image space via the
eff_scale / scale / crop-offset bookkeeping the reference tracks in
``PreprocInfo`` (layers/preprocess_info.py:20).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sleap_nn_tpu.data.normalization import apply_channel_config, normalize_image
from sleap_nn_tpu.data.resizing import apply_pad_to_stride, apply_sizematcher, resize_image
from sleap_nn_tpu.ops.crops import crop_bboxes, make_centered_bboxes
from sleap_nn_tpu.ops.peaks import find_global_peaks, find_local_peaks
from sleap_nn_tpu.inference.paf_grouping import PAFScorer


def jit_layer(backends, fn):
    """jit a layer body with every backend's params as PROGRAM ARGUMENTS.

    Layer bodies call ``backend(x)`` (closure style); naive ``jax.jit(fn)``
    would inline each backend's concrete weights as CONSTANTS into the
    compiled program — bloating the serialized HLO by the full weight size
    (past the axon remote-compile request limit for >25M-param models) and
    forcing recompiles on weight swaps. This wrapper traces the same body
    with each backend temporarily bound to tracer params, so the weights
    stay arguments.

    The returned callable keeps the body's call signature. Attributes:
    ``raw`` (the unjitted body — composite layers call inner layers through
    it so one outer trace covers everything), ``jitted`` (the underlying
    ``(params_list, *args)`` jit), ``backends``.
    """
    backends = list(backends)

    def wrapped(params_list, *args):
        prev = [b._bound for b in backends]
        for b, p in zip(backends, params_list):
            b._bound = p
        try:
            return fn(*args)
        finally:
            for b, pv in zip(backends, prev):
                b._bound = pv

    jitted = jax.jit(wrapped)

    def call(*args):
        return jitted([b.params for b in backends], *args)

    call.raw = fn
    call.jitted = jitted
    call.backends = backends
    return call


@dataclasses.dataclass
class PreprocessConfig:
    """Static preprocessing params shared by all layers (reference: layers/configs.py:17)."""

    ensure_rgb: bool = False
    ensure_grayscale: bool = False
    max_height: Optional[int] = None
    max_width: Optional[int] = None
    scale: float = 1.0
    max_stride: int = 16

    def __post_init__(self):
        if self.ensure_rgb and self.ensure_grayscale:
            raise ValueError(
                "ensure_rgb and ensure_grayscale cannot both be True"
            )


@dataclasses.dataclass
class PostprocessConfig:
    """Peak-finding / grouping knobs (reference: layers/configs.py:53)."""

    peak_threshold: float = 0.2
    refinement: Optional[str] = "integral"
    integral_patch_size: int = 5
    max_instances: Optional[int] = None
    max_peaks: int = 200
    return_confmaps: bool = False
    # bottomup debug: emit the matched PAF candidate graph per sample as
    # (peaks, edge_inds, edge_peak_inds, line_scores) under "pred_paf_graph"
    return_paf_graph: bool = False
    # bottomup only
    k_per_node: int = 20
    n_points: int = 10
    max_edge_length_ratio: float = 0.25
    dist_penalty_weight: float = 1.0
    min_line_scores: float = 0.25
    # topdown only
    crop_size: Optional[int] = None
    anchor_ind: Optional[int] = None


def preprocess_images(pre: PreprocessConfig, images: jnp.ndarray):
    """uint8 (B, H, W, C) -> network-ready float batch + coordinate factors.

    Returns (x, eff_scale): predicted coords must be divided by
    ``pre.scale * eff_scale`` to land in original-image space.
    """
    x = normalize_image(images)
    x = apply_channel_config(x, pre.ensure_rgb, pre.ensure_grayscale)
    x, eff_scale = apply_sizematcher(x, pre.max_height, pre.max_width)
    if pre.scale != 1.0:
        x = resize_image(x, pre.scale)
    x = apply_pad_to_stride(x, pre.max_stride)
    return x, eff_scale


class InferenceLayer:
    """Base: owns backend + configs.

    Layers expose an async protocol so the predictor can pipeline host work
    against in-flight device batches (JAX dispatch is asynchronous; blocking
    per batch would serialize the transfer round-trips):
    ``predict_async`` dispatches and returns unfetched device arrays;
    ``finalize`` fetches (+ any host postprocessing).

    ``consumes_host_frames``: True when ``predict_async`` does host-side
    work on the raw frames (per-frame tiling); the predictor then keeps
    tail batches host-padded instead of shipping a device array that
    would immediately round-trip back.
    """

    consumes_host_frames = False

    def __init__(self, backend, pre: PreprocessConfig, post: PostprocessConfig):
        self.backend = backend
        self.pre = pre
        self.post = post

    def predict_async(self, images: np.ndarray) -> Dict[str, Any]:
        raise NotImplementedError

    def finalize(self, device_out: Dict[str, Any]) -> Dict[str, Any]:
        return jax.device_get(device_out)

    def predict(self, images: np.ndarray) -> Dict[str, Any]:
        return self.finalize(self.predict_async(images))


class SingleInstanceLayer(InferenceLayer):
    """Full-frame single-instance confmap peaks (reference: single_instance.py:35)."""

    def __init__(self, backend, pre, post, head_name="SingleInstanceConfmapsHead", output_stride=2):
        super().__init__(backend, pre, post)
        self.head_name = head_name
        self.output_stride = output_stride
        post_cfg = self.post

        def fn(images):
            x, eff_scale = preprocess_images(self.pre, images)
            preds = self.backend(x)
            cms = preds[self.head_name]
            points, vals = find_global_peaks(
                cms,
                threshold=post_cfg.peak_threshold,
                refinement=post_cfg.refinement,
                integral_patch_size=post_cfg.integral_patch_size,
            )
            points = points * self.output_stride / (self.pre.scale * eff_scale)
            out = {"pred_keypoints": points[:, None], "pred_peak_values": vals[:, None]}
            if post_cfg.return_confmaps:
                out["confmaps"] = cms
            return out

        self._fn = jit_layer([self.backend], fn)

    def predict_async(self, images):
        return self._fn(jnp.asarray(images))


class CentroidLayer(InferenceLayer):
    """Stage-1 centroid detection via local peaks (reference: centroid.py:43)."""

    def __init__(self, backend, pre, post, head_name="CentroidConfmapsHead", output_stride=2):
        super().__init__(backend, pre, post)
        self.head_name = head_name
        self.output_stride = output_stride
        post_cfg = self.post
        k = post_cfg.max_instances or post_cfg.max_peaks

        def fn(images):
            x, eff_scale = preprocess_images(self.pre, images)
            preds = self.backend(x)
            cms = preds[self.head_name]
            points, vals, channels, valid = find_local_peaks(
                cms,
                threshold=post_cfg.peak_threshold,
                refinement=post_cfg.refinement,
                integral_patch_size=post_cfg.integral_patch_size,
                max_peaks=k,
            )
            # scaled-image coords (for stage-2 crops) and original coords.
            points_scaled = points * self.output_stride
            points_orig = points_scaled / (self.pre.scale * eff_scale)
            out = {
                "pred_centroids": points_orig,
                "centroids_scaled": points_scaled,
                "centroid_vals": vals,
                "centroid_valid": valid,
                "eff_scale": eff_scale,
            }
            if post_cfg.return_confmaps:
                out["confmaps"] = cms
            return out

        self._fn = jit_layer([self.backend], fn)

    def predict_async(self, images):
        return self._fn(jnp.asarray(images))


class CenteredInstanceLayer(InferenceLayer):
    """Stage-2 per-crop confmap peaks (reference: centered_instance.py:39).

    ``predict_on_crops`` takes pre-extracted crops in the SCALED image space;
    peaks are returned in crop coordinates, callers add the crop offsets.
    """

    def __init__(self, backend, pre, post, head_name="CenteredInstanceConfmapsHead", output_stride=2):
        super().__init__(backend, pre, post)
        self.head_name = head_name
        self.output_stride = output_stride
        post_cfg = self.post

        def fn(crops):
            preds = self.backend(crops)
            cms = preds[self.head_name]
            points, vals = find_global_peaks(
                cms,
                threshold=post_cfg.peak_threshold,
                refinement=post_cfg.refinement,
                integral_patch_size=post_cfg.integral_patch_size,
            )
            return points * self.output_stride, vals

        self._fn = jit_layer([self.backend], fn)

    def predict_on_crops(self, crops: jnp.ndarray):
        return self._fn(crops)


class TopDownLayer(InferenceLayer):
    """Two-stage: centroids -> static-shape crop gather -> instance peaks.

    Parity target: reference layers/topdown.py:35-250. Stage-2 runs on a
    fixed ``max_instances`` crop batch with masking (no dynamic shapes).
    """

    def __init__(self, centroid_layer: Optional[CentroidLayer], instance_layer: CenteredInstanceLayer,
                 max_instances: int = 20, crop_size: int = 160):
        self.centroid_layer = centroid_layer
        self.instance_layer = instance_layer
        self.max_instances = max_instances
        self.crop_size = crop_size

        inst_pre = instance_layer.pre
        crop = crop_size

        def stage2(images_scaled, centroids_scaled, valid):
            """images_scaled: stage-2-preprocessed full frames (B, H, W, C);
            centroids_scaled: (B, K, 2) in the same scaled space."""
            b, k = centroids_scaled.shape[:2]
            flat_c = centroids_scaled.reshape(b * k, 2)
            bboxes = make_centered_bboxes(flat_c, crop, crop)
            sample_inds = jnp.repeat(jnp.arange(b), k)
            crops = crop_bboxes(images_scaled, bboxes, sample_inds, crop, crop)
            peaks, vals = instance_layer._fn.raw(crops)  # crop coords
            # Integer-floored bbox top-left — must match crop_bboxes' gather
            # (center - (crop-1)/2, then the trunc(x+half)-half legacy floor).
            half = jnp.array([crop // 2, crop // 2], dtype=flat_c.dtype)
            bbox_tl = flat_c - (crop - 1) / 2.0
            top_left = jnp.trunc(bbox_tl + half) - half
            peaks = peaks + top_left[:, None, :]
            n_nodes = peaks.shape[1]
            peaks = peaks.reshape(b, k, n_nodes, 2)
            vals = vals.reshape(b, k, n_nodes)
            peaks = jnp.where(valid[..., None, None], peaks, jnp.nan)
            vals = jnp.where(valid[..., None], vals, 0.0)
            return peaks, vals

        max_inst = self.max_instances
        c = self.centroid_layer

        def full(images):
            """Both stages fused into one XLA program (no eager host ops —
            on TPU every eager op would be a dispatch round-trip)."""
            cres = c._fn.raw(images)
            cres = {
                **cres,
                "centroids_scaled": cres["centroids_scaled"][:, :max_inst],
                "pred_centroids": cres["pred_centroids"][:, :max_inst],
                "centroid_vals": cres["centroid_vals"][:, :max_inst],
                "centroid_valid": cres["centroid_valid"][:, :max_inst],
            }
            # Preprocess frames once for stage 2 in the instance layer's space.
            x2, eff2 = preprocess_images(instance_layer.pre, images)
            # centroid-layer scaled space -> stage-2 scaled space.
            ratio = (instance_layer.pre.scale * eff2) / (c.pre.scale * cres["eff_scale"])
            cent2 = jnp.nan_to_num(cres["centroids_scaled"] * ratio, nan=-1e6)
            peaks, vals = stage2(x2, cent2, cres["centroid_valid"])
            peaks = peaks / (instance_layer.pre.scale * eff2)
            return {
                "pred_keypoints": peaks,
                "pred_peak_values": vals,
                "pred_centroids": cres["pred_centroids"],
                "centroid_vals": cres["centroid_vals"],
                "instance_valid": cres["centroid_valid"],
            }

        self._full = jit_layer(
            [self.centroid_layer.backend, instance_layer.backend], full
        )

    def predict_async(self, images):
        return self._full(jnp.asarray(images))

    def finalize(self, device_out):
        return jax.device_get(device_out)

    def predict(self, images):
        return self.finalize(self.predict_async(images))


class BottomUpLayer(InferenceLayer):
    """Multi-instance confmaps + PAF grouping (reference: bottomup.py:44)."""

    def __init__(
        self,
        backend,
        pre,
        post,
        paf_scorer: PAFScorer,
        cm_head="MultiInstanceConfmapsHead",
        paf_head="PartAffinityFieldsHead",
        cm_output_stride=2,
    ):
        super().__init__(backend, pre, post)
        self.paf_scorer = paf_scorer
        post_cfg = post

        def fn(images):
            x, eff_scale = preprocess_images(self.pre, images)
            preds = self.backend(x)
            cms = preds[cm_head]
            pafs = preds[paf_head]
            points, vals, channels, valid = find_local_peaks(
                cms,
                threshold=post_cfg.peak_threshold,
                refinement=post_cfg.refinement,
                integral_patch_size=post_cfg.integral_patch_size,
                max_peaks=post_cfg.max_peaks,
            )
            points = points * cm_output_stride  # image(scaled) coords
            grouped_peaks, grouped_vals, mask, scores = paf_scorer.score_on_device(
                pafs, points, vals, channels, valid
            )
            out = {
                "grouped_peaks": grouped_peaks,
                "grouped_vals": grouped_vals,
                "scores": scores,
                "eff_scale": eff_scale,
            }
            if post_cfg.return_confmaps:
                out["confmaps"] = cms
                out["pafs"] = pafs
            return out

        self._fn = jit_layer([self.backend], fn)

    def predict_async(self, images):
        return self._fn(jnp.asarray(images))

    def device_to_payload(self, dev) -> Dict[str, Any]:
        """Fetch the device scores into a picklable numpy grouping payload.

        One bundled ``jax.device_get`` — separate per-array fetches each cost
        a full transport round-trip on remote-attached devices.
        """
        keys = ["grouped_peaks", "grouped_vals", "scores", "eff_scale"]
        # return_confmaps: the device program emitted confmaps/pafs too;
        # carry them through grouping into the output batch dicts.
        keys += [k for k in ("confmaps", "pafs") if k in dev]
        host = jax.device_get({k: dev[k] for k in keys})
        payload = {
            "grouped_peaks": host["grouped_peaks"],
            "grouped_vals": host["grouped_vals"],
            "scores": host["scores"],
            "lift": 1.0 / (self.pre.scale * float(np.reshape(host["eff_scale"], -1)[0])),
        }
        for k in ("confmaps", "pafs"):
            if k in host:
                payload[k] = host[k]
        return payload

    def finalize(self, dev):
        """Host grouping of fetched device scores (reference CPU boundary)."""
        from sleap_nn_tpu.inference.streaming import group_batch_host

        return group_batch_host(
            self.device_to_payload(dev), self.paf_scorer, self.post.max_instances,
            return_paf_graph=self.post.return_paf_graph,
        )

    def predict(self, images):
        return self.finalize(self.predict_async(images))


class BottomUpMultiClassLayer(InferenceLayer):
    """Multi-instance confmaps + class maps -> per-identity instances.

    Parity target: reference layers/bottomup_multiclass.py — device peak
    finding + class-map gather; host Hungarian peak->class assignment
    (ops/identity.py).
    """

    def __init__(
        self,
        backend,
        pre,
        post,
        n_nodes: int,
        n_classes: int,
        cm_head="MultiInstanceConfmapsHead",
        class_head="ClassMapsHead",
        cm_output_stride=2,
        class_maps_output_stride=2,
    ):
        super().__init__(backend, pre, post)
        self.n_nodes = n_nodes
        self.n_classes = n_classes
        self.cm_output_stride = cm_output_stride
        self.class_maps_output_stride = class_maps_output_stride
        post_cfg = post

        def fn(images):
            x, eff_scale = preprocess_images(self.pre, images)
            preds = self.backend(x)
            cms = preds[cm_head]
            class_maps = preds[class_head]
            points, vals, channels, valid, rough = find_local_peaks(
                cms,
                threshold=post_cfg.peak_threshold,
                refinement=post_cfg.refinement,
                integral_patch_size=post_cfg.integral_patch_size,
                max_peaks=post_cfg.max_peaks,
                return_rough=True,
            )
            out = {
                "points": points * cm_output_stride,  # scaled-image coords
                "rough": rough,  # grid coords, for scan-order tie-breaking
                "vals": vals,
                "channels": channels,
                "valid": valid,
                "class_maps": class_maps,
                "eff_scale": eff_scale,
            }
            return out

        self._fn = jit_layer([self.backend], fn)

    def predict_async(self, images):
        return self._fn(jnp.asarray(images))

    def finalize(self, dev):
        from sleap_nn_tpu.inference.identity import classify_peaks_from_maps

        dev = jax.device_get(dev)
        b, k = dev["vals"].shape
        valid = dev["valid"].reshape(-1)
        points = dev["points"].reshape(-1, 2)[valid]
        rough = dev["rough"].reshape(-1, 2)[valid]
        vals = dev["vals"].reshape(-1)[valid]
        sample_inds = np.repeat(np.arange(b), k)[valid]
        channel_inds = dev["channels"].reshape(-1)[valid]

        pts_cm_grid = points / self.class_maps_output_stride
        grouped_pts, grouped_vals, class_probs = classify_peaks_from_maps(
            dev["class_maps"],
            pts_cm_grid,
            vals,
            sample_inds,
            channel_inds,
            self.n_nodes,
            sort_keys=rough,
        )
        lift = self.class_maps_output_stride / (self.pre.scale * float(dev["eff_scale"]))
        return {
            "pred_keypoints": grouped_pts * lift,
            "pred_peak_values": grouped_vals,
            "pred_class_probs": class_probs,
        }

    def predict(self, images):
        return self.finalize(self.predict_async(images))


class TopDownMultiClassLayer(TopDownLayer):
    """Two-stage topdown where stage 2 also emits class vectors.

    Parity target: reference layers/topdown_multiclass.py — per-sample
    Hungarian assignment of crop class probabilities to identities
    (ops/identity.py:149).
    """

    def __init__(self, centroid_layer, instance_layer, max_instances, crop_size,
                 n_classes: int, class_head="ClassVectorsHead"):
        self.n_classes = n_classes
        self.class_head = class_head
        # Augment the instance layer's fn to also return class probs.
        backend = instance_layer.backend
        post_cfg = instance_layer.post
        head_name = instance_layer.head_name
        output_stride = instance_layer.output_stride

        def fn(crops):
            preds = backend(crops)
            cms = preds[head_name]
            points, vals = find_global_peaks(
                cms,
                threshold=post_cfg.peak_threshold,
                refinement=post_cfg.refinement,
                integral_patch_size=post_cfg.integral_patch_size,
            )
            return points * output_stride, vals, preds[class_head]

        self._crop_fn = jit_layer([backend], fn)
        super().__init__(centroid_layer, instance_layer, max_instances, crop_size)

        max_inst = self.max_instances
        c = centroid_layer
        crop = self.crop_size

        def full(images):
            cres = c._fn.raw(images)
            cres = {
                **cres,
                "centroids_scaled": cres["centroids_scaled"][:, :max_inst],
                "pred_centroids": cres["pred_centroids"][:, :max_inst],
                "centroid_vals": cres["centroid_vals"][:, :max_inst],
                "centroid_valid": cres["centroid_valid"][:, :max_inst],
            }
            x2, eff2 = preprocess_images(instance_layer.pre, images)
            ratio = (instance_layer.pre.scale * eff2) / (c.pre.scale * cres["eff_scale"])
            cent2 = jnp.nan_to_num(cres["centroids_scaled"] * ratio, nan=-1e6)

            b, k = cent2.shape[:2]
            flat_c = cent2.reshape(b * k, 2)
            bboxes = make_centered_bboxes(flat_c, crop, crop)
            sample_inds = jnp.repeat(jnp.arange(b), k)
            crops = crop_bboxes(x2, bboxes, sample_inds, crop, crop)
            peaks, vals, class_probs = self._crop_fn.raw(crops)
            half = jnp.array([crop // 2, crop // 2], dtype=flat_c.dtype)
            top_left = jnp.trunc((flat_c - (crop - 1) / 2.0) + half) - half
            peaks = peaks + top_left[:, None, :]
            n_nodes = peaks.shape[1]
            peaks = peaks.reshape(b, k, n_nodes, 2)
            vals = vals.reshape(b, k, n_nodes)
            valid = cres["centroid_valid"]
            peaks = jnp.where(valid[..., None, None], peaks, jnp.nan)
            vals = jnp.where(valid[..., None], vals, 0.0)
            peaks = peaks / (instance_layer.pre.scale * eff2)
            return {
                "pred_keypoints": peaks,
                "pred_peak_values": vals,
                "pred_centroids": cres["pred_centroids"],
                "centroid_vals": cres["centroid_vals"],
                "instance_valid": valid,
                "class_probs": class_probs.reshape(b, k, -1),
            }

        self._full = jit_layer(
            [self.centroid_layer.backend, instance_layer.backend], full
        )

    def finalize(self, device_out):
        from sleap_nn_tpu.inference.identity import get_class_inds_from_vectors

        out = jax.device_get(device_out)
        b = out["pred_keypoints"].shape[0]
        class_inds = np.full(out["class_probs"].shape[:2], -1, dtype=np.int64)
        class_scores = np.full(out["class_probs"].shape[:2], np.nan, dtype=np.float32)
        for i in range(b):
            valid = out["instance_valid"][i]
            if not valid.any():
                continue
            probs = out["class_probs"][i][valid]
            ci, cp = get_class_inds_from_vectors(probs)
            class_inds[i, np.nonzero(valid)[0]] = ci
            class_scores[i, np.nonzero(valid)[0]] = cp
        out["pred_class_inds"] = class_inds
        out["pred_class_scores"] = class_scores
        return out


class TiledLayer(InferenceLayer):
    """Sliding-window inference over large frames with blended stitching.

    Parity target: reference layers/tiled.py:135 — grid inference + taper
    -window blending (tile_merger), then standard peak finding on the merged
    maps. Works for any confmap-headed model; the merged canvas lives at the
    head's output-stride resolution.
    """

    consumes_host_frames = True

    def __init__(
        self,
        backend,
        pre,
        post,
        head_name: str,
        output_stride: int,
        tile_size: int,
        overlap: Optional[int] = None,
        blend: str = "gaussian",
        sigma_scale: float = 0.125,
        min_overlap_fraction: float = 0.25,
        tile_batch_size: int = 16,
        mode: str = "local",  # "local" (multi peak) or "global" (single instance)
    ):
        super().__init__(backend, pre, post)
        self.head_name = head_name
        self.output_stride = output_stride
        self.tile_size = tile_size
        self.overlap = overlap if overlap is not None else tile_size // 4
        self.blend = blend
        self.sigma_scale = sigma_scale
        self.min_overlap_fraction = min_overlap_fraction
        self.tile_batch_size = tile_batch_size
        self.mode = mode

        def tile_fn(tiles):
            x = normalize_image(tiles)
            x = apply_channel_config(x, self.pre.ensure_rgb, self.pre.ensure_grayscale)
            return self.backend(x)[self.head_name]

        self._tile_fn = jit_layer([self.backend], tile_fn)
        ts = tile_size // output_stride
        from sleap_nn_tpu.inference.tile_merger import build_importance_window

        self._window = build_importance_window((ts, ts), blend, sigma_scale)

    def predict_async(self, images):
        """Tile, forward, and merge each frame; returns merged confmaps."""
        from sleap_nn_tpu.data.tiling import extract_tile, generate_tile_grid
        from sleap_nn_tpu.inference.tile_merger import merge_tiles

        images = np.asarray(images)
        b, h, w, c = images.shape
        origins = generate_tile_grid(
            (h, w),
            self.tile_size,
            self.overlap,
            self.output_stride,
            max_stride=self.pre.max_stride,
            min_overlap_fraction=self.min_overlap_fraction,
        )
        dummy_inst = np.zeros((0, 1, 2), np.float32)
        canvases = []
        os_ = self.output_stride
        origins_os = jnp.asarray(
            np.asarray(origins, np.int32) // os_, dtype=jnp.int32
        )
        for i in range(b):
            tiles = np.stack(
                [
                    extract_tile(images[i], dummy_inst, o, self.tile_size)[0]
                    for o in origins
                ]
            )
            maps = []
            for start in range(0, len(tiles), self.tile_batch_size):
                chunk = tiles[start : start + self.tile_batch_size]
                pad = 0
                if chunk.shape[0] < self.tile_batch_size:
                    pad = self.tile_batch_size - chunk.shape[0]
                    chunk = np.concatenate([chunk, np.repeat(chunk[-1:], pad, 0)])
                out = self._tile_fn(jnp.asarray(chunk))
                maps.append(out[: out.shape[0] - pad] if pad else out)
            tile_maps = jnp.concatenate(maps, axis=0)
            canvas = merge_tiles(
                tile_maps, origins_os, (h // os_, w // os_), self._window
            )
            canvases.append(canvas)
        cms = jnp.stack(canvases)

        post_cfg = self.post
        if self.mode == "global":
            points, vals = find_global_peaks(
                cms, post_cfg.peak_threshold, post_cfg.refinement,
                post_cfg.integral_patch_size,
            )
            return {
                "pred_keypoints": (points * os_)[:, None],
                "pred_peak_values": vals[:, None],
            }
        points, vals, channels, valid = find_local_peaks(
            cms, post_cfg.peak_threshold, post_cfg.refinement,
            post_cfg.integral_patch_size, max_peaks=post_cfg.max_peaks,
        )
        return {
            "pred_peaks": points * os_,
            "peak_vals": vals,
            "peak_channels": channels,
            "peak_valid": valid,
        }


class GTCentroidTopDownLayer(InferenceLayer):
    """Centered-instance-only inference using GROUND-TRUTH centroids.

    Parity target: the reference's centered-instance-only combo
    (predictor.py:652 ``_build_centroid_layer_gt_only``): no centroid model —
    the .slp source's instance centroids (anchor node or mean-of-visible)
    drive the crop placement, and only the stage-2 model runs. Requires a
    labels source; video sources have no centroids to use.
    """

    needs_gt_centroids = True

    def __init__(self, instance_layer: CenteredInstanceLayer,
                 max_instances: int = 20, crop_size: int = 160):
        self.instance_layer = instance_layer
        self.max_instances = max_instances
        self.crop_size = crop_size
        inst_pre = instance_layer.pre
        crop = crop_size

        def full(images, centroids_orig, valid, centroid_vals):
            """centroids_orig: (B, K, 2) in ORIGINAL image coords (NaN pads).

            centroid_vals: (B, K) confidences of the source centroids
            (PredictedInstance scores, or 1.0 for user instances) — carried
            through as the reported centroid/instance confidence, NaN on
            invalid slots (reference finding 14: GT-peaks inference reports
            centroid confidence as the instance score).
            """
            x2, eff2 = preprocess_images(inst_pre, images)
            s = inst_pre.scale * eff2
            cent2 = jnp.nan_to_num(centroids_orig * s, nan=-1e6)
            b, k = cent2.shape[:2]
            flat_c = cent2.reshape(b * k, 2)
            bboxes = make_centered_bboxes(flat_c, crop, crop)
            sample_inds = jnp.repeat(jnp.arange(b), k)
            crops = crop_bboxes(x2, bboxes, sample_inds, crop, crop)
            peaks, vals = instance_layer._fn.raw(crops)
            half = jnp.array([crop // 2, crop // 2], dtype=flat_c.dtype)
            top_left = jnp.trunc((flat_c - (crop - 1) / 2.0) + half) - half
            peaks = (peaks + top_left[:, None, :]).reshape(b, k, -1, 2) / s
            vals = vals.reshape(b, k, -1)
            peaks = jnp.where(valid[..., None, None], peaks, jnp.nan)
            vals = jnp.where(valid[..., None], vals, 0.0)
            cvals = jnp.where(valid, centroid_vals.astype(jnp.float32), jnp.nan)
            return {
                "pred_keypoints": peaks,
                "pred_peak_values": vals,
                "pred_centroids": centroids_orig,
                "centroid_vals": cvals,
                "pred_instance_scores": cvals,
                "instance_valid": valid,
            }

        self._full = jit_layer([instance_layer.backend], full)

    def predict_async(self, images, centroids=None, valid=None, centroid_vals=None):
        valid = jnp.asarray(valid)
        if centroid_vals is None:
            centroid_vals = jnp.ones(valid.shape, jnp.float32)
        return self._full(jnp.asarray(images), jnp.asarray(centroids), valid,
                          jnp.asarray(centroid_vals))

    def finalize(self, device_out):
        return jax.device_get(device_out)
