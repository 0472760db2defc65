"""Training data pipeline: host datasets + fused device-side render graph.

TPU-first redesign of the reference's 12 dataset classes
(reference: sleap_nn/data/custom_datasets.py:339-5874). Host side does only
indexing + frame decode + NaN-padding (numpy); everything else — normalize,
sizematch, scale, augment, pad-to-stride, and target rendering
(confmaps/PAFs/class maps/vectors) — is one pure, jittable function produced
by :func:`make_render_fn`, designed to be jitted together with the train
step so the whole step is a single XLA program.

Static-shape discipline: every batch is ``(B, H, W, C)`` with fixed
``max_instances`` NaN-padded keypoints; centered-instance datasets enumerate
(frame, instance) pairs and crop on device at a static crop size.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sleap_nn_tpu.config.data_config import DataConfig
from sleap_nn_tpu.data.augmentation import (
    apply_geometric_augmentation,
    apply_intensity_augmentation,
)
from sleap_nn_tpu.data.identity import make_class_vectors
from sleap_nn_tpu.data.instance_centroids import generate_centroids
from sleap_nn_tpu.data.instance_cropping import generate_crops
from sleap_nn_tpu.data.normalization import apply_channel_config, normalize_image
from sleap_nn_tpu.data.providers import get_max_instances, process_lf
from sleap_nn_tpu.data.resizing import apply_pad_to_stride, apply_resizer, apply_sizematcher
from sleap_nn_tpu.io.model import Labels
from sleap_nn_tpu.ops.confmaps import generate_confmaps, generate_multiconfmaps
from sleap_nn_tpu.ops.edge_maps import generate_pafs
from sleap_nn_tpu.ops.grid import make_grid_vectors
from sleap_nn_tpu.ops.confmaps import make_confmaps


@dataclasses.dataclass
class PipelineContext:
    """Static pipeline parameters shared by host datasets and device render fns."""

    model_type: str
    n_nodes: int
    max_instances: int
    edge_inds: Tuple[Tuple[int, int], ...] = ()
    n_classes: int = 0
    # preprocessing
    ensure_rgb: bool = False
    ensure_grayscale: bool = False
    max_height: Optional[int] = None
    max_width: Optional[int] = None
    scale: float = 1.0
    crop_size: Optional[int] = None
    max_stride: int = 16
    # heads
    sigma: float = 5.0
    output_stride: int = 2
    pafs_sigma: float = 15.0
    pafs_output_stride: int = 4
    class_maps_sigma: float = 5.0
    class_maps_output_stride: int = 2
    anchor_ind: Optional[int] = None
    # segmentation
    seg_output_stride: int = 2
    seg_maxpool: bool = False
    center_sigma: float = 4.0
    center_output_stride: int = 2
    offsets_output_stride: int = 2
    mask_radius: float = 12.0
    # augmentation
    use_augmentations: bool = False
    intensity: Optional[dict] = None
    geometric: Optional[dict] = None
    symmetric_inds: Tuple[Tuple[int, int], ...] = ()
    # Tiled training with geometric augmentation: train tiles arrive as a
    # larger halo (side ceil(tile*sqrt(2))); after the aug the device render
    # center-crops back to this tile size so rotations never pull in
    # zero-padding wedges (reference: data/tiling.py:262 halo path).
    halo_crop_to: Optional[int] = None


def _aug_kwargs(cfg) -> dict:
    if cfg is None:
        return {}
    if dataclasses.is_dataclass(cfg):
        return dataclasses.asdict(cfg)
    return dict(cfg)


def preprocess_batch(
    ctx: PipelineContext,
    image: jnp.ndarray,
    instances: jnp.ndarray,
    key: Optional[jax.Array],
    train: bool,
) -> Tuple[jnp.ndarray, jnp.ndarray, float]:
    """Shared device-side chain: normalize -> channels -> sizematch -> scale
    -> augment -> (image NOT yet padded to stride). Returns eff_scale."""
    image = normalize_image(image)
    image = apply_channel_config(image, ctx.ensure_rgb, ctx.ensure_grayscale)
    image, eff_scale = apply_sizematcher(image, ctx.max_height, ctx.max_width)
    instances = instances * eff_scale
    image, instances = apply_resizer(image, instances, ctx.scale)

    if train and ctx.use_augmentations and key is not None:
        k_int, k_geo = jax.random.split(key)
        if ctx.intensity:
            image = apply_intensity_augmentation(k_int, image, **ctx.intensity)
        if ctx.geometric:
            out = apply_geometric_augmentation(
                k_geo, image, instances,
                symmetric_inds=ctx.symmetric_inds or None,
                **ctx.geometric,
            )
            image, instances = out[0], out[1]
    if train and ctx.halo_crop_to is not None:
        target = int(round(ctx.halo_crop_to * ctx.scale))
        h, w = image.shape[-3], image.shape[-2]
        if h > target or w > target:
            off_h, off_w = (h - target) // 2, (w - target) // 2
            image = image[..., off_h : off_h + target, off_w : off_w + target, :]
            instances = instances - jnp.asarray([off_w, off_h], instances.dtype)
    return image, instances, eff_scale


def make_render_fn(ctx: PipelineContext, train: bool) -> Callable:
    """Build the pure device-side batch -> (inputs, targets) function.

    The returned fn has signature ``fn(batch: dict[str, jnp.ndarray],
    key: jax.Array | None) -> dict`` and is jit-safe for fixed input shapes.
    Output dict always contains ``image`` (network input) plus model-type
    specific targets: ``confmaps``, ``pafs``, ``class_maps``,
    ``class_vectors``, ``instances`` (transformed keypoints), ``centroids``.
    """
    edge_inds = jnp.asarray(ctx.edge_inds, dtype=jnp.int32) if ctx.edge_inds else None

    def fn(batch: Dict[str, jnp.ndarray], key: Optional[jax.Array] = None) -> Dict[str, Any]:
        image = batch["image"]
        instances = batch["instances"]  # (B, I, N, 2)
        image, instances, eff_scale = preprocess_batch(ctx, image, instances, key, train)
        image = apply_pad_to_stride(image, ctx.max_stride)
        h, w = image.shape[1], image.shape[2]
        out: Dict[str, Any] = {"eff_scale": eff_scale}

        if ctx.model_type == "single_instance":
            pts = instances[:, 0]  # (B, N, 2)
            out["confmaps"] = generate_confmaps(
                pts, (h, w), sigma=ctx.sigma, output_stride=ctx.output_stride
            )
            out["image"], out["instances"] = image, instances

        elif ctx.model_type == "centroid":
            centroids = generate_centroids(instances, ctx.anchor_ind)  # (B, I, 2)
            out["confmaps"] = generate_multiconfmaps(
                centroids, (h, w), sigma=ctx.sigma,
                output_stride=ctx.output_stride, is_centroids=True,
            )
            out["image"], out["instances"], out["centroids"] = image, instances, centroids

        elif ctx.model_type in ("centered_instance", "multi_class_topdown"):
            centroids = generate_centroids(instances, ctx.anchor_ind)  # (B, I, 2)
            b = image.shape[0]
            sel = batch["center_idx"].astype(jnp.int32)  # (B,)
            rows = jnp.arange(b)
            c = centroids[rows, sel]  # (B, 2)
            inst = instances[rows, sel]  # (B, N, 2)
            crop_size = int(round(ctx.crop_size * ctx.scale))
            crop_size += (-crop_size) % ctx.max_stride
            crops, inst_shifted, c_shifted = generate_crops(image, inst, c, crop_size)
            out["image"] = crops
            out["instances"] = inst_shifted
            out["centroids"] = c_shifted
            out["confmaps"] = generate_confmaps(
                inst_shifted, (crop_size, crop_size),
                sigma=ctx.sigma, output_stride=ctx.output_stride,
            )
            if ctx.model_type == "multi_class_topdown":
                tid = batch["track_ids"][rows, sel]
                out["class_vectors"] = make_class_vectors(tid, ctx.n_classes)

        elif ctx.model_type == "bottomup":
            out["image"], out["instances"] = image, instances
            out["confmaps"] = generate_multiconfmaps(
                instances, (h, w), sigma=ctx.sigma, output_stride=ctx.output_stride
            )
            out["pafs"] = jax.vmap(
                lambda inst: generate_pafs(
                    inst, (h, w), edge_inds,
                    sigma=ctx.pafs_sigma, output_stride=ctx.pafs_output_stride,
                )
            )(instances)

        elif ctx.model_type == "multi_class_bottomup":
            out["image"], out["instances"] = image, instances
            out["confmaps"] = generate_multiconfmaps(
                instances, (h, w), sigma=ctx.sigma, output_stride=ctx.output_stride
            )
            xv, yv = make_grid_vectors(h, w, ctx.class_maps_output_stride)
            per_inst_cms = make_confmaps(
                instances, xv, yv, ctx.class_maps_sigma * ctx.class_maps_output_stride
            )  # (B, I, Hs, Ws, N)
            from sleap_nn_tpu.data.identity import make_class_maps

            out["class_maps"] = make_class_maps(
                per_inst_cms, batch["track_ids"], ctx.n_classes
            )

        elif ctx.model_type in ("bottomup_segmentation", "semantic_segmentation"):
            from sleap_nn_tpu.data.segmentation_maps import (
                generate_center_heatmap,
                generate_center_offsets,
                generate_foreground_mask,
                render_masks_from_instances,
            )

            out["image"], out["instances"] = image, instances
            # Masks synthesized from the (already augmented) keypoints so they
            # are automatically co-transformed (the reference's synthetic-mask
            # fixture path; real stored masks are a host-side alternative).
            ei = edge_inds if edge_inds is not None else jnp.zeros((0, 2), jnp.int32)
            masks = jax.vmap(
                lambda inst: render_masks_from_instances(inst, (h, w), ei, ctx.mask_radius)
            )(instances)  # (B, I, H, W)
            valid = jnp.any(~jnp.isnan(instances[..., 0]), axis=-1)  # (B, I)
            out["segmentation"] = generate_foreground_mask(
                masks, valid, ctx.seg_output_stride, ctx.seg_maxpool
            )
            if ctx.model_type == "bottomup_segmentation":
                out["center_heatmap"] = generate_center_heatmap(
                    masks, valid, ctx.center_output_stride, ctx.center_sigma
                )
                offsets, weight = generate_center_offsets(
                    masks, valid, ctx.offsets_output_stride
                )
                out["center_offsets"] = offsets
                out["offsets_mask"] = weight

        elif ctx.model_type == "centered_instance_segmentation":
            from sleap_nn_tpu.data.segmentation_maps import (
                generate_foreground_mask,
                render_masks_from_instances,
            )

            centroids = generate_centroids(instances, ctx.anchor_ind)
            b = image.shape[0]
            sel = batch["center_idx"].astype(jnp.int32)
            rows = jnp.arange(b)
            c = centroids[rows, sel]
            inst = instances[rows, sel]
            crop_size = int(round(ctx.crop_size * ctx.scale))
            crop_size += (-crop_size) % ctx.max_stride
            crops, inst_shifted, _ = generate_crops(image, inst, c, crop_size)
            out["image"] = crops
            out["instances"] = inst_shifted
            ei = edge_inds if edge_inds is not None else jnp.zeros((0, 2), jnp.int32)
            masks = jax.vmap(
                lambda i1: render_masks_from_instances(
                    i1[None], (crop_size, crop_size), ei, ctx.mask_radius
                )
            )(inst_shifted)  # (B, 1, crop, crop)
            valid = jnp.any(~jnp.isnan(inst_shifted[..., 0]), axis=-1, keepdims=True)
            out["segmentation"] = generate_foreground_mask(
                masks, valid, ctx.seg_output_stride, ctx.seg_maxpool
            )

        else:
            raise NotImplementedError(f"Render fn for model type {ctx.model_type}")

        return out

    return fn


# ---------------------------------------------------------------------------
# Host-side datasets
# ---------------------------------------------------------------------------


class BaseDataset:
    """Host-side dataset: index + decode + pad. One item = one frame sample.

    ``cache_mode``: "memory" (decoded frames held in RAM, the default),
    "disk" (frames spilled to ``cache_dir`` as .npy, loaded lazily —
    reference: custom_datasets.py:847 disk-jpg cache), or "none".
    ``use_negative_frames`` adds instance-less frames as negatives with
    all-NaN keypoints (zero targets) and ``sample_weight`` =
    ``negative_loss_weight`` (reference: providers.py:150
    ``process_negative_lf`` + negative-weighted loss).
    """

    # Crop-level datasets (one sample per instance) have no frame-level
    # sample to attach a negative to; they override this to False and
    # negatives are skipped even if requested (the trainer also warns —
    # reference custom_datasets.py:4862-4872).
    supports_negative_frames = True

    def __init__(
        self,
        labels_list: Sequence[Labels],
        ctx: PipelineContext,
        user_instances_only: bool = True,
        cache_imgs: bool = True,
        cache_mode: str = "memory",
        cache_dir=None,
        use_negative_frames: bool = False,
        negative_loss_weight: float = 1.0,
        use_existing_imgs: bool = False,
        cache_workers: int = 0,
        centroid_from_user: bool = False,
    ):
        self.labels_list = list(labels_list)
        self.ctx = ctx
        self.user_instances_only = user_instances_only
        # centroid_source='user' (centroid models only): frames carrying
        # user-annotated centroid records train on THOSE points — encoded as
        # synthetic instances with every node at the centroid, so the device
        # render (generate_centroids: anchor or visible-mean) reproduces the
        # annotated point exactly with zero new device code.
        self.centroid_from_user = centroid_from_user
        self.cache_mode = cache_mode
        self.cache_dir = cache_dir
        self.use_negative_frames = use_negative_frames
        self.negative_loss_weight = negative_loss_weight
        self.samples: List[Dict[str, Any]] = []
        self._build_index(cache_imgs)
        if cache_mode == "disk":
            self._spill_to_disk(use_existing=use_existing_imgs,
                                workers=cache_workers)

    def _track_index(self, labels: Labels) -> dict:
        # Class index = position in labels.tracks (by name order, stable).
        return {id(t): i for i, t in enumerate(labels.tracks)}

    def _build_index(self, cache_imgs: bool):
        for labels in self.labels_list:
            tindex = self._track_index(labels)
            for lf in labels.labeled_frames:
                video_idx = (
                    labels.videos.index(lf.video) if lf.video in labels.videos else 0
                )
                if self.centroid_from_user and lf.user_centroids:
                    sample = self._make_user_centroid_sample(lf, video_idx)
                    if sample is not None:
                        self.samples.append(sample)
                    continue
                sample = process_lf(
                    lf,
                    video_idx=video_idx,
                    max_instances=self.ctx.max_instances,
                    user_instances_only=self.user_instances_only,
                    track_index=tindex,
                )
                if sample is None:
                    from sleap_nn_tpu.io.model import is_negative_frame

                    # Only a truly empty labeled frame is a user-confirmed
                    # negative (reference custom_datasets._collect_negative_frames
                    # reads labels.negative_frames); frames whose instances are
                    # all empty/OOB are annotation errors and just skipped.
                    if (
                        self.use_negative_frames
                        and self.supports_negative_frames
                        and is_negative_frame(lf)
                    ):
                        neg = self._make_negative_sample(lf, video_idx)
                        if neg is not None:
                            self.samples.append(neg)
                    continue
                sample["sample_weight"] = 1.0
                self._append_samples(sample)

    def _make_user_centroid_sample(self, lf, video_idx: int):
        """User-centroid frame -> synthetic instances at the centroid."""
        try:
            img = lf.image
        except Exception:
            return None
        if img.ndim == 2:
            img = img[..., None]
        cents = lf.user_centroids[: self.ctx.max_instances]
        pts = np.full(
            (self.ctx.max_instances, self.ctx.n_nodes, 2), np.nan, np.float32
        )
        for i, c in enumerate(cents):
            pts[i, :, :] = np.asarray(c.point, np.float32)
        return {
            "image": np.ascontiguousarray(img),
            "instances": pts,
            "num_instances": len(cents),
            "frame_idx": int(lf.frame_idx),
            "video_idx": int(video_idx),
            "orig_size": np.array(img.shape[:2], np.float32),
            "track_ids": np.full((self.ctx.max_instances,), -1, np.int32),
            "sample_weight": 1.0,
        }

    def _make_negative_sample(self, lf, video_idx: int):
        """Instance-less frame -> all-NaN keypoints (zero targets)."""
        try:
            img = lf.image
        except Exception:
            return None
        if img.ndim == 2:
            img = img[..., None]
        return {
            "image": np.ascontiguousarray(img),
            "instances": np.full(
                (self.ctx.max_instances, self.ctx.n_nodes, 2), np.nan, np.float32
            ),
            "num_instances": 0,
            "frame_idx": int(lf.frame_idx),
            "video_idx": int(video_idx),
            "orig_size": np.array(img.shape[:2], np.float32),
            "track_ids": np.full((self.ctx.max_instances,), -1, np.int32),
            "sample_weight": float(self.negative_loss_weight),
        }

    def _spill_to_disk(self, use_existing: bool = False, workers: int = 0):
        """Move decoded frames to .npy files; reload lazily in get_sample.

        ``use_existing`` reuses already-spilled files (skip rewriting when a
        matching ``sample_i.npy`` exists — the reference's
        ``use_existing_imgs``); ``workers`` > 1 writes with a thread pool
        (``parallel_caching``/``cache_workers``).
        """
        import tempfile
        from pathlib import Path

        cache_dir = Path(self.cache_dir or tempfile.mkdtemp(prefix="sleap_tpu_cache_"))
        cache_dir.mkdir(parents=True, exist_ok=True)
        self.cache_dir = cache_dir

        def spill_one(i_s):
            i, s = i_s
            path = cache_dir / f"sample_{i}.npy"
            if not (use_existing and path.exists()):
                np.save(path, s["image"])
            s["image_path"] = str(path)
            del s["image"]

        if workers and workers > 1:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=workers) as pool:
                list(pool.map(spill_one, enumerate(self.samples)))
        else:
            for item in enumerate(self.samples):
                spill_one(item)

    def _append_samples(self, sample: Dict[str, Any]):
        self.samples.append(sample)

    def __len__(self) -> int:
        return len(self.samples)

    def get_sample(self, idx: int) -> Dict[str, Any]:
        s = self.samples[idx]
        if "image" not in s and "image_path" in s:
            s = dict(s, image=np.load(s["image_path"]))
        return s

    def make_batch(self, indices: Sequence[int]) -> Dict[str, np.ndarray]:
        samples = [self.get_sample(i) for i in indices]
        batch: Dict[str, np.ndarray] = {}
        for key in ("image", "instances", "track_ids", "orig_size"):
            batch[key] = np.stack([s[key] for s in samples])
        for key in ("frame_idx", "video_idx", "num_instances"):
            batch[key] = np.asarray([s[key] for s in samples], dtype=np.int32)
        if "center_idx" in samples[0]:
            batch["center_idx"] = np.asarray(
                [s["center_idx"] for s in samples], dtype=np.int32
            )
        batch["sample_weight"] = np.asarray(
            [s.get("sample_weight", 1.0) for s in samples], dtype=np.float32
        )
        return batch


class SingleInstanceDataset(BaseDataset):
    """One sample per labeled frame; first instance supervised."""


class CentroidDataset(BaseDataset):
    """One sample per labeled frame; all centroids supervised."""


class BottomUpDataset(BaseDataset):
    """One sample per labeled frame; confmaps + PAFs."""


class BottomUpMultiClassDataset(BaseDataset):
    """One sample per labeled frame; confmaps + class maps."""


class CenteredInstanceDataset(BaseDataset):
    """One sample per (frame, instance): device-side crop at static size."""

    supports_negative_frames = False

    def _append_samples(self, sample: Dict[str, Any]):
        for k in range(sample["num_instances"]):
            s = dict(sample)
            s["center_idx"] = k
            self.samples.append(s)


class TopDownCenteredInstanceMultiClassDataset(CenteredInstanceDataset):
    """Centered-instance samples + class-vector targets from track ids."""


class BottomUpSegmentationDataset(BaseDataset):
    """One sample per frame; fg mask + center heatmap + offsets targets."""


class SemanticSegmentationDataset(BaseDataset):
    """One sample per frame; fg mask target only."""


class CenteredInstanceSegmentationDataset(CenteredInstanceDataset):
    """One sample per (frame, instance); crop fg mask target."""


class TiledDataset:
    """Epoch-seeded tile sampler over any frame-level dataset.

    Parity target: reference custom_datasets.py:3001/:3877/:4305
    (``SingleInstanceTiledDataset`` / ``BottomUpSegmentationTiledDataset`` /
    ``SemanticSegmentationTiledDataset``): each epoch draws
    ``samples_per_frame`` fixed-size tiles per frame — foreground-biased with
    center jitter, deterministic per ``(frame, tile, epoch)`` via
    ``tile_sample_seed`` — and shifts the instances into tile-local coords.
    Host side stays decode+slice only; all target rendering happens in the
    fused device render fn on the (static-shape) tiles, so one wrapper covers
    every model type instead of three subclasses.
    """

    def __init__(self, inner: BaseDataset, tiling, base_seed: int = 0,
                 use_halo: bool = False):
        import math as _math

        from sleap_nn_tpu.data.tiling import generate_tile_grid

        if not tiling.tile_size:
            raise ValueError("tiling.enabled requires tiling.tile_size.")
        self.inner = inner
        self.cfg = tiling
        self.base_seed = base_seed
        self.epoch = 0
        # Halo path (geometric aug enabled): emit tiles with a sqrt(2) halo
        # so the device-side rotation has real context; the render fn crops
        # back (ctx.halo_crop_to). Reference: data/tiling.py:262,322.
        self.use_halo = bool(use_halo)
        self.halo_size = int(_math.ceil(tiling.tile_size * _math.sqrt(2.0)))
        # Sampling strategy (reference data_config.py:109): 'foreground'
        # (train; object-aware biased draws) or 'grid' (val/debug; the
        # deterministic full-coverage grid).
        self.sampling = getattr(tiling, "sampling", "foreground") or "foreground"
        s0 = inner.get_sample(0)
        self._grid = generate_tile_grid(
            s0["image"].shape[:2], tiling.tile_size,
            overlap=tiling.overlap or 0,
            output_stride=1,
            min_overlap_fraction=tiling.min_overlap_fraction,
        )
        if self.sampling == "grid":
            self.samples_per_frame = max(1, len(self._grid))
        elif tiling.samples_per_frame:
            self.samples_per_frame = int(tiling.samples_per_frame)
        else:
            # Default: the deterministic grid count of the first frame.
            self.samples_per_frame = max(1, len(self._grid))
        # full_frame_pass: one extra slot per frame holding the whole frame
        # downscaled to tile_size (global context alongside the tiles).
        self.full_frame_pass = bool(getattr(tiling, "full_frame_pass", False))
        if self.full_frame_pass:
            self.samples_per_frame += 1

    def set_epoch(self, epoch: int):
        self.epoch = int(epoch)

    def __len__(self) -> int:
        return len(self.inner) * self.samples_per_frame

    @property
    def ctx(self):
        return self.inner.ctx

    @property
    def samples(self):
        return self.inner.samples

    def get_sample(self, idx: int) -> Dict[str, Any]:
        from sleap_nn_tpu.data.tiling import (
            draw_tile_origin,
            extract_tile,
            frame_foreground_centers,
            tile_sample_seed,
        )

        frame_i, k = divmod(int(idx), self.samples_per_frame)
        s = self.inner.get_sample(frame_i)
        if self.full_frame_pass and k == self.samples_per_frame - 1:
            return self._full_frame_sample(s)
        key = f"{s['video_idx']}:{s['frame_idx']}"
        rng = np.random.default_rng(
            tile_sample_seed(self.base_seed, key, k, self.epoch)
        )
        if self.sampling == "grid":
            # Deterministic full-coverage grid tile (val/debug sampling).
            origin = tuple(self._grid[k % max(1, len(self._grid))])
        else:
            centers = frame_foreground_centers(s["instances"])
            origin = draw_tile_origin(
                centers,
                s["image"].shape[:2],
                self.cfg.tile_size,
                sample_k=k,
                samples_per_frame=self.samples_per_frame,
                tile_fg_fraction=self.cfg.tile_fg_fraction,
                center_jitter=self.cfg.center_jitter,
                rng=rng,
            )
        if self.use_halo:
            # Shift the origin so the halo is centered on the tile center,
            # then extract at halo size. min_visible gating still uses the
            # pre-aug tile region (handled by extract_tile for the halo
            # rectangle — a superset; post-aug out-of-tile points simply
            # render nothing).
            margin = (self.halo_size - self.cfg.tile_size) // 2
            origin = (origin[0] - margin, origin[1] - margin)
            tile, pts = extract_tile(
                s["image"], s["instances"], origin, self.halo_size,
                min_visible_keypoints=self.cfg.min_visible_keypoints,
            )
        else:
            tile, pts = extract_tile(
                s["image"], s["instances"], origin, self.cfg.tile_size,
                min_visible_keypoints=self.cfg.min_visible_keypoints,
            )
        # Compact visible instances to the front: model types that supervise
        # instance slot 0 (single_instance) must see the tile's surviving
        # instance there, and track_ids stay aligned.
        vis = ~np.isnan(pts[..., 0]).all(axis=-1)
        order = np.concatenate([np.nonzero(vis)[0], np.nonzero(~vis)[0]])
        out = dict(s)
        out["image"] = tile
        out["instances"] = pts[order]
        if "track_ids" in s:
            out["track_ids"] = np.asarray(s["track_ids"])[order]
        out["orig_size"] = np.array([self.cfg.tile_size, self.cfg.tile_size], np.float32)
        out["num_instances"] = int(vis.sum())
        return out

    def _full_frame_sample(self, s: Dict[str, Any]) -> Dict[str, Any]:
        """The frame downscaled to tile_size (the full_frame_pass slot).

        Gives the model global context alongside the local tiles. With the
        halo path active, the resized frame sits centered on a halo-size
        canvas so the post-augmentation crop-back recovers it exactly.
        """
        import cv2

        ts = int(self.cfg.tile_size)
        img = s["image"]
        h, w = img.shape[:2]
        scale = min(ts / h, ts / w)
        nh, nw = max(1, int(round(h * scale))), max(1, int(round(w * scale)))
        resized = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_AREA)
        if resized.ndim == 2:
            resized = resized[..., None]
        canvas_size = self.halo_size if self.use_halo else ts
        off = ((canvas_size - nh) // 2, (canvas_size - nw) // 2)
        canvas = np.zeros((canvas_size, canvas_size, img.shape[2]), img.dtype)
        canvas[off[0]:off[0] + nh, off[1]:off[1] + nw] = resized
        pts = np.asarray(s["instances"], np.float32).copy()
        pts *= scale
        pts[..., 0] += off[1]
        pts[..., 1] += off[0]

        vis = ~np.isnan(pts[..., 0]).all(axis=-1)
        order = np.concatenate([np.nonzero(vis)[0], np.nonzero(~vis)[0]])
        out = dict(s)
        out["image"] = canvas
        out["instances"] = pts[order]
        if "track_ids" in s:
            out["track_ids"] = np.asarray(s["track_ids"])[order]
        out["orig_size"] = np.array([ts, ts], np.float32)
        out["num_instances"] = int(vis.sum())
        return out

    def make_batch(self, indices: Sequence[int]) -> Dict[str, np.ndarray]:
        # Same stacking contract as BaseDataset.make_batch, through get_sample.
        return BaseDataset.make_batch(self, indices)


_DATASET_BY_TYPE = {
    "single_instance": SingleInstanceDataset,
    "centroid": CentroidDataset,
    "centered_instance": CenteredInstanceDataset,
    "bottomup": BottomUpDataset,
    "multi_class_bottomup": BottomUpMultiClassDataset,
    "multi_class_topdown": TopDownCenteredInstanceMultiClassDataset,
    "bottomup_segmentation": BottomUpSegmentationDataset,
    "semantic_segmentation": SemanticSegmentationDataset,
    "centered_instance_segmentation": CenteredInstanceSegmentationDataset,
}


def make_dataset(model_type: str, labels_list, ctx: PipelineContext, **kwargs) -> BaseDataset:
    if model_type not in _DATASET_BY_TYPE:
        raise NotImplementedError(f"No dataset for model type: {model_type}")
    return _DATASET_BY_TYPE[model_type](labels_list, ctx, **kwargs)


def build_pipeline_context(cfg, labels: Labels, model_type: str) -> PipelineContext:
    """Assemble static pipeline params from a TrainingJobConfig + labels.

    Mirrors the config inference in reference ModelTrainer.setup_config
    (model_trainer.py:479-770): crop size, sigma/strides per head leaf,
    max_stride from backbone, symmetric node pairs from the skeleton.
    """
    from sleap_nn_tpu.config.utils import get_backbone_config, get_head_config
    from sleap_nn_tpu.data.instance_cropping import (
        compute_augmentation_padding,
        find_instance_crop_size,
    )

    pre = cfg.data_config.preprocessing
    backbone = get_backbone_config(cfg)
    head = get_head_config(cfg)
    skel = labels.skeleton
    n_nodes = len(skel.node_names)

    kw: Dict[str, Any] = dict(
        model_type=model_type,
        n_nodes=n_nodes,
        max_instances=get_max_instances(
            labels, include_user_centroids=(model_type == "centroid")
        ),
        ensure_rgb=pre.ensure_rgb,
        ensure_grayscale=pre.ensure_grayscale,
        max_height=pre.max_height,
        max_width=pre.max_width,
        scale=pre.scale,
        crop_size=pre.crop_size,
        max_stride=backbone.max_stride,
        symmetric_inds=tuple(skel.symmetry_inds),
        use_augmentations=cfg.data_config.use_augmentations_train,
    )
    aug = cfg.data_config.augmentation_config
    if aug is not None:
        kw["intensity"] = _aug_kwargs(aug.intensity) if aug.intensity else None
        kw["geometric"] = _aug_kwargs(aug.geometric) if aug.geometric else None
        if (
            kw["geometric"]
            and kw["geometric"].get("flip_p", 0)
            and not kw["symmetric_inds"]
            and kw["use_augmentations"]
        ):
            # Flip without symmetry metadata silently corrupts left/right
            # keypoints (the flipped "left ear" stays labeled left). The
            # aug still runs — mirror-symmetric skeletons are valid — but
            # the user should hear about it (reference custom_datasets
            # flip-symmetry warning).
            print(
                "WARNING: flip augmentation is enabled but the skeleton "
                "defines no symmetries; left/right nodes will NOT be "
                "swapped on flipped frames."
            )

    cm = getattr(head, "confmaps", None)
    if cm is not None:
        kw["sigma"] = cm.sigma
        kw["output_stride"] = cm.output_stride
        anchor = getattr(cm, "anchor_part", None)
        if anchor is not None:
            kw["anchor_ind"] = skel.node_names.index(anchor)
    pafs = getattr(head, "pafs", None)
    if pafs is not None:
        kw["pafs_sigma"] = pafs.sigma
        kw["pafs_output_stride"] = pafs.output_stride
        kw["edge_inds"] = tuple(skel.edge_inds)
    cmaps = getattr(head, "class_maps", None)
    if cmaps is not None:
        kw["class_maps_sigma"] = cmaps.sigma
        kw["class_maps_output_stride"] = cmaps.output_stride
        kw["n_classes"] = len(cmaps.classes or labels.tracks)
    cvec = getattr(head, "class_vectors", None)
    if cvec is not None:
        kw["n_classes"] = len(cvec.classes or labels.tracks)

    seg = getattr(head, "segmentation", None)
    if seg is not None:
        kw["seg_output_stride"] = seg.output_stride
        kw["seg_maxpool"] = bool(getattr(seg, "target_maxpool", False))
        kw["edge_inds"] = tuple(skel.edge_inds)
        anchor = getattr(seg, "anchor_part", None)
        if anchor:
            kw["anchor_ind"] = skel.node_names.index(anchor)
    center = getattr(head, "center", None)
    if center is not None:
        kw["center_sigma"] = center.sigma
        kw["center_output_stride"] = center.output_stride
    offsets = getattr(head, "offsets", None)
    if offsets is not None:
        kw["offsets_output_stride"] = offsets.output_stride

    if model_type in (
        "centered_instance", "multi_class_topdown", "centered_instance_segmentation"
    ) and not kw["crop_size"]:
        rot_max, scale_max = 0.0, 1.0
        if aug is not None and aug.geometric is not None:
            rot_max = max(abs(aug.geometric.rotation_min), abs(aug.geometric.rotation_max))
            scale_max = aug.geometric.scale_max
        padding = compute_augmentation_padding(
            find_instance_crop_size(labels), rot_max, scale_max
        ) if cfg.data_config.use_augmentations_train else 0
        # crop_padding (reference data_config.py:161): extra pixels around
        # the instance bbox when auto-computing the crop size.
        padding += int(pre.crop_padding or 0)
        kw["crop_size"] = find_instance_crop_size(
            labels,
            padding=padding,
            maximum_stride=backbone.max_stride,
            min_crop_size=pre.min_crop_size,
        )
    return PipelineContext(**kw)


class Loader:
    """Shuffling batch loader with background-thread batch prefetch.

    ``__iter__`` returns a :class:`PrefetchIterator` wrapping the batch
    generator, so host-side slicing/collation for batch N+1 overlaps the
    device's step N (the jitted train step dispatches asynchronously).
    Same role as the reference's DataLoader workers
    (reference: data/custom_datasets.py get_train_val dataloaders).
    """

    def __init__(
        self,
        dataset: BaseDataset,
        batch_size: int,
        shuffle: bool = False,
        seed: int = 0,
        drop_last: bool = False,
        pad_last: bool = True,
        prefetch: int = 2,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.pad_last = pad_last
        self.prefetch = prefetch
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(epoch)

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self):
        from sleap_nn_tpu.data.prefetch import PrefetchIterator

        if self.prefetch > 0:
            return PrefetchIterator(self._gen(), prefetch=self.prefetch)
        return self._gen()

    def _gen(self):
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(order)
        for start in range(0, n, self.batch_size):
            idxs = order[start : start + self.batch_size].tolist()
            if len(idxs) < self.batch_size:
                if self.drop_last:
                    return
                if self.pad_last:
                    # Pad with wrap-around repeats; ``batch_mask`` marks real rows
                    # so losses/metrics can ignore the padding (keeps jit shapes
                    # static — one compile for all batches).
                    pad = self.batch_size - len(idxs)
                    idxs = idxs + order[np.arange(pad) % n].tolist()
                    batch = self.dataset.make_batch(idxs)
                    mask = np.zeros(self.batch_size, dtype=bool)
                    mask[: self.batch_size - pad] = True
                    batch["batch_mask"] = mask
                    yield batch
                    return
            batch = self.dataset.make_batch(idxs)
            batch["batch_mask"] = np.ones(len(idxs), dtype=bool)
            yield batch
