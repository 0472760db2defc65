"""Predictor: orchestrates providers -> layers -> sio Labels.

Parity target: reference sleap_nn/inference/predictor.py:829-2325
(``Predictor.from_model_paths``, ``_select_layer``, ``predict``,
``to_labels``) for the single_instance / centroid / topdown / bottomup
model families.
"""

from __future__ import annotations

import logging
import os
import math
import threading
import time
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Union

import numpy as np

from sleap_nn_tpu.config.utils import get_head_config
from sleap_nn_tpu.inference.backends import JaxBackend
from sleap_nn_tpu.inference.layers import (
    BottomUpLayer,
    CenteredInstanceLayer,
    CentroidLayer,
    PostprocessConfig,
    PreprocessConfig,
    SingleInstanceLayer,
    TopDownLayer,
)
from sleap_nn_tpu.inference.loaders import LoadedModel, load_model
from sleap_nn_tpu.inference.paf_grouping import PAFScorer
from sleap_nn_tpu.inference.providers import Batch, LabelsProvider, VideoProvider
from sleap_nn_tpu.io.model import (
    LabeledFrame,
    Labels,
    PredictedInstance,
    Skeleton,
)
from sleap_nn_tpu.io.video import Video

# Library-wide logger (reference uses loguru module-wide; stdlib logging keeps
# the zero-dependency contract). The CLI and any embedding app configure the
# handler/level; by default lines propagate to the root logger.
logger = logging.getLogger("sleap_nn_tpu")

# Ship only the valid rows of a host-padded tail batch and rebuild the pad
# on device (see the dispatch loop in Predictor.predict). Kill-switch:
# SLEAP_NN_TPU_DEVICE_PAD_TAIL=0 restores full-batch host sends.
_DEVICE_PAD_TAIL = os.environ.get("SLEAP_NN_TPU_DEVICE_PAD_TAIL", "1") != "0"


def rgb_to_gray_uint8(frames: np.ndarray) -> np.ndarray:
    """ITU-601 luma on a uint8 batch, (B, H, W, 3) -> (B, H, W, 1).

    cv2's SIMD cvtColor is ~100x faster than numpy float broadcasting on a
    single-core host (the luma weights match the in-model conversion).
    """
    try:
        import cv2

        out = np.empty(frames.shape[:-1] + (1,), dtype=np.uint8)
        for i in range(frames.shape[0]):
            out[i, ..., 0] = cv2.cvtColor(frames[i], cv2.COLOR_RGB2GRAY)
        return out
    except ImportError:
        luma = np.array([0.2989, 0.587, 0.114], dtype=np.float32)
        return (frames.astype(np.float32) @ luma).astype(np.uint8)[..., None]


def _pre_config(loaded: LoadedModel) -> PreprocessConfig:
    pre = loaded.config.data_config.preprocessing
    backbone = loaded.backbone_config
    # A 1-channel model converts RGB inputs to grayscale in its forward
    # anyway (identical ITU-601 luma weights); declaring it here lets the
    # predictor convert on HOST before transfer — 3x less H2D traffic, the
    # dominant cost on narrow links.
    ensure_grayscale = pre.ensure_grayscale
    if getattr(backbone, "in_channels", None) == 1 and not pre.ensure_rgb:
        ensure_grayscale = True
    return PreprocessConfig(
        ensure_rgb=pre.ensure_rgb,
        ensure_grayscale=ensure_grayscale,
        max_height=pre.max_height,
        max_width=pre.max_width,
        scale=pre.scale,
        max_stride=backbone.max_stride,
    )


def _swap_param_subtrees(loaded, backbone_ckpt_path, head_ckpt_path):
    """Replace backbone / head param subtrees from other checkpoints in place.

    The flax param tree is ``{"params": {"backbone": ..., <head convs>...}}``;
    "head" means every non-backbone subtree. Shapes must match — a mismatch
    raises instead of silently mixing incompatible weights.
    """
    import jax

    def subtree_shapes(t):
        return jax.tree_util.tree_map(lambda a: tuple(a.shape), t)

    for src_path, which in ((backbone_ckpt_path, "backbone"), (head_ckpt_path, "head")):
        if src_path is None:
            continue
        src = load_model(src_path)
        for m in loaded:
            dst_p = dict(m.params["params"])
            src_p = src.params["params"]
            keys = (
                ["backbone"] if which == "backbone"
                else [k for k in dst_p if k != "backbone"]
            )
            for k in keys:
                if k not in src_p:
                    raise ValueError(
                        f"{which}_ckpt_path: source checkpoint has no '{k}' "
                        f"subtree (has: {sorted(src_p)})."
                    )
                if subtree_shapes(dst_p[k]) != subtree_shapes(src_p[k]):
                    raise ValueError(
                        f"{which}_ckpt_path: '{k}' parameter shapes do not "
                        "match the target model."
                    )
                dst_p[k] = src_p[k]
            m.params = {**m.params, "params": dst_p}


class Predictor:
    """Built from one or two model dirs; runs batched inference to Labels."""

    def __init__(
        self,
        layer,
        model_type: str,
        skeleton: Skeleton,
        models: Sequence[LoadedModel],
        batch_size: int = 4,
    ):
        self.layer = layer
        self.model_type = model_type
        self.skeleton = skeleton
        self.models = list(models)
        self.batch_size = batch_size
        # When the model consumes grayscale, convert on HOST before transfer:
        # 3x less H2D traffic (the dominant cost on narrow links; still a win
        # on PCIe/ICI).
        pre = getattr(layer, "centroid_layer", layer)
        pre = getattr(pre, "pre", None)
        self._host_grayscale = bool(pre and pre.ensure_grayscale)
        # Set by from_model_paths(host_resize=True): (scale, max_h, max_w)
        # resize moved off-device; coords are re-lifted in _undo_host_resize.
        self._host_transform = None
        # Set by from_model_paths(data_parallel=True): NamedSharding that
        # splits each batch's leading axis over the local device mesh.
        self._batch_sharding = None

    # -- construction ---------------------------------------------------------
    @classmethod
    def from_model_paths(cls, model_paths, *args, **kwargs):
        """Build a predictor from 1-2 model dirs (see ``_build_from_model_paths``
        for the full parameter list; positional args keep working). Remembers
        its construction arguments so per-call postprocess overrides
        (``_scoped_postprocess_layer``, reference predictor.py:2198) can
        rebuild an independent scoped layer without mutating this
        predictor."""
        if args:
            # Callers written against the explicit signature may pass
            # options positionally; map them onto parameter names so the
            # scoped-replay _ctor record stays keyword-only.
            import inspect

            names = list(inspect.signature(
                cls._build_from_model_paths).parameters)[1:]
            kwargs = {**dict(zip(names, args)), **kwargs}
        p = cls._build_from_model_paths(model_paths, **kwargs)
        p._ctor = (list(model_paths), dict(kwargs))
        return p

    def _scoped_postprocess_layer(self, **overrides):
        """An independent layer copy with the given postprocess overrides.

        Parity target: reference predictor.py:2198 — per-call ``return_*``
        flags apply to a scoped copy so concurrent ``predict`` calls on the
        same predictor cannot clobber each other; with no overrides the real
        layer is returned as-is. In this framework the return flags are baked
        into the traced program, so the scoped copy is built by replaying the
        construction with the overridden flags (compile cost only when used).
        """
        overrides = {k: v for k, v in overrides.items() if v is not None}
        ctor = getattr(self, "_ctor", None)
        current = dict(ctor[1]) if ctor else {}
        overrides = {
            k: v for k, v in overrides.items()
            if bool(v) != bool(current.get(k, False))
        }
        if not overrides:
            return self.layer
        if ctor is None:
            raise ValueError(
                "Per-call postprocess overrides need a predictor built via "
                "from_model_paths (exported predictors bake postprocessing "
                "into the graph)."
            )
        paths, kwargs = ctor
        return type(self)._build_from_model_paths(
            paths, **{**kwargs, **overrides}, _spinup_log=False
        ).layer

    @classmethod
    def _build_from_model_paths(
        cls,
        model_paths: Sequence[Union[str, Path]],
        peak_threshold: float = 0.2,
        refinement: str = "integral",
        integral_patch_size: int = 5,
        max_instances: Optional[int] = None,
        batch_size: int = 4,
        use_bf16: bool = False,
        # Space-to-depth packed execution depth: None = auto (on for narrow
        # UNets on TPU, see inference/backends.py:choose_packed_levels),
        # False/0 = off, True = auto depth, int = exact level count.
        packed_level0=None,
        max_peaks: int = 200,
        k_per_node: int = 20,
        min_line_scores: float = 0.25,
        crop_size: Optional[int] = None,
        return_confmaps: bool = False,
        return_paf_graph: bool = False,
        filters=None,
        paf_workers: int = 0,
        merge_fragments: bool = False,
        merge_method: str = "greedy",
        min_mask_area: int = 0,
        fg_threshold: float = 0.5,
        centroid_peak_threshold: Optional[float] = None,
        anchor_part: Optional[str] = None,
        host_resize: bool = False,
        centroid_only: bool = False,
        # Preprocess overrides (reference cli.py:2408-2420): trump the
        # values stored in each model's training config.
        input_scale: Optional[float] = None,
        max_height: Optional[int] = None,
        max_width: Optional[int] = None,
        ensure_rgb: Optional[bool] = None,
        ensure_grayscale: Optional[bool] = None,
        # PAF grouping knobs (reference cli.py:2441-2445).
        max_edge_length_ratio: float = 0.25,
        dist_penalty_weight: float = 1.0,
        n_points: int = 10,
        min_instance_peaks: float = 0,
        # Segmentation knobs (reference cli.py:2467-2611).
        center_nms_kernel: int = 3,
        distance_gate_alpha: Optional[float] = None,
        mask_cleanup: bool = True,
        mask_cleanup_radius: int = 0,
        merge_dilate: int = 1,
        merge_w_valley: float = 1.0,
        merge_w_offset: float = 0.25,
        merge_thresholds: Sequence[float] = (0.85, 0.6, 0.4),
        full_res_masks: bool = False,
        mask_output: str = "mask",
        polygon_epsilon: float = 0.01,
        backbone_ckpt_path: Optional[Union[str, Path]] = None,
        head_ckpt_path: Optional[Union[str, Path]] = None,
        # Multi-device SPMD inference: shard each batch's leading axis over
        # a 1-D mesh of ALL local devices (params replicated; XLA inserts
        # the collectives). batch_size must divide the device count.
        data_parallel: bool = False,
        # Internal: scoped-override replays rebuild the layer mid-run and
        # must not emit a second spin-up header (#610 one-header contract).
        _spinup_log: bool = True,
    ) -> "Predictor":
        loaded = [load_model(p) for p in model_paths]
        if backbone_ckpt_path or head_ckpt_path:
            # Weight surgery (reference cli.py:2397-2407): swap the backbone
            # and/or head param subtrees with those of another checkpoint.
            _swap_param_subtrees(loaded, backbone_ckpt_path, head_ckpt_path)
        if any(v is not None for v in
               (input_scale, max_height, max_width, ensure_rgb, ensure_grayscale)):
            for m in loaded:
                p = m.config.data_config.preprocessing
                if input_scale is not None:
                    p.scale = float(input_scale)
                if max_height is not None:
                    p.max_height = int(max_height)
                if max_width is not None:
                    p.max_width = int(max_width)
                if ensure_rgb is not None:
                    p.ensure_rgb = bool(ensure_rgb)
                if ensure_grayscale is not None:
                    p.ensure_grayscale = bool(ensure_grayscale)
        if centroid_only:
            # Stage-1-only inference from a topdown pair (reference
            # cli.py --centroid-only): keep just the centroid model.
            centroids = [m for m in loaded if m.model_type == "centroid"]
            if not centroids:
                raise ValueError("--centroid-only requires a centroid model.")
            loaded = centroids
        by_type: Dict[str, LoadedModel] = {}
        for m in loaded:
            if m.model_type in by_type:
                # Reference load_model_assets rejects duplicates (issue #582);
                # a dict build would silently drop all but the last one.
                raise ValueError(
                    f"Duplicate model type {m.model_type!r} in model_paths; "
                    "pass at most one checkpoint per model type."
                )
            by_type[m.model_type] = m
        types = set(by_type)

        host_transform = None
        if host_resize:
            # Move sizematch+scale resizing to the HOST so the device link
            # carries the downscaled frames (4x less payload at scale=0.5).
            # Only keypoint families on full frames qualify; the stage pres
            # must agree for two-model composites. cv2's bilinear differs
            # from jax.image.resize antialiasing at the last bit — opt-in
            # fast path, not the parity path.
            qualifying = types in (
                {"single_instance"},
                {"centroid"},
                {"centroid", "centered_instance"},
                {"bottomup"},
                {"multi_class_bottomup"},
                {"centroid", "multi_class_topdown"},
            )
            pres = [m.config.data_config.preprocessing for m in loaded]
            if qualifying and pres and all(
                (p.scale, p.max_height, p.max_width)
                == (pres[0].scale, pres[0].max_height, pres[0].max_width)
                for p in pres
            ) and (pres[0].scale != 1.0 or pres[0].max_height or pres[0].max_width):
                host_transform = (
                    float(pres[0].scale or 1.0),
                    pres[0].max_height,
                    pres[0].max_width,
                )
                for m in loaded:
                    # Crop sizes are defined in the preprocessed space; keep
                    # the original scale available for that computation.
                    m.host_scale = float(
                        m.config.data_config.preprocessing.scale or 1.0
                    )
                    m.config.data_config.preprocessing.scale = 1.0
                    m.config.data_config.preprocessing.max_height = None
                    m.config.data_config.preprocessing.max_width = None

        def post_for(m: LoadedModel) -> PostprocessConfig:
            return PostprocessConfig(
                peak_threshold=peak_threshold,
                refinement=refinement,
                integral_patch_size=integral_patch_size,
                max_instances=max_instances,
                max_peaks=max_peaks,
                k_per_node=k_per_node,
                min_line_scores=min_line_scores,
                return_confmaps=return_confmaps,
                return_paf_graph=return_paf_graph,
            )

        made_backends: List[JaxBackend] = []

        def backend_for(m: LoadedModel) -> JaxBackend:
            b = JaxBackend(m.model, m.params, use_bf16=use_bf16,
                           packed_level0=packed_level0)
            made_backends.append(b)
            return b

        def skeleton_for(m: LoadedModel) -> Skeleton:
            return Skeleton(nodes=m.skeleton_nodes, edges=m.skeleton_edges)

        _cls = cls

        def cls(*args, **kwargs_):  # attach filters to every branch's predictor
            p = _cls(*args, **kwargs_)
            p.filters = filters
            p.paf_workers = paf_workers
            p._host_transform = host_transform
            p.mask_output = mask_output
            p.polygon_epsilon = polygon_epsilon
            if data_parallel:
                # SPMD batch sharding: one jitted program spans every local
                # device — params replicated, batch leading axis split, XLA
                # inserts any cross-device collectives. Same program shape
                # the trainer uses (parallel/mesh.py); on real hardware the
                # collectives ride ICI.
                import jax

                from sleap_nn_tpu.parallel.mesh import (
                    get_mesh,
                    replicate,
                    shard_batch_spec,
                )

                mesh = get_mesh()
                n_dev = mesh.devices.size
                if p.batch_size % n_dev != 0:
                    raise ValueError(
                        f"data_parallel inference needs batch_size divisible "
                        f"by the device count: batch_size={p.batch_size}, "
                        f"devices={n_dev}."
                    )
                rep = replicate(mesh)
                for b in made_backends:
                    b.params = jax.device_put(b.params, rep)
                p._mesh = mesh
                p._batch_sharding = shard_batch_spec(mesh)
            # Spin-up header (reference predictor.py:1119, issue #610 PR-B):
            # one legible line recording WHAT model runs on WHAT, so a run
            # never starts in silence.
            import jax

            from sleap_nn_tpu.config.utils import get_backbone_type_from_cfg

            if not _spinup_log:
                return p
            skeleton = args[2] if len(args) > 2 else kwargs_.get("skeleton")
            n_nodes = len(skeleton.nodes) if skeleton is not None else None
            spec = [
                f"type={'+'.join(m.model_type for m in loaded)}",
                f"backbone={get_backbone_type_from_cfg(loaded[0].config)}",
                f"nodes={n_nodes}",
                f"device={jax.default_backend()}",
                f"batch_size={batch_size}",
                f"peak_threshold={peak_threshold}",
                f"max_instances={max_instances}",
                f"integral_refinement={refinement}",
                f"paf_workers={paf_workers}",
            ]
            seg_types = {m.model_type for m in loaded if "segmentation" in m.model_type}
            if seg_types:
                spec += [
                    f"fg_threshold={fg_threshold}",
                    f"min_mask_area={min_mask_area}",
                    f"merge_fragments={merge_fragments}",
                    f"full_res_masks={full_res_masks}",
                    f"mask_output={mask_output}",
                ]
            logger.info("Loaded inference model | " + " | ".join(spec))
            return p

        if types == {"single_instance"}:
            m = by_type["single_instance"]
            head = get_head_config(m.config).confmaps
            layer = SingleInstanceLayer(
                backend_for(m), _pre_config(m), post_for(m), output_stride=head.output_stride
            )
            return cls(layer, "single_instance", skeleton_for(m), loaded, batch_size)

        if types == {"centroid"}:
            m = by_type["centroid"]
            head = get_head_config(m.config).confmaps
            layer = CentroidLayer(
                backend_for(m), _pre_config(m), post_for(m), output_stride=head.output_stride
            )
            return cls(layer, "centroid", Skeleton(nodes=["centroid"]), loaded, batch_size)

        if types == {"centroid", "centered_instance"}:
            mc = by_type["centroid"]
            mi = by_type["centered_instance"]
            c_head = get_head_config(mc.config).confmaps
            i_head = get_head_config(mi.config).confmaps
            post_c = post_for(mc)
            post_c.max_instances = max_instances or 20
            if centroid_peak_threshold is not None:
                post_c.peak_threshold = centroid_peak_threshold
            centroid_layer = CentroidLayer(
                backend_for(mc), _pre_config(mc), post_c, output_stride=c_head.output_stride
            )
            inst_pre = _pre_config(mi)
            cs = crop_size or mi.config.data_config.preprocessing.crop_size
            if cs is None:
                raise ValueError("crop_size not set in centered-instance config.")
            cs = int(round(cs * getattr(mi, "host_scale", inst_pre.scale)))
            cs += (-cs) % inst_pre.max_stride
            instance_layer = CenteredInstanceLayer(
                backend_for(mi), inst_pre, post_for(mi), output_stride=i_head.output_stride
            )
            layer = TopDownLayer(
                centroid_layer,
                instance_layer,
                max_instances=max_instances or 20,
                crop_size=cs,
            )
            return cls(layer, "topdown", skeleton_for(mi), loaded, batch_size)

        if types == {"centered_instance"}:
            from sleap_nn_tpu.inference.layers import GTCentroidTopDownLayer

            mi = by_type["centered_instance"]
            i_head = get_head_config(mi.config).confmaps
            inst_pre = _pre_config(mi)
            cs = crop_size or mi.config.data_config.preprocessing.crop_size
            if cs is None:
                raise ValueError("crop_size not set in centered-instance config.")
            cs = int(round(cs * getattr(mi, "host_scale", inst_pre.scale)))
            cs += (-cs) % inst_pre.max_stride
            instance_layer = CenteredInstanceLayer(
                backend_for(mi), inst_pre, post_for(mi), output_stride=i_head.output_stride
            )
            layer = GTCentroidTopDownLayer(
                instance_layer, max_instances=max_instances or 20, crop_size=cs
            )
            if anchor_part is not None:
                nodes = list(mi.skeleton_nodes)
                if anchor_part not in nodes:
                    raise ValueError(
                        f"anchor_part {anchor_part!r} is not a skeleton node; "
                        f"nodes: {nodes}."
                    )
                layer.anchor_ind = nodes.index(anchor_part)
            return cls(layer, "topdown", skeleton_for(mi), loaded, batch_size)

        if types == {"multi_class_bottomup"}:
            from sleap_nn_tpu.inference.layers import BottomUpMultiClassLayer

            m = by_type["multi_class_bottomup"]
            head = get_head_config(m.config)
            layer = BottomUpMultiClassLayer(
                backend_for(m),
                _pre_config(m),
                post_for(m),
                n_nodes=len(head.confmaps.part_names),
                n_classes=len(head.class_maps.classes),
                cm_output_stride=head.confmaps.output_stride,
                class_maps_output_stride=head.class_maps.output_stride,
            )
            p = cls(layer, "multi_class_bottomup", skeleton_for(m), loaded, batch_size)
            p.class_names = list(head.class_maps.classes)
            return p

        if types == {"centroid", "multi_class_topdown"}:
            from sleap_nn_tpu.inference.layers import TopDownMultiClassLayer

            mc = by_type["centroid"]
            mi = by_type["multi_class_topdown"]
            c_head = get_head_config(mc.config).confmaps
            i_head_cfg = get_head_config(mi.config)
            post_c = post_for(mc)
            post_c.max_instances = max_instances or 20
            if centroid_peak_threshold is not None:
                post_c.peak_threshold = centroid_peak_threshold
            centroid_layer = CentroidLayer(
                backend_for(mc), _pre_config(mc), post_c, output_stride=c_head.output_stride
            )
            inst_pre = _pre_config(mi)
            cs = crop_size or mi.config.data_config.preprocessing.crop_size
            if cs is None:
                raise ValueError("crop_size not set in multi_class_topdown config.")
            cs = int(round(cs * getattr(mi, "host_scale", inst_pre.scale)))
            cs += (-cs) % inst_pre.max_stride
            instance_layer = CenteredInstanceLayer(
                backend_for(mi), inst_pre, post_for(mi),
                output_stride=i_head_cfg.confmaps.output_stride,
            )
            layer = TopDownMultiClassLayer(
                centroid_layer,
                instance_layer,
                max_instances=max_instances or 20,
                crop_size=cs,
                n_classes=len(i_head_cfg.class_vectors.classes),
            )
            p = cls(layer, "multi_class_topdown", skeleton_for(mi), loaded, batch_size)
            p.class_names = list(i_head_cfg.class_vectors.classes)
            return p

        if types == {"bottomup"}:
            m = by_type["bottomup"]
            head = get_head_config(m.config)
            scorer = PAFScorer(
                part_names=head.confmaps.part_names,
                edges=[tuple(e) for e in head.pafs.edges],
                pafs_stride=head.pafs.output_stride,
                max_edge_length_ratio=max_edge_length_ratio,
                dist_penalty_weight=dist_penalty_weight,
                n_points=n_points,
                min_instance_peaks=min_instance_peaks,
                min_line_scores=min_line_scores,
                k_per_node=k_per_node,
            )
            layer = BottomUpLayer(
                backend_for(m),
                _pre_config(m),
                post_for(m),
                paf_scorer=scorer,
                cm_output_stride=head.confmaps.output_stride,
            )
            return cls(layer, "bottomup", skeleton_for(m), loaded, batch_size)

        if types == {"centroid", "centered_instance_segmentation"}:
            from sleap_nn_tpu.inference.segmentation import TopDownSegmentationLayer

            mc = by_type["centroid"]
            ms = by_type["centered_instance_segmentation"]
            c_head = get_head_config(mc.config).confmaps
            s_head = get_head_config(ms.config).segmentation
            post_c = post_for(mc)
            post_c.max_instances = max_instances or 20
            if centroid_peak_threshold is not None:
                post_c.peak_threshold = centroid_peak_threshold
            centroid_layer = CentroidLayer(
                backend_for(mc), _pre_config(mc), post_c, output_stride=c_head.output_stride
            )
            seg_pre = _pre_config(ms)
            cs = crop_size or ms.config.data_config.preprocessing.crop_size
            if cs is None:
                raise ValueError(
                    "crop_size not set in centered_instance_segmentation config."
                )
            cs = int(round(cs * getattr(ms, "host_scale", seg_pre.scale)))
            cs += (-cs) % seg_pre.max_stride
            layer = TopDownSegmentationLayer(
                centroid_layer,
                backend_for(ms),
                seg_pre,
                seg_output_stride=s_head.output_stride,
                fg_threshold=fg_threshold,
                max_instances=max_instances or 20,
                crop_size=cs,
            )
            return cls(layer, "topdown_segmentation", Skeleton(nodes=["centroid"]),
                       loaded, batch_size)

        if types == {"bottomup_segmentation"}:
            from sleap_nn_tpu.inference.segmentation import BottomUpSegmentationLayer

            m = by_type["bottomup_segmentation"]
            head = get_head_config(m.config)
            layer = BottomUpSegmentationLayer(
                backend_for(m),
                _pre_config(m),
                post_for(m),
                seg_output_stride=head.segmentation.output_stride,
                center_output_stride=head.center.output_stride,
                offsets_output_stride=head.offsets.output_stride,
                max_instances=max_instances or 50,
                min_mask_area=min_mask_area,
                merge_fragments=merge_fragments,
                merge_method=merge_method,
                fg_threshold=fg_threshold,
                center_nms_kernel=center_nms_kernel,
                distance_gate_alpha=distance_gate_alpha,
                mask_cleanup=mask_cleanup,
                mask_cleanup_radius=mask_cleanup_radius,
                merge_dilate=merge_dilate,
                merge_w_valley=merge_w_valley,
                merge_w_offset=merge_w_offset,
                merge_thresholds=merge_thresholds,
                full_res_masks=full_res_masks,
            )
            return cls(layer, "bottomup_segmentation", Skeleton(nodes=["centroid"]), loaded, batch_size)

        if types == {"semantic_segmentation"}:
            from sleap_nn_tpu.inference.segmentation import SemanticSegmentationLayer

            m = by_type["semantic_segmentation"]
            head = get_head_config(m.config)
            layer = SemanticSegmentationLayer(
                backend_for(m), _pre_config(m), post_for(m),
                seg_output_stride=head.segmentation.output_stride,
                fg_threshold=fg_threshold,
                full_res_masks=full_res_masks,
            )
            return cls(layer, "semantic_segmentation", Skeleton(nodes=["fg"]), loaded, batch_size)

        raise ValueError(f"Unsupported model type combination: {sorted(types)}")

    # -- prediction -----------------------------------------------------------
    def _apply_host_resize(self, frames: np.ndarray):
        """Sizematch+scale on host (cv2); returns (frames, coord factor).

        Mirrors the device-side apply_sizematcher + resize_image rounding
        (data/resizing.py) so coordinates lift back with one divide.
        """
        import cv2

        scale, mh, mw = self._host_transform
        b, h, w, c = frames.shape
        eff = 1.0
        if (mh or mw) and (h, w) != (mh or h, mw or w):
            # Single-dim caps behave like the device apply_sizematcher
            # (`max_height or h`): an unset dim constrains nothing.
            eff = min((mh or h) / h, (mw or w) / w)
        th, tw = int(round(h * eff)), int(round(w * eff))
        th2, tw2 = int(round(th * scale)), int(round(tw * scale))
        if (th2, tw2) == (h, w):
            return frames, 1.0
        out = np.empty((b, th2, tw2, c), dtype=frames.dtype)
        for i in range(b):
            r = cv2.resize(frames[i], (tw2, th2), interpolation=cv2.INTER_AREA)
            out[i] = r[..., None] if r.ndim == 2 else r
        return out, eff * scale

    @staticmethod
    def _lift_host_coords(out: Dict, factor: float) -> Dict:
        if factor == 1.0:
            return out
        for key in ("pred_keypoints", "pred_centroids"):
            val = out.get(key)
            if val is None:
                continue
            if isinstance(val, list):
                out[key] = [np.asarray(v) / factor for v in val]
            else:
                out[key] = np.asarray(val) / factor
        graphs = out.get("pred_paf_graph")
        if graphs is not None:
            # Debug graph peaks live in the same coord space as the
            # instances they explain — lift them identically.
            out["pred_paf_graph"] = [
                (np.asarray(peaks) / factor, e, ep, ls)
                for peaks, e, ep, ls in graphs
            ]
        return out

    # -- run logging (reference predictor.py:1282-1359, issue #610 PR-B) -----
    @staticmethod
    def _describe_source(source: Any) -> str:
        """Best-effort human label for a prediction source."""
        if isinstance(source, (str, Path)):
            return str(source)
        filename = getattr(source, "filename", None)
        if filename:
            return str(filename)
        return type(source).__name__

    def _log_inference_start(self, source: Any, provider) -> None:
        """One-line spin-up record of the source being processed."""
        n_frames = getattr(provider, "n_frames", None)
        if n_frames is None:
            lfs = getattr(provider, "lfs", None)
            n_frames = len(lfs) if lfs is not None else None
        videos = (
            provider.labels.videos if isinstance(provider, LabelsProvider)
            else [provider.video] if isinstance(provider, VideoProvider)
            else []
        )
        parts = [
            f"source={self._describe_source(source)}",
            f"frames={n_frames if n_frames is not None else '?'}",
            f"videos={len(videos) if videos else 1}",
        ]
        vid = videos[0] if videos else None
        shape = getattr(vid, "shape", None)
        if shape is not None and len(shape) == 4:
            parts.append(f"shape={shape[1]}x{shape[2]}x{shape[3]}")
        fps = getattr(vid, "fps", None)
        if fps:
            parts.append(f"fps={fps}")
        parts.append(f"tracking={bool(getattr(self, 'tracking_active', False))}")
        logger.info("Starting inference | " + " | ".join(parts))

    def _log_filter_config(self) -> None:
        """Per-filter confirmation lines (reference predictor.py:1306).

        Confirms each active post-inference filter with its values — silent
        filter no-ops have bitten the reference before (#715/#716/#717).
        """
        cfg = getattr(self, "filters", None)
        if cfg is None or not cfg.enabled():
            return
        if cfg.min_node_count is not None or cfg.min_visible_node_fraction is not None:
            logger.info(
                "Filtering instances by node count: "
                f"min_node_count={cfg.min_node_count}, "
                f"min_visible_node_fraction={cfg.min_visible_node_fraction}"
            )
        if cfg.min_node_confidence is not None or cfg.min_mean_node_score is not None \
                or cfg.min_instance_score is not None:
            logger.info(
                "Filtering instances by confidence: "
                f"min_node_confidence={cfg.min_node_confidence}, "
                f"min_mean_node_score={cfg.min_mean_node_score}, "
                f"min_instance_score={cfg.min_instance_score}"
            )
        if cfg.overlap_method is not None:
            logger.info(
                "Filtering overlapping instances with "
                f"{cfg.overlap_method.upper()} threshold: {cfg.overlap_threshold}"
            )
        if cfg.max_centroid_distance is not None:
            logger.info(
                "Filtering instances by centroid distance: "
                f"max_centroid_distance={cfg.max_centroid_distance}"
            )

    def _log_inference_summary(
        self,
        *,
        n_frames: int,
        elapsed_s: float,
        output: Optional[str] = None,
        n_objects: Optional[int] = None,
        object_label: str = "instances",
    ) -> None:
        """One-line post-run summary (frames, objects/frame, throughput)."""
        fps = n_frames / elapsed_s if elapsed_s > 0 else 0.0
        parts = [f"frames={n_frames}"]
        if n_objects is not None:
            mean = n_objects / n_frames if n_frames > 0 else 0.0
            parts.append(f"{object_label}={n_objects} ({mean:.2f}/frame)")
        parts += [
            f"elapsed={elapsed_s:.1f}s",
            f"throughput={fps:.1f} fps",
            f"tracking={bool(getattr(self, 'tracking_active', False))}",
        ]
        if output:
            parts.append(f"output={output}")
        logger.info("Inference complete | " + " | ".join(parts))

    def _make_provider(self, data, frames=None):
        needs_gt = getattr(self.layer, "needs_gt_centroids", False)
        provider_kwargs = {"batch_size": self.batch_size}
        # --queue-maxsize (frames) -> provider prefetch depth (batches); the
        # reference's legacy VideoReader bounds its decode queue the same way.
        # (Providers default to prefetch=2 already — decode runs on a
        # background thread overlapping device dispatch; this only widens it.)
        prefetch = getattr(self, "prefetch_batches", None)
        if prefetch:
            provider_kwargs["prefetch"] = int(prefetch)
        if needs_gt:
            provider_kwargs.update(
                with_centroids=True,
                max_instances=getattr(self.layer, "max_instances", 20),
                anchor_ind=getattr(self.layer, "anchor_ind", None),
                # --only_labeled_frames: mixed frames contribute only their
                # user instances as GT centroids (reference finding 43).
                user_frames_only=getattr(self, "gt_user_instances_only", False),
            )
        if isinstance(data, Labels):
            return LabelsProvider(data, **provider_kwargs)
        if isinstance(data, (str, Path)):
            p = str(data)
            if p.endswith(".slp"):
                from sleap_nn_tpu.io.slp import load_slp

                return LabelsProvider(load_slp(p), **provider_kwargs)
            if needs_gt:
                raise ValueError(
                    "Centered-instance-only inference uses GROUND-TRUTH "
                    "centroids and needs a .slp source (a video has none); "
                    "pair the model with a centroid model for videos."
                )
            return VideoProvider(
                p, batch_size=self.batch_size, frames=frames,
                out_format="gray" if self._host_grayscale else None,
                **({"prefetch": int(prefetch)} if prefetch else {}),
            )
        if isinstance(data, Video):
            if needs_gt:
                raise ValueError(
                    "Centered-instance-only inference needs a .slp source."
                )
            return VideoProvider(
                data, batch_size=self.batch_size, frames=frames,
                out_format="gray" if self._host_grayscale else None,
                **({"prefetch": int(prefetch)} if prefetch else {}),
            )
        raise ValueError(f"Unsupported data source: {type(data)}")

    def predict(
        self,
        data,
        frames: Optional[Sequence[int]] = None,
        make_labels: bool = True,
        provider=None,
        return_confmaps: Optional[bool] = None,
        return_paf_graph: Optional[bool] = None,
    ):
        """Run inference over a video/labels source.

        Returns ``sio``-style ``Labels`` when ``make_labels`` else the raw
        per-batch output dicts. ``return_confmaps`` / ``return_paf_graph``
        override the construction-time flags for THIS call only (scoped copy
        — the shared predictor is never mutated, reference predictor.py:2198).
        """
        if return_confmaps is not None or return_paf_graph is not None:
            scoped_layer = self._scoped_postprocess_layer(
                return_confmaps=return_confmaps,
                return_paf_graph=return_paf_graph,
            )
            if scoped_layer is not self.layer:
                import copy

                scoped = copy.copy(self)
                scoped.layer = scoped_layer
                return scoped.predict(data, frames, make_labels, provider)
        provider = provider or self._make_provider(data, frames)
        self._log_inference_start(data, provider)
        self._log_filter_config()
        results = []
        # Streaming writer (set by run.predict for --stream-to-file): frames
        # flush as each batch completes, so a crash mid-run leaves a usable
        # temp .slp — not just an atomic finalize (reference streams during
        # inference, predictor.py predict_to_file :1791).
        writer = getattr(self, "stream_writer", None)
        stream_frames: List[LabeledFrame] = []
        if writer is not None:
            stream_videos = (
                provider.labels.videos if isinstance(provider, LabelsProvider)
                else [provider.video] if isinstance(provider, VideoProvider)
                else []
            )
        t0 = time.perf_counter()
        n_frames = 0
        # Pipeline: decode/dispatch on the main thread, device->host fetch +
        # host postprocess on a dedicated fetcher thread. Each D2H fetch is a
        # full transport round-trip (~30 ms on remote-attached devices); doing
        # it inline would stall the H2D stream between batches, so the fetcher
        # thread absorbs that latency while the main thread keeps the input
        # pipe full. `depth` bounds in-flight batches (device + host memory).
        depth = int(os.environ.get("SLEAP_NN_TPU_PIPELINE_DEPTH", 3))
        # SLEAP_NN_TPU_FETCH_THREAD=0 falls back to inline draining on the
        # main thread (dispatch N batches ahead, then fetch the oldest) —
        # on single-CPU hosts behind a shared-transport tunnel, concurrent
        # H2D/D2H RPCs can contend and underperform the serialized order.
        use_fetch_thread = os.environ.get("SLEAP_NN_TPU_FETCH_THREAD", "1") != "0"
        import queue as _queue

        fetch_q: "_queue.Queue" = _queue.Queue(maxsize=max(1, depth))
        fetch_err: List[BaseException] = []

        # PAF grouping pool: with paf_workers > 0 on a bottom-up layer, the
        # host grouping stage runs in worker processes overlapped with device
        # dispatch (reference streaming.py PafGroupingPool). Batch metadata is
        # kept by ordinal; results merge in submission order.
        pool = None
        pool_meta: List = []
        use_pool = (
            getattr(self, "paf_workers", 0) > 0
            and hasattr(self.layer, "device_to_payload")
        )
        if use_pool:
            from sleap_nn_tpu.inference.streaming import PafGroupingPool

            pool = PafGroupingPool(
                self.paf_workers, self.layer.paf_scorer,
                self.layer.post.max_instances,
                return_paf_graph=self.layer.post.return_paf_graph,
            )

        def drain_one(item):
            nonlocal n_frames
            dev_out, batch, host_f = item
            if pool is not None:
                pool.submit(len(pool_meta), self.layer.device_to_payload(dev_out))
                pool_meta.append((batch, host_f))
                # Bound in-worker backlog to keep memory O(window).
                if len(pool) > 2 * self.paf_workers:
                    merge_grouped(*pool.drain_one())
            else:
                out = self.layer.finalize(dev_out)
                out = self._lift_host_coords(out, host_f)
                out["frame_inds"] = batch.frame_inds
                out["video_inds"] = batch.video_inds
                out["valid"] = batch.valid
                n_frames += int(batch.valid.sum())
                results.append(out)
                if writer is not None:
                    frames_out = self._frames_from_out(out, stream_videos)
                    writer.add_frames(frames_out)
                    stream_frames.extend(frames_out)
                cb = getattr(self, "progress_callback", None)
                if cb is not None:
                    cb(n_frames)

        def merge_grouped(ordinal, grouped):
            nonlocal n_frames
            batch, host_f = pool_meta[ordinal]
            grouped = self._lift_host_coords(grouped, host_f)
            grouped["frame_inds"] = batch.frame_inds
            grouped["video_inds"] = batch.video_inds
            grouped["valid"] = batch.valid
            n_frames += int(batch.valid.sum())
            results.append(grouped)
            if writer is not None:
                frames_out = self._frames_from_out(grouped, stream_videos)
                writer.add_frames(frames_out)
                stream_frames.extend(frames_out)
            cb = getattr(self, "progress_callback", None)
            if cb is not None:
                cb(n_frames)

        def fetcher():
            # Single consumer: preserves submission order for results/writer.
            while True:
                item = fetch_q.get()
                if item is None:
                    return
                try:
                    drain_one(item)
                except BaseException as e:  # propagate to the main thread
                    fetch_err.append(e)
                    # Keep draining so the producer never blocks on a full
                    # queue after a failure; items are dropped unprocessed.
                    while True:
                        nxt = fetch_q.get()
                        if nxt is None:
                            return

        fetch_thread = None
        if use_fetch_thread:
            fetch_thread = threading.Thread(
                target=fetcher, name="sleap-nn-tpu-fetch", daemon=True
            )
            fetch_thread.start()
        in_flight: List = []
        try:
            if pool is not None:
                pool.__enter__()
            try:
                for batch in provider:
                    if fetch_err:
                        break
                    frames = batch.frames
                    # Tail batches arrive host-padded (repeated last frame,
                    # providers.py pad). Shipping the pad rows over a
                    # remote-attached link wastes up to (B-1)/B of the last
                    # transfer, so send only the valid rows and rebuild the
                    # pad device-side (broadcast of the last row — the same
                    # values the host pad carried, so outputs are
                    # bit-identical). The full-batch jit program never
                    # recompiles; only a tiny per-tail-shape pad computation
                    # does, once. Skipped under SPMD sharding (the committed
                    # layout needs the full leading axis host-side).
                    pad_dev = None
                    valid = getattr(batch, "valid", None)
                    if (
                        _DEVICE_PAD_TAIL
                        and valid is not None
                        and not valid.all()
                        and self._batch_sharding is None
                        and not getattr(
                            self.layer, "consumes_host_frames", False
                        )
                    ):
                        n_valid = int(valid.sum())
                        # Providers append pads at the END; only slice when
                        # the valid rows really are a prefix.
                        if 0 < n_valid < len(frames) and bool(
                            valid[:n_valid].all()
                        ):
                            pad_dev = len(frames)
                            frames = frames[:n_valid]
                    if self._host_grayscale and frames.shape[-1] == 3:
                        frames = rgb_to_gray_uint8(frames)
                    host_f = 1.0
                    if self._host_transform is not None:
                        frames, host_f = self._apply_host_resize(frames)
                    if pad_dev is not None:
                        import jax.numpy as _jnp

                        dev_frames = _jnp.asarray(
                            np.ascontiguousarray(frames)
                        )
                        frames = _jnp.concatenate(
                            [
                                dev_frames,
                                _jnp.broadcast_to(
                                    dev_frames[-1:],
                                    (pad_dev - dev_frames.shape[0],)
                                    + dev_frames.shape[1:],
                                ),
                            ],
                            axis=0,
                        )
                    if self._batch_sharding is not None:
                        # SPMD: commit the batch with its leading axis split
                        # over the mesh; jnp.asarray inside the layer keeps
                        # the committed sharding and jit runs one program
                        # across all devices.
                        import jax as _jax

                        frames = _jax.device_put(
                            np.ascontiguousarray(frames), self._batch_sharding
                        )
                    if getattr(self.layer, "needs_gt_centroids", False):
                        gt_args = (batch.gt_centroids, batch.gt_centroid_valid,
                                   batch.gt_centroid_vals)
                        if self._batch_sharding is not None:
                            import jax as _jax

                            gt_args = tuple(
                                _jax.device_put(np.ascontiguousarray(a),
                                                self._batch_sharding)
                                for a in gt_args
                            )
                        dev = self.layer.predict_async(frames, *gt_args)
                    else:
                        dev = self.layer.predict_async(frames)
                    if fetch_thread is not None:
                        fetch_q.put((dev, batch, host_f))
                    else:
                        in_flight.append((dev, batch, host_f))
                        if len(in_flight) > depth:
                            drain_one(in_flight.pop(0))
            finally:
                if fetch_thread is not None:
                    fetch_q.put(None)
                    fetch_thread.join()
            while in_flight:
                drain_one(in_flight.pop(0))
            if fetch_err:
                raise fetch_err[0]
            if pool is not None:
                for ordinal, grouped in pool.iter_completed():
                    merge_grouped(ordinal, grouped)
        finally:
            if pool is not None:
                pool.__exit__(None, None, None)
        elapsed = time.perf_counter() - t0
        self.last_stats = {
            "n_frames": n_frames,
            "elapsed_s": elapsed,
            "fps": n_frames / elapsed if elapsed > 0 else 0.0,
        }
        if not make_labels:
            self._log_inference_summary(n_frames=n_frames, elapsed_s=elapsed)
            return results
        video = provider.video if isinstance(provider, VideoProvider) else None
        labels_src = provider.labels if isinstance(provider, LabelsProvider) else None
        labels = self.to_labels(
            results, video=video, labels_src=labels_src,
            # Streaming already converted each batch (filters, masks, class
            # tracks applied once) — reuse those frames instead of running
            # the whole host postprocess a second time.
            precomputed_frames=stream_frames if writer is not None else None,
        )
        seg = "segmentation" in (self.model_type or "")
        n_objects = sum(
            len(getattr(lf, "masks", []) or []) if seg else len(lf.instances)
            for lf in labels.labeled_frames
        )
        self._log_inference_summary(
            n_frames=n_frames,
            elapsed_s=elapsed,
            n_objects=n_objects,
            object_label="masks" if seg else "instances",
            output=getattr(self, "output_path_hint", None),
        )
        return labels

    # -- conversion -------------------------------------------------------------
    def _apply_mask_output(self, lf, mask_scale: float = 1.0):
        """Honor ``mask_output`` (mask | polygon | both) on one LabeledFrame.

        polygon/both simplify each mask's largest contour into a
        :class:`PredictedROI` in IMAGE pixel coords (reference cli.py:2588);
        'polygon' additionally drops the dense masks.
        """
        mode = getattr(self, "mask_output", "mask")
        if mode == "mask" or not lf.masks:
            return
        from sleap_nn_tpu.inference.segmentation import mask_to_polygon
        from sleap_nn_tpu.io.model import PredictedROI

        eps = float(getattr(self, "polygon_epsilon", 0.01))
        rois = []
        for sm in lf.masks:
            # Per-mask scale (#618) when the layer stamped one; the batch
            # mask_scale stays as the fallback for legacy producers.
            lift = getattr(sm, "scale", None) or mask_scale
            poly = mask_to_polygon(sm.mask, epsilon_frac=eps, scale=lift)
            if poly is not None:
                rois.append(PredictedROI(poly, score=sm.score, track=sm.track))
        lf.rois = rois
        if mode == "polygon":
            lf.masks = []

    def to_labels(self, results: List[Dict], video=None, labels_src=None,
                  precomputed_frames: Optional[List[LabeledFrame]] = None) -> Labels:
        """Batch outputs -> Labels with PredictedInstances (reference: outputs.py:284).

        ``precomputed_frames`` skips reconversion when the streaming path
        already built the LabeledFrames per batch.
        """
        videos = labels_src.videos if labels_src is not None else ([video] if video else [])
        if precomputed_frames is not None:
            lfs = list(precomputed_frames)
        else:
            lfs = []
            for out in results:
                lfs.extend(self._frames_from_out(out, videos))
        labels = Labels(labeled_frames=lfs, videos=[v for v in videos if v is not None])
        if getattr(self, "_class_tracks", None):
            labels.tracks = [t for t in self._class_tracks.values()]
        from sleap_nn_tpu.inference.provenance import build_inference_provenance

        labels.provenance = build_inference_provenance(
            [m.model_dir for m in self.models], stats=getattr(self, "last_stats", None)
        )
        return labels

    def _frames_from_out(self, out: Dict, videos) -> List[LabeledFrame]:
        """Convert ONE batch output dict into LabeledFrames (in frame order).

        Shared by :meth:`to_labels` and the streaming writer path, which
        flushes frames as each batch completes rather than after the run.
        """
        skel = self.skeleton
        lfs: List[LabeledFrame] = []
        b = len(out["frame_inds"])
        for i in range(b):
            if not out["valid"][i]:
                continue
            vid = videos[out["video_inds"][i]] if videos else None
            frame_idx = int(out["frame_inds"][i])
            instances = []
            frame_masks = []

            if self.model_type == "topdown_segmentation":
                # Masks only — no phantom keypoint instances (matches the
                # reference TopDownSegmentationLayer emission contract).
                frame_masks = out["pred_masks"][i]
                if frame_masks:
                    lf = LabeledFrame(video=vid, frame_idx=frame_idx, instances=[])
                    lf.masks = frame_masks
                    self._apply_mask_output(lf, out.get("mask_scale", 1.0))
                    lfs.append(lf)
                continue

            if self.model_type in ("bottomup_segmentation", "semantic_segmentation"):
                frame_masks = out["pred_masks"][i]
                if self.model_type == "bottomup_segmentation":
                    cents = out["pred_centroids"][i]
                    vals = out["centroid_vals"][i]
                    valid = out["centroid_valid"][i]
                    for k in range(cents.shape[0]):
                        if not valid[k] or np.all(np.isnan(cents[k])):
                            continue
                        instances.append(
                            self._make_instance(cents[k][None], vals[k : k + 1], skel)
                        )
                if frame_masks or instances:
                    lf = LabeledFrame(video=vid, frame_idx=frame_idx, instances=instances)
                    lf.masks = frame_masks
                    self._apply_mask_output(lf, out.get("mask_scale", 1.0))
                    lfs.append(lf)
                continue

            if self.model_type == "single_instance":
                pts = out["pred_keypoints"][i]  # (1, n_nodes, 2)
                vals = out["pred_peak_values"][i]
                for k in range(pts.shape[0]):
                    if np.all(np.isnan(pts[k])):
                        continue
                    instances.append(self._make_instance(pts[k], vals[k], skel))

            elif self.model_type == "centroid":
                cents = out["pred_centroids"][i]  # (K, 2)
                vals = out["centroid_vals"][i]
                valid = out["centroid_valid"][i]
                # --centroid-output (reference cli.py:2376): 'instance'
                # emits single-node PredictedInstances (frontend-loadable,
                # default), 'centroid' emits PredictedCentroid records on
                # LabeledFrame.centroids, 'both' emits both.
                c_out = getattr(self, "centroid_output", "instance")
                frame_centroids = []
                for k in range(cents.shape[0]):
                    if not valid[k] or np.all(np.isnan(cents[k])):
                        continue
                    if c_out in ("instance", "both"):
                        instances.append(
                            self._make_instance(cents[k][None], vals[k : k + 1], skel)
                        )
                    if c_out in ("centroid", "both"):
                        from sleap_nn_tpu.io.model import PredictedCentroid

                        frame_centroids.append(
                            PredictedCentroid(cents[k], score=float(vals[k]))
                        )
                if frame_centroids:
                    lf = LabeledFrame(
                        video=vid, frame_idx=frame_idx, instances=instances
                    )
                    lf.centroids = frame_centroids
                    lfs.append(lf)
                    continue

            elif self.model_type == "topdown":
                pts = out["pred_keypoints"][i]  # (K, n_nodes, 2)
                vals = out["pred_peak_values"][i]
                valid = out["instance_valid"][i]
                # GT-centroid runs carry the source-centroid confidence as
                # the instance score (reference finding 14); model-driven
                # runs fall back to mean peak value inside _make_instance.
                inst_scores = out.get("pred_instance_scores")
                for k in range(pts.shape[0]):
                    if not valid[k] or np.all(np.isnan(pts[k])):
                        continue
                    score = (
                        float(inst_scores[i][k]) if inst_scores is not None else None
                    )
                    instances.append(
                        self._make_instance(pts[k], vals[k], skel, score=score)
                    )

            elif self.model_type == "multi_class_bottomup":
                pts = out["pred_keypoints"][i]  # (n_classes, n_nodes, 2)
                vals = np.nan_to_num(out["pred_peak_values"][i])
                probs = out["pred_class_probs"][i]
                for k in range(pts.shape[0]):
                    if np.all(np.isnan(pts[k])):
                        continue
                    inst = self._make_instance(pts[k], vals[k], skel)
                    inst.track = self._class_track(k)
                    inst.tracking_score = float(np.nanmean(probs[k]))
                    instances.append(inst)

            elif self.model_type == "multi_class_topdown":
                pts = out["pred_keypoints"][i]
                vals = out["pred_peak_values"][i]
                valid = out["instance_valid"][i]
                cls_inds = out["pred_class_inds"][i]
                cls_scores = out["pred_class_scores"][i]
                for k in range(pts.shape[0]):
                    if not valid[k] or np.all(np.isnan(pts[k])):
                        continue
                    inst = self._make_instance(pts[k], vals[k], skel)
                    if cls_inds[k] >= 0:
                        inst.track = self._class_track(int(cls_inds[k]))
                        inst.tracking_score = float(np.nan_to_num(cls_scores[k]))
                    instances.append(inst)

            elif self.model_type == "bottomup":
                pts_list = out["pred_keypoints"][i]
                vals_list = out["pred_peak_values"][i]
                scores = out["pred_instance_scores"][i]
                for k in range(len(pts_list)):
                    if np.all(np.isnan(pts_list[k])):
                        continue
                    instances.append(
                        self._make_instance(
                            pts_list[k], vals_list[k], skel, score=float(scores[k])
                        )
                    )

            filters = getattr(self, "filters", None)
            if filters is not None and filters.enabled():
                from sleap_nn_tpu.inference.filters import FilterPipeline

                instances = FilterPipeline(filters).apply(instances)
            if instances:
                lfs.append(LabeledFrame(video=vid, frame_idx=frame_idx, instances=instances))

        return lfs

    def _class_track(self, class_idx: int):
        """Track object per supervised-ID class (multiclass models)."""
        if not hasattr(self, "_class_tracks"):
            self._class_tracks = {}
        if class_idx not in self._class_tracks:
            from sleap_nn_tpu.io.model import Track

            names = getattr(self, "class_names", None)
            name = names[class_idx] if names and class_idx < len(names) else str(class_idx)
            self._class_tracks[class_idx] = Track(name=name)
        return self._class_tracks[class_idx]

    @staticmethod
    def _make_instance(pts, vals, skel, score=None) -> PredictedInstance:
        vals = np.nan_to_num(np.asarray(vals, dtype=np.float64))
        visible = ~np.isnan(np.asarray(pts)[:, 0])
        if score is None:
            score = float(vals[visible].mean()) if visible.any() else 0.0
        return PredictedInstance(
            points=np.asarray(pts, dtype=np.float64),
            skeleton=skel,
            point_scores=vals,
            score=score,
        )


class ExportedLayer:
    """Thin layer over a serialized export (postproc is baked in the graph).

    Parity target: reference inference/layers/exported.py:71-562.
    """

    def __init__(self, call, meta, paf_scorer=None, max_instances: Optional[int] = None,
                 finalize_fn=None):
        self.call = call
        self.meta = meta
        self.batch_size = int(meta.input_shape[0])
        self.paf_scorer = paf_scorer
        self.max_instances = max_instances
        self.finalize_fn = finalize_fn

    def predict_async(self, images):
        import jax.numpy as jnp

        images = np.asarray(images)
        b = images.shape[0]
        tb = self.batch_size
        pad = 0
        if b < tb:
            pad = tb - b
            images = np.concatenate([images, np.repeat(images[-1:], pad, 0)])
        elif b > tb:
            raise ValueError(
                f"Exported model compiled for batch {tb}; got {b}. "
                "Use batch_size <= the exported batch."
            )
        # Channel adaptation to the baked input spec.
        want_c = self.meta.input_shape[-1]
        if images.shape[-1] == 3 and want_c == 1:
            images = rgb_to_gray_uint8(images.astype(np.uint8))
        elif images.shape[-1] == 1 and want_c == 3:
            images = np.repeat(images, 3, axis=-1)
        out = self.call(images.astype(np.uint8))
        out = {k: v for k, v in out.items()}
        out["_pad"] = pad
        return out

    def finalize(self, dev):
        import jax

        pad = dev.pop("_pad", 0)
        out = jax.device_get(dev)
        if pad:
            out = {k: v[: len(v) - pad] for k, v in out.items()}
        if self.finalize_fn is not None:
            return self.finalize_fn(out)
        # Match the live layers' contracts (instance axis on single_instance;
        # centroid validity when the graph didn't emit one).
        if self.meta.model_type == "single_instance":
            out["pred_keypoints"] = out["pred_keypoints"][:, None]
            out["pred_peak_values"] = out["pred_peak_values"][:, None]
        elif self.meta.model_type == "bottomup":
            # The exported graph bakes the device half (dense PAF scoring);
            # the host Hungarian/greedy grouping runs here, identical to the
            # live BottomUpLayer (grouped peaks already in original coords).
            from sleap_nn_tpu.inference.streaming import group_batch_host

            out = group_batch_host(
                {
                    "grouped_peaks": out["grouped_peaks"],
                    "grouped_vals": out["grouped_vals"],
                    "scores": out["paf_scores"],
                    "lift": 1.0,
                },
                self.paf_scorer,
                self.max_instances,
            )
        return out

    def predict(self, images):
        return self.finalize(self.predict_async(images))


def from_export_dir(
    export_dir, batch_size: Optional[int] = None,
    max_instances: Optional[int] = None,
    min_line_scores: float = 0.25,
    runtime: str = "auto",
) -> Predictor:
    """Build a Predictor from a serialized export dir (reference: predictor.py:1124).

    Supports single_instance / centroid exports (whose graphs emit final
    keypoints) and bottomup exports (the graph bakes the dense PAF scoring;
    the host grouping stage is reconstructed from the export's
    training_config.yaml). Topdown exports load via their source model dirs.
    """
    from sleap_nn_tpu.export import load_exported_model

    call, meta = load_exported_model(export_dir, runtime=runtime)
    skel = Skeleton(nodes=list(meta.skeleton_nodes) or ["centroid"],
                    edges=list(meta.skeleton_edges))

    if meta.model_type == "bottomup":
        from sleap_nn_tpu.config import TrainingJobConfig

        cfg_path = Path(export_dir) / "training_config.yaml"
        if not cfg_path.exists():
            raise FileNotFoundError(
                f"bottomup export needs training_config.yaml for the PAF "
                f"grouping stage; not found under {export_dir}."
            )
        head = get_head_config(TrainingJobConfig.load_yaml(str(cfg_path)))
        scorer = PAFScorer(
            part_names=head.confmaps.part_names,
            edges=[tuple(e) for e in head.pafs.edges],
            pafs_stride=head.pafs.output_stride,
            min_line_scores=min_line_scores,
        )
        layer = ExportedLayer(call, meta, paf_scorer=scorer,
                              max_instances=max_instances)
        p = Predictor(layer, "bottomup", skel, [], batch_size or layer.batch_size)
        p.filters = None
        return p

    def _load_cfg():
        from sleap_nn_tpu.config import TrainingJobConfig

        cfg_path = Path(export_dir) / "training_config.yaml"
        if not cfg_path.exists():
            raise FileNotFoundError(
                f"{meta.model_type} export needs its training_config.yaml "
                f"for host-side postprocessing; not found under {export_dir}."
            )
        return TrainingJobConfig.load_yaml(str(cfg_path))

    if meta.model_type == "multi_class_bottomup":
        head = get_head_config(_load_cfg())
        n_nodes = len(head.confmaps.part_names)
        n_classes = len(head.class_maps.classes)

        def finalize_mcbu(out):
            from sleap_nn_tpu.inference.identity import group_and_assemble

            b, k = out["vals"].shape
            valid = out["valid"].reshape(-1)
            pts = out["points_grid"].reshape(-1, 2)[valid]
            rough = out["rough"].reshape(-1, 2)[valid]
            vals = out["vals"].reshape(-1)[valid]
            sample_inds = np.repeat(np.arange(b), k)[valid]
            channel_inds = out["channels"].reshape(-1)[valid]
            probs = out["class_probs"].reshape(-1, n_classes)[valid]
            pts_g, vals_g, probs_g = group_and_assemble(
                pts, vals, sample_inds, channel_inds, probs,
                b, n_classes, n_nodes, sort_keys=rough,
            )
            lift = out["lift"].reshape(b, 1, 1, 1)
            return {
                "pred_keypoints": pts_g * lift,
                "pred_peak_values": vals_g,
                "pred_class_probs": probs_g,
            }

        layer = ExportedLayer(call, meta, finalize_fn=finalize_mcbu)
        p = Predictor(layer, "multi_class_bottomup", skel, [],
                      batch_size or layer.batch_size)
        p.class_names = list(head.class_maps.classes)
        p.filters = None
        return p

    if meta.model_type in ("topdown", "multi_class_topdown"):
        finalize_fn = None
        if meta.model_type == "multi_class_topdown":
            from sleap_nn_tpu.inference.layers import TopDownMultiClassLayer

            def finalize_fn(out):
                # The live layer's finalize only reads the output dict.
                return TopDownMultiClassLayer.finalize(None, out)

        layer = ExportedLayer(call, meta, finalize_fn=finalize_fn)
        p = Predictor(layer, meta.model_type, skel, [],
                      batch_size or layer.batch_size)
        if meta.model_type == "multi_class_topdown":
            head = get_head_config(_load_cfg())
            p.class_names = list(head.class_vectors.classes)
        p.filters = None
        return p

    if meta.model_type == "semantic_segmentation":
        from sleap_nn_tpu.inference.segmentation import SemanticSegmentationLayer

        import types as _types

        # The finalize shim must carry the SAME grid->image context the live
        # layer has (#618): the head's output stride and the baked
        # preprocessing scale, or exported grid masks would be stamped
        # scale~1.0 and evaluate as if they were image-resolution.
        _cfg = _load_cfg()
        sem_shim = _types.SimpleNamespace(
            seg_output_stride=get_head_config(_cfg).segmentation.output_stride,
            pre=_types.SimpleNamespace(
                scale=_cfg.data_config.preprocessing.scale or 1.0
            ),
            full_res_masks=False,
        )

        def finalize_semseg(out):
            return SemanticSegmentationLayer.finalize(sem_shim, out)

        layer = ExportedLayer(call, meta, finalize_fn=finalize_semseg)
        p = Predictor(layer, "semantic_segmentation", skel, [],
                      batch_size or layer.batch_size)
        p.filters = None
        return p

    if meta.model_type == "bottomup_segmentation":
        import types as _types

        from sleap_nn_tpu.inference.segmentation import BottomUpSegmentationLayer

        _cfg = _load_cfg()
        head = get_head_config(_cfg)
        shim = _types.SimpleNamespace(
            min_mask_area=0,
            merge_fragments=False,
            merge_method="greedy",
            seg_output_stride=head.segmentation.output_stride,
            # Grid->image lift context (#618): same as the live layer.
            pre=_types.SimpleNamespace(
                scale=_cfg.data_config.preprocessing.scale or 1.0
            ),
            full_res_masks=False,
        )

        def finalize_buseg(out):
            return BottomUpSegmentationLayer.finalize(shim, out)

        layer = ExportedLayer(call, meta, finalize_fn=finalize_buseg)
        p = Predictor(layer, "bottomup_segmentation", skel, [],
                      batch_size or layer.batch_size)
        p.filters = None
        return p

    if meta.model_type in ("centered_instance", "multi_class_topdown",
                           "centered_instance_segmentation"):
        raise NotImplementedError(
            f"from_export_dir does not support {meta.model_type!r} "
            f"(centered-instance-style exports run on pre-extracted crops; "
            f"export the topdown composite instead)."
        )
    if meta.model_type not in ("single_instance", "centroid"):
        raise ValueError(
            f"Unrecognized model_type {meta.model_type!r} in this export "
            "dir's metadata.json — not a model type this framework exports."
        )
    layer = ExportedLayer(call, meta)
    # Exported centroid models record the node that anchored training-time
    # centroids (reference finding 29): resolve it so downstream packaging
    # (e.g. pairing with a crop stage) uses the same anchor; a recorded
    # anchor absent from the node list is a corrupt export.
    anchor = getattr(meta, "anchor_part", None)
    if meta.model_type == "centroid" and anchor is not None:
        nodes = list(meta.skeleton_nodes)
        if anchor not in nodes:
            raise ValueError(
                f"export metadata anchor_part {anchor!r} not found in "
                f"skeleton nodes {nodes}."
            )
        layer.anchor_ind = nodes.index(anchor)
    if meta.model_type == "centroid":
        # Lone-centroid output is one point per instance — collapse to the
        # single-node skeleton exactly like the live predictor branch, or
        # frame assembly would try to reshape (1, 2) points onto the full
        # training skeleton.
        skel = Skeleton(nodes=["centroid"])
    p = Predictor(layer, meta.model_type, skel, [], batch_size or layer.batch_size)
    p.filters = None
    return p


Predictor.from_export_dir = staticmethod(from_export_dir)
