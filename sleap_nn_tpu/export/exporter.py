"""Export implementation: wrapper building, serialization, verification."""

from __future__ import annotations

import dataclasses
import hashlib
import json
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import numpy as np

from sleap_nn_tpu.config import get_head_config
from sleap_nn_tpu.inference.loaders import LoadedModel, load_model


@dataclasses.dataclass
class ExportMetadata:
    """Exported-model metadata (reference: export/metadata.py:16)."""

    model_type: str
    input_shape: Tuple[int, ...]
    input_dtype: str
    output_names: Tuple[str, ...]
    peak_threshold: float
    skeleton_nodes: Tuple[str, ...]
    skeleton_edges: Tuple[Tuple[str, str], ...]
    artifact: str
    artifact_sha256: str
    format: str = "jax_export_stablehlo"
    # Centroid-anchor provenance (reference export/metadata.py anchor_part,
    # finding 29): which node anchored crops/centroids at training time.
    anchor_part: "Optional[str]" = None
    # Baked postprocess knobs beyond the threshold — recorded so the predict
    # flow can warn when a runtime flag differs from what the compiled graph
    # actually does (None on exports written before these fields existed).
    refinement: "Optional[str]" = None
    max_peaks: "Optional[int]" = None

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2, default=list)

    @classmethod
    def from_json(cls, text: str) -> "ExportMetadata":
        d = json.loads(text)
        return cls(**{f.name: d[f.name] for f in dataclasses.fields(cls) if f.name in d})


def _anchor_part_from_config(config) -> "Optional[str]":
    """The trained anchor node, if any (centroid / centered-instance heads)."""
    hc = getattr(getattr(config, "model_config", None), "head_configs", None)
    for name in ("centroid", "centered_instance"):
        cm = getattr(getattr(hc, name, None), "confmaps", None)
        ap = getattr(cm, "anchor_part", None)
        if ap is not None:
            return ap
    return None


def _build_wrapper(loaded: LoadedModel, peak_threshold: float, batch_size: int,
                   max_peaks: int, paf_knobs: dict = None):
    """Bake normalize + forward + peaks into one function (reference wrapper pattern)."""
    import jax.numpy as jnp

    from sleap_nn_tpu.inference.backends import JaxBackend
    from sleap_nn_tpu.inference.layers import PreprocessConfig, preprocess_images
    from sleap_nn_tpu.ops.peaks import find_global_peaks, find_local_peaks

    pre_cfg = loaded.config.data_config.preprocessing
    backbone = loaded.backbone_config
    pre = PreprocessConfig(
        ensure_rgb=pre_cfg.ensure_rgb,
        ensure_grayscale=pre_cfg.ensure_grayscale,
        max_height=pre_cfg.max_height,
        max_width=pre_cfg.max_width,
        scale=pre_cfg.scale,
        max_stride=backbone.max_stride,
    )
    model = loaded.model
    params = loaded.params
    model_type = loaded.model_type
    head = get_head_config(loaded.config)

    h = pre.max_height or 256
    w = pre.max_width or 256
    c = 3 if pre_cfg.ensure_rgb else 1
    input_shape = (batch_size, h, w, c)

    if model_type == "single_instance":
        stride = head.confmaps.output_stride

        def fn(images):
            x, eff = preprocess_images(pre, images)
            cms = model.apply(params, x)["SingleInstanceConfmapsHead"]
            pts, vals = find_global_peaks(cms, peak_threshold, "integral")
            return {"pred_keypoints": pts * stride / (pre.scale * eff), "pred_peak_values": vals}

        outputs = ("pred_keypoints", "pred_peak_values")

    elif model_type == "centroid":
        stride = head.confmaps.output_stride

        def fn(images):
            x, eff = preprocess_images(pre, images)
            cms = model.apply(params, x)["CentroidConfmapsHead"]
            pts, vals, ch, valid = find_local_peaks(
                cms, peak_threshold, "integral", max_peaks=max_peaks
            )
            return {
                "pred_centroids": pts * stride / (pre.scale * eff),
                "centroid_vals": vals,
                "centroid_valid": valid,
            }

        outputs = ("pred_centroids", "centroid_vals", "centroid_valid")

    elif model_type == "centered_instance":
        stride = head.confmaps.output_stride
        crop = pre_cfg.crop_size or 128
        crop = int(round(crop * pre.scale))
        crop += (-crop) % pre.max_stride
        input_shape = (batch_size, crop, crop, c)

        def fn(crops):
            x = crops.astype(jnp.float32) / 255.0
            cms = model.apply(params, x)["CenteredInstanceConfmapsHead"]
            pts, vals = find_global_peaks(cms, peak_threshold, "integral")
            return {"pred_keypoints": pts * stride, "pred_peak_values": vals}

        outputs = ("pred_keypoints", "pred_peak_values")

    elif model_type == "bottomup":
        from sleap_nn_tpu.inference.paf_grouping import PAFScorer

        cm_stride = head.confmaps.output_stride
        scorer = PAFScorer(
            part_names=head.confmaps.part_names,
            edges=[tuple(e) for e in head.pafs.edges],
            pafs_stride=head.pafs.output_stride,
            **(paf_knobs or {}),
        )

        def fn(images):
            x, eff = preprocess_images(pre, images)
            preds = model.apply(params, x)
            cms = preds["MultiInstanceConfmapsHead"]
            pafs = preds["PartAffinityFieldsHead"]
            pts, vals, ch, valid = find_local_peaks(
                cms, peak_threshold, "integral", max_peaks=max_peaks
            )
            pts = pts * cm_stride
            gp, gv, mask, scores = scorer.score_on_device(pafs, pts, vals, ch, valid)
            return {
                "grouped_peaks": gp / (pre.scale * eff),
                "grouped_vals": gv,
                "grouped_mask": mask,
                "paf_scores": scores,
            }

        outputs = ("grouped_peaks", "grouped_vals", "grouped_mask", "paf_scores")

    elif model_type == "multi_class_bottomup":
        from sleap_nn_tpu.inference.layers import BottomUpMultiClassLayer, PostprocessConfig

        post = PostprocessConfig(peak_threshold=peak_threshold, max_peaks=max_peaks)
        from sleap_nn_tpu.inference.backends import JaxBackend

        layer = BottomUpMultiClassLayer(
            JaxBackend(model, params),
            pre,
            post,
            n_nodes=len(head.confmaps.part_names),
            n_classes=len(head.class_maps.classes),
            cm_output_stride=head.confmaps.output_stride,
            class_maps_output_stride=head.class_maps.output_stride,
        )
        cm_grid_stride = head.class_maps.output_stride

        def fn(images):
            dev = layer._fn(images)
            # Bake the class-prob gather (reference wrappers/bottomup_multiclass.py
            # samples class maps at peak locations on device) so the export
            # ships per-peak probs, not full class maps.
            cm = dev["class_maps"]  # (B, h, w, n_classes)
            pts_grid = jnp.nan_to_num(dev["points"] / cm_grid_stride, nan=0.0)
            xy = jnp.round(pts_grid).astype(jnp.int32)
            xs = jnp.clip(xy[..., 0], 0, cm.shape[2] - 1)
            ys = jnp.clip(xy[..., 1], 0, cm.shape[1] - 1)
            b = cm.shape[0]
            probs = cm[jnp.arange(b)[:, None], ys, xs, :]  # (B, K, n_classes)
            return {
                "points_grid": dev["points"] / cm_grid_stride,
                "rough": dev["rough"],
                "vals": dev["vals"],
                "channels": dev["channels"],
                "valid": dev["valid"],
                "class_probs": probs,
                "lift": jnp.broadcast_to(
                    cm_grid_stride / (pre.scale * dev["eff_scale"]), (b,)
                ),
            }

        outputs = (
            "points_grid", "rough", "vals", "channels", "valid", "class_probs", "lift",
        )

    elif model_type in ("centered_instance_segmentation", "semantic_segmentation"):
        stride = head.segmentation.output_stride

        if model_type == "centered_instance_segmentation":
            crop = pre_cfg.crop_size or 128
            crop = int(round(crop * pre.scale))
            crop += (-crop) % pre.max_stride
            input_shape = (batch_size, crop, crop, c)

            def fn(crops):
                x = crops.astype(jnp.float32) / 255.0
                seg = model.apply(params, x)["SegmentationHead"]
                return {"seg_probs": seg}

            outputs = ("seg_probs",)
        else:

            def fn(images):
                x, eff = preprocess_images(pre, images)
                seg = model.apply(params, x)["SegmentationHead"]
                return {"fg": seg, "eff_scale": jnp.broadcast_to(eff, (images.shape[0],))}

            outputs = ("fg", "eff_scale")

    elif model_type == "bottomup_segmentation":
        from sleap_nn_tpu.inference.backends import JaxBackend
        from sleap_nn_tpu.inference.layers import PostprocessConfig
        from sleap_nn_tpu.inference.segmentation import BottomUpSegmentationLayer

        post = PostprocessConfig(peak_threshold=peak_threshold)
        layer = BottomUpSegmentationLayer(
            JaxBackend(model, params),
            pre,
            post,
            seg_output_stride=head.segmentation.output_stride,
            center_output_stride=head.center.output_stride,
            offsets_output_stride=head.offsets.output_stride,
            max_instances=max_peaks,
        )
        fn = layer._fn
        outputs = (
            "instance_masks", "fg", "centers", "center_vals", "center_valid", "eff_scale",
        )

    else:
        raise NotImplementedError(f"Export not implemented for model type: {model_type}")

    return fn, input_shape, outputs


def _build_composite_wrapper(
    model_dirs, peak_threshold: float, batch_size: int, max_peaks: int,
    max_instances: int, input_height=None, input_width=None,
    input_scale=None, crop_size=None, use_bf16: bool = False,
):
    """Two-model (centroid + instance) fused export: crop extraction in-graph.

    Mirrors the reference's composite topdown export wrappers
    (reference: export/wrappers/topdown.py:69-147, topdown_multiclass.py) by
    serializing the SAME fused XLA program the live TopDown layers run.
    """
    from sleap_nn_tpu.inference.predictor import Predictor

    p = Predictor.from_model_paths(
        [str(d) for d in model_dirs],
        peak_threshold=peak_threshold,
        max_peaks=max_peaks,
        max_instances=max_instances,
        max_height=input_height,
        max_width=input_width,
        input_scale=input_scale,
        crop_size=crop_size,
        use_bf16=use_bf16,
    )
    if p.model_type not in ("topdown", "multi_class_topdown"):
        raise NotImplementedError(
            f"Composite export supports topdown / multi_class_topdown; the "
            f"given model dirs resolve to {p.model_type}."
        )
    layer = p.layer
    pre = layer.centroid_layer.pre
    h = pre.max_height or 256
    w = pre.max_width or 256
    c = 3 if pre.ensure_rgb else 1
    input_shape = (batch_size, h, w, c)
    outputs = (
        "pred_keypoints", "pred_peak_values", "pred_centroids", "centroid_vals",
        "instance_valid",
    )
    if p.model_type == "multi_class_topdown":
        outputs = outputs + ("class_probs",)
    return p, layer._full, input_shape, outputs


def _apply_bf16(loaded):
    """Swap the loaded model for a bf16-forward shim (``--precision bf16``).

    Inputs cast to bfloat16 at the model boundary, params cast once,
    outputs back to float32 — the same policy as JaxBackend(use_bf16) so
    exported numerics match live bf16 inference.
    """
    import jax
    import jax.numpy as jnp

    orig_model = loaded.model
    loaded.params = jax.tree_util.tree_map(
        lambda p: p.astype(jnp.bfloat16)
        if jnp.issubdtype(p.dtype, jnp.floating) else p,
        loaded.params,
    )

    class _BF16Shim:
        def apply(self, params, x):
            out = orig_model.apply(params, x.astype(jnp.bfloat16))
            return {k: v.astype(jnp.float32) for k, v in out.items()}

    loaded.model = _BF16Shim()


def export_model(
    model_dir,
    output_dir=None,
    fmt: str = "stablehlo",
    batch_size: int = 4,
    peak_threshold: float = 0.2,
    max_peaks: int = 200,
    max_instances: int = 20,
    verify: bool = True,
    input_height: "Optional[int]" = None,
    input_width: "Optional[int]" = None,
    input_scale: "Optional[float]" = None,
    crop_size: "Optional[int]" = None,
    precision: str = "fp32",
    n_line_points: int = 10,
    max_edge_length_ratio: float = 0.25,
    dist_penalty_weight: float = 1.0,
) -> Path:
    """Export trained model dir(s) to a serialized artifact + metadata.json.

    ``model_dir`` may be a single dir or a [centroid, instance-model] pair
    for the fused topdown / multi_class_topdown composite export.
    ``input_height``/``input_width``/``input_scale`` override the baked
    input geometry; ``precision='bf16'`` bakes a bfloat16 forward
    (reference exports offer the analogous fp16 engines).
    """
    import jax
    import jax.numpy as jnp

    if precision not in ("fp32", "bf16"):
        raise ValueError(f"precision must be fp32 or bf16, got {precision!r}")

    if isinstance(model_dir, (list, tuple)) and len(model_dir) > 1:
        predictor, fn, input_shape, output_names = _build_composite_wrapper(
            model_dir, peak_threshold, batch_size, max_peaks, max_instances,
            input_height=input_height, input_width=input_width,
            input_scale=input_scale, crop_size=crop_size,
            use_bf16=precision == "bf16",
        )
        model_type = predictor.model_type
        anchor_part = next(
            (a for a in (_anchor_part_from_config(m.config)
                         for m in predictor.models) if a is not None),
            None,
        )
        skeleton_nodes = tuple(predictor.skeleton.node_names)
        skeleton_edges = tuple(tuple(e) for e in predictor.skeleton.edge_names)
        # Instance model's config carries the head/skeleton/crop info needed
        # to reconstruct host-side stages.
        cfg_dir = Path(model_dir[-1])
        model_dir = Path(model_dir[0])
    else:
        if isinstance(model_dir, (list, tuple)):
            model_dir = model_dir[0]
        loaded = load_model(model_dir)
        pre_cfg = loaded.config.data_config.preprocessing
        if input_height is not None:
            pre_cfg.max_height = int(input_height)
        if input_width is not None:
            pre_cfg.max_width = int(input_width)
        if input_scale is not None:
            pre_cfg.scale = float(input_scale)
        if precision == "bf16":
            _apply_bf16(loaded)
        fn, input_shape, output_names = _build_wrapper(
            loaded, peak_threshold, batch_size, max_peaks,
            paf_knobs={
                "n_points": n_line_points,
                "max_edge_length_ratio": max_edge_length_ratio,
                "dist_penalty_weight": dist_penalty_weight,
            },
        )
        model_type = loaded.model_type
        anchor_part = _anchor_part_from_config(loaded.config)
        skeleton_nodes = tuple(loaded.skeleton_nodes)
        skeleton_edges = tuple(tuple(e) for e in loaded.skeleton_edges)
        cfg_dir = Path(model_dir)

    output_dir = Path(output_dir or (Path(model_dir) / "exported"))
    output_dir.mkdir(parents=True, exist_ok=True)

    if fmt == "savedmodel":
        # TF SavedModel via jax2tf (the TF-serving deployment surface; the
        # reference's ONNX analog). The graph bakes the same uint8 ->
        # outputs program; metadata records the directory artifact with a
        # tree hash over its files.
        artifact_name = "savedmodel"
        _export_savedmodel(fn, input_shape, output_dir / artifact_name)
        blob = _hash_tree(output_dir / artifact_name)
    else:
        artifact_name = "model.stablehlo"
        x_spec = jax.ShapeDtypeStruct(input_shape, jnp.uint8)
        exported = jax.export.export(jax.jit(fn))(x_spec)
        blob = exported.serialize()
        (output_dir / artifact_name).write_bytes(blob)
        blob = hashlib.sha256(blob).hexdigest()

    meta = ExportMetadata(
        model_type=model_type,
        input_shape=tuple(input_shape),
        input_dtype="uint8",
        output_names=tuple(output_names),
        peak_threshold=peak_threshold,
        skeleton_nodes=skeleton_nodes,
        skeleton_edges=skeleton_edges,
        artifact=artifact_name,
        artifact_sha256=blob,
        format="tf_savedmodel" if fmt == "savedmodel"
        else "jax_export_stablehlo",
        anchor_part=anchor_part,
        refinement="integral",
        max_peaks=max_peaks,
    )
    (output_dir / "metadata.json").write_text(meta.to_json())
    # Copy the training config for provenance (reference: export/cli.py:854).
    src_cfg = Path(cfg_dir) / "training_config.yaml"
    if src_cfg.exists():
        (output_dir / "training_config.yaml").write_text(src_cfg.read_text())

    if verify:
        rng = np.random.default_rng(0)
        x = rng.integers(0, 255, input_shape, dtype=np.uint8)
        report = verify_export_numerics(output_dir, fn, x)
        if not report["ok"]:
            raise RuntimeError(f"Export verification failed: {report}")
    return output_dir


def _export_savedmodel(fn, input_shape, out_dir: Path):
    """Serialize ``fn`` as a TF SavedModel (jax2tf bridge)."""
    import tensorflow as tf
    from jax.experimental import jax2tf

    tf_fn = jax2tf.convert(fn, with_gradient=False)
    module = tf.Module()
    module.serve = tf.function(
        tf_fn,
        input_signature=[tf.TensorSpec(list(input_shape), tf.uint8)],
        autograph=False,
    )
    tf.saved_model.save(
        module, str(out_dir),
        signatures={"serving_default": module.serve},
    )


def _hash_tree(root: Path) -> str:
    """Deterministic sha256 over a directory's files (path + bytes)."""
    h = hashlib.sha256()
    for p in sorted(root.rglob("*")):
        if p.is_file():
            h.update(str(p.relative_to(root)).encode())
            h.update(p.read_bytes())
    return h.hexdigest()


def load_exported_model(export_dir, runtime: str = "auto"):
    """Load a serialized export: returns (callable, ExportMetadata).

    ``runtime`` ('auto'|'stablehlo'|'savedmodel') must agree with the
    dir's metadata; a dir holding both artifact kinds is ambiguous (one
    metadata.json names one artifact) — export each format to its own dir.
    """
    import jax

    export_dir = Path(export_dir)
    if runtime not in ("auto", "stablehlo", "savedmodel"):
        raise ValueError(
            f"Unknown runtime {runtime!r}; expected 'auto', 'stablehlo' or "
            "'savedmodel'."
        )
    meta_path = export_dir / "metadata.json"
    if not meta_path.is_file():
        raise FileNotFoundError(
            f"{export_dir} is not an export dir: missing metadata.json "
            "(produce one with `sleap-nn-tpu export`)."
        )
    meta = ExportMetadata.from_json(meta_path.read_text())
    want = {"stablehlo": "model.stablehlo", "savedmodel": "savedmodel"}.get(runtime)
    if want is not None and meta.artifact != want:
        raise ValueError(
            f"--runtime {runtime!r}: this export dir's metadata names "
            f"{meta.artifact!r}. Re-export with --format {runtime} (to a "
            "separate output dir when keeping both)."
        )
    artifact = export_dir / meta.artifact
    if artifact.is_dir():  # SavedModel
        if _hash_tree(artifact) != meta.artifact_sha256:
            raise ValueError("Exported artifact hash mismatch (corrupted tree).")
        import tensorflow as tf

        module = tf.saved_model.load(str(artifact))
        serve = module.signatures["serving_default"]

        def call(x):
            import numpy as _np

            out = serve(**{list(serve.structured_input_signature[1])[0]:
                           tf.constant(_np.asarray(x))})
            return {k: v.numpy() for k, v in out.items()}

        return call, meta
    blob = artifact.read_bytes()
    if hashlib.sha256(blob).hexdigest() != meta.artifact_sha256:
        raise ValueError("Exported artifact hash mismatch (corrupted file).")
    exported = jax.export.deserialize(bytearray(blob))
    return exported.call, meta


def verify_export_numerics(export_dir, eager_fn, x: np.ndarray, atol: float = 1e-4) -> Dict:
    """Compare exported vs eager outputs (reference: onnx_exporter.py:147)."""
    import jax

    call, meta = load_exported_model(export_dir)
    out_e = jax.device_get(call(x))
    out_r = jax.device_get(eager_fn(x))
    report = {"ok": True, "max_abs_diff": {}}
    for k in out_r:
        a, b = np.asarray(out_e[k], dtype=np.float64), np.asarray(out_r[k], dtype=np.float64)
        # Matching non-finite sentinels (NaN pads, -inf masked scores) are
        # equal; a NaN/inf on one side only is a real mismatch.
        same_sentinel = (np.isnan(a) & np.isnan(b)) | (
            np.isinf(a) & np.isinf(b) & (np.sign(a) == np.sign(b))
        )
        with np.errstate(invalid="ignore"):
            d = np.abs(np.where(same_sentinel, 0.0, a - b))
        d = np.nan_to_num(d, nan=np.inf)
        md = float(d.max()) if d.size else 0.0
        report["max_abs_diff"][k] = md
        if md > atol:
            report["ok"] = False
    return report
