"""Top-level ``predict()`` entry point (reference: sleap_nn/inference/run.py:265)."""

from __future__ import annotations

import re
from pathlib import Path
from typing import Dict, Optional, Sequence, Union

from sleap_nn_tpu.inference.predictor import Predictor
from sleap_nn_tpu.io.model import Labels

_URL_RE = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.-]*://")


def is_remote_url(path: str) -> bool:
    """True for scheme:// inputs (http/https/s3/gs/file/...), False for
    plain local paths — including Windows drive letters (``C:\\...`` has no
    ``//``). Parity: reference cli.py ``_is_remote_url``."""
    return bool(_URL_RE.match(path)) and "://" in path


def fetch_remote_data(
    url: str,
    headers: Optional[Dict[str, str]] = None,
    stream_mode: str = "download",
    timeout: float = 60.0,
) -> str:
    """Materialize a remote data URL as a local file path.

    ``file://`` resolves in place (no copy); ``http(s)://`` downloads to a
    temp file whose suffix is preserved from the URL path so downstream
    ``.slp``/video routing keeps working; cloud schemes (s3/gs/...) need
    credentialed SDKs this build does not ship, so they raise with guidance.
    The reference streams via sleap-io 0.8.0's remote loaders; here
    ``stream_mode="stream"`` falls back to download-first.
    """
    from urllib.parse import urlparse, unquote
    from urllib.request import Request, url2pathname, urlopen

    parsed = urlparse(url)
    scheme = parsed.scheme.lower()
    if scheme == "file":
        return url2pathname(parsed.path)
    if scheme in ("http", "https"):
        import shutil
        import tempfile

        name = unquote(Path(parsed.path).name) or "remote_data"
        suffix = name[name.index("."):] if "." in name else ""
        req = Request(url, headers=dict(headers or {}))
        # Open the connection BEFORE creating the temp file so a failed
        # request (404/DNS/stall) never leaves an orphaned empty file;
        # `timeout` bounds both connect and per-read socket waits.
        with urlopen(req, timeout=timeout) as resp:
            tmp = tempfile.NamedTemporaryFile(
                suffix=suffix, prefix="sleap_nn_tpu_remote_", delete=False
            )
            try:
                with tmp:
                    shutil.copyfileobj(resp, tmp)
            except BaseException:
                Path(tmp.name).unlink(missing_ok=True)
                raise
        # The download exists only to back this process's prediction run;
        # remove it at interpreter exit so repeated CLI runs never
        # accumulate full-size copies in $TMPDIR.
        import atexit

        atexit.register(lambda p=tmp.name: Path(p).unlink(missing_ok=True))
        return tmp.name
    raise ValueError(
        f"Remote scheme {scheme!r} needs a credentialed client this build "
        f"does not ship (got {url!r}); download the file and pass a local "
        "path, or use an http(s):// URL."
    )


_ALLOWED_TRACKER_KWARGS: Optional[set] = None


def _validate_tracker_kwargs(kwargs: Dict) -> None:
    """Reject kwargs that are neither predict() params nor tracking knobs.

    ``predict(**tracker_kwargs)`` forwards the trailing kwargs to
    ``run_tracker``/``Tracker.from_config``; without validation a typo'd
    parameter (e.g. ``min_instance_scores=...``) would be silently dropped
    whenever tracking is off. The allowed set is derived from the tracker
    signatures so new knobs never need registering here.
    """
    global _ALLOWED_TRACKER_KWARGS
    if not kwargs:
        return
    if _ALLOWED_TRACKER_KWARGS is None:
        import inspect

        from sleap_nn_tpu.tracking.tracker import Tracker, run_tracker

        allowed = set()
        for fn in (run_tracker, Tracker.from_config):
            for name, p in inspect.signature(fn).parameters.items():
                if p.kind in (p.POSITIONAL_OR_KEYWORD, p.KEYWORD_ONLY):
                    allowed.add(name)
        allowed.discard("labels")
        _ALLOWED_TRACKER_KWARGS = allowed
    unknown = sorted(set(kwargs) - _ALLOWED_TRACKER_KWARGS)
    if unknown:
        raise TypeError(
            f"predict() got unexpected keyword arguments {unknown} "
            "(not recognized as tracking knobs either)."
        )


def predict(
    data_path: Union[str, Path, Labels],
    model_paths: Sequence[Union[str, Path]],
    output_path: Optional[Union[str, Path]] = None,
    frames: Optional[Sequence[int]] = None,
    peak_threshold: float = 0.2,
    refinement: str = "integral",
    integral_patch_size: int = 5,
    max_instances: Optional[int] = None,
    batch_size: int = 4,
    use_bf16: bool = False,
    data_parallel: bool = False,
    max_peaks: int = 200,
    min_line_scores: float = 0.25,
    paf_workers: int = 0,
    merge_fragments: bool = False,
    merge_method: str = "greedy",
    fg_threshold: float = 0.5,
    min_mask_area: int = 0,
    centroid_only: bool = False,
    embed: bool = False,
    video_path_map: Optional[str] = None,
    device: Optional[str] = None,
    host_resize: bool = False,
    crop_size: Optional[int] = None,
    output_format: Union[str, Sequence[str]] = "slp",
    filters=None,
    no_empty_frames: bool = False,
    only_suggested_frames: bool = False,
    exclude_user_labeled: bool = False,
    only_labeled_frames: bool = False,
    only_predicted_frames: bool = False,
    centroid_peak_threshold: Optional[float] = None,
    anchor_part: Optional[str] = None,
    video_index: Optional[int] = None,
    profile_dir: Optional[Union[str, Path]] = None,
    make_labels: bool = True,
    tracking: bool = False,
    tracker=None,
    # Preprocess overrides (reference cli.py:2408-2420).
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
    # Weight / output plumbing.
    backbone_ckpt_path: Optional[Union[str, Path]] = None,
    head_ckpt_path: Optional[Union[str, Path]] = None,
    centroid_output: str = "instance",
    stream_to_file: Optional[Union[str, Path]] = None,
    write_interval: Optional[int] = None,
    video_dataset: Optional[str] = None,
    video_input_format: str = "channels_last",
    # Remote-input plumbing (reference cli.py --headers / --stream-mode):
    # request headers for http(s) data_path URLs; "stream" falls back to
    # download-first in this build.
    headers: Optional[Dict[str, str]] = None,
    stream_mode: Optional[str] = None,
    runtime: str = "auto",
    queue_maxsize: Optional[int] = None,
    progress_callback=None,
    restore_source_videos: bool = False,
    mask_backend: Optional[str] = None,
    sam_model_id: str = "facebook/sam-vit-huge",
    sam_prompt_mode: str = "pose",
    sam_anchor_ind: Optional[int] = None,
    sam_disjointify_masks: bool = False,
    sam_overlay_path: Optional[Union[str, Path]] = None,
    sam_backend=None,
    **tracker_kwargs,
):
    """Run inference on a video/labels source with one or two trained models.

    Returns ``Labels`` (and writes ``output_path`` if given). Mirrors the
    reference entry semantics: model_paths of length 1 (single_instance /
    centroid / bottomup) or 2 (topdown).

    When ``mask_backend`` is set, ``data_path`` is treated as a pose ``.slp``
    and the call short-circuits to SAM prompted segmentation — no trained
    model is involved (reference run.py:481 SAM short-circuit).
    """
    if device == "cpu":
        # Force the CPU backend (reference --device; here: jax platform).
        import jax

        jax.config.update("jax_platforms", "cpu")

    if isinstance(data_path, (str, Path)) and is_remote_url(str(data_path)):
        # Remote URLs (reference cli.py _is_remote_url/_resolve_data_path:
        # sleap-io 0.8.0 loads .slp/video from http(s)/s3/... directly).
        # Here remote inputs are fetched to a local temp file first
        # (stream_mode "download"); file:// resolves in place. --headers
        # ride the HTTP request.
        data_path = fetch_remote_data(
            str(data_path), headers=headers, stream_mode=stream_mode
        )

    if video_dataset is not None and isinstance(data_path, (str, Path)):
        # HDF5 video source: read frames from --video_dataset inside the
        # file, honoring --video_input_format (reference cli.py:2428-2433).
        from sleap_nn_tpu.io.video import HDF5VideoBackend, Video as _Video

        data_path = _Video(
            filename=str(data_path),
            backend=HDF5VideoBackend(
                str(data_path), dataset=video_dataset,
                input_format=video_input_format,
            ),
        )

    if video_path_map:
        # Remap .slp video paths (reference --video-path-map 'old=new,...'),
        # for labels files moved between machines.
        from sleap_nn_tpu.io import load_slp

        labels = data_path if isinstance(data_path, Labels) else load_slp(str(data_path))
        mapping = dict(pair.split("=", 1) for pair in str(video_path_map).split(","))
        for vid in labels.videos:
            fn = str(vid.filename)
            for old, new in mapping.items():
                if fn == old or fn.startswith(old):
                    vid.filename = fn.replace(old, new, 1)
                    vid.backend = None  # reopen lazily at the new path
                    break
        data_path = labels

    if video_index is not None:
        # Scope a multi-video .slp source to one video (reference cli.py
        # _scope_labels_to_video, :1344): frames re-indexed to slot 0,
        # suggestions carried.
        from sleap_nn_tpu.io import load_slp
        from sleap_nn_tpu.io.model import Labels as _Labels

        labels = data_path if isinstance(data_path, Labels) else load_slp(str(data_path))
        if not 0 <= video_index < len(labels.videos):
            raise ValueError(
                f"video_index {video_index} out of range: the source has "
                f"{len(labels.videos)} video(s)."
            )
        target = labels.videos[video_index]
        data_path = _Labels(
            labeled_frames=[lf for lf in labels.labeled_frames if lf.video is target],
            videos=[target],
            skeletons=labels.skeletons,
            suggestions=[s_ for s_ in labels.suggestions if s_.video is target],
            provenance=dict(labels.provenance),
        )

    if exclude_user_labeled:
        # Don't re-predict frames a human already labeled (reference
        # cli.py --exclude_user_labeled).
        from sleap_nn_tpu.io import load_slp
        from sleap_nn_tpu.io.model import Labels as _Labels

        labels = data_path if isinstance(data_path, Labels) else load_slp(str(data_path))
        data_path = _Labels(
            labeled_frames=[
                lf for lf in labels.labeled_frames if not lf.has_user_instances
            ],
            videos=labels.videos,
            skeletons=labels.skeletons,
            suggestions=labels.suggestions,
        )

    if only_labeled_frames or only_predicted_frames:
        # Scope a .slp source to frames that already carry user labels
        # (--only_labeled_frames) or predictions (--only_predicted_frames)
        # (reference cli.py:2422-2425).
        from sleap_nn_tpu.io import load_slp
        from sleap_nn_tpu.io.model import Labels as _Labels

        labels = data_path if isinstance(data_path, Labels) else load_slp(str(data_path))
        keep = [
            lf for lf in labels.labeled_frames
            if (not only_labeled_frames or lf.has_user_instances)
            and (not only_predicted_frames or lf.has_predicted_instances)
        ]
        data_path = _Labels(
            labeled_frames=keep,
            videos=labels.videos,
            skeletons=labels.skeletons,
            suggestions=labels.suggestions,
        )

    # Frame-selection provenance (recorded after prediction): the suggestion
    # block below CONSUMES `frames`, so resolve the method up front.
    _frame_selection_method = (
        "suggested" if only_suggested_frames
        else "labeled" if only_labeled_frames
        else "list" if frames
        else "all"
    )
    if only_suggested_frames:
        # GUI workflow: predict on the .slp's suggested frames (which may be
        # unlabeled) instead of its labeled frames (reference cli.py:680).
        from sleap_nn_tpu.io import load_slp
        from sleap_nn_tpu.io.model import LabeledFrame, Labels as _Labels

        labels = data_path if isinstance(data_path, Labels) else load_slp(str(data_path))
        if not labels.suggestions:
            raise ValueError(
                "only_suggested_frames: the labels file has no suggestions."
            )
        wanted = set(frames) if frames else None
        data_path = _Labels(
            labeled_frames=[
                LabeledFrame(video=s_.video, frame_idx=s_.frame_idx, instances=[])
                for s_ in labels.suggestions
                if wanted is None or s_.frame_idx in wanted
            ],
            videos=labels.videos,
            skeletons=labels.skeletons,
        )
        frames = None

    _validate_tracker_kwargs(tracker_kwargs)
    if centroid_output != "instance" and (tracking or tracker is not None):
        # Guard BEFORE any inference work (reference run.py:532, issue #582):
        # the tracker operates on PredictedInstance records; centroid-record
        # output would be silently dropped by tracking.
        raise ValueError(
            "Tracking is incompatible with centroid_output="
            f"{centroid_output!r}: tracking operates on PredictedInstance, "
            "not centroid records. Use centroid_output='instance' (the "
            "default) for tracking."
        )

    if mask_backend is not None:
        if model_paths:
            # Same rule the CLI enforces (reference cli.py SAM short-circuit):
            # prompted segmentation uses the poses already in the .slp, so a
            # trained model makes the request ambiguous.
            raise ValueError(
                "mask_backend cannot be combined with model_paths: SAM "
                "prompted segmentation reads poses from the input .slp. "
                "Drop model_paths, or run predict without mask_backend."
            )
        from sleap_nn_tpu.inference.sam import run_sam_segmentation

        return run_sam_segmentation(
            data_path,
            mask_backend,
            backend=sam_backend,
            prompt_mode=sam_prompt_mode,
            sam_model_id=sam_model_id,
            anchor_ind=sam_anchor_ind,
            disjointify_masks=sam_disjointify_masks,
            output_path=output_path,
            overlay_path=sam_overlay_path,
            frames=frames,
        )
    # A single -m pointing at a serialized export dir loads the baked graph
    # (reference run.py export_dir path). --runtime selects the format when
    # the export dir carries more than one; 'auto' accepts either. The
    # exported predictor then flows through the SAME post-prediction pipeline
    # below (tracking, filters, no_empty_frames, stream_to_file, embed) —
    # the reference forwards these to the exported runtime too
    # (reference cli.py:1746-1755).
    predictor = None
    if len(model_paths) == 1:
        mp = Path(model_paths[0])
        has_hlo = (mp / "model.stablehlo").exists()
        has_sm = (mp / "savedmodel").is_dir()
        if (mp / "metadata.json").exists() and (has_hlo or has_sm):
            # Artifact selection/validation happens against metadata in
            # load_exported_model (a dir with both kinds is ambiguous).
            predictor = Predictor.from_export_dir(
                mp, max_instances=max_instances,
                min_line_scores=min_line_scores, runtime=runtime,
            )
            predictor.filters = filters
            predictor.mask_output = mask_output
            predictor.polygon_epsilon = polygon_epsilon
            # Exported graphs BAKE the peak threshold at export time (the
            # traced program thresholds on device); a differing request
            # would otherwise be ignored in silence — the class of no-op
            # flag the reference's filter logging exists to prevent.
            import logging as _logging

            _log = _logging.getLogger("sleap_nn_tpu")
            meta = getattr(predictor.layer, "meta", None)
            for flag, requested in (
                ("peak_threshold", peak_threshold),
                ("refinement", refinement),
                ("max_peaks", max_peaks),
            ):
                baked = getattr(meta, flag, None)
                if baked is not None and requested is not None \
                        and requested != baked:
                    _log.warning(
                        "%s=%s ignored: this export dir baked %s into the "
                        "compiled graph at export time — re-export with the "
                        "desired value, or use filter flags for post-hoc "
                        "screening.", flag, requested, baked,
                    )

    if predictor is None:
        predictor = Predictor.from_model_paths(
            model_paths,
            peak_threshold=peak_threshold,
            refinement=refinement,
            integral_patch_size=integral_patch_size,
            max_instances=max_instances,
            batch_size=batch_size,
            use_bf16=use_bf16,
            data_parallel=data_parallel,
            max_peaks=max_peaks,
            min_line_scores=min_line_scores,
            paf_workers=paf_workers,
            merge_fragments=merge_fragments,
            crop_size=crop_size,
            filters=filters,
            centroid_peak_threshold=centroid_peak_threshold,
            anchor_part=anchor_part,
            host_resize=host_resize,
            centroid_only=centroid_only,
            merge_method=merge_method,
            fg_threshold=fg_threshold,
            min_mask_area=min_mask_area,
            input_scale=input_scale,
            max_height=max_height,
            max_width=max_width,
            ensure_rgb=ensure_rgb,
            ensure_grayscale=ensure_grayscale,
            max_edge_length_ratio=max_edge_length_ratio,
            dist_penalty_weight=dist_penalty_weight,
            n_points=n_points,
            min_instance_peaks=min_instance_peaks,
            center_nms_kernel=center_nms_kernel,
            distance_gate_alpha=distance_gate_alpha,
            mask_cleanup=mask_cleanup,
            mask_cleanup_radius=mask_cleanup_radius,
            merge_dilate=merge_dilate,
            merge_w_valley=merge_w_valley,
            merge_w_offset=merge_w_offset,
            merge_thresholds=merge_thresholds,
            full_res_masks=full_res_masks,
            mask_output=mask_output,
            polygon_epsilon=polygon_epsilon,
            backbone_ckpt_path=backbone_ckpt_path,
            head_ckpt_path=head_ckpt_path,
        )
    predictor.centroid_output = centroid_output
    # In --only_labeled_frames (GT) mode, mixed frames expose only their
    # user instances as ground-truth centroids (reference finding 43).
    predictor.gt_user_instances_only = bool(only_labeled_frames)
    if queue_maxsize:
        # --queue-maxsize is specified in FRAMES (reference legacy
        # run_inference); providers prefetch whole batches.
        predictor.prefetch_batches = max(
            1, int(queue_maxsize) // max(1, predictor.batch_size)
        )
    if progress_callback is not None:
        predictor.progress_callback = progress_callback
    # Run-logging context (#610): the predictor's spin-up/summary lines report
    # whether tracking will run and where output lands.
    predictor.tracking_active = bool(tracking or tracker is not None)
    if output_path is not None:
        predictor.output_path_hint = str(output_path)
    stream_writer = None
    if make_labels and stream_to_file is not None:
        # --stream-to-file (reference cli.py:2814): frames flush to a temp
        # .slp DURING prediction (crash-safe), atomic rename on finalize.
        # Whole-video passes (tracking, frame filtering) would invalidate
        # already-flushed frames — the CLI rejects those combinations and the
        # Python API mirrors that here.
        if tracking or tracker is not None or no_empty_frames:
            raise ValueError(
                "stream_to_file streams frames as they are predicted and "
                "cannot be combined with tracking or no_empty_frames "
                "(those rewrite frames after the full run)."
            )
        from sleap_nn_tpu.inference.writer import IncrementalLabelsWriter

        stream_writer = IncrementalLabelsWriter(
            stream_to_file, flush_every=int(write_interval or 500)
        )
        predictor.stream_writer = stream_writer
    if profile_dir is not None:
        # XLA/TPU profiler trace around the whole predict loop; open with
        # TensorBoard or Perfetto to see device steps vs H2D vs host gaps.
        import jax

        with jax.profiler.trace(str(profile_dir)):
            result = predictor.predict(
                data_path, frames=frames, make_labels=make_labels
            )
    else:
        result = predictor.predict(data_path, frames=frames, make_labels=make_labels)
    if make_labels and (tracking or tracker is not None):
        if tracker is not None:
            result = tracker.track_labels(result)
        else:
            # run_tracker accepts the full knob set: pre-cull, clean cull,
            # post_connect_single_breaks + every Tracker.from_config knob.
            # features / scoring_method left unset resolve by model type
            # (reference cli.py:2743-2767 + apply_tracking #586): centroid /
            # single-node models -> centroids + euclidean_dist, segmentation
            # (mask) models -> masks + mask_iou.
            from sleap_nn_tpu.tracking.tracker import run_tracker

            mt = predictor.model_type
            if "features" not in tracker_kwargs:
                if mt in ("bottomup_segmentation", "semantic_segmentation",
                          "topdown_segmentation"):
                    tracker_kwargs["features"] = "masks"
                elif mt == "centroid" or len(predictor.skeleton.nodes) == 1:
                    tracker_kwargs["features"] = "centroids"
            if "scoring_method" not in tracker_kwargs:
                feats = tracker_kwargs.get("features")
                if feats == "masks":
                    tracker_kwargs["scoring_method"] = "mask_iou"
                elif feats == "centroids":
                    tracker_kwargs["scoring_method"] = "euclidean_dist"
            result = run_tracker(result, **tracker_kwargs)
    if make_labels:
        # Enrich the predictor's base provenance with run-level lineage
        # (reference provenance.py:18): source file, frame selection,
        # inference + tracking params. Never fails the run.
        try:
            from sleap_nn_tpu.inference.provenance import (
                build_inference_provenance,
                merge_provenance,
            )

            run_prov = build_inference_provenance(
                model_dirs=None,
                model_type=predictor.model_type,
                input_path=None if isinstance(data_path, Labels) else data_path,
                input_labels=data_path if isinstance(data_path, Labels) else None,
                frames_processed=len(result.labeled_frames),
                frame_selection_method=_frame_selection_method,
                inference_params={
                    "peak_threshold": peak_threshold,
                    "batch_size": batch_size,
                    "refinement": refinement,
                    "max_instances": max_instances,
                },
                # Record tracking params ONLY when tracking actually ran.
                tracking_params=tracker_kwargs
                if (tracking or tracker is not None) else None,
                device=device,
                include_system_info=False,  # base prov already has versions
            )
            result.provenance = merge_provenance(
                dict(getattr(result, "provenance", {}) or {}), run_prov,
                overwrite=False,
            )
        except Exception:
            pass
    if make_labels and no_empty_frames:
        # Mirror the reference --no_empty_frames: drop frames with nothing on
        # them (neither instances nor masks) before saving.
        result.labeled_frames = [
            lf for lf in result.labeled_frames if lf.instances or lf.masks
        ]
    if stream_writer is not None:
        # Frames were flushed during prediction; stamp provenance and
        # atomically finalize the streamed file.
        stream_writer.provenance = dict(getattr(result, "provenance", {}) or {})
        stream_writer.finalize()
        predictor.stream_writer = None
    if make_labels and restore_source_videos and not embed:
        # On a non-embedding save, restore references to the pre-embedding
        # source videos when recorded (reference cli.py:2320).
        for vid in result.videos:
            src = getattr(vid, "source_video", None)
            if src is not None:
                idx = result.videos.index(vid)
                result.videos[idx] = src
                for lf in result.labeled_frames:
                    if lf.video is vid:
                        lf.video = src
    if make_labels and output_path is not None:
        save_predictions(result, output_path, output_format=output_format, embed=embed)
    return result


def _normalize_output_formats(output_format) -> set:
    formats = (
        {output_format} if isinstance(output_format, str) else set(output_format)
    )
    bad = formats - {"slp", "analysis_h5"}
    if bad:
        raise ValueError(
            f"Unknown output_format {sorted(bad)}; expected 'slp' and/or 'analysis_h5'."
        )
    return formats


def save_predictions(
    labels: Labels,
    output_path,
    output_format: Union[str, Sequence[str]] = "slp",
    video_index: Optional[int] = None,
    embed: bool = False,
):
    """Save predictions as .slp and/or SLEAP Analysis HDF5 (reference run.py:208).

    Returns the list of analysis HDF5 paths written (empty unless
    'analysis_h5' was requested).
    """
    from sleap_nn_tpu.io.analysis import save_analysis_h5_files

    formats = _normalize_output_formats(output_format)
    if "slp" in formats:
        labels.save(str(output_path), embed=embed)
    if "analysis_h5" in formats:
        return save_analysis_h5_files(labels, output_path, video_index=video_index)
    return []
