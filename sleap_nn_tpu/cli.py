"""Command-line interface.

Parity target: reference sleap_nn/cli.py:170-3097 — the ``sleap-nn``
command surface: ``train``, ``predict`` (+ hidden ``infer`` alias),
``track``, ``eval``, ``system``, ``info``, ``config``, ``export``. Built on
click; config overrides use the same dotted ``a.b.c=value`` syntax.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path
from typing import Optional, Tuple

import click


@click.group(name="sleap-nn-tpu")
@click.version_option("0.1.0", prog_name="sleap-nn-tpu")
def cli():
    """sleap-nn-tpu: TPU-native animal pose estimation (train / predict / track / eval)."""
    # Run-observability lines (#610: spin-up header, filter confirmations,
    # run summary) go through the library logger; surface them on stderr at
    # INFO when the embedding app hasn't configured logging itself.
    import logging

    lib_logger = logging.getLogger("sleap_nn_tpu")
    if not lib_logger.handlers and not logging.getLogger().handlers:
        handler = logging.StreamHandler()
        handler.setFormatter(logging.Formatter("%(levelname)s %(message)s"))
        lib_logger.addHandler(handler)
        lib_logger.setLevel(logging.INFO)


def make_rolling_fps(window: int = 32, clock=None):
    """Windowed frames/sec formatter for the progress column.

    Parity target: reference cli.py:1959 ``_make_fps_column`` (issue #610
    PR-A) — the rate is computed over a trailing window of
    ``(time, processed_frames)`` samples so it is batch-size-invariant and
    tracks the CURRENT throughput, not the lifetime mean. Returns a
    callable ``fps_of(n_done) -> str`` ('' until two samples with a
    positive time delta exist). ``clock`` is injectable for tests.
    """
    import time as _time
    from collections import deque

    clock = clock or _time.perf_counter
    samples = deque(maxlen=window)

    def fps_of(n_done: int) -> str:
        samples.append((clock(), n_done))
        if len(samples) >= 2:
            (t0, n0), (t1, n1) = samples[0], samples[-1]
            if t1 > t0:
                return f"{(n1 - n0) / (t1 - t0):.1f} fps"
        return ""

    return fps_of


def _parse_overrides(pairs: Tuple[str, ...]) -> dict:
    out = {}
    for pair in pairs:
        if "=" not in pair:
            raise click.UsageError(f"Override must be key=value, got: {pair}")
        k, v = pair.split("=", 1)
        out[k] = v
    return out


@cli.command()
@click.argument("config_path", type=click.Path(exists=True), required=False)
@click.option("--config", "config_opt", default=None,
              help="Path to the config YAML (alternative to the positional).")
@click.option("--config-name", "-c", "config_name", default=None,
              help="Configuration file name (legacy hydra-style).")
@click.option("--config-dir", "-d", "config_dir", default=".", show_default=True,
              help="Configuration directory (legacy hydra-style).")
@click.option("--video-paths", "-v", "video_paths", multiple=True,
              help="Replace the labels file's video paths in order; "
                   "repeatable.")
@click.option("--video-path-map", "video_path_map", nargs=2, multiple=True,
              metavar="OLD NEW", help="Map one old video path to a new path; "
                                      "repeatable.")
@click.option("--prefix-map", "prefix_map", nargs=2, multiple=True,
              metavar="OLD NEW",
              help="Map an old path prefix to a new prefix for ALL videos; "
                   "repeatable.")
@click.option("--video-config", "video_config", default=None, hidden=True,
              help="YAML with video_paths/video_path_map/prefix_map "
                   "(internal use for multi-process launches).")
@click.argument("overrides", nargs=-1)
def train(config_path, config_opt, config_name, config_dir, video_paths,
          video_path_map, prefix_map, video_config, overrides):
    """Train a model from a config YAML (dotted OVERRIDES like a.b.c=value)."""
    from sleap_nn_tpu.config import TrainingJobConfig
    from sleap_nn_tpu.train import run_training

    # Resolve the config source: positional, --config, or the legacy
    # --config-dir/--config-name pair (reference cli.py:331-377).
    if config_path is None:
        if config_opt is not None:
            config_path = config_opt
        elif config_name is not None:
            name = config_name if config_name.endswith((".yaml", ".yml", ".json")) \
                else config_name + ".yaml"
            config_path = str(Path(config_dir) / name)
        else:
            raise click.UsageError(
                "Provide a config: positional CONFIG_PATH, --config, or "
                "--config-dir/--config-name."
            )
    if not Path(config_path).exists():
        raise click.UsageError(f"Config not found: {config_path}")

    cfg = TrainingJobConfig.load_yaml(config_path, overrides=_parse_overrides(overrides))
    if video_config:
        import yaml

        with open(video_config) as f:
            vc = yaml.safe_load(f) or {}
        video_paths = video_paths or tuple(vc.get("video_paths", ()))
        video_path_map = video_path_map or tuple(
            (k, v) for k, v in (vc.get("video_path_map") or {}).items()
        )
        prefix_map = prefix_map or tuple(
            (k, v) for k, v in (vc.get("prefix_map") or {}).items()
        )
    if video_paths or video_path_map or prefix_map:
        cfg.data_config.video_paths = list(video_paths)
        cfg.data_config.video_path_map = dict(video_path_map)
        cfg.data_config.video_prefix_map = dict(prefix_map)
    trainer = run_training(cfg)
    if trainer.ckpt_dir:
        click.echo(f"Model saved to: {trainer.ckpt_dir}")


class _CommaFloatTuple(click.ParamType):
    """Comma-separated float list, e.g. '0.85,0.6,0.4'."""

    name = "floats"

    def convert(self, value, param, ctx):
        if isinstance(value, tuple):
            return value
        try:
            return tuple(float(v) for v in str(value).split(","))
        except ValueError:
            self.fail(f"{value!r} is not a comma-separated float list", param, ctx)


def _parse_int_list(ctx, param, value):
    """'1,3,5' -> [1, 3, 5] (reference cli.py:49)."""
    if value is None:
        return None
    try:
        return [int(v) for v in str(value).split(",") if v != ""]
    except ValueError:
        raise click.BadParameter(f"{value!r} is not a comma-separated int list")


def _inference_options(f):
    """Shared predict/infer/track flag list (reference cli.py:2252
    ``_common_inference_options``). Every option accepts both dashed and
    underscored spellings for drop-in compatibility with reference scripts.
    """
    opts = [
        # -- input / output ----------------------------------------------------
        click.option("--data-path", "--data_path", "-i", "data_path", required=True,
                     help="Video or .slp path."),
        click.option("--headers", default=None,
                     help="JSON HTTP headers for a remote --data-path URL "
                          "(e.g. '{\"Authorization\": \"Bearer ...\"}'; "
                          "ignored for local inputs)."),
        click.option("--stream-mode", "--stream_mode", "stream_mode", default=None,
                     type=click.Choice(["download", "stream"]),
                     help="Remote read strategy for a --data-path URL; "
                          "'stream' falls back to download-first in this "
                          "build (ignored for local inputs)."),
        click.option("--model-paths", "--model_paths", "-m", "model_paths",
                     multiple=True,
                     help="Model dir(s); pass twice for topdown (centroid + "
                          "centered_instance). Omit only with --mask-backend."),
        click.option("--output-path", "--output_path", "-o", "output_path",
                     default=None, help="Output .slp path."),
        click.option("--output-format", "--output_format", "output_format",
                     multiple=True, type=click.Choice(["slp", "analysis_h5"]),
                     help="Repeatable; default slp. analysis_h5 writes one "
                          "SLEAP Analysis HDF5 per video."),
        click.option("--embed", type=click.Choice(["auto", "true", "false"],
                                                  case_sensitive=False),
                     default="false", show_default=True,
                     help="Image-embedding policy for the .slp output: "
                          "false (backreference media), true (self-contained "
                          ".pkg.slp), auto (embed iff the input was embedded)."),
        click.option("--restore-source-videos/--no-restore-source-videos",
                     "--restore_source_videos/--no-restore_source_videos",
                     "restore_source_videos", default=False,
                     help="On a non-embedding save, restore references to the "
                          "pre-embedding source videos when recorded."),
        click.option("--stream-to-file", "--stream_to_file", "stream_to_file",
                     default=None,
                     help="Write predictions to this .slp via the incremental "
                          "writer (crash-safe temp flushes, atomic finalize)."),
        click.option("--write-interval", "--write_interval", "write_interval",
                     default=None, type=int,
                     help="Flush cadence (frames) for --stream-to-file "
                          "(default 500)."),
        click.option("--gui", is_flag=True, default=False,
                     help="Emit JSON-lines progress for GUI integration."),
        click.option("--queue-maxsize", "--queue_maxsize", "queue_maxsize",
                     type=int, default=32, show_default=True,
                     help="Max decoded frames buffered ahead of the device "
                          "(provider prefetch bound, reference VideoReader "
                          "queue knob)."),
        # -- runtime / device ---------------------------------------------------
        click.option("--device", "-d", default=None,
                     type=click.Choice(["auto", "tpu", "cpu"]),
                     help="Compute platform; 'cpu' forces the CPU backend."),
        click.option("--batch-size", "--batch_size", "-b", "batch_size",
                     default=4, show_default=True),
        click.option("--runtime", default="auto", show_default=True,
                     type=click.Choice(["auto", "stablehlo", "savedmodel"]),
                     help="Runtime for an exported model dir passed to "
                          "--model-paths; ignored for trained checkpoints."),
        click.option("--use-bf16/--no-use-bf16", "--use_bf16/--no-use_bf16",
                     "use_bf16", default=False, show_default=True,
                     help="bfloat16 forward pass (TPU fast path)."),
        click.option("--data-parallel/--no-data-parallel",
                     "--data_parallel/--no-data_parallel", "data_parallel",
                     default=False, show_default=True,
                     help="SPMD inference over ALL local devices: each "
                          "batch's leading axis shards across the mesh "
                          "(params replicated). --batch-size must divide "
                          "the device count."),
        click.option("--host-resize/--no-host-resize", "host_resize",
                     default=False, show_default=True,
                     help="Downscale frames on the host before transfer "
                          "(cuts H2D payload; cv2 bilinear instead of the "
                          "on-device resize)."),
        click.option("--paf-workers", "--paf_workers", "paf_workers",
                     default=0, show_default=True,
                     help="Worker processes for bottom-up PAF grouping (0 = inline)."),
        click.option("--cpu-workers", "--cpu_workers", "cpu_workers",
                     default=None, type=int,
                     help="[DEPRECATED] Use --paf-workers."),
        click.option("--profile-dir", default=None,
                     help="Write an XLA profiler trace of the predict loop "
                          "here (open with TensorBoard/Perfetto)."),
        # -- frame / source scoping ---------------------------------------------
        click.option("--frames", default=None,
                     help="Frame range like 0-100 or comma list."),
        click.option("--video-index", "--video_index", "video_index",
                     default=None, type=int,
                     help="Restrict a multi-video .slp source to one video."),
        click.option("--video-dataset", "--video_dataset", "video_dataset",
                     default=None,
                     help="HDF5 dataset path for an .h5 video source."),
        click.option("--video-input-format", "--video_input_format",
                     "video_input_format", default="channels_last",
                     show_default=True,
                     help="Axis order of an HDF5 video dataset."),
        click.option("--video-path-map", default=None,
                     help="Remap .slp video paths: 'old=new' (repeatable via "
                          "comma: 'a=b,c=d')."),
        click.option("--only-labeled-frames", "--only_labeled_frames",
                     "only_labeled_frames", is_flag=True, default=False,
                     help="Predict only on frames with user labels."),
        click.option("--only-suggested-frames/--all-frames",
                     "--only_suggested_frames/--all_frames",
                     "only_suggested_frames", default=False, show_default=True,
                     help="Predict on the .slp's suggested frames instead of "
                          "its labeled frames."),
        click.option("--only-predicted-frames", "--only_predicted_frames",
                     "only_predicted_frames", is_flag=True, default=False,
                     help="Predict only on frames that already have predictions."),
        click.option("--exclude-user-labeled/--include-user-labeled",
                     "--exclude_user_labeled/--include_user_labeled",
                     "exclude_user_labeled", default=False, show_default=True,
                     help="Skip frames that already carry user labels."),
        click.option("--no-empty-frames/--keep-empty-frames",
                     "--no_empty_frames/--keep_empty_frames",
                     "no_empty_frames", default=False, show_default=True,
                     help="Drop frames with no predictions before saving."),
        # -- model / preprocessing ----------------------------------------------
        click.option("--backbone-ckpt-path", "--backbone_ckpt_path",
                     "backbone_ckpt_path", default=None,
                     help="Swap the backbone weights from another checkpoint."),
        click.option("--head-ckpt-path", "--head_ckpt_path", "head_ckpt_path",
                     default=None,
                     help="Swap the head weights from another checkpoint."),
        click.option("--max-height", "--max_height", "max_height",
                     default=None, type=int),
        click.option("--max-width", "--max_width", "max_width",
                     default=None, type=int),
        click.option("--input-scale", "--input_scale", "input_scale",
                     default=None, type=float),
        click.option("--ensure-rgb/--no-ensure-rgb",
                     "--ensure_rgb/--no-ensure_rgb", "ensure_rgb", default=None,
                     help="Force RGB conversion of input frames."),
        click.option("--ensure-grayscale/--no-ensure-grayscale",
                     "--ensure_grayscale/--no-ensure_grayscale",
                     "ensure_grayscale", default=None,
                     help="Force grayscale conversion of input frames."),
        click.option("--crop-size", "--crop_size", "crop_size",
                     default=None, type=int),
        click.option("--anchor-part", "--anchor_part", "anchor_part",
                     default=None,
                     help="Skeleton node used as the GT-centroid anchor "
                          "(centered-instance-only inference)."),
        # -- peaks --------------------------------------------------------------
        click.option("--peak-threshold", "--peak_threshold",
                     "--peak-conf-threshold", "peak_threshold",
                     default=0.2, show_default=True,
                     help="Min confmap value for a valid peak."),
        click.option("--centroid-peak-threshold", "--centroid_peak_threshold",
                     "centroid_peak_threshold", default=None, type=float,
                     help="Separate stage-1 (centroid) threshold for topdown."),
        click.option("--max-instances", "--max_instances", "-n",
                     "max_instances", default=None, type=int),
        click.option("--max-peaks", default=200, show_default=True),
        click.option("--integral-refinement", "--integral_refinement",
                     "--refinement", "refinement", default="integral",
                     show_default=True,
                     type=click.Choice(["integral", "local", "none"])),
        click.option("--integral-patch-size", "--integral_patch_size",
                     "integral_patch_size", default=5, show_default=True),
        click.option("--centroid-only/--full-pipeline",
                     "--centroid_only/--full_pipeline", "centroid_only",
                     default=False, show_default=True,
                     help="Run only the centroid stage of a topdown pair."),
        click.option("--centroid-output", "--centroid_output",
                     "centroid_output", default="instance", show_default=True,
                     type=click.Choice(["instance", "centroid", "both"]),
                     help="Centroid-only output representation."),
        # -- PAF grouping (bottomup) ---------------------------------------------
        click.option("--max-edge-length-ratio", "--max_edge_length_ratio",
                     "max_edge_length_ratio", default=0.25, show_default=True),
        click.option("--dist-penalty-weight", "--dist_penalty_weight",
                     "dist_penalty_weight", default=1.0, show_default=True),
        click.option("--n-points", "--n_points", "n_points",
                     default=10, show_default=True),
        click.option("--min-instance-peaks", "--min_instance_peaks",
                     "min_instance_peaks", default=0.0, show_default=True),
        click.option("--min-line-scores", "--min_line_scores",
                     "min_line_scores", default=0.25, show_default=True),
        # -- segmentation ---------------------------------------------------------
        click.option("--fg-threshold", "--fg_threshold", "fg_threshold",
                     default=0.5, show_default=True,
                     help="Foreground probability cutoff (segmentation models)."),
        click.option("--min-mask-area", "--min_mask_area", "min_mask_area",
                     default=0, show_default=True,
                     help="Drop predicted masks smaller than this many "
                          "ORIGINAL-image pixels (converted to grid units "
                          "when masks stay at output-stride resolution). "
                          "0 disables (reference default)."),
        click.option("--center-nms-kernel", "--center_nms_kernel",
                     "center_nms_kernel", default=3, show_default=True, type=int,
                     help="Odd NMS window for instance-center peaks; larger "
                          "merges nearby duplicate centers."),
        click.option("--mask-cleanup/--no-mask-cleanup",
                     "--mask_cleanup/--no-mask_cleanup", "mask_cleanup",
                     default=True, show_default=True,
                     help="Keep each mask's largest connected component and "
                          "fill interior holes."),
        click.option("--mask-cleanup-radius", "--mask_cleanup_radius",
                     "mask_cleanup_radius", default=0, show_default=True, type=int,
                     help="Disk radius for a morphological open->close before "
                          "cleanup (despeckle / close pinholes)."),
        click.option("--distance-gate-alpha", "--distance_gate_alpha",
                     "distance_gate_alpha", default=None, type=float,
                     help="Scale-free stray-pixel gate: drop fg pixels whose "
                          "voted center exceeds alpha*sqrt(area/pi) from the "
                          "assigned center."),
        click.option("--merge-fragments/--no-merge-fragments",
                     "--merge_fragments/--no-merge_fragments",
                     "merge_fragments", default=False, show_default=True,
                     help="Fuse over-segmented mask fragments (bottom-up segmentation)."),
        click.option("--merge-method", "--merge_method", "merge_method",
                     default="greedy", show_default=True,
                     type=click.Choice(["greedy", "multicut"]),
                     help="Fragment-merge strategy (with --merge-fragments)."),
        click.option("--merge-thresholds", "--merge_thresholds",
                     "merge_thresholds", type=_CommaFloatTuple(),
                     default=(0.85, 0.6, 0.4), show_default=True,
                     help="Decreasing affinity thresholds for greedy merging."),
        click.option("--merge-w-valley", "--merge_w_valley", "merge_w_valley",
                     default=1.0, show_default=True,
                     help="Weight of the center-valley ridge affinity term."),
        click.option("--merge-w-offset", "--merge_w_offset", "merge_w_offset",
                     default=0.25, show_default=True,
                     help="Weight of the offset-agreement affinity term."),
        click.option("--merge-dilate", "--merge_dilate", "merge_dilate",
                     default=1, show_default=True, type=int,
                     help="Dilation iterations for the fragment contact test."),
        click.option("--full-res-masks/--no-full-res-masks",
                     "--full_res_masks/--no-full_res_masks", "full_res_masks",
                     default=False, show_default=True,
                     help="Emit masks at ORIGINAL image resolution instead of "
                          "the output-stride grid."),
        click.option("--mask-output", "--mask_output", "mask_output",
                     default="mask", show_default=True,
                     type=click.Choice(["mask", "polygon", "both"]),
                     help="Mask representation: dense mask, simplified "
                          "polygon ROI, or both."),
        click.option("--polygon-epsilon", "--polygon_epsilon",
                     "polygon_epsilon", default=0.01, show_default=True,
                     help="Douglas-Peucker tolerance as a fraction of the "
                          "contour perimeter (0 disables)."),
        # -- SAM prompted-mask producer -------------------------------------------
        click.option("--mask-backend", "--mask_backend", "mask_backend",
                     default=None, type=click.Choice(["sam", "sam_jax", "sam3"],
                                                     case_sensitive=False),
                     help="Produce instance masks from the poses in the input "
                          ".slp via a SAM backend (no trained model; omit "
                          "--model-paths)."),
        click.option("--sam-checkpoint", "--sam_checkpoint", "sam_checkpoint",
                     default=None,
                     help="Path to the SAM1 checkpoint (--mask-backend sam)."),
        click.option("--sam-model-type", "--sam_model_type", "sam_model_type",
                     default="vit_h", show_default=True,
                     help="SAM1 model registry key."),
        click.option("--sam-prompt-mode", "--sam_prompt_mode",
                     "sam_prompt_mode", default="pose", show_default=True,
                     type=click.Choice(["pose", "centroid", "box"])),
        click.option("--sam-anchor-ind", "--sam_anchor_ind", "sam_anchor_ind",
                     default=None, type=int,
                     help="Centroid anchor node index (prompt mode centroid)."),
        click.option("--sam-disjointify-masks", "--sam_disjointify_masks",
                     "sam_disjointify_masks", is_flag=True, default=False,
                     help="Make per-frame masks disjoint when overlapping."),
        click.option("--sam3-model-id", "--sam3_model_id", "sam3_model_id",
                     default="facebook/sam3", show_default=True,
                     help="Hugging Face model id for the SAM3 backend."),
        click.option("--overlay-path", "--overlay_path", "overlay_path",
                     default=None,
                     help="Optional review-overlay PNG written by the SAM path."),
        # -- instance filters -------------------------------------------------------
        click.option("--filter-overlapping", "--filter_overlapping",
                     "filter_overlapping", is_flag=True, default=False,
                     help="Suppress overlapping instances (see "
                          "--filter-overlapping-method)."),
        click.option("--filter-overlapping-method",
                     "--filter_overlapping_method", "filter_overlapping_method",
                     default="iou", show_default=True,
                     type=click.Choice(["iou", "oks"])),
        click.option("--filter-overlapping-threshold",
                     "--filter_overlapping_threshold",
                     "filter_overlapping_threshold", default=0.8,
                     show_default=True),
        click.option("--filter-min-visible-nodes", "--filter_min_visible_nodes",
                     "filter_min_visible_nodes", default=None, type=int,
                     help="Drop instances with fewer visible nodes."),
        click.option("--filter-min-visible-node-fraction",
                     "--filter_min_visible_node_fraction",
                     "filter_min_visible_node_fraction", default=None, type=float,
                     help="Drop instances with a lower visible-node fraction."),
        click.option("--filter-min-mean-node-score",
                     "--filter_min_mean_node_score",
                     "filter_min_mean_node_score", default=None, type=float,
                     help="Drop instances whose mean visible-node score is lower."),
        click.option("--filter-min-node-confidence",
                     "--filter_min_node_confidence",
                     "filter_min_node_confidence", default=None, type=float,
                     help="NaN-out nodes below this confidence."),
        click.option("--filter-min-instance-score",
                     "--filter_min_instance_score", "filter_min_instance_score",
                     default=None, type=float,
                     help="Drop instances below this score."),
        click.option("--filter-min-centroid-distance",
                     "--filter_min_centroid_distance",
                     "filter_min_centroid_distance", default=None, type=float,
                     help="Greedy NMS radius (px) for centroid-only output "
                          "de-duplication."),
        # -- tracking ------------------------------------------------------------
        click.option("--tracking/--no-tracking", "-t", "tracking",
                     default=False, show_default=True),
        click.option("--tracking-window-size", "--tracking_window_size",
                     "tracking_window_size", default=5, show_default=True),
        click.option("--min-new-track-points", "--min_new_track_points",
                     "min_new_track_points", default=0, show_default=True),
        click.option("--candidates-method", "--candidates_method",
                     "candidates_method", default=None,
                     type=click.Choice(["fixed_window", "local_queues"]),
                     help="Candidate pool strategy; --max-tracks auto-selects "
                          "local_queues."),
        click.option("--min-match-points", "--min_match_points",
                     "min_match_points", default=0, show_default=True),
        click.option("--features", default=None,
                     type=click.Choice(["keypoints", "centroids", "bboxes",
                                        "masks"]),
                     help="Track-association feature. Left unset, centroid "
                          "models resolve to centroids and mask models to masks."),
        click.option("--scoring-method", "--scoring_method",
                     "--tracking-scoring-method", "scoring_method", default=None,
                     type=click.Choice(["oks", "cosine_sim", "iou", "mask_iou",
                                        "euclidean_dist"]),
                     help="Track-association scoring. Left unset, centroid "
                          "models resolve to euclidean_dist and mask models "
                          "to mask_iou."),
        click.option("--scoring-reduction", "--scoring_reduction",
                     "scoring_reduction", default="mean", show_default=True,
                     type=click.Choice(["mean", "max", "robust_quantile"])),
        click.option("--robust-best-instance", "--robust_best_instance",
                     "robust_best_instance", default=1.0, show_default=True),
        click.option("--track-matching-method", "--track_matching_method",
                     "track_matching_method", default="hungarian",
                     show_default=True, type=click.Choice(["hungarian", "greedy"])),
        click.option("--max-tracks", "--max_tracks", "--tracking-max-tracks",
                     "max_tracks", default=None, type=int),
        click.option("--use-flow", "--use_flow", "--tracking-use-flow",
                     "use_flow", is_flag=True, default=False),
        click.option("--of-img-scale", "--of_img_scale", "of_img_scale",
                     default=1.0, show_default=True,
                     help="Image scale for optical-flow computation."),
        click.option("--of-window-size", "--of_window_size", "of_window_size",
                     default=21, show_default=True),
        click.option("--of-max-levels", "--of_max_levels", "of_max_levels",
                     default=3, show_default=True),
        click.option("--use-kalman", "--use_kalman", "use_kalman",
                     is_flag=True, default=False),
        click.option("--kf-track-features", "--kf_track_features",
                     "kf_track_features", default="centroid", show_default=True,
                     type=click.Choice(["centroid", "keypoints"])),
        click.option("--kf-init-frame-count", "--kf_init_frame_count",
                     "kf_init_frame_count", default=10, show_default=True),
        click.option("--kf-node-indices", "--kf_node_indices",
                     "kf_node_indices", default=None, callback=_parse_int_list,
                     help="Comma-separated node indices the Kalman filter tracks."),
        click.option("--kf-reset-gap-size", "--kf_reset_gap_size",
                     "kf_reset_gap_size", default=5, show_default=True),
        click.option("--oks-stddev", "--oks_stddev", "oks_stddev",
                     default=None, type=float,
                     help="OKS spread for tracking association (auto-resolved "
                          "when unset)."),
        click.option("--post-connect-single-breaks",
                     "--post_connect_single_breaks",
                     "post_connect_single_breaks", is_flag=True, default=False),
        click.option("--tracking-target-instance-count",
                     "--tracking_target_instance_count",
                     "tracking_target_instance_count", default=None, type=int),
        click.option("--tracking-pre-cull-to-target",
                     "--tracking_pre_cull_to_target",
                     "tracking_pre_cull_to_target", default=0, show_default=True,
                     type=int),
        click.option("--tracking-pre-cull-iou-threshold",
                     "--tracking_pre_cull_iou_threshold",
                     "tracking_pre_cull_iou_threshold", default=0.0,
                     show_default=True),
        click.option("--tracking-clean-instance-count",
                     "--tracking_clean_instance_count",
                     "tracking_clean_instance_count", default=0,
                     show_default=True, type=int),
        click.option("--tracking-clean-iou-threshold",
                     "--tracking_clean_iou_threshold",
                     "tracking_clean_iou_threshold", default=0.0,
                     show_default=True),
    ]
    for opt in reversed(opts):
        f = opt(f)
    return f


def _parse_frames(frames: Optional[str]):
    """'n-m' (or the legacy 'n,-m' spelling) -> range; 'a,b,c' -> list.

    Matches reference legacy_predict.frame_list:32-48: any string containing
    '-' is treated as a range, with a trailing comma stripped from the lower
    bound — so '1,-200' means frames 1..200, not [1, -200].
    """
    if not frames:
        return None
    if "-" in frames:
        lo, hi = frames.split("-")
        return list(range(int(lo.rstrip(",")), int(hi) + 1))
    return [int(x) for x in frames.split(",")]


def _default_predictions_path(data_path) -> str:
    """Default output .slp path next to the input.

    Remote URLs (reference cli.py ``_default_predictions_path``) must not go
    through ``Path()`` — ``scheme://`` would collapse — so they derive from
    the URL basename (query string dropped) in the current directory.
    """
    from sleap_nn_tpu.inference.run import is_remote_url

    s = str(data_path)
    if is_remote_url(s):
        from urllib.parse import unquote, urlparse

        name = unquote(Path(urlparse(s).path).name) or "remote_data"
        return str(Path(name).with_suffix("")) + ".predictions.slp"
    return str(Path(s).with_suffix("")) + ".predictions.slp"


def _parse_headers(raw) -> Optional[dict]:
    """--headers JSON string -> dict for the HTTP request (reference
    cli.py:1454 ``_build_remote_kwargs``)."""
    if not raw:
        return None
    try:
        parsed = json.loads(raw)
    except json.JSONDecodeError as e:
        raise click.UsageError(f"--headers must be a JSON object: {e}")
    if not isinstance(parsed, dict):
        raise click.UsageError("--headers must be a JSON object of strings.")
    return {str(k): str(v) for k, v in parsed.items()}


_TRACKER_KNOBS = (
    "tracking_window_size", "min_new_track_points", "candidates_method",
    "min_match_points", "features", "scoring_method", "scoring_reduction",
    "robust_best_instance", "track_matching_method", "max_tracks", "use_flow",
    "of_img_scale", "of_window_size", "of_max_levels", "use_kalman",
    "kf_track_features", "kf_init_frame_count", "kf_node_indices",
    "kf_reset_gap_size", "oks_stddev", "post_connect_single_breaks",
    "tracking_target_instance_count", "tracking_pre_cull_to_target",
    "tracking_pre_cull_iou_threshold", "tracking_clean_instance_count",
    "tracking_clean_iou_threshold",
)


def _build_tracker_kwargs(kw: dict) -> dict:
    """Pop the tracking flag set out of the click kwargs and shape it for
    ``run_tracker`` (reference cli.py:1242 ``_build_tracker_config``)."""
    vals = {k: kw.pop(k) for k in _TRACKER_KNOBS}
    if not kw.pop("tracking"):
        return {}
    # Legacy edge-layer defaulting (reference cli.py:1242 _build_tracker_config,
    # issue #582): --post_connect_single_breaks with no --max_tracks derives the
    # track cap from --max_instances, and post_connect / pre_cull / kalman with
    # no explicit --tracking_target_instance_count derive the target identity
    # count from --max_instances instead of crashing or silently no-op'ing.
    max_instances = kw.get("max_instances")
    if vals["post_connect_single_breaks"] and vals["max_tracks"] is None:
        vals["max_tracks"] = max_instances
    needs_target = (
        vals["post_connect_single_breaks"]
        or vals["tracking_pre_cull_to_target"]
        or vals["use_kalman"]
    )
    if needs_target and vals["tracking_target_instance_count"] is None:
        vals["tracking_target_instance_count"] = max_instances
    out = dict(
        tracking=True,
        window_size=vals["tracking_window_size"],
        min_new_track_points=vals["min_new_track_points"],
        min_match_points=vals["min_match_points"],
        scoring_reduction=vals["scoring_reduction"],
        robust_best_instance=vals["robust_best_instance"],
        track_matching_method=vals["track_matching_method"],
        max_tracks=vals["max_tracks"],
        use_flow=vals["use_flow"],
        use_kalman=vals["use_kalman"],
        kf_track_features=vals["kf_track_features"],
        kf_init_frame_count=vals["kf_init_frame_count"],
        kf_reset_gap_size=vals["kf_reset_gap_size"],
        of_img_scale=vals["of_img_scale"],
        of_window_size=vals["of_window_size"],
        of_max_levels=vals["of_max_levels"],
        post_connect_single_breaks=vals["post_connect_single_breaks"],
        target_instance_count=vals["tracking_target_instance_count"],
        pre_cull_to_target=bool(vals["tracking_pre_cull_to_target"]),
        pre_cull_iou_threshold=vals["tracking_pre_cull_iou_threshold"],
        clean_instance_count=vals["tracking_clean_instance_count"],
        clean_iou_threshold=vals["tracking_clean_iou_threshold"],
    )
    # None means "user didn't choose" -> model-type-aware defaults are
    # resolved downstream (centroid models -> centroids/euclidean_dist,
    # mask models -> masks/mask_iou; reference cli.py:2743-2767).
    for k in ("candidates_method", "features", "scoring_method", "oks_stddev",
              "kf_node_indices"):
        if vals[k] is not None:
            out[k] = vals[k]
    return out


def _run_inference(**kw):
    from sleap_nn_tpu.inference import predict

    # Inert/compat flags.
    # queue_maxsize flows through to predict() -> provider prefetch depth.
    cpu_workers = kw.pop("cpu_workers", None)
    if cpu_workers is not None:
        click.echo("WARNING: --cpu-workers is deprecated; use --paf-workers.",
                   err=True)
        if not kw.get("paf_workers"):
            kw["paf_workers"] = cpu_workers

    tracker_kwargs = _build_tracker_kwargs(kw)

    gui = kw.pop("gui")
    progress_ui = None
    if gui:
        def _gui_progress(n_done):
            click.echo(json.dumps({"n_processed": int(n_done)}), err=False)

        kw["progress_callback"] = _gui_progress
    elif sys.stderr.isatty():
        # Interactive: rich progress with a rolling-FPS column (reference
        # cli.py:1959-2077 _make_fps_column/_make_rich_progress).
        from rich.progress import Progress, SpinnerColumn, TextColumn

        progress_ui = Progress(
            SpinnerColumn(),
            TextColumn("Predicting... {task.completed} frames"),
            TextColumn("{task.fields[fps]}"),
            transient=True,
        )
        task_id = progress_ui.add_task("predict", total=None, fps="")
        fps_of = make_rolling_fps()

        def _rich_progress(n_done):
            progress_ui.update(task_id, completed=n_done, fps=fps_of(n_done))

        kw["progress_callback"] = _rich_progress

    out_fmt = kw.pop("output_format") or ("slp",)
    kw["output_format"] = list(out_fmt)

    # --stream-to-file combination rules (reference
    # tests/cli/test_flag_validation.py): the streaming writer bypasses the
    # in-memory Labels post-passes, so flags that need them are rejected.
    if kw.get("stream_to_file"):
        if tracker_kwargs:
            raise click.UsageError(
                "--stream-to-file cannot be combined with --tracking; "
                "track the written file afterwards with `track-only`."
            )
        if kw.get("no_empty_frames"):
            raise click.UsageError(
                "--stream-to-file cannot be combined with --no-empty-frames."
            )
        if str(kw.get("embed", "false")).lower() == "true":
            raise click.UsageError(
                "--stream-to-file cannot be combined with --embed true."
            )
    elif kw.get("write_interval") is not None:
        raise click.UsageError(
            "--write-interval only applies with --stream-to-file."
        )

    # --embed tri-state (reference cli.py:2310): auto embeds iff the input
    # was itself an embedded .pkg.slp.
    if kw.get("device") == "cpu":
        # Apply --device BEFORE any code can touch jax devices: paths that
        # short-circuit ahead of run.predict (tracking-only retrack, SAM)
        # must not let a bystander jax.devices() initialize the pinned
        # accelerator platform (remote-attached links may be down).
        import jax

        jax.config.update("jax_platforms", "cpu")
    embed_choice = str(kw.pop("embed")).lower()
    data_path = kw.pop("data_path")
    kw["embed"] = (
        embed_choice == "true"
        or (embed_choice == "auto" and str(data_path).endswith(".pkg.slp"))
    )

    from sleap_nn_tpu.inference.filters import FilterConfig

    overlap_on = kw.pop("filter_overlapping")
    overlap_method = kw.pop("filter_overlapping_method")  # always consumed
    fc = FilterConfig(
        min_node_count=kw.pop("filter_min_visible_nodes"),
        min_node_confidence=kw.pop("filter_min_node_confidence"),
        min_instance_score=kw.pop("filter_min_instance_score"),
        overlap_method=overlap_method if overlap_on else None,
        overlap_threshold=kw.pop("filter_overlapping_threshold"),
        max_centroid_distance=kw.pop("filter_min_centroid_distance"),
        min_visible_node_fraction=kw.pop("filter_min_visible_node_fraction"),
        min_mean_node_score=kw.pop("filter_min_mean_node_score"),
    )
    if fc.enabled():
        kw["filters"] = fc

    # SAM prompted-mask producer: poses from the input .slp, no trained model.
    mask_backend = kw.pop("mask_backend")
    sam_checkpoint = kw.pop("sam_checkpoint")
    sam_model_type = kw.pop("sam_model_type")
    sam3_model_id = kw.pop("sam3_model_id")
    kw["sam_overlay_path"] = kw.pop("overlay_path")
    if mask_backend is not None:
        kw["mask_backend"] = mask_backend
        if mask_backend == "sam3":
            kw["sam_model_id"] = sam3_model_id
        elif sam_checkpoint:
            # SAM1: a local checkpoint path doubles as the model id.
            kw["sam_model_id"] = sam_checkpoint

    model_paths = list(kw.pop("model_paths") or ())
    if (
        mask_backend is None
        and not model_paths
        and tracker_kwargs
        and str(data_path).endswith(".slp")
    ):
        # Tracking-only retrack (reference cli.py:1563): --tracking on a
        # .slp with no model_paths re-tracks the EXISTING predictions —
        # no inference. Existing track assignments are discarded.
        return _run_retrack_only(data_path, kw, tracker_kwargs, gui)
    if mask_backend is None and not model_paths:
        raise click.UsageError(
            "Provide --model-paths (trained model dir(s) or an export dir), "
            "or --mask-backend for SAM prompted masks; or combine "
            "--tracking with a predictions .slp for tracking-only retrack."
        )
    if mask_backend is not None and model_paths:
        raise click.UsageError(
            "--mask-backend produces masks from the poses already in the "
            "input .slp; do not pass --model-paths with it."
        )

    output_path = kw.pop("output_path")
    frames = _parse_frames(kw.pop("frames"))
    if output_path is None:
        output_path = _default_predictions_path(data_path)

    # Remote-input options: JSON --headers string -> dict; stream_mode
    # defaults to download-first.
    kw["headers"] = _parse_headers(kw.get("headers"))
    kw["stream_mode"] = kw.get("stream_mode") or "download"

    import contextlib

    try:
        with (progress_ui if progress_ui is not None
              else contextlib.nullcontext()):
            labels = predict(
                data_path,
                model_paths,
                output_path=output_path,
                frames=frames,
                **kw,
                **tracker_kwargs,
            )
    except Exception as e:
        # GUI mode (reference cli.py run_guarded): the SLEAP GUI reads
        # stdout JSON lines — surface the failure as one, then re-raise
        # so the exit code still reflects the error.
        if gui:
            click.echo(json.dumps({"error": str(e)}))
        raise
    n_inst = sum(len(lf.instances) for lf in labels)
    n_masks = sum(len(lf.masks) for lf in labels)
    msg = f"Predicted {len(labels)} frames, {n_inst} instances"
    if n_masks:
        msg += f", {n_masks} masks"
    # In --gui mode stdout is a JSON-lines protocol; the human line rides
    # stderr (same contract as the retrack path).
    click.echo(msg + f" -> {output_path}", err=gui)
    if gui:
        click.echo(json.dumps({
            "done": True, "n_frames": len(labels), "n_instances": n_inst,
            "output_path": str(output_path),
        }))
    return labels


def _run_retrack_only(data_path, kw: dict, tracker_kwargs: dict, gui: bool):
    """Tracking-only retrack of an existing predictions ``.slp``
    (reference cli.py:1799 ``_run_retrack_only``): strip existing track
    assignments, re-run the tracker, attach tracking-only provenance.

    Honors ``--output-format``/``--embed``/``--frames``/``--video-index``;
    flags that require the inference pipeline (instance filters,
    ``--only-suggested-frames``) are rejected rather than silently dropped.
    """
    # Fail fast on flags the retrack path cannot honor.
    if kw.get("filters") is not None:
        raise click.UsageError(
            "--filter-* options require inference and cannot be combined "
            "with tracking-only retrack (no --model-paths)."
        )
    if kw.get("only_suggested_frames"):
        raise click.UsageError(
            "--only-suggested-frames requires inference; tracking-only "
            "retrack operates on the file's existing predictions."
        )

    try:
        return _retrack_inner(data_path, kw, tracker_kwargs, gui)
    except click.UsageError:
        raise
    except Exception as e:
        # GUI contract: every failure surfaces as an error JSON line
        # (load/save included, not just the tracker itself).
        if gui:
            click.echo(json.dumps({"error": str(e)}))
        raise


def _retrack_inner(data_path, kw: dict, tracker_kwargs: dict, gui: bool):
    from datetime import datetime

    from sleap_nn_tpu.inference.provenance import build_tracking_only_provenance
    from sleap_nn_tpu.inference.run import save_predictions
    from sleap_nn_tpu.io import load_slp
    from sleap_nn_tpu.tracking import run_tracker

    labels = load_slp(str(data_path))
    frames = _parse_frames(kw.get("frames"))
    if frames:
        wanted = set(frames)
        labels.labeled_frames = [
            lf for lf in labels.labeled_frames if lf.frame_idx in wanted
        ]
    video_index = kw.get("video_index")
    if video_index is not None:
        if not 0 <= video_index < len(labels.videos):
            raise click.UsageError(
                f"--video-index {video_index} out of range for "
                f"{len(labels.videos)} video(s)."
            )
        vid = labels.videos[video_index]
        labels.labeled_frames = [
            lf for lf in labels.labeled_frames if lf.video is vid
        ]
    # Discard prior identities — retrack means from scratch.
    for lf in labels.labeled_frames:
        for inst in lf.instances:
            inst.track = None
    labels.tracks = []

    run_kwargs = dict(tracker_kwargs)
    run_kwargs.pop("tracking", None)
    t0 = datetime.now()
    labels = run_tracker(labels, **run_kwargs)
    labels.provenance = build_tracking_only_provenance(
        input_labels=labels,
        input_path=data_path,
        start_time=t0,
        end_time=datetime.now(),
        tracking_params=run_kwargs,
        frames_processed=len(labels.labeled_frames),
    )
    output_path = kw.get("output_path") or _default_predictions_path(data_path)
    save_predictions(
        labels, output_path,
        output_format=kw.get("output_format") or "slp",
        embed=bool(kw.get("embed")),
    )
    # GUI stdout is a JSON-lines protocol — the human result line must ride
    # stderr there (reference keeps loguru on stderr in --gui mode).
    click.echo(
        f"Retracked {len(labels)} frames into {len(labels.tracks)} tracks "
        f"-> {output_path}",
        err=gui,
    )
    if gui:
        click.echo(json.dumps({
            "done": True, "n_frames": len(labels),
            "n_tracks": len(labels.tracks), "output_path": str(output_path),
        }))
    return labels


@cli.command()
@_inference_options
def predict(**kw):
    """Run inference on a video or labels file."""
    _run_inference(**kw)


@cli.command(hidden=True)
@_inference_options
def infer(**kw):
    """Hidden alias of predict (reference parity)."""
    import warnings

    warnings.warn(
        "sleap-nn-tpu infer is deprecated. Use sleap-nn-tpu predict instead.",
        DeprecationWarning,
        stacklevel=2,
    )
    _run_inference(**kw)


@cli.command()
@_inference_options
def track(**kw):
    """Run inference with tracking enabled (reference `sleap-nn track`)."""
    kw["tracking"] = True
    _run_inference(**kw)


@cli.command("sam")
@click.option("--data-path", "-i", required=True, type=click.Path(exists=True),
              help="Pose .slp/.pkg.slp to produce masks for.")
@click.option("--mask-backend", required=True, type=click.Choice(["sam", "sam_jax", "sam_legacy", "sam3"]),
              help="Explicit mask backend (no default).")
@click.option("--output-path", "-o", default=None)
@click.option("--prompt-mode", default="pose", show_default=True,
              type=click.Choice(["pose", "centroid", "box"]))
@click.option("--sam-model-id", default="facebook/sam-vit-huge", show_default=True)
@click.option("--anchor-ind", default=None, type=int,
              help="Centroid anchor node index (prompt-mode=centroid).")
@click.option("--disjointify/--no-disjointify", default=False, show_default=True,
              help="Make per-frame masks disjoint via keypoint-Voronoi.")
@click.option("--overlay-path", default=None, help="Review overlay PNG path.")
@click.option("--frames", default=None, help="Frame subset, e.g. 0-100 or 3,7,9.")
def sam_cmd(data_path, mask_backend, output_path, prompt_mode, sam_model_id,
            anchor_ind, disjointify, overlay_path, frames):
    """Predict per-instance SAM masks for an existing pose .slp (review workflow)."""
    from sleap_nn_tpu.inference.sam import run_sam_segmentation

    if output_path is None:
        output_path = str(Path(data_path).with_suffix("")) + ".masks.slp"
    labels = run_sam_segmentation(
        data_path,
        mask_backend,
        prompt_mode=prompt_mode,
        sam_model_id=sam_model_id,
        anchor_ind=anchor_ind,
        disjointify_masks=disjointify,
        output_path=output_path,
        overlay_path=overlay_path,
        frames=_parse_frames(frames),
    )
    n_masks = sum(len(lf.masks) for lf in labels)
    click.echo(f"Masked {len(labels)} frames, {n_masks} masks -> {output_path}")


@cli.command("track-only")
@click.option("--data-path", "-i", required=True, help="Predicted .slp to re-track.")
@click.option("--output-path", "-o", default=None)
@click.option("--window-size", default=5, show_default=True)
@click.option("--scoring-method", default="oks", show_default=True)
@click.option("--max-tracks", default=None, type=int)
@click.option("--target-instance-count", default=None, type=int,
              help="Expected instances per frame (enables culling / break repair).")
@click.option("--pre-cull-to-target/--no-pre-cull-to-target", default=False,
              show_default=True, help="Cull frames to the target count before tracking.")
@click.option("--pre-cull-iou-threshold", default=0.0, show_default=True)
@click.option("--post-connect-single-breaks/--no-post-connect-single-breaks",
              default=False, show_default=True,
              help="Merge single-frame track breaks after tracking.")
def track_only(data_path, output_path, window_size, scoring_method, max_tracks,
               target_instance_count, pre_cull_to_target, pre_cull_iou_threshold,
               post_connect_single_breaks):
    """Assign tracks to an existing predictions file (no model inference)."""
    from datetime import datetime

    from sleap_nn_tpu.inference.provenance import build_tracking_only_provenance
    from sleap_nn_tpu.io import load_slp
    from sleap_nn_tpu.tracking import run_tracker

    labels = load_slp(data_path)
    t0 = datetime.now()
    tracking_params = dict(
        window_size=window_size, scoring_method=scoring_method,
        max_tracks=max_tracks,
        target_instance_count=target_instance_count,
        pre_cull_to_target=pre_cull_to_target,
        pre_cull_iou_threshold=pre_cull_iou_threshold,
        post_connect_single_breaks=post_connect_single_breaks,
    )
    labels = run_tracker(labels, **tracking_params)
    # Tracking-only provenance (reference provenance.py:186): pipeline type,
    # input lineage (the file's prior inference provenance is preserved),
    # tracking params, runtime.
    labels.provenance = build_tracking_only_provenance(
        input_labels=labels,
        input_path=data_path,
        start_time=t0,
        end_time=datetime.now(),
        tracking_params=tracking_params,
        frames_processed=len(labels.labeled_frames),
    )
    out = output_path or str(Path(data_path).with_suffix("")) + ".tracked.slp"
    labels.save(out)
    click.echo(f"Tracked {len(labels.tracks)} tracks -> {out}")


@cli.command("eval")
@click.option("--ground-truth", "--ground-truth-path", "--ground_truth_path",
              "-g", "ground_truth", required=True, type=click.Path(exists=True),
              help="Path to ground truth labels (.slp).")
@click.option("--predictions", "--predicted-path", "--predicted_path", "-p",
              "predictions", required=True, type=click.Path(exists=True),
              help="Path to predicted labels (.slp).")
@click.option("--save-metrics", "--save_metrics", "-s", "save_metrics",
              default=None, help="Optional .npz output path.")
@click.option("--oks-stddev", "--oks_stddev", "oks_stddev",
              default=0.025, show_default=True)
@click.option("--oks-scale", "--oks_scale", "oks_scale", default=None,
              type=float, help="Fixed OKS object scale (default: GT bbox area).")
@click.option("--match-threshold", "--match_threshold", "match_threshold",
              default=0.0, show_default=True)
@click.option("--user-labels-only/--no-user-labels-only",
              "--user_labels_only/--no-user_labels_only", "user_labels_only",
              default=True, show_default=True,
              help="Only evaluate user-labeled frames.")
@click.option("--match-method", "--match_method", "match_method",
              default="auto", show_default=True,
              type=click.Choice(["oks", "centroid", "mask", "semantic", "auto"]))
@click.option("--anchor-part", "--anchor_part", "anchor_part", default=None,
              help="GT node for ground-truth centroids in centroid mode.")
def eval_cmd(ground_truth, predictions, save_metrics, oks_stddev, oks_scale,
             match_threshold, user_labels_only, match_method, anchor_part):
    """Evaluate predictions against ground truth labels."""
    from sleap_nn_tpu.evaluation import run_evaluation

    metrics = run_evaluation(
        ground_truth,
        predictions,
        oks_stddev=oks_stddev,
        oks_scale=oks_scale,
        match_threshold=match_threshold,
        user_labels_only=user_labels_only,
        match_method=match_method,
        anchor_part=anchor_part,
        save_metrics=save_metrics,
    )
    if metrics is None:
        click.echo("No usable predictions; metrics skipped.")
        return
    summary = {}
    if "mOKS" in metrics:
        summary["mOKS"] = metrics["mOKS"]["mOKS"]
        summary["oks_voc.mAP"] = metrics["voc_metrics"]["oks_voc.mAP"]
        summary["oks_voc.mAR"] = metrics["voc_metrics"]["oks_voc.mAR"]
        summary["dist.avg"] = metrics["distance_metrics"]["avg"]
        summary["PCK@5"] = metrics["pck_metrics"]["PCK@5"]
    if "detection_metrics" in metrics:
        summary.update({f"detection.{k}": v for k, v in metrics["detection_metrics"].items()
                        if k in ("precision", "recall", "f1", "avg")})
    click.echo(json.dumps({k: (round(float(v), 5) if v == v else None) for k, v in summary.items()}))


@cli.command()
def system():
    """Report devices / versions and run a device smoke test."""
    from sleap_nn_tpu.system_info import get_startup_info_string

    click.echo(get_startup_info_string())


@cli.command()
@click.argument("model_dir", type=click.Path(exists=True))
def info(model_dir):
    """Summarize a trained model directory."""
    from sleap_nn_tpu.model_info import print_model_info

    print_model_info(model_dir)


@cli.command("config")
@click.argument("path", type=click.Path(exists=True), required=False)
@click.option("--output", "-o", default=None, help="Output config YAML path.")
@click.option("--auto", is_flag=True, default=False,
              help="Generate a config non-interactively with smart defaults.")
@click.option("--pipeline", default=None,
              type=click.Choice(["topdown", "centroid", "bottomup",
                                 "single_instance", "multi_class_topdown",
                                 "multi_class_bottomup"]),
              help="Pipeline override for --auto mode.")
@click.option("--show-yaml", "--show_yaml", "show_yaml", is_flag=True,
              default=False, help="Print the generated YAML instead of saving.")
@click.option("--preset", default="quality", show_default=True,
              type=click.Choice(["quality", "throughput"]),
              help="--auto preset: 'throughput' applies the measured "
                   "fast-inference knobs (output_stride=4, <=384 px scale, "
                   "crop 128) that clear 2,000 frames/s/chip on a TPU v5e.")
@click.argument("overrides", nargs=-1)
def config_cmd(path, output, auto, pipeline, show_yaml, preset, overrides):
    """Validate a config YAML, or generate one from a SLEAP file.

    With a YAML argument: validate + print it (with optional dotted
    OVERRIDES). With an .slp argument: generate a recommended training
    config — ``--auto`` for non-interactive smart defaults, otherwise an
    interactive TUI (reference cli.py:3004).
    """
    if path is not None and str(path).endswith((".yaml", ".yml", ".json")):
        from sleap_nn_tpu.config import TrainingJobConfig, to_yaml, verify_training_cfg

        cfg = TrainingJobConfig.load_yaml(path, overrides=_parse_overrides(overrides))
        verify_training_cfg(cfg)
        click.echo(to_yaml(cfg))
        return

    if auto:
        if not path:
            raise click.UsageError("SLP_PATH is required for --auto mode.")
        from sleap_nn_tpu.config_generator import (
            analyze_slp,
            generate_config,
            recommend_config,
        )
        from sleap_nn_tpu.config import to_yaml

        stats = analyze_slp(path)
        rec = recommend_config(stats)
        if pipeline:
            rec.pipeline.pipeline = pipeline
            # The throughput preset's knob set is pipeline-dependent
            # (crop_size only for topdown families) — recompute it for the
            # OVERRIDDEN pipeline, not the recommended one.
            from sleap_nn_tpu.config_generator.recommender import (
                recommend_throughput_preset,
            )

            rec.throughput_preset = recommend_throughput_preset(
                stats, pipeline, rec.backbone
            )
        if preset == "throughput" and rec.throughput_preset is None:
            raise click.UsageError(
                f"No measured throughput preset for the recommended "
                f"backbone ({rec.backbone}); rerun without --preset."
            )
        if show_yaml:
            cfg = generate_config(path, output_path=None, stats=stats,
                                  recommendation=rec, preset=preset)
            click.echo(to_yaml(cfg))
            return
        out = output or str(Path(path).parent / f"{Path(path).stem}_config.yaml")
        generate_config(path, output_path=out, stats=stats,
                        recommendation=rec, preset=preset)
        if preset == "throughput" and rec.throughput_preset:
            click.echo(f"Throughput preset: {rec.throughput_preset['note']}")
        click.echo(f"Saved config to: {out}")
        return

    # Interactive TUI mode.
    from sleap_nn_tpu.config_generator.tui import launch_tui

    launch_tui(path, output_path=output)


@cli.command()
@click.argument("model_dir", type=click.Path(exists=True), nargs=-1, required=True)
@click.option("--output-dir", "--output", "-o", "output_dir", default=None)
@click.option("--format", "fmt", default="stablehlo", show_default=True,
              type=click.Choice(["stablehlo", "savedmodel"]))
@click.option("--batch-size", "--max-batch-size", "batch_size", default=4,
              show_default=True,
              help="Batch size baked into the exported graph.")
@click.option("--peak-threshold", default=0.2, show_default=True)
@click.option("--max-instances", default=20, show_default=True,
              help="Crop slots baked into topdown composite exports.")
@click.option("--max-peaks", "--max-peaks-per-node", "max_peaks", default=200,
              show_default=True, help="Peak slots baked into the graph.")
@click.option("--input-height", default=None, type=int,
              help="Override the baked input height.")
@click.option("--input-width", default=None, type=int,
              help="Override the baked input width.")
@click.option("--input-scale", default=None, type=float,
              help="Override the baked preprocessing scale.")
@click.option("--crop-size", default=None, type=int,
              help="Override the instance crop size (topdown composites).")
@click.option("--precision", default="fp32", show_default=True,
              type=click.Choice(["fp32", "bf16"]),
              help="Forward-pass precision baked into the graph (bf16 is "
                   "the TPU analog of the reference's fp16 engines).")
@click.option("--n-line-points", default=10, show_default=True,
              help="PAF line samples baked into bottomup exports.")
@click.option("--max-edge-length-ratio", default=0.25, show_default=True)
@click.option("--dist-penalty-weight", default=1.0, show_default=True)
@click.option("--verify/--no-verify", "verify", default=True, show_default=True,
              help="Numerically verify the serialized graph against eager.")
@click.option("--device", default=None, hidden=True,
              help="[no-op] Retained for reference-CLI compatibility.")
@click.option("--opset-version", default=None, type=int, hidden=True,
              help="[ONNX-only] Not applicable to StableHLO exports.")
@click.option("--workspace-size-gb", default=None, type=float, hidden=True,
              help="[TensorRT-only] Not applicable to StableHLO exports.")
def export(model_dir, output_dir, fmt, batch_size, peak_threshold,
           max_instances, max_peaks, input_height, input_width, input_scale,
           crop_size, precision, n_line_points, max_edge_length_ratio,
           dist_penalty_weight, verify, device, opset_version,
           workspace_size_gb):
    """Export trained model(s) with baked postprocessing.

    Pass one model dir, or a centroid + instance-model pair for the fused
    topdown / multi_class_topdown composite graph.
    """
    from sleap_nn_tpu.export import export_model

    if opset_version is not None or workspace_size_gb is not None:
        click.echo(
            "WARNING: --opset-version/--workspace-size-gb are ONNX/TensorRT "
            "knobs; StableHLO exports ignore them.",
            err=True,
        )
    dirs = list(model_dir)
    out = export_model(
        dirs if len(dirs) > 1 else dirs[0],
        output_dir=output_dir,
        fmt=fmt,
        batch_size=batch_size,
        peak_threshold=peak_threshold,
        max_instances=max_instances,
        max_peaks=max_peaks,
        input_height=input_height,
        input_width=input_width,
        input_scale=input_scale,
        crop_size=crop_size,
        precision=precision,
        n_line_points=n_line_points,
        max_edge_length_ratio=max_edge_length_ratio,
        dist_penalty_weight=dist_penalty_weight,
        verify=verify,
    )
    click.echo(f"Exported to: {out}")


@cli.command("config-generate")
@click.argument("slp_path", type=click.Path(exists=True))
@click.option("--output", "-o", default=None, help="Output config YAML path.")
@click.option("--max-epochs", default=100, show_default=True)
@click.option("--preset", default="quality", show_default=True,
              type=click.Choice(["quality", "throughput"]),
              help="'throughput' applies the measured fast-inference knobs "
                   "(output_stride=4, <=384 px scale, crop 128) that clear "
                   "2,000 frames/s/chip on a TPU v5e.")
def config_generate(slp_path, output, max_epochs, preset):
    """Analyze a dataset and generate a recommended training config."""
    from sleap_nn_tpu.config_generator import analyze_slp, generate_config, recommend_config

    stats = analyze_slp(slp_path)
    rec = recommend_config(stats)
    if preset == "throughput" and rec.throughput_preset is None:
        raise click.UsageError(
            f"No measured throughput preset for the recommended backbone "
            f"({rec.backbone}); rerun without --preset."
        )
    cfg = generate_config(slp_path, output_path=output, stats=stats,
                          recommendation=rec, max_epochs=max_epochs,
                          preset=preset)
    click.echo(json.dumps({
        "pipeline": rec.pipeline.pipeline,
        "reason": rec.pipeline.reason,
        "recommendation": rec.summary(),
        "preset": preset,
        "output": output,
    }, indent=2))


def main():
    cli()


if __name__ == "__main__":
    main()
