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


def _parse_overrides(pairs: Tuple[str, ...]) -> dict:
    out = {}
    for pair in pairs:
        if "=" not in pair:
            raise click.UsageError(f"Override must be key=value, got: {pair}")
        k, v = pair.split("=", 1)
        out[k] = v
    return out


@cli.command()
@click.argument("config_path", type=click.Path(exists=True))
@click.argument("overrides", nargs=-1)
def train(config_path, overrides):
    """Train a model from a config YAML (dotted OVERRIDES like a.b.c=value)."""
    from sleap_nn_tpu.config import TrainingJobConfig
    from sleap_nn_tpu.train import run_training

    cfg = TrainingJobConfig.load_yaml(config_path, overrides=_parse_overrides(overrides))
    trainer = run_training(cfg)
    if trainer.ckpt_dir:
        click.echo(f"Model saved to: {trainer.ckpt_dir}")


def _inference_options(f):
    opts = [
        click.option("--data-path", "-i", "data_path", required=True, help="Video or .slp path."),
        click.option("--model-paths", "-m", "model_paths", multiple=True, required=True,
                     help="Model dir(s); pass twice for topdown (centroid + centered_instance)."),
        click.option("--output-path", "-o", "output_path", default=None, help="Output .slp path."),
        click.option("--frames", default=None, help="Frame range like 0-100 or comma list."),
        click.option("--batch-size", default=4, show_default=True),
        click.option("--peak-threshold", default=0.2, show_default=True),
        click.option("--centroid-peak-threshold", default=None, type=float,
                     help="Separate stage-1 (centroid) threshold for topdown."),
        click.option("--profile-dir", default=None,
                     help="Write an XLA profiler trace of the predict loop "
                          "here (open with TensorBoard/Perfetto)."),
        click.option("--anchor-part", default=None,
                     help="Skeleton node used as the GT-centroid anchor "
                          "(centered-instance-only inference)."),
        click.option("--video-index", default=None, type=int,
                     help="Restrict a multi-video .slp source to one video."),
        click.option("--max-instances", default=None, type=int),
        click.option("--max-peaks", default=200, show_default=True),
        click.option("--refinement", default="integral", show_default=True,
                     type=click.Choice(["integral", "local", "none"])),
        click.option("--integral-patch-size", default=5, show_default=True),
        click.option("--exclude-user-labeled/--include-user-labeled",
                     "exclude_user_labeled", default=False, show_default=True,
                     help="Skip frames that already carry user labels "
                          "(.slp sources; don't re-predict labeled frames)."),
        click.option("--only-suggested-frames/--all-frames", "only_suggested_frames",
                     default=False, show_default=True,
                     help="Predict on the .slp's suggested frames instead of "
                          "its labeled frames."),
        click.option("--no-empty-frames/--keep-empty-frames", "no_empty_frames",
                     default=False, show_default=True,
                     help="Drop frames with no predictions before saving."),
        click.option("--filter-min-visible-nodes", default=None, type=int,
                     help="Drop instances with fewer visible nodes."),
        click.option("--filter-min-node-confidence", default=None, type=float,
                     help="NaN-out nodes below this confidence."),
        click.option("--filter-min-instance-score", default=None, type=float,
                     help="Drop instances below this score."),
        click.option("--filter-overlapping-method", default=None,
                     type=click.Choice(["iou", "oks"]),
                     help="Suppress overlapping instances by IoU/OKS."),
        click.option("--filter-overlapping-threshold", default=0.8,
                     show_default=True),
        click.option("--use-bf16/--no-use-bf16", default=False, show_default=True,
                     help="bfloat16 forward pass (TPU fast path)."),
        click.option("--host-resize/--no-host-resize", "host_resize",
                     default=False, show_default=True,
                     help="Downscale frames on the host before transfer "
                          "(cuts H2D payload; cv2 bilinear instead of the "
                          "on-device resize)."),
        click.option("--paf-workers", default=0, show_default=True,
                     help="Worker processes for bottom-up PAF grouping (0 = inline)."),
        click.option("--output-format", "output_format", multiple=True,
                     type=click.Choice(["slp", "analysis_h5"]),
                     help="Repeatable; default slp. analysis_h5 writes one "
                          "SLEAP Analysis HDF5 per video."),
        click.option("--merge-fragments/--no-merge-fragments", default=False,
                     show_default=True,
                     help="Fuse over-segmented mask fragments (bottom-up segmentation)."),
        click.option("--merge-method", default="greedy", show_default=True,
                     type=click.Choice(["greedy", "multicut"]),
                     help="Fragment-merge strategy (with --merge-fragments)."),
        click.option("--fg-threshold", default=0.5, show_default=True,
                     help="Foreground probability cutoff (segmentation models)."),
        click.option("--min-mask-area", default=16, show_default=True,
                     help="Drop predicted masks smaller than this (px)."),
        click.option("--centroid-only/--full-pipeline", "centroid_only",
                     default=False, show_default=True,
                     help="Run only the centroid stage of a topdown pair."),
        click.option("--embed/--no-embed", "embed", default=False,
                     show_default=True,
                     help="Embed source frames into the output .slp."),
        click.option("--video-path-map", default=None,
                     help="Remap .slp video paths: 'old=new' (repeatable via "
                          "comma: 'a=b,c=d')."),
        click.option("--device", default=None,
                     type=click.Choice(["auto", "tpu", "cpu"]),
                     help="Compute platform; 'cpu' forces the CPU backend."),
        click.option("--tracking/--no-tracking", default=False, show_default=True),
        click.option("--tracking-window-size", default=5, show_default=True),
        click.option("--tracking-scoring-method", default="oks", show_default=True),
        click.option("--tracking-max-tracks", default=None, type=int),
        click.option("--tracking-use-flow/--no-tracking-use-flow", default=False),
    ]
    for opt in reversed(opts):
        f = opt(f)
    return f


def _parse_frames(frames: Optional[str]):
    if not frames:
        return None
    if "-" in frames and "," not in frames:
        a, b = frames.split("-")
        return list(range(int(a), int(b) + 1))
    return [int(x) for x in frames.split(",")]


def _run_inference(**kw):
    from sleap_nn_tpu.inference import predict

    tracker_kwargs = {}
    if kw.pop("tracking"):
        tracker_kwargs = dict(
            tracking=True,
            window_size=kw.pop("tracking_window_size"),
            scoring_method=kw.pop("tracking_scoring_method"),
            max_tracks=kw.pop("tracking_max_tracks"),
            use_flow=kw.pop("tracking_use_flow"),
        )
    else:
        for k in ("tracking_window_size", "tracking_scoring_method",
                  "tracking_max_tracks", "tracking_use_flow"):
            kw.pop(k)

    out_fmt = kw.pop("output_format") or ("slp",)
    kw["output_format"] = list(out_fmt)

    from sleap_nn_tpu.inference.filters import FilterConfig

    fc = FilterConfig(
        min_node_count=kw.pop("filter_min_visible_nodes"),
        min_node_confidence=kw.pop("filter_min_node_confidence"),
        min_instance_score=kw.pop("filter_min_instance_score"),
        overlap_method=kw.pop("filter_overlapping_method"),
        overlap_threshold=kw.pop("filter_overlapping_threshold"),
    )
    if fc.enabled():
        kw["filters"] = fc
    kw["no_empty_frames"] = kw.pop("no_empty_frames")
    data_path = kw.pop("data_path")
    model_paths = list(kw.pop("model_paths"))
    output_path = kw.pop("output_path")
    frames = _parse_frames(kw.pop("frames"))
    if output_path is None:
        output_path = str(Path(data_path).with_suffix("")) + ".predictions.slp"

    labels = predict(
        data_path,
        model_paths,
        output_path=output_path,
        frames=frames,
        **kw,
        **tracker_kwargs,
    )
    n_inst = sum(len(lf.instances) for lf in labels)
    click.echo(f"Predicted {len(labels)} frames, {n_inst} instances -> {output_path}")
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
@click.option("--mask-backend", required=True, type=click.Choice(["sam", "sam3"]),
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
    from sleap_nn_tpu.io import load_slp
    from sleap_nn_tpu.tracking import run_tracker

    labels = load_slp(data_path)
    labels = run_tracker(
        labels, window_size=window_size, scoring_method=scoring_method,
        max_tracks=max_tracks,
        target_instance_count=target_instance_count,
        pre_cull_to_target=pre_cull_to_target,
        pre_cull_iou_threshold=pre_cull_iou_threshold,
        post_connect_single_breaks=post_connect_single_breaks,
    )
    out = output_path or str(Path(data_path).with_suffix("")) + ".tracked.slp"
    labels.save(out)
    click.echo(f"Tracked {len(labels.tracks)} tracks -> {out}")


@cli.command("eval")
@click.option("--ground-truth", "-g", "ground_truth", required=True, type=click.Path(exists=True))
@click.option("--predictions", "-p", "predictions", required=True, type=click.Path(exists=True))
@click.option("--save-metrics", default=None, help="Optional .npz output path.")
@click.option("--oks-stddev", default=0.025, show_default=True)
@click.option("--oks-scale", default=None, type=float,
              help="Fixed OKS object scale (default: GT bbox area).")
@click.option("--match-threshold", default=0.0, show_default=True)
@click.option("--match-method", default="oks", show_default=True,
              type=click.Choice(["oks", "centroid", "mask", "semantic", "auto"]))
def eval_cmd(ground_truth, predictions, save_metrics, oks_stddev, oks_scale,
             match_threshold, match_method):
    """Evaluate predictions against ground truth labels."""
    from sleap_nn_tpu.evaluation import run_evaluation

    metrics = run_evaluation(
        ground_truth,
        predictions,
        oks_stddev=oks_stddev,
        oks_scale=oks_scale,
        match_threshold=match_threshold,
        match_method=match_method,
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
@click.argument("config_path", type=click.Path(exists=True))
@click.argument("overrides", nargs=-1)
def config_cmd(config_path, overrides):
    """Validate + print a training config (with optional overrides)."""
    from sleap_nn_tpu.config import TrainingJobConfig, to_yaml, verify_training_cfg

    cfg = TrainingJobConfig.load_yaml(config_path, overrides=_parse_overrides(overrides))
    verify_training_cfg(cfg)
    click.echo(to_yaml(cfg))


@cli.command()
@click.argument("model_dir", type=click.Path(exists=True), nargs=-1, required=True)
@click.option("--output-dir", "-o", default=None)
@click.option("--format", "fmt", default="stablehlo", show_default=True,
              type=click.Choice(["stablehlo", "savedmodel"]))
@click.option("--batch-size", default=4, show_default=True)
@click.option("--peak-threshold", default=0.2, show_default=True)
@click.option("--max-instances", default=20, show_default=True,
              help="Crop slots baked into topdown composite exports.")
def export(model_dir, output_dir, fmt, batch_size, peak_threshold, max_instances):
    """Export trained model(s) with baked postprocessing.

    Pass one model dir, or a centroid + instance-model pair for the fused
    topdown / multi_class_topdown composite graph.
    """
    from sleap_nn_tpu.export import export_model

    dirs = list(model_dir)
    out = export_model(
        dirs if len(dirs) > 1 else dirs[0],
        output_dir=output_dir,
        fmt=fmt,
        batch_size=batch_size,
        peak_threshold=peak_threshold,
        max_instances=max_instances,
    )
    click.echo(f"Exported to: {out}")


@cli.command("config-generate")
@click.argument("slp_path", type=click.Path(exists=True))
@click.option("--output", "-o", default=None, help="Output config YAML path.")
@click.option("--max-epochs", default=100, show_default=True)
def config_generate(slp_path, output, max_epochs):
    """Analyze a dataset and generate a recommended training config."""
    from sleap_nn_tpu.config_generator import analyze_slp, generate_config, recommend_config

    stats = analyze_slp(slp_path)
    rec = recommend_config(stats)
    cfg = generate_config(slp_path, output_path=output, stats=stats,
                          recommendation=rec, max_epochs=max_epochs)
    click.echo(json.dumps({
        "pipeline": rec.pipeline.pipeline,
        "reason": rec.pipeline.reason,
        "recommendation": rec.summary(),
        "output": output,
    }, indent=2))


def main():
    cli()


if __name__ == "__main__":
    main()
