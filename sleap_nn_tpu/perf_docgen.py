"""Generate docs/inference-performance.md from BENCH_DETAIL.json.

Parity target: reference docs/guides/inference-performance.md (the
measured-throughput guide). This repo's numbers come from ``bench.py``
(which writes BENCH_DETAIL.json every run); regenerating the page after a
bench run keeps the doc and the measurements in lock-step:

    python bench.py && python -m sleap_nn_tpu.perf_docgen
"""

from __future__ import annotations

import json
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
DETAIL = REPO / "BENCH_DETAIL.json"
DOC = REPO / "docs" / "inference-performance.md"

_FAMILIES = ("single_instance", "centroid", "topdown", "bottomup")


def _a40_baselines() -> dict:
    """A40 e2e baselines, read from bench.py's ROWS (single source)."""
    import bench

    return {name: base for name, _dirs, base, _kw in bench.ROWS}


def _batch_size() -> int:
    import bench

    return bench.BATCH_SIZE


def _fmt(x, nd=1):
    if x is None:
        return "—"
    if isinstance(x, float):
        return f"{x:,.{nd}f}"
    return f"{x:,}"


def generate_perf_doc(detail: dict | None = None) -> str:
    if detail is None:
        detail = json.loads(DETAIL.read_text())
    e = detail.get("extra", {})
    host = e.get("host_limits", {}) or {}
    prod = e.get("production", {}) or {}
    ns = e.get("north_star", {}) or {}

    lines = [
        "# Inference Performance",
        "",
        "Measured throughput of this build, with the physical limits that",
        "bound each row. Regenerated from `BENCH_DETAIL.json` (written by",
        "every `python bench.py` run) via `python -m sleap_nn_tpu.perf_docgen`;",
        "treat cross-machine numbers as relative, like the reference does.",
        "",
        f"Hardware for the committed numbers: 1× TPU v5e behind a remote",
        f"tunnel (~{_fmt(host.get('h2d_bandwidth_MBps'), 0)} MB/s host→device), "
        f"{_fmt(host.get('host_cpus'), 0)}-CPU host "
        f"(decode ≈{_fmt(host.get('decode_fps_gray'), 0)} f/s grayscale / "
        f"{_fmt(host.get('decode_fps_rgb'), 0)} f/s RGB).",
        "",
        "## End-to-end vs the reference A40 baseline",
        "",
        "Same protocol as the reference's table (320×560 fixture video,",
        "reference fixture checkpoints, end-to-end including decode):",
        "",
        "| Family | A40 (reference) | This build (v5e e2e) | ×A40 | × of this host's achievable ceiling |",
        "|---|---:|---:|---:|---:|",
    ]
    a40 = _a40_baselines()
    for fam in _FAMILIES:
        row = e.get(fam) or {}
        lines.append(
            f"| {fam} | {_fmt(a40.get(fam), 0)} f/s | {_fmt(row.get('e2e_fps'))} f/s "
            f"| {_fmt(row.get('e2e_vs_a40'), 2)}× "
            f"| {_fmt(row.get('e2e_vs_achievable'), 2)}× |"
        )
    lines += [
        "",
        "The e2e rows are bound by the HOST (single CPU core + tunnel",
        "bandwidth), not the chip: `bench.py` measures decode and transfer",
        "limits per row and reports `e2e_vs_achievable` against that",
        "infrastructure ceiling. Device-resident compute throughput is",
        "1-2 orders of magnitude higher (e.g. "
        f"{_fmt((e.get('single_instance') or {}).get(f'compute_fps_b{_batch_size()}'), 0)} f/s "
        "for single_instance at B=32).",
        "",
        "## Forward latency (device program, B=4)",
        "",
        "True device time of each family's fused program (preprocess +",
        "forward + peaks in ONE jitted function), timed as a chained",
        "`fori_loop` — vs the reference's published A40 eager forward",
        "(reference docs/guides/inference-performance.md:40-48):",
        "",
        "| Family | A40 eager (ms/batch) | This build (ms/batch) | speedup |",
        "|---|---:|---:|---:|",
    ]
    import bench as _bench

    for fam in _FAMILIES:
        row = e.get(fam) or {}
        base_ms = _bench.FWD_BASELINE_MS.get(fam)
        lines.append(
            f"| {fam} | {_fmt(base_ms, 2)} | {_fmt(row.get('forward_ms_b4'), 2)} "
            f"| {_fmt(row.get('forward_vs_a40_eager'), 2)}× |"
        )
    lines += [
        "",
        "(topdown has no published single-number baseline — its fused",
        "two-stage program is compared against centroid+centered as a",
        "lower bound in BENCH_DETAIL.json.)",
        "",
        "## Production scale (megapixel, production-width UNet)",
        "",
        "| Config | f/s/chip | MFU | bound | fraction of roofline |",
        "|---|---:|---:|---|---:|",
    ]
    for name, row in prod.items():
        if not isinstance(row, dict) or "fps_per_chip" not in row:
            continue
        cfg = (f"{name} @{row.get('image_px')}px os{row.get('output_stride')} "
               f"B={row.get('batch')}")
        lines.append(
            f"| {cfg} | {_fmt(row.get('fps_per_chip'))} "
            f"| {_fmt(row.get('mfu'), 3)} | {row.get('bound', '—')} "
            f"| {_fmt(row.get('fraction_of_roofline'), 2)} |"
        )
    lines += [
        "",
        "`fraction_of_roofline` compares achieved throughput against the",
        "tighter of the compute speed-of-light (bf16 peak / FLOPs-per-frame)",
        "and the post-fusion HBM roofline (optimized-HLO traffic parse,",
        "`ops/hlo_cost.py`, including layout padding). Narrow-channel UNets",
        "at megapixel resolution are memory-bound — the same physics that",
        "caps them on GPUs; on TPU the extra hazard is 128-lane tile",
        "padding, which the space-to-depth packed execution path removes",
        "(`ops/packed_conv.py`, auto-enabled, identical checkpoints).",
        "",
        "## The 2,000 f/s/chip north star",
        "",
        f"Target: >2,000 frames/s/chip topdown at production scale.",
        f"The measured preset that clears it: "
        f"**{(ns.get('production_preset') or {}).get('config', '—')}** at "
        f"**{_fmt((ns.get('production_preset') or {}).get('fps_per_chip'))} f/s/chip** "
        f"({_fmt((ns.get('production_preset') or {}).get('vs_target'), 2)}× target).",
        "",
        "Get it with `sleap-nn-tpu config labels.slp --auto --preset",
        "throughput` or the shipped",
        "`config_topdown_centered_instance_unet_medium_rf_throughput`",
        "[sample config](sample-configs.md). The quality (os2, full-res)",
        "config of the same backbone runs ~10× slower at 1024 px — choose",
        "by your localization tolerance (confmap cells are `output_stride`",
        "pixels apart before sub-pixel refinement).",
        "",
        "## Knobs that matter",
        "",
        "- **bf16 forward** (`use_bf16`, default on for inference): ~2×",
        "  memory-bound throughput; keypoint drift vs fp32 is <0.001 px on",
        "  the fixture suite (mirrors the reference's fp16 finding).",
        "- **`output_stride=4`**: halves decoder FLOPs and bytes; the",
        "  single biggest lever (see the preset above).",
        "- **Batch size**: production rows use B=32-128; peaks NMS and crop",
        "  gather are fixed-size, so batch scales without recompiles once",
        "  warm. `BENCH_BATCH_SWEEP=1 python bench.py` sweeps it.",
        "- **Packed execution** (`packed_level0`, auto): exact",
        "  space-to-depth layout for narrow stride-1 levels; engages at",
        "  megapixel sizes where lane padding dominates.",
        "- **Weights-as-arguments jit** (`jit_layer`): swapping checkpoints",
        "  never recompiles; first-compile is one-time per shape.",
        "",
        "## Workflow recipes",
        "",
        '### "I want the fastest correct predictions on a long video"',
        "",
        "```bash",
        "sleap-nn-tpu config labels.slp --auto --preset throughput "
        "-o fast.yaml",
        "sleap-nn-tpu train fast.yaml",
        "sleap-nn-tpu predict -i video.mp4 -m models/run -o out.slp \\",
        "    --batch-size 128 --stream-to-file",
        "```",
        "",
        "os4 @384px clears the 2,000 f/s/chip target; `--stream-to-file`",
        "flushes each batch so a crash mid-run leaves a usable `.slp`.",
        "",
        '### "Quick sanity check on a 10-frame clip"',
        "",
        "```bash",
        'sleap-nn-tpu predict -i video.mp4 -m models/run --frames "0-9" \\',
        "    --batch-size 4 -o check.slp",
        "```",
        "",
        "Small batch keeps first-compile time down; subsequent runs of the",
        "same shapes reuse the persistent compilation cache.",
        "",
        '### "Multi-animal bottom-up on a crowded video"',
        "",
        "```bash",
        "sleap-nn-tpu predict -i video.mp4 -m models/bottomup \\",
        "    --paf-workers 2 --max-instances 30 -o out.slp",
        "```",
        "",
        "PAF line scoring runs on-device (Pallas kernel); only the final",
        "Jonker-Volgenant assignment is host work — `--paf-workers` moves",
        "it to a process pool overlapped with device dispatch (worth it",
        "above ~15 instances/frame; inline wins at fixture scale).",
        "",
        "## When to re-benchmark",
        "",
        "Re-run `python bench.py && python -m sleap_nn_tpu.perf_docgen`",
        "after changing: model width/stride presets, the packed-execution",
        "rules (`inference/backends.py`), peak-finding knobs, the provider",
        "or host-resize path, or the host/chip itself. Rows move with the",
        "tunnel's minute-to-minute rate (~3× swings measured); compare",
        "best-of-N interleaved runs, never single shots.",
        "",
        "## Measurement honesty",
        "",
        "- Device timing chains iterations inside one jitted `fori_loop`",
        "  and reduces over EVERY output leaf — nothing can be",
        "  dead-code-eliminated and async dispatch cannot hide latency.",
        "- " + (e.get("history_note") or
                "See BENCH_DETAIL.json for the full per-row record."),
        "",
    ]
    return "\n".join(lines)


if __name__ == "__main__":
    DOC.write_text(generate_perf_doc())
    print(f"Wrote {DOC}")
