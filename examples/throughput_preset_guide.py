"""Throughput preset guide — trade localization sharpness for >10x speed.

The production sweep on a TPU v5e (bench.py, BENCH_DETAIL.json) showed the
`medium_rf` topdown pair runs ~220 frames/s/chip at 1024 px with the
quality defaults (output_stride=2) but ~3,700 f/s with the reference's own
preset knobs — ``output_stride=4`` and a <=384 px eval scale (crop 128).
This script shows how to get each configuration from the same labels file
and what actually differs between them.

Run:

    python examples/throughput_preset_guide.py [labels.slp] [out_dir]

Uses the reference fixture labels when no argument is given. CPU-safe.
"""

from __future__ import annotations

import sys
from pathlib import Path

DEFAULT_SLP = "/root/reference/tests/assets/datasets/minimal_instance.pkg.slp"


def main() -> None:
    slp = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_SLP
    out_dir = Path(sys.argv[2] if len(sys.argv) > 2 else ".")
    out_dir.mkdir(parents=True, exist_ok=True)

    from sleap_nn_tpu.config_generator import (
        analyze_slp,
        generate_config,
        recommend_config,
    )

    stats = analyze_slp(slp)
    rec = recommend_config(stats)
    print(f"dataset: {stats.num_labeled_frames} frames, "
          f"{stats.max_width}x{stats.max_height}px, "
          f"{stats.num_nodes}-node skeleton")
    print(f"recommended pipeline: {rec.pipeline.pipeline} "
          f"({rec.pipeline.reason})")

    quality = generate_config(slp, output_path=out_dir / "quality.yaml",
                              stats=stats, recommendation=rec)
    fast = generate_config(slp, output_path=out_dir / "throughput.yaml",
                           stats=stats, recommendation=rec,
                           preset="throughput")

    def knobs(cfg):
        bb = cfg.model_config.backbone_config
        leaf = getattr(bb, bb.which())
        return {
            "output_stride": leaf.output_stride,
            "scale": cfg.data_config.preprocessing.scale,
            "crop_size": cfg.data_config.preprocessing.crop_size,
        }

    q, f = knobs(quality), knobs(fast)
    print("\nknob              quality      throughput")
    for k in q:
        print(f"{k:16} {str(q[k]):>10}   {str(f[k]):>10}")

    note = rec.throughput_preset["note"] if rec.throughput_preset else ""
    print(f"\nwhy: {note}")
    print("\nWhat the knobs mean:")
    print("- output_stride=4: the decoder stops one level earlier — about")
    print("  half the FLOPs and HBM bytes; confmap cells are 4 px apart")
    print("  before sub-pixel integral refinement (localization is coarser")
    print("  but usually within a pixel after refinement).")
    print("- scale<=384px: quadratic pixel savings; pick by the smallest")
    print("  animal feature you must still resolve.")
    print("- crop 128: the stage-2 crop shrinks with the eval scale.")
    print(f"\nWrote {out_dir / 'quality.yaml'} and {out_dir / 'throughput.yaml'}")
    print("Train either with: sleap-nn-tpu train <config> "
          "trainer_config.save_ckpt=true")


if __name__ == "__main__":
    main()
