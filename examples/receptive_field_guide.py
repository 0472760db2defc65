"""Receptive field guide — pick ``max_stride`` / ``scale`` for your animals.

TPU-native counterpart of the reference's
``example_notebooks/receptive_field_guide.py``. The receptive field (RF) is
the patch of input pixels that can influence one output pixel; pose models
work best when the RF roughly covers one animal (plus some context). This
script:

1. computes the RF analytically for any UNet configuration (same equation as
   the reference, distill.pub/2019/computing-receptive-fields Eq. 2),
2. prints the RF table for every shipped UNet preset at several input scales,
3. overlays the RF box on a labeled frame so you can eyeball coverage
   (``receptive_field_guide.png``).

On TPU there is a second consideration the reference doesn't have: the
``max_stride``/``filters`` choice also sets how well the convolutions tile
onto the 128-lane MXU — wider-but-shallower models (larger ``filters``,
smaller ``max_stride``) often run FASTER per frame than their FLOP count
suggests because narrow channels waste vector lanes. ``docs/performance.md``
covers that side; this guide covers the statistical side (RF coverage).

Run:

    JAX_PLATFORMS=cpu python examples/receptive_field_guide.py
"""

from __future__ import annotations

import math
import os
from pathlib import Path

import numpy as np

ASSETS = Path(
    os.environ.get("SLEAP_DEMO_ASSETS", "/root/reference/tests/assets/datasets")
)
LABELS = Path(os.environ.get("SLEAP_DEMO_LABELS", ASSETS / "minimal_instance.pkg.slp"))
OUT_PNG = Path(os.environ.get("SLEAP_DEMO_OUT", ".")) / "receptive_field_guide.png"


def compute_receptive_field(
    down_blocks: int, convs_per_block: int = 2, kernel_size: int = 3,
    stem_stride: int | None = None,
) -> int:
    """RF of the deepest encoder feature, distill.pub Eq. 2.

    Each down block is ``convs_per_block`` stride-1 KxK convs followed by a
    2x2 stride-2 pool; an optional strided stem prepends one more stride-2
    layer. (Reference math: example_notebooks/receptive_field_guide.py:110.)
    """
    strides: list[int] = []
    kernels: list[int] = []
    if stem_stride:
        for _ in range(int(math.log2(stem_stride))):
            strides.append(2)
            kernels.append(kernel_size)
    for _ in range(down_blocks):
        strides += [1] * convs_per_block + [2]
        kernels += [kernel_size] * convs_per_block + [2]
    rf = 1
    prod = 1
    for k, s in zip(kernels, strides):
        rf += (k - 1) * prod
        prod *= s
    return int(rf)


def rf_for_config(cfg, scale: float = 1.0) -> float:
    """RF in ORIGINAL image pixels for a UNet config at an input scale."""
    down_blocks = int(math.log2(cfg.max_stride))
    if getattr(cfg, "stem_stride", None):
        down_blocks -= int(math.log2(cfg.stem_stride))
    rf = compute_receptive_field(
        down_blocks,
        convs_per_block=cfg.convs_per_block,
        kernel_size=cfg.kernel_size,
        stem_stride=getattr(cfg, "stem_stride", None),
    )
    return rf / scale


def main() -> None:
    from sleap_nn_tpu.config.model_config import (
        UNetConfig,
        UNetLargeRFConfig,
        UNetMediumRFConfig,
    )

    presets = {
        "unet (default)": UNetConfig(),
        "unet medium_rf": UNetMediumRFConfig(),
        "unet large_rf": UNetLargeRFConfig(),
    }
    scales = (1.0, 0.75, 0.5, 0.25)
    print(f"{'preset':18s} {'max_stride':>10s} " +
          " ".join(f"RF@scale={s:<4}" for s in scales))
    for name, cfg in presets.items():
        rfs = [rf_for_config(cfg, s) for s in scales]
        print(f"{name:18s} {cfg.max_stride:>10d} " +
              " ".join(f"{r:>12.0f}" for r in rfs))
    print(
        "\nRule of thumb: choose max_stride/scale so the RF covers one animal\n"
        "plus margin. Too small -> the model can't see whole-body context\n"
        "(swapped left/right parts); too large -> wasted compute and blurry\n"
        "localization. On TPU also prefer filters>=32 where possible (lane\n"
        "utilization) — see docs/performance.md."
    )

    # Overlay the medium_rf RF box on a labeled frame.
    try:
        from sleap_nn_tpu.io import load_slp

        labels = load_slp(str(LABELS))
        img = np.asarray(labels[0].image)
    except Exception as e:  # no fixture in this environment
        print(f"(no fixture frame available: {e}; skipping figure)")
        return
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        print("matplotlib unavailable; skipping figure")
        return

    fig, axes = plt.subplots(1, len(presets), figsize=(5 * len(presets), 5))
    h, w = img.shape[:2]
    for ax, (name, cfg) in zip(np.ravel(axes), presets.items()):
        rf = rf_for_config(cfg, scale=1.0)
        ax.imshow(img.squeeze(-1) if img.ndim == 3 and img.shape[-1] == 1 else img,
                  cmap="gray")
        side = min(rf, max(h, w))
        ax.add_patch(plt.Rectangle(
            ((w - side) / 2, (h - side) / 2), side, side,
            fill=False, edgecolor="red", linewidth=2,
        ))
        ax.set_title(f"{name}\nRF = {rf:.0f}px", fontsize=10)
        ax.axis("off")
    fig.tight_layout()
    OUT_PNG.parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(OUT_PNG, dpi=80)
    print(f"wrote {OUT_PNG}")


if __name__ == "__main__":
    main()
