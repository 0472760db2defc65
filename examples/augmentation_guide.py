"""Augmentation guide — what each knob does, entirely on-device.

The TPU-native counterpart of the reference's interactive
``example_notebooks/augmentation_guide.py`` (marimo sliders over Skia
transforms). Here the same augmentations — rotation, scale, translation,
flip, random erase, mixup, noise, contrast, brightness — run through the
actual training pipeline's JAX functions (``sleap_nn_tpu.data.augmentation``),
the very code that executes *inside the jitted train step on the TPU*; the
script sweeps each knob over a few values and writes a comparison grid PNG.

Key design difference vs the reference: the reference augments on the host
(Skia/kornia, one image at a time, CPU worker processes); this framework
augments **batched on the accelerator** with ``jax.random`` keys, so
augmentation fuses into the same XLA program as target rendering and the
forward pass — zero extra host<->device traffic, bitwise-reproducible from the
seed. Keypoints are transformed by the same affine matrices as the pixels, so
image/point consistency is exact by construction (the tests'
geometric-consistency oracles assert this).

Run:

    JAX_PLATFORMS=cpu python examples/augmentation_guide.py
    # -> augmentation_guide.png + per-knob stats on stdout

Reference parity: ref example_notebooks/augmentation_guide.py (rotation /
scale / translate / intensity cells); ref sleap_nn/data/augmentation.py for
the knob names and ranges (mirrored by our AugmentationConfig).
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np

ASSETS = Path(
    os.environ.get("SLEAP_DEMO_ASSETS", "/root/reference/tests/assets/datasets")
)
LABELS = Path(os.environ.get("SLEAP_DEMO_LABELS", ASSETS / "minimal_instance.pkg.slp"))
OUT_PNG = Path(os.environ.get("SLEAP_DEMO_OUT", ".")) / "augmentation_guide.png"


def load_sample():
    """One labeled frame + its keypoints, batched to (1, H, W, C) in [0, 1]."""
    from sleap_nn_tpu.io import load_slp

    labels = load_slp(str(LABELS))
    lf = labels[0]
    img = np.asarray(lf.image)
    if img.ndim == 2:
        img = img[..., None]
    pts = np.stack([np.asarray(inst.numpy())[:, :2] for inst in lf.instances])
    return img[None].astype(np.float32) / 255.0, pts[None].astype(np.float32)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from sleap_nn_tpu.data.augmentation import (
        apply_geometric_augmentation,
        apply_intensity_augmentation,
    )

    image, instances = load_sample()
    image = jnp.asarray(image)
    instances = jnp.asarray(instances)
    key = jax.random.PRNGKey(int(os.environ.get("SLEAP_DEMO_SEED", "0")))

    # Each row of the figure: one knob swept over three strengths. p=1.0
    # forces the augmentation on (training uses probabilities < 1 so only a
    # random subset of each batch is augmented).
    sweeps = [
        ("rotation", [
            dict(rotation_min=a, rotation_max=a, rotation_p=1.0)
            for a in (-45.0, 15.0, 90.0)
        ]),
        ("scale", [
            dict(scale_min=s, scale_max=s, scale_p=1.0)
            for s in (0.5, 0.9, 1.5)
        ]),
        ("translate", [
            dict(translate_width=t, translate_height=t, translate_p=1.0)
            for t in (0.05, 0.1, 0.2)
        ]),
        ("flip + erase", [
            dict(flip_p=1.0),
            dict(erase_p=1.0, erase_scale_min=0.02, erase_scale_max=0.05),
            dict(flip_p=1.0, erase_p=1.0, erase_scale_min=0.02,
                 erase_scale_max=0.05),
        ]),
    ]
    intensity_sweeps = [
        ("intensity", [
            dict(gaussian_noise_std=0.05, gaussian_noise_p=1.0),
            dict(contrast_min=1.6, contrast_max=1.6, contrast_p=1.0),
            dict(brightness_min=1.4, brightness_max=1.4, brightness_p=1.0),
        ]),
    ]

    panels = [("original", np.asarray(image[0]), np.asarray(instances[0]))]
    for name, variants in sweeps:
        for i, kw in enumerate(variants):
            k = jax.random.fold_in(key, hash((name, i)) % (2**31))
            img_a, pts_a = apply_geometric_augmentation(
                k, image, instances, **kw
            )
            label = f"{name}: " + ", ".join(
                f"{kk}={vv}" for kk, vv in kw.items() if not kk.endswith("_p")
            )
            panels.append((label or name, np.asarray(img_a[0]), np.asarray(pts_a[0])))
            # Consistency check: keypoints moved with the pixels (finite and
            # inside the frame unless the transform pushed them out).
            moved = np.asarray(pts_a[0]) - np.asarray(instances[0])
            print(f"{label:52s} mean-keypoint-shift={np.nanmean(np.abs(moved)):6.2f}px")
    for name, variants in intensity_sweeps:
        for i, kw in enumerate(variants):
            k = jax.random.fold_in(key, 1000 + i)
            img_a = apply_intensity_augmentation(k, image, **kw)
            label = f"{name}: " + ", ".join(
                f"{kk}={vv}" for kk, vv in kw.items() if not kk.endswith("_p")
            )
            panels.append((label, np.asarray(img_a[0]), np.asarray(instances[0])))
            print(
                f"{label:52s} mean-abs-pixel-delta="
                f"{float(np.abs(np.asarray(img_a) - np.asarray(image)).mean()):.4f}"
            )

    # ------------------------------------------------------------------
    # Render the grid (matplotlib is only needed for the figure, not the
    # pipeline itself — skip gracefully in minimal environments).
    # ------------------------------------------------------------------
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        print("matplotlib unavailable; skipping figure")
        return
    n = len(panels)
    cols = 4
    rows = (n + cols - 1) // cols
    fig, axes = plt.subplots(rows, cols, figsize=(4 * cols, 4 * rows))
    for ax in np.ravel(axes):
        ax.axis("off")
    for ax, (label, img, pts) in zip(np.ravel(axes), panels):
        ax.imshow(img.squeeze(-1) if img.shape[-1] == 1 else img,
                  cmap="gray", vmin=0, vmax=1)
        for inst in pts:
            ok = np.isfinite(inst).all(axis=-1)
            ax.plot(inst[ok, 0], inst[ok, 1], "o-", ms=4, lw=1)
        ax.set_title(label, fontsize=8)
    fig.tight_layout()
    OUT_PNG.parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(OUT_PNG, dpi=80)
    print(f"wrote {OUT_PNG} ({n} panels)")


if __name__ == "__main__":
    main()
