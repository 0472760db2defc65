"""Training visualization: confmap/peak/PAF overlays rendered to PNGs.

Parity target: reference sleap_nn/training/callbacks.py:523-1029
(``UnifiedVizCallback`` + ``MatplotlibSaver``) and training/utils.py:158-290
(``plot_confmaps``/``plot_peaks``): each epoch (or every N), render the
first validation sample's image + predicted confmaps + peaks into
``<model_dir>/viz/<epoch>.png``.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional

import numpy as np

from sleap_nn_tpu.training.callbacks import Callback


def render_prediction_png(
    image: np.ndarray,
    confmaps: Optional[np.ndarray] = None,
    peaks: Optional[np.ndarray] = None,
    gt_points: Optional[np.ndarray] = None,
    output_path=None,
    confmap_stride: int = 1,
    title: str = "",
):
    """Render image + confmap overlay + GT/pred points to a PNG."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    img = np.asarray(image)
    if img.ndim == 3 and img.shape[-1] == 1:
        img = img[..., 0]
    fig, ax = plt.subplots(figsize=(6, 6), dpi=100)
    ax.imshow(img, cmap="gray")
    if confmaps is not None:
        cm = np.asarray(confmaps)
        overlay = cm.max(axis=-1)
        ax.imshow(
            overlay,
            cmap="jet",
            alpha=0.5 * np.clip(overlay, 0, 1),
            extent=(0, overlay.shape[1] * confmap_stride, overlay.shape[0] * confmap_stride, 0),
        )
    if gt_points is not None:
        pts = np.asarray(gt_points).reshape(-1, 2)
        ax.plot(pts[:, 0], pts[:, 1], "g+", markersize=10, label="GT")
    if peaks is not None:
        pts = np.asarray(peaks).reshape(-1, 2)
        ax.plot(pts[:, 0], pts[:, 1], "rx", markersize=8, label="pred")
    if title:
        ax.set_title(title)
    ax.set_xlim(0, img.shape[1])
    ax.set_ylim(img.shape[0], 0)
    ax.axis("off")
    if output_path is not None:
        fig.savefig(output_path, bbox_inches="tight")
        plt.close(fig)
        return output_path
    return fig


def render_paf_png(
    image: np.ndarray,
    pafs: np.ndarray,
    output_path=None,
    paf_stride: int = 1,
    quiver_step: int = 8,
    title: str = "",
):
    """Render image + PAF magnitude heatmap + direction quiver to a PNG.

    Parity target: the reference bottom-up viz panel (training/utils.py
    ``plot_pafs`` / UnifiedVizCallback pafs output). ``pafs`` is
    ``(H, W, 2*E)`` channels-last with per-edge (x, y) pairs; a 4D
    ``(H, W, E, 2)`` layout is accepted too.
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    img = np.asarray(image)
    if img.ndim == 3 and img.shape[-1] == 1:
        img = img[..., 0]
    p = np.asarray(pafs)
    if p.ndim == 3:
        h, w, c = p.shape
        if c % 2:
            raise ValueError(f"PAF channel count must be even, got {c}.")
        p = p.reshape(h, w, c // 2, 2)
    elif p.ndim != 4:
        raise ValueError(f"pafs must be 3D or 4D, got shape {p.shape}.")
    # Magnitude: max over edges of the per-edge vector norm.
    mag = np.sqrt((p**2).sum(axis=-1)).max(axis=-1)
    fig, ax = plt.subplots(figsize=(6, 6), dpi=100)
    ax.imshow(img, cmap="gray")
    ax.imshow(
        mag,
        cmap="jet",
        alpha=0.5 * np.clip(mag, 0, 1),
        extent=(0, mag.shape[1] * paf_stride, mag.shape[0] * paf_stride, 0),
    )
    # Direction quiver on a sparse grid, strongest edge per cell.
    gy, gx = np.mgrid[0:p.shape[0]:quiver_step, 0:p.shape[1]:quiver_step]
    sub = p[::quiver_step, ::quiver_step]  # (gy, gx, E, 2)
    norms = np.sqrt((sub**2).sum(axis=-1))
    best = norms.argmax(axis=-1)
    take = np.take_along_axis(sub, best[..., None, None], axis=2)[:, :, 0, :]
    keep = norms.max(axis=-1) > 0.1
    ax.quiver(
        gx[keep] * paf_stride, gy[keep] * paf_stride,
        take[..., 0][keep], -take[..., 1][keep],
        color="white", scale=30, width=0.003,
    )
    if title:
        ax.set_title(title)
    ax.set_xlim(0, img.shape[1])
    ax.set_ylim(img.shape[0], 0)
    ax.axis("off")
    if output_path is not None:
        fig.savefig(output_path, bbox_inches="tight")
        plt.close(fig)
        return output_path
    return fig


def render_class_maps_png(
    image: np.ndarray,
    class_maps: np.ndarray,
    output_path=None,
    stride: int = 1,
    title: str = "",
):
    """Render image + per-class occupancy overlay (multiclass bottom-up viz).

    ``class_maps`` is ``(H, W, n_classes)``; each pixel is tinted by its
    argmax class where any class activation exceeds 0.5.
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    img = np.asarray(image)
    if img.ndim == 3 and img.shape[-1] == 1:
        img = img[..., 0]
    cm = np.asarray(class_maps)
    if cm.ndim != 3:
        raise ValueError(f"class_maps must be (H, W, C), got {cm.shape}.")
    strength = cm.max(axis=-1)
    labels_map = cm.argmax(axis=-1).astype(float)
    labels_map[strength < 0.5] = np.nan
    fig, ax = plt.subplots(figsize=(6, 6), dpi=100)
    ax.imshow(img, cmap="gray")
    ax.imshow(
        labels_map,
        cmap="tab10",
        alpha=0.6,
        interpolation="nearest",
        vmin=0,
        vmax=max(cm.shape[-1] - 1, 1),
        extent=(0, cm.shape[1] * stride, cm.shape[0] * stride, 0),
    )
    if title:
        ax.set_title(title)
    ax.set_xlim(0, img.shape[1])
    ax.set_ylim(img.shape[0], 0)
    ax.axis("off")
    if output_path is not None:
        fig.savefig(output_path, bbox_inches="tight")
        plt.close(fig)
        return output_path
    return fig


class VizCallback(Callback):
    """Render a validation sample's predictions each epoch (reference: :523)."""

    def __init__(
        self,
        trainer,
        viz_dir,
        every_n_epochs: int = 1,
        img_format: str = "png",
    ):
        self.trainer = trainer
        self.viz_dir = Path(viz_dir)
        self.viz_dir.mkdir(parents=True, exist_ok=True)
        self.every_n_epochs = max(every_n_epochs, 1)
        self.img_format = img_format

    def on_epoch_end(self, trainer, epoch: int, logs: Dict):
        if epoch % self.every_n_epochs:
            return
        try:
            self._render(trainer, epoch)
        except Exception as e:  # viz must never break training
            print(f"viz render failed at epoch {epoch}: {e}")

    def _render(self, trainer, epoch: int):
        import jax
        import jax.numpy as jnp

        from sleap_nn_tpu.data.pipeline import make_render_fn
        from sleap_nn_tpu.ops.peaks import find_global_peaks, find_local_peaks

        batch = trainer.val_ds.make_batch([0])
        render = make_render_fn(trainer.ctx, train=False)
        processed = render({k: jnp.asarray(v) for k, v in batch.items()})
        preds = trainer.model.apply(trainer.params, processed["image"])
        # Share this epoch's render+forward with the wandb overlay callback
        # (it runs after this one) so the sample is computed once per epoch.
        trainer._viz_cache = (epoch, processed, preds)

        cm_head = next(
            (h for h in trainer.model.heads if "Confmaps" in h.name), None
        )
        confmaps = peaks = None
        stride = 1
        if cm_head is not None:
            confmaps = np.asarray(preds[cm_head.name][0])
            stride = cm_head.output_stride
            cms = preds[cm_head.name]
            if trainer.model_type in ("single_instance", "centered_instance"):
                pts, _ = find_global_peaks(cms, threshold=0.1, refinement="integral")
                peaks = np.asarray(pts[0]) * stride
            else:
                pts, _, _, valid = find_local_peaks(cms, threshold=0.1, max_peaks=20)
                peaks = np.asarray(pts[0])[np.asarray(valid[0])] * stride

        gt = np.asarray(processed.get("instances", batch["instances"]))[0]
        out = self.viz_dir / f"epoch_{epoch:04d}.{self.img_format}"
        render_prediction_png(
            np.asarray(processed["image"][0]),
            confmaps=confmaps,
            peaks=peaks,
            gt_points=gt,
            output_path=out,
            confmap_stride=stride,
            title=f"epoch {epoch}",
        )
        # Bottom-up: a second panel with the PAF magnitude + direction field
        # (reference UnifiedVizCallback pafs output); multiclass bottom-up:
        # a class-occupancy panel (class_maps viz mode).
        paf_head = next(
            (h for h in trainer.model.heads if "PartAffinity" in h.name), None
        )
        if paf_head is not None:
            render_paf_png(
                np.asarray(processed["image"][0]),
                np.asarray(preds[paf_head.name][0]),
                output_path=self.viz_dir
                / f"epoch_{epoch:04d}_pafs.{self.img_format}",
                paf_stride=paf_head.output_stride,
                title=f"epoch {epoch} pafs",
            )
        cmap_head = next(
            (h for h in trainer.model.heads if "ClassMaps" in h.name), None
        )
        if cmap_head is not None:
            render_class_maps_png(
                np.asarray(processed["image"][0]),
                np.asarray(preds[cmap_head.name][0]),
                output_path=self.viz_dir
                / f"epoch_{epoch:04d}_classmaps.{self.img_format}",
                stride=cmap_head.output_stride,
                title=f"epoch {epoch} class maps",
            )
