"""Top-down training, evaluation & tracking — end to end, on TPU or CPU.

The TPU-native retelling of the reference walkthrough
(``example_notebooks/training_demo.py``): build a **top-down** pose pipeline —
a *centroid* model that locates each animal plus a *centered-instance* model
that predicts the skeleton inside a crop around each centroid — then train,
evaluate on held-out data, and run tracked inference on a fresh video.

Unlike the reference's marimo notebook this is a plain script: run it with

    JAX_PLATFORMS=cpu python examples/training_demo.py            # quick, fixture-scale
    SLEAP_DEMO_EPOCHS=50 python examples/training_demo.py         # longer run (TPU)

By default it runs at *fixture scale* (tiny UNet, 2 epochs, the bundled
minimal dataset) so it finishes in ~2 minutes on a laptop CPU and is executed
verbatim by ``tests/test_examples.py`` in CI. Every step is the same API a
production run uses — scale up by pointing ``SLEAP_DEMO_LABELS`` at your own
.slp/.pkg.slp files and raising ``SLEAP_DEMO_EPOCHS``.
"""

from __future__ import annotations

import os
from pathlib import Path

# ---------------------------------------------------------------------------
# 0. Inputs. The demo dataset is a SLEAP labels package (.pkg.slp) with the
#    frames embedded, so no video files need resolving. Override with your own.
# ---------------------------------------------------------------------------
ASSETS = Path(
    os.environ.get("SLEAP_DEMO_ASSETS", "/root/reference/tests/assets/datasets")
)
LABELS = Path(os.environ.get("SLEAP_DEMO_LABELS", ASSETS / "minimal_instance.pkg.slp"))
# Point SLEAP_DEMO_VIDEO at a fresh clip of the SAME animals to see tracked
# inference on unlabeled data; by default we predict back on the labeled
# frames (the fixture model knows nothing about other footage).
VIDEO = Path(os.environ.get("SLEAP_DEMO_VIDEO", ""))
EPOCHS = int(os.environ.get("SLEAP_DEMO_EPOCHS", "2"))
OUT = Path(os.environ.get("SLEAP_DEMO_OUT", "demo_models"))


def main() -> None:
    from sleap_nn_tpu.config import apply_overrides
    from sleap_nn_tpu.config.get_config import get_config
    from sleap_nn_tpu.evaluation import load_metrics
    from sleap_nn_tpu.inference.run import predict
    from sleap_nn_tpu.io import load_slp
    from sleap_nn_tpu.train import run_training

    labels = load_slp(str(LABELS))
    skeleton = labels.skeletons[0]
    print(
        f"dataset: {len(labels)} labeled frames, "
        f"{len(skeleton.nodes)} nodes ({[n.name for n in skeleton.nodes]})"
    )

    # -----------------------------------------------------------------------
    # 1. Configs. ``get_config`` mirrors the reference's flat-kwargs builders
    #    (ref sleap_nn/config/get_config.py:506/634/712); the result is a
    #    ``TrainingJobConfig`` you could equally load from any reference YAML.
    #    A top-down pipeline is TWO training jobs: centroid + centered instance.
    # -----------------------------------------------------------------------
    common = dict(
        train_labels_path=[str(LABELS)],
        use_same_data_for_val=True,  # fixture has one frame; real runs split
        scale=0.5,
        backbone="unet",
        filters=8,            # fixture-scale; reference medium_rf preset = 64
        filters_rate=2.0,
        max_stride=8,
        output_stride=2,
        max_epochs=EPOCHS,
        batch_size=2,
        learning_rate=1e-3,
        save_ckpt=True,
        ckpt_dir=str(OUT),
        min_train_steps_per_epoch=1,
    )
    centroid_cfg = get_config(head_configs="centroid", run_name="centroid", **common)
    instance_cfg = get_config(
        head_configs="centered_instance", run_name="centered_instance", **common
    )
    # Anchor both stages on the same body part, like the reference demo anchors
    # flies on the thorax. The fixture skeleton is A->B; use the first node.
    anchor = skeleton.nodes[0].name
    apply_overrides(centroid_cfg, {
        "model_config.head_configs.centroid.confmaps.anchor_part": anchor,
    })
    apply_overrides(instance_cfg, {
        "model_config.head_configs.centered_instance.confmaps.anchor_part": anchor,
        "data_config.preprocessing.crop_size": 96,
    })

    # Save the configs as reference-compatible YAML next to the checkpoints.
    OUT.mkdir(parents=True, exist_ok=True)
    centroid_cfg.save_yaml(OUT / "centroid.yaml")
    instance_cfg.save_yaml(OUT / "centered_instance.yaml")

    # -----------------------------------------------------------------------
    # 2. Train. One jitted XLA program per job: augmentation, target render,
    #    forward, loss, and optimizer update all fused on-device. Checkpoints,
    #    training_log.csv, and per-split metrics land in the run dir — the same
    #    model-dir contract the reference produces.
    # -----------------------------------------------------------------------
    for cfg in (centroid_cfg, instance_cfg):
        name = cfg.trainer_config.run_name
        print(f"\n=== training {name} ({EPOCHS} epochs) ===")
        run_training(cfg)

    centroid_dir = OUT / "centroid"
    instance_dir = OUT / "centered_instance"

    # -----------------------------------------------------------------------
    # 3. Evaluate. Training already wrote metrics.<split>.<idx>.npz per split
    #    (ref train.py behavior); load and report the headline numbers.
    # -----------------------------------------------------------------------
    for run_dir in (centroid_dir, instance_dir):
        metrics_files = sorted(run_dir.glob("metrics.*.npz"))
        if not metrics_files:
            continue
        metrics = load_metrics(str(metrics_files[-1]))
        oks = metrics.get("oks_voc.mAP")
        dist = metrics.get("distance_metrics.avg")
        print(
            f"{run_dir.name}: mAP={float(oks) if oks is not None else float('nan'):.3f} "
            f"avg-dist={float(dist) if dist is not None else float('nan'):.2f}px"
        )

    # -----------------------------------------------------------------------
    # 4. Tracked inference on a fresh clip. ``predict`` assembles the two
    #    models into a TopDown pipeline automatically and streams results to
    #    a .slp; tracking links instances across frames (Hungarian matching
    #    over IoU/centroid cost, same flags as the reference tracker).
    # -----------------------------------------------------------------------
    on_video = str(VIDEO) not in ("", ".") and VIDEO.exists()
    infer_target = VIDEO if on_video else LABELS
    preds = predict(
        str(infer_target),
        model_paths=[str(centroid_dir), str(instance_dir)],
        output_path=str(OUT / "predictions.slp"),
        frames=list(range(16)) if on_video else None,
        tracking=on_video,
        max_instances=2,
        batch_size=2,
        peak_threshold=0.1,  # fixture-scale models are under-trained; relax
    )
    n_pred = sum(len(lf.instances) for lf in preds)
    n_tracks = len({i.track.name for lf in preds for i in lf.instances if i.track})
    print(
        f"\npredicted {n_pred} instances over {len(preds)} frames"
        + (f", {n_tracks} tracks" if n_tracks else "")
    )
    print(f"outputs in {OUT}/ (configs, checkpoints, logs, metrics, predictions.slp)")


if __name__ == "__main__":
    main()
