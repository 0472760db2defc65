"""Training entry: run a training job + post-training evaluation per split.

Parity target: reference sleap_nn/train.py:316-904 (``run_training`` with
post-training predict + eval on train/val/test splits, metrics npz files in
the model dir).
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

from sleap_nn_tpu.config import TrainingJobConfig, get_model_type_from_cfg
from sleap_nn_tpu.evaluation import run_evaluation
from sleap_nn_tpu.training import ModelTrainer


def _eval_split(
    model_dir: Path,
    model_type: str,
    split: str,
    idx: int,
    labels_gt,
    peak_threshold: float = 0.2,
) -> Optional[dict]:
    """Predict on a split's GT frames + evaluate, saving labels_pr + metrics."""
    from sleap_nn_tpu.inference import predict

    if model_type == "centroid":
        match_method = "centroid"
        model_paths = [str(model_dir)]
    elif model_type in ("centered_instance",):
        # Centered-instance alone can't run topdown; skip split eval
        # (reference evaluates it within a topdown pair).
        return None
    else:
        match_method = "oks"
        model_paths = [str(model_dir)]

    preds = predict(labels_gt, model_paths, make_labels=True, peak_threshold=peak_threshold)
    pred_path = model_dir / f"labels_pr.{split}_{idx}.slp"
    preds.save(pred_path)
    metrics = run_evaluation(
        labels_gt,
        preds,
        match_method=match_method,
        # Reference model-dir contract: metrics.{split}.{idx}.npz (its
        # load_metrics new-format naming; old names still load, see
        # evaluation._find_metrics_file).
        save_metrics=str(model_dir / f"metrics.{split}.{idx}.npz"),
    )
    return metrics


def run_training(config: TrainingJobConfig) -> ModelTrainer:
    """Train a model from config; then best-effort post-training eval.

    Returns the trainer (with ``.history`` and ``.ckpt_dir``).
    """
    trainer = ModelTrainer.get_model_trainer_from_config(config)
    trainer.train()

    if trainer.ckpt_dir is not None:
        model_type = trainer.model_type
        # Held-out test files (data_config.test_file_path, reference
        # train.py:478-509): evaluated alongside the train/val splits.
        test_labels: List = []
        tfp = config.data_config.test_file_path
        if tfp:
            from sleap_nn_tpu.io import load_slp

            paths = [tfp] if isinstance(tfp, (str, Path)) else list(tfp)
            for p in paths:
                try:
                    test_labels.append(load_slp(str(p)))
                except Exception as e:
                    print(f"test_file_path {p}: failed to load ({e})")
        for split, labels_list in (
            ("train", trainer.train_labels),
            ("val", trainer.val_labels),
            ("test", test_labels),
        ):
            for i, labels in enumerate(labels_list):
                try:
                    m = _eval_split(trainer.ckpt_dir, model_type, split, i, labels)
                    if m is None:
                        print(f"eval {split}_{i}: no usable predictions, metrics skipped")
                    elif "mOKS" in m:
                        print(f"eval {split}_{i}: mOKS={m['mOKS']['mOKS']:.4f}")
                except Exception as e:  # best-effort (reference: train.py:121-126)
                    print(f"Post-training eval failed for {split}_{i}: {e}")
    return trainer


def train(
    train_labels_path: Optional[List[str]] = None,
    config_path: Optional[str] = None,
    overrides: Optional[Dict] = None,
    **kwargs,
) -> ModelTrainer:
    """Python-API train entry (reference: train.py:535).

    Without ``config_path``, keyword arguments are routed through the
    kwargs->config builders (``get_config``, reference get_config.py:506-712)
    so the full reference surface works: ``backbone_config`` (preset name or
    ``{"unet"|"convnext"|"swint"|"pretrained": {...}}`` dict),
    ``head_configs``, preprocessing (scale/max_height/...), augmentation,
    and every trainer knob. With ``config_path``, kwargs are applied as
    trainer-config attribute overrides on the loaded YAML.
    """
    if config_path is not None:
        config = TrainingJobConfig.load_yaml(config_path, overrides=overrides)
        if train_labels_path:
            config.data_config.train_labels_path = (
                [train_labels_path] if isinstance(train_labels_path, (str, Path))
                else list(train_labels_path)
            )
        for key, value in kwargs.items():
            setattr(config.trainer_config, key, value)
        return run_training(config)

    from sleap_nn_tpu.config.get_config import get_config

    # Reference kwarg names -> builder arg names.
    aliases = {
        "backbone_config": "backbone",
        "geometry_aug": "geometric_aug",
        "init_weight": "init_weights",
    }
    for ref_name, builder_name in aliases.items():
        if ref_name in kwargs:
            kwargs[builder_name] = kwargs.pop(ref_name)
    use_aug = kwargs.pop("use_augmentations_train", None)
    if train_labels_path:
        kwargs["train_labels_path"] = (
            [train_labels_path] if isinstance(train_labels_path, (str, Path))
            else list(train_labels_path)
        )
    config = get_config(**kwargs)
    if use_aug is not None:
        config.data_config.use_augmentations_train = bool(use_aug)
    if overrides:
        from sleap_nn_tpu.config import apply_overrides

        apply_overrides(config, overrides)
    return run_training(config)
