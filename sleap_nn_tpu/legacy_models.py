"""Legacy SLEAP v1 model import: Keras ``.h5`` weights + json config -> flax.

Parity target: reference sleap_nn/legacy_models.py:88-596
(``load_keras_weights``, ``map_legacy_to_pytorch_layers``,
``load_legacy_model``). Keras stores conv kernels in HWIO — exactly flax's
layout — so the import is a pure name-mapping (no transposes), unlike the
reference's OIHW conversion (reference: legacy_models.py:88).
"""

from __future__ import annotations

import json
import math
from pathlib import Path
from typing import Dict, Optional, Tuple

import h5py
import numpy as np

from sleap_nn_tpu.config import TrainingJobConfig, apply_overrides
from sleap_nn_tpu.models import Model


def load_keras_weights(h5_path) -> Dict[str, Dict[str, np.ndarray]]:
    """Read all layer weights from a Keras ``best_model.h5`` (reference: :129)."""
    weights: Dict[str, Dict[str, np.ndarray]] = {}
    if not Path(h5_path).exists():
        raise FileNotFoundError(
            f"Legacy Keras weights file not found: {h5_path}"
        )
    with h5py.File(h5_path, "r") as f:
        if "model_weights" not in f:
            raise ValueError(
                f"{h5_path} has no 'model_weights' group — not a Keras "
                "checkpoint (SLEAP v1 saves best_model.h5 via keras)."
            )
        mw = f["model_weights"]

        def visit(name, obj):
            if isinstance(obj, h5py.Dataset) and name.endswith(":0"):
                parts = name.split("/")
                layer = parts[0]
                kind = parts[-1].split(":")[0]  # kernel | bias
                weights.setdefault(layer, {})[kind] = np.asarray(obj)

        mw.visititems(visit)
    return weights


def legacy_config_mapper(legacy: dict) -> TrainingJobConfig:
    """Map a SLEAP v1 ``training_config.json`` to a TrainingJobConfig.

    (reference: config/data_config.py:367 ``data_mapper`` +
    trainer_config.py:419 ``trainer_mapper`` + model mapping in
    legacy_models.py:567.)
    """
    cfg = TrainingJobConfig()
    data = legacy.get("data", {})
    pre = data.get("preprocessing", {})
    cfg.data_config.train_labels_path = [
        p for p in [data.get("labels", {}).get("training_labels")] if p
    ]
    val = data.get("labels", {}).get("validation_labels")
    if val:
        cfg.data_config.val_labels_path = [val]
    cfg.data_config.validation_fraction = data.get("labels", {}).get(
        "validation_fraction", 0.1
    )
    cfg.data_config.preprocessing.ensure_rgb = bool(pre.get("ensure_rgb", False))
    cfg.data_config.preprocessing.ensure_grayscale = bool(pre.get("ensure_grayscale", False))
    cfg.data_config.preprocessing.scale = float(pre.get("input_scaling", 1.0))
    crop = data.get("instance_cropping", {}).get("crop_size")
    cfg.data_config.preprocessing.crop_size = crop

    model = legacy.get("model", {})
    unet = (model.get("backbone") or {}).get("unet")
    if unet:
        apply_overrides(cfg, {
            "model_config.backbone_config.unet.filters": int(unet.get("filters", 32)),
            "model_config.backbone_config.unet.filters_rate": float(unet.get("filters_rate", 1.5)),
            "model_config.backbone_config.unet.max_stride": int(unet.get("max_stride", 16)),
            "model_config.backbone_config.unet.output_stride": int(unet.get("output_stride", 2)),
            "model_config.backbone_config.unet.stem_stride": unet.get("stem_stride"),
            "model_config.backbone_config.unet.middle_block": bool(unet.get("middle_block", True)),
            "model_config.backbone_config.unet.up_interpolate": bool(unet.get("up_interpolate", True)),
            "model_config.backbone_config.unet.stacks": int(unet.get("stacks", 1)),
            "model_config.backbone_config.unet.in_channels": 3,
            # Keras Conv2DTranspose(padding="same") has the TF phase, which
            # flax ConvTranspose(padding="SAME") reproduces exactly — keep it
            # for imported legacy weights (fresh models default to "torch").
            "model_config.backbone_config.unet.trans_conv_phase": "tf",
        })

    heads = model.get("heads", {})
    if heads.get("single_instance"):
        h = heads["single_instance"]
        apply_overrides(cfg, {
            "model_config.head_configs.single_instance.confmaps.part_names": h.get("part_names"),
            "model_config.head_configs.single_instance.confmaps.sigma": h.get("sigma", 5.0),
            "model_config.head_configs.single_instance.confmaps.output_stride": h.get("output_stride", 1),
        })
    elif heads.get("centroid"):
        h = heads["centroid"]
        apply_overrides(cfg, {
            "model_config.head_configs.centroid.confmaps.anchor_part": h.get("anchor_part"),
            "model_config.head_configs.centroid.confmaps.sigma": h.get("sigma", 5.0),
            "model_config.head_configs.centroid.confmaps.output_stride": h.get("output_stride", 1),
        })
    elif heads.get("centered_instance"):
        h = heads["centered_instance"]
        apply_overrides(cfg, {
            "model_config.head_configs.centered_instance.confmaps.part_names": h.get("part_names"),
            "model_config.head_configs.centered_instance.confmaps.anchor_part": h.get("anchor_part"),
            "model_config.head_configs.centered_instance.confmaps.sigma": h.get("sigma", 5.0),
            "model_config.head_configs.centered_instance.confmaps.output_stride": h.get("output_stride", 1),
        })
    elif heads.get("multi_instance"):
        h = heads["multi_instance"]
        cm, pafs = h.get("confmaps", {}), h.get("pafs", {})
        apply_overrides(cfg, {
            "model_config.head_configs.bottomup.confmaps.part_names": cm.get("part_names"),
            "model_config.head_configs.bottomup.confmaps.sigma": cm.get("sigma", 5.0),
            "model_config.head_configs.bottomup.confmaps.output_stride": cm.get("output_stride", 1),
            "model_config.head_configs.bottomup.pafs.edges": pafs.get("edges"),
            "model_config.head_configs.bottomup.pafs.sigma": pafs.get("sigma", 15.0),
            "model_config.head_configs.bottomup.pafs.output_stride": pafs.get("output_stride", 1),
        })
    elif heads.get("multi_class_bottomup"):
        h = heads["multi_class_bottomup"]
        cm, cmaps = h.get("confmaps", {}), h.get("class_maps", {})
        apply_overrides(cfg, {
            "model_config.head_configs.multi_class_bottomup.confmaps.part_names": cm.get("part_names"),
            "model_config.head_configs.multi_class_bottomup.confmaps.sigma": cm.get("sigma", 5.0),
            "model_config.head_configs.multi_class_bottomup.confmaps.output_stride": cm.get("output_stride", 1),
            "model_config.head_configs.multi_class_bottomup.confmaps.loss_weight": cm.get("loss_weight", 1.0),
            "model_config.head_configs.multi_class_bottomup.class_maps.classes": cmaps.get("classes"),
            "model_config.head_configs.multi_class_bottomup.class_maps.sigma": cmaps.get("sigma", 5.0),
            "model_config.head_configs.multi_class_bottomup.class_maps.output_stride": cmaps.get("output_stride", 1),
            "model_config.head_configs.multi_class_bottomup.class_maps.loss_weight": cmaps.get("loss_weight", 1.0),
        })
    elif heads.get("multi_class_topdown"):
        h = heads["multi_class_topdown"]
        cm = h.get("confmaps", {})
        cvec = h.get("class_vectors", {})
        apply_overrides(cfg, {
            "model_config.head_configs.multi_class_topdown.confmaps.part_names": cm.get("part_names"),
            "model_config.head_configs.multi_class_topdown.confmaps.anchor_part": cm.get("anchor_part"),
            "model_config.head_configs.multi_class_topdown.confmaps.sigma": cm.get("sigma", 5.0),
            "model_config.head_configs.multi_class_topdown.confmaps.output_stride": cm.get("output_stride", 1),
            "model_config.head_configs.multi_class_topdown.class_vectors.classes": cvec.get("classes"),
            "model_config.head_configs.multi_class_topdown.class_vectors.num_fc_layers": cvec.get("num_fc_layers", 1),
            "model_config.head_configs.multi_class_topdown.class_vectors.num_fc_units": cvec.get("num_fc_units", 64),
            "model_config.head_configs.multi_class_topdown.class_vectors.loss_weight": cvec.get("loss_weight", 1.0),
        })

    opt = legacy.get("optimization", {})
    cfg.trainer_config.train_data_loader.batch_size = int(opt.get("batch_size", 4))
    cfg.trainer_config.max_epochs = int(opt.get("epochs", 100))
    cfg.trainer_config.optimizer_name = str(opt.get("optimizer", "adam")).capitalize()
    cfg.trainer_config.optimizer.lr = float(opt.get("initial_learning_rate", 1e-4))
    lrs = opt.get("learning_rate_schedule", {})
    if lrs.get("reduce_on_plateau"):
        apply_overrides(cfg, {
            "trainer_config.lr_scheduler.reduce_lr_on_plateau.factor": lrs.get("reduction_factor", 0.5),
            "trainer_config.lr_scheduler.reduce_lr_on_plateau.threshold": lrs.get("plateau_min_delta", 1e-6),
            "trainer_config.lr_scheduler.reduce_lr_on_plateau.patience": lrs.get("plateau_patience", 5),
            "trainer_config.lr_scheduler.reduce_lr_on_plateau.cooldown": lrs.get("plateau_cooldown", 3),
            "trainer_config.lr_scheduler.reduce_lr_on_plateau.min_lr": lrs.get("min_learning_rate", 0.0),
        })
    es = opt.get("early_stopping", {})
    cfg.trainer_config.early_stopping.stop_training_on_plateau = bool(
        es.get("stop_training_on_plateau", True)
    )
    cfg.trainer_config.early_stopping.patience = int(es.get("plateau_patience", 10))
    hkm = opt.get("hard_keypoint_mining", {})
    if hkm:
        cfg.trainer_config.online_hard_keypoint_mining.online_mining = bool(
            hkm.get("online_mining", False)
        )

    outputs = legacy.get("outputs", {})
    # run_name = prefix + name + suffix (reference trainer_config.py:432-439
    # intends this concatenation; its ternary has a precedence bug that
    # returns the bare prefix — implement the documented intent instead).
    _name = outputs.get("run_name") or ""
    _prefix = outputs.get("run_name_prefix") or ""
    _suffix = outputs.get("run_name_suffix") or ""
    _full = f"{_prefix}{_name}{_suffix}"
    cfg.trainer_config.run_name = _full if _full else None
    # Skeleton (for head autofill + prediction labels).
    skels = data.get("labels", {}).get("skeletons") or []
    if skels:
        nodes, edges = _decode_legacy_skeleton(skels[0])
        cfg.data_config.skeletons = [
            {
                "nodes": [{"name": n} for n in nodes],
                "edges": [{"source": {"name": s}, "destination": {"name": d}} for s, d in edges],
                "symmetries": [],
                "name": skels[0].get("graph", {}).get("name", "Skeleton-0"),
            }
        ]
    return cfg


def _decode_legacy_skeleton(skel_json: dict) -> Tuple[list, list]:
    """Decode SLEAP v1 jsonpickle skeleton (py/object Node states)."""
    memo = {}
    order = []

    def node_name(obj):
        if isinstance(obj, dict):
            if "py/object" in obj and "py/state" in obj:
                name = obj["py/state"]["py/tuple"][0]
                memo[len(memo) + 1] = name
                return name
            if "py/id" in obj:
                return memo.get(obj["py/id"])
        return obj

    edges = []
    for link in skel_json.get("links", []):
        s = node_name(link.get("source"))
        d = node_name(link.get("target"))
        for n in (s, d):
            if n is not None and n not in order:
                order.append(n)
        if s is not None and d is not None:
            edges.append((s, d))
    for n in skel_json.get("nodes", []):
        name = node_name(n.get("id"))
        if name is not None and name not in order:
            order.append(name)
    return order, edges


def _legacy_name_to_path(name: str) -> Optional[Tuple[str, ...]]:
    """Map a Keras layer name to our flax param path (under 'params')."""
    if "_middle_expand_conv" in name or "_middle_contract_conv" in name:
        stack = name.split("_")[0]  # stack0
        kind = "middle_expand" if "middle_expand" in name else "middle_contract"
        conv = name.rsplit("_", 1)[-1]  # conv0
        return ("backbone", f"{stack}_{kind}", conv)
    if "_enc" in name and "_conv" in name:
        stack, enc, conv = name.split("_")  # stack0, enc0, conv0
        return ("backbone", f"{stack}_enc", enc, conv)
    if "_dec" in name:
        # stack0_dec0_s8_to_s4_refine_conv0 / ..._trans_conv
        parts = name.split("_")
        stack = parts[0]
        block = "_".join(parts[1:5])  # dec0_s8_to_s4
        rest = "_".join(parts[5:])  # refine_conv0 | trans_conv
        return ("backbone", f"{stack}_dec", block, rest)
    if "stem" in name and "_conv" in name:
        stem, conv = name.split("_")
        return ("backbone", "stem", stem, conv)
    if name.startswith("pre_classification") and name.endswith("_fc"):
        # Keras class-vectors FC stack: pre_classificationN_fc -> fcN.
        idx = name[len("pre_classification"):-len("_fc")]
        return ("ClassVectorsHead", f"fc{idx}")
    if "ClassVectorsHead" in name:
        # The final Dense (units -> n_classes) is the logits layer.
        return ("ClassVectorsHead", "logits")
    if "Head" in name:
        head_name = name.rsplit("_", 1)[0]  # strip trailing _0
        return (head_name, "head_conv")
    return None


def map_legacy_to_flax_params(weights: Dict, params) -> Tuple[dict, list, list]:
    """Place Keras weights into a flax param tree by name (reference: :214).

    Returns (new_params, mapped_names, skipped_names).
    """
    import jax

    params = jax.tree_util.tree_map(np.asarray, params)
    root = params["params"] if "params" in params else params
    mapped, skipped = [], []
    for name, w in weights.items():
        path = _legacy_name_to_path(name)
        node = root
        ok = path is not None
        if ok:
            for key in path:
                if not isinstance(node, dict) or key not in node:
                    ok = False
                    break
                node = node[key]
        if not ok:
            skipped.append(name)
            continue
        for kind in ("kernel", "bias"):
            if kind in w and kind in node:
                value = w[kind]
                if kind == "kernel" and name.endswith("trans_conv"):
                    # Keras Conv2DTranspose kernels are (h, w, OUT, IN);
                    # flax ConvTranspose expects (h, w, IN, OUT).
                    value = np.swapaxes(value, -1, -2)
                if node[kind].shape != value.shape:
                    skipped.append(f"{name}/{kind} (shape {value.shape} vs {node[kind].shape})")
                    continue
                node[kind] = value.astype(node[kind].dtype)
                mapped.append(f"{name}/{kind}")
    return params, mapped, skipped


def load_legacy_model(model_dir):
    """Load a SLEAP v1 model dir into (Model, params, TrainingJobConfig).

    (reference: legacy_models.py:567.)
    """
    import jax
    import jax.numpy as jnp

    from sleap_nn_tpu.config.utils import (
        get_backbone_config,
        get_head_config,
        get_model_type_from_cfg,
    )

    model_dir = Path(model_dir)
    cfg_path = model_dir / "training_config.json"
    if not cfg_path.exists():
        raise FileNotFoundError(
            f"Not a SLEAP v1 model dir (no training_config.json): {model_dir}"
        )
    legacy = json.loads(cfg_path.read_text())
    cfg = legacy_config_mapper(legacy)
    weights = load_keras_weights(model_dir / "best_model.h5")
    # Infer input channels from the first conv's kernel (the json's
    # ensure_rgb/grayscale flags don't record the trained channel count).
    for first in ("stem0_conv0", "stack0_enc0_conv0"):
        if first in weights:
            cfg.model_config.backbone_config.unet.in_channels = int(
                weights[first]["kernel"].shape[2]
            )
            break
    model_type = get_model_type_from_cfg(cfg)
    model = Model.from_config(
        "unet", get_backbone_config(cfg), get_head_config(cfg), model_type
    )
    bc = get_backbone_config(cfg)
    size = bc.max_stride * 8
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, size, size, bc.in_channels))
    )
    params, mapped, skipped = map_legacy_to_flax_params(weights, params)
    return model, params, cfg, {"mapped": mapped, "skipped": skipped}
