"""Model-asset loading: checkpoint dir -> (model, params, configs).

Parity target: reference sleap_nn/inference/loaders.py:564-1254
(``load_model_assets``): resolve a model dir, read ``training_config.yaml``,
restore the best checkpoint, rebuild the flax model and the preprocessing
metadata inference layers need.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Any, Dict, Optional

from sleap_nn_tpu.config import (
    TrainingJobConfig,
    get_backbone_config,
    get_backbone_type_from_cfg,
    get_head_config,
    get_model_type_from_cfg,
    resolve_model_dir,
)
from sleap_nn_tpu.models import Model


@dataclasses.dataclass
class LoadedModel:
    """One trained model ready for inference."""

    model_dir: Path
    config: TrainingJobConfig
    model_type: str
    model: Model
    params: Any
    skeleton_nodes: list
    skeleton_edges: list

    @property
    def head_config(self):
        return get_head_config(self.config)

    @property
    def backbone_config(self):
        return get_backbone_config(self.config)


def load_model(path, params_override=None) -> LoadedModel:
    """Load one model dir (training_config.yaml + best.ckpt).

    A path pointing directly at a ``.ckpt`` loads THAT checkpoint (e.g. an
    ``epoch=...ckpt`` from save_top_k or ``last.ckpt``) with the dir's
    training config.
    """
    p = Path(path)
    # Orbax checkpoints are DIRECTORIES named *.ckpt; torch ones are files.
    explicit_ckpt = p if p.suffix.lower() == ".ckpt" and p.exists() else None
    model_dir = resolve_model_dir(path)
    if not (model_dir / "training_config.yaml").exists():
        # SLEAP-v1 legacy model dir (training_config.json + best_model.h5):
        # auto-convert the Keras weights into the flax model, same as the
        # reference's loader (reference inference/loaders.py:193-206) —
        # `predict -m <v1_model_dir>` is drop-in.
        return _load_legacy_dir(model_dir)
    config = TrainingJobConfig.load_yaml(model_dir / "training_config.yaml")
    model_type = get_model_type_from_cfg(config)
    backbone_type = get_backbone_type_from_cfg(config)
    model = Model.from_config(
        backbone_type, get_backbone_config(config), get_head_config(config), model_type
    )

    if params_override is not None:
        params = params_override
    else:
        ckpt = explicit_ckpt or model_dir / "best.ckpt"
        if not ckpt.exists():
            ckpt = model_dir / "last.ckpt"

        from sleap_nn_tpu.torch_models import is_torch_checkpoint

        if is_torch_checkpoint(ckpt):
            # Reference (torch Lightning) checkpoint: import weights directly
            # so `predict -m <reference_model_dir>` is drop-in compatible.
            from sleap_nn_tpu.torch_models import load_torch_checkpoint_params

            bb = get_backbone_config(config)
            in_channels = getattr(bb, "in_channels", 1) or 1
            params = load_torch_checkpoint_params(
                ckpt, model, (bb.max_stride, bb.max_stride, in_channels)
            )
        else:
            from sleap_nn_tpu.training.model_trainer import ModelTrainer

            state = ModelTrainer.load_checkpoint_params(ckpt)
            params = state["params"]

    nodes, edges = [], []
    skel_list = config.data_config.skeletons or []
    if skel_list:
        skel = skel_list[0]
        nodes = [n["name"] for n in skel.get("nodes", [])]
        edges = [
            (e["source"]["name"], e["destination"]["name"]) for e in skel.get("edges", [])
        ]
    return LoadedModel(
        model_dir=model_dir,
        config=config,
        model_type=model_type,
        model=model,
        params=params,
        skeleton_nodes=nodes,
        skeleton_edges=edges,
    )


def _load_legacy_dir(model_dir: Path) -> LoadedModel:
    """SLEAP-v1 model dir -> LoadedModel via the Keras weight importer."""
    from sleap_nn_tpu.legacy_models import load_legacy_model

    model, params, config, _stats = load_legacy_model(model_dir)
    nodes, edges = [], []
    skel_list = config.data_config.skeletons or []
    if skel_list:
        skel = skel_list[0]
        nodes = [n["name"] for n in skel.get("nodes", [])]
        edges = [
            (e["source"]["name"], e["destination"]["name"])
            for e in skel.get("edges", [])
        ]
    return LoadedModel(
        model_dir=Path(model_dir),
        config=config,
        model_type=get_model_type_from_cfg(config),
        model=model,
        params=params,
        skeleton_nodes=nodes,
        skeleton_edges=edges,
    )
