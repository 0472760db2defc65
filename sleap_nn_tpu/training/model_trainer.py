"""Training orchestration.

Parity target: reference sleap_nn/training/model_trainer.py:83-1940 (the
``ModelTrainer``) + the per-model-type LightningModules
(lightning_modules.py:89-3576), re-architected for JAX/TPU:

- the train step = (device preprocess + target render) + forward + loss +
  backward + optax update, all jitted as ONE XLA program with donated state;
- data parallelism = a 1-D ``data`` mesh with batch sharded on the leading
  axis and params replicated (XLA inserts the grad all-reduce) instead of
  DDP/NCCL;
- checkpointing via orbax with the reference's model-dir contract:
  ``initial_config.yaml``, ``training_config.yaml``, ``best.ckpt``,
  ``labels_train_gt_0.slp`` / ``labels_val_gt_0.slp``, ``training_log.csv``.
"""

from __future__ import annotations

import dataclasses
import math
import time
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from sleap_nn_tpu.config import (
    TrainingJobConfig,
    get_backbone_config,
    get_backbone_type_from_cfg,
    get_head_config,
    get_model_type_from_cfg,
    verify_training_cfg,
)
from sleap_nn_tpu.data.pipeline import (
    Loader,
    build_pipeline_context,
    make_dataset,
    make_render_fn,
)
from sleap_nn_tpu.data.providers import get_max_height_width, get_max_instances
from sleap_nn_tpu.io import Labels, load_slp
from sleap_nn_tpu.models import Model
from sleap_nn_tpu.parallel import get_mesh, replicate, shard_batch
from sleap_nn_tpu.training.callbacks import (
    Callback,
    CSVLoggerCallback,
    EarlyStopping,
    ProgressCallback,
    ProgressReporterZMQ,
    TrainingControllerZMQ,
)
from sleap_nn_tpu.training.losses import compute_loss
from sleap_nn_tpu.training.schedulers import make_scheduler


def _remap_video_paths(labels: Labels, data_config):
    """Apply --video-paths / --video-path-map / --prefix-map remapping.

    Reference cli.py:341-370: replace the labels file's video paths in
    order (video_paths), by exact match (video_path_map), or by shared
    prefix (video_prefix_map), for labels moved between machines.
    """
    vp = getattr(data_config, "video_paths", None)
    if vp:
        for vid, new in zip(labels.videos, vp):
            vid.filename = new
            vid.backend = None
    vmap = getattr(data_config, "video_path_map", None) or {}
    pmap = getattr(data_config, "video_prefix_map", None) or {}
    for vid in labels.videos:
        fn = str(vid.filename)
        if fn in vmap:
            vid.filename = vmap[fn]
            vid.backend = None
            continue
        for old, new in pmap.items():
            if fn.startswith(old):
                vid.filename = new + fn[len(old):]
                vid.backend = None
                break


def _init_subtrees_from_ckpts(params, backbone_ckpt, head_ckpt):
    """Replace backbone / non-backbone param subtrees from other checkpoints.

    ``model_config.pretrained_backbone_weights`` / ``pretrained_head_weights``
    transfer-learning init (reference model_config.py:133-140). Accepts a
    trained model dir or a ``best.ckpt`` path (orbax).
    """
    from sleap_nn_tpu.config.utils import resolve_model_dir

    def load_tree(path):
        from pathlib import Path as _P

        p = _P(path)
        if p.is_dir():
            p = resolve_model_dir(p) / "best.ckpt"
        state = ModelTrainer.load_checkpoint_params(p)
        return state["params"] if "params" in state else state

    def shapes(t):
        return jax.tree_util.tree_map(lambda a: tuple(a.shape), t)

    out = dict(params["params"])
    for src_path, which in ((backbone_ckpt, "backbone"), (head_ckpt, "head")):
        if not src_path:
            continue
        src = load_tree(src_path)
        src_p = src["params"] if "params" in src else src
        keys = (["backbone"] if which == "backbone"
                else [k for k in out if k != "backbone"])
        for k in keys:
            if k not in src_p:
                raise ValueError(
                    f"pretrained_{which}_weights: checkpoint has no '{k}' "
                    f"subtree (has {sorted(src_p)})."
                )
            if shapes(out[k]) != shapes(src_p[k]):
                raise ValueError(
                    f"pretrained_{which}_weights: '{k}' parameter shapes do "
                    "not match the configured architecture."
                )
            out[k] = jax.tree_util.tree_map(jnp.asarray, src_p[k])
    return {**params, "params": out}


def xavier_init_params(params, key):
    """Re-init conv/dense kernels with Xavier-uniform (reference default,
    training/utils.py:72); biases stay zero."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    leaves = []
    keys = jax.random.split(key, len(flat))
    for (path, leaf), k in zip(flat, keys):
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        if names and names[-1] == "kernel" and leaf.ndim >= 2:
            fan_in = np.prod(leaf.shape[:-1])
            fan_out = leaf.shape[-1]
            limit = math.sqrt(6.0 / (fan_in + fan_out))
            leaves.append(jax.random.uniform(k, leaf.shape, leaf.dtype, -limit, limit))
        else:
            leaves.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, leaves)


class ModelTrainer:
    """Config-driven training orchestrator."""

    def __init__(
        self,
        config: TrainingJobConfig,
        train_labels: Optional[List[Labels]] = None,
        val_labels: Optional[List[Labels]] = None,
    ):
        self.config = config
        self.initial_config = None  # set by from_config before inference fills
        self.train_labels = train_labels or []
        self.val_labels = val_labels or []
        self.model_type = get_model_type_from_cfg(config)
        self.backbone_type = get_backbone_type_from_cfg(config)
        self.should_stop = False
        self.lr_override: Optional[float] = None
        self.current_epoch = 0
        self.ckpt_dir: Optional[Path] = None
        self.callbacks: List[Callback] = []
        self.history: List[Dict] = []
        self.best_val_loss = math.inf
        self.mesh = None
        self._setup_done = False

    # -- construction -------------------------------------------------------
    @classmethod
    def get_model_trainer_from_config(
        cls,
        config: TrainingJobConfig,
        train_labels: Optional[List[Labels]] = None,
        val_labels: Optional[List[Labels]] = None,
    ) -> "ModelTrainer":
        """Load labels, make splits, infer derived config (reference: :122)."""
        import copy

        verify_training_cfg(config)
        initial = copy.deepcopy(config)

        if train_labels is None:
            paths = config.data_config.train_labels_path or []
            if not paths:
                raise ValueError("data_config.train_labels_path must be set.")
            train_labels = [load_slp(p) for p in paths]
            for p, labels in zip(paths, train_labels):
                if not labels.labeled_frames:
                    # Fail with the actual problem, not a downstream
                    # IndexError from max-size inference (reference
                    # custom_datasets.py:528 empty-dataset error).
                    raise ValueError(
                        f"Training labels file is empty (no labeled "
                        f"frames): {p}"
                    )
                _remap_video_paths(labels, config.data_config)
        if val_labels is None:
            if config.data_config.use_same_data_for_val:
                val_labels = list(train_labels)
            elif config.data_config.val_labels_path:
                val_labels = [load_slp(p) for p in config.data_config.val_labels_path]
                for labels in val_labels:
                    _remap_video_paths(labels, config.data_config)
            else:
                frac = config.data_config.validation_fraction
                seed = config.trainer_config.seed
                keep_cent = get_model_type_from_cfg(config) == "centroid"
                split = [
                    labels.make_training_splits(
                        1.0 - frac, frac, seed=seed,
                        include_centroid_only_frames=keep_cent,
                    )
                    for labels in train_labels
                ]
                train_labels = [s[0] for s in split]
                val_labels = [s[1] for s in split]

        if get_model_type_from_cfg(config) == "single_instance":
            # Single-instance training is undefined on multi-animal frames:
            # the rendered confmap target would blend instances and the model
            # silently learns garbage. Hard error, matching the reference's
            # label validation (reference model_trainer.py single-instance
            # check; tests/training/test_model_trainer.py:561).
            for split_name, split in (("train", train_labels), ("val", val_labels)):
                for labels in split:
                    for lf in labels.labeled_frames:
                        if len(lf.user_instances) > 1:
                            raise ValueError(
                                "single_instance training requires at most "
                                "one instance per frame; found "
                                f"{len(lf.user_instances)} user instances on "
                                f"{split_name} frame {lf.frame_idx}. Use a "
                                "topdown or bottomup pipeline for "
                                "multi-animal data."
                            )

        trainer = cls(config, train_labels, val_labels)
        trainer.initial_config = initial
        trainer._infer_config()
        return trainer

    def _infer_config(self):
        """Fill derived config: head part names/edges/classes, preprocessing
        max dims, crop size (reference: setup_config, model_trainer.py:996)."""
        labels = self.train_labels[0]
        skel = labels.skeleton
        head = get_head_config(self.config)
        pre = self.config.data_config.preprocessing

        if pre.max_height is None or pre.max_width is None:
            h, w = get_max_height_width(labels)
            # pad to backbone stride so sizematch output is conv-friendly
            pre.max_height = pre.max_height or h
            pre.max_width = pre.max_width or w

        # Backbone output stride must cover the finest head stride
        # (reference: config/utils.py:106 check_output_strides).
        from sleap_nn_tpu.config.utils import check_output_strides

        check_output_strides(self.config)

        cm = getattr(head, "confmaps", None)
        if cm is not None and hasattr(cm, "part_names") and cm.part_names is None:
            cm.part_names = list(skel.node_names)
        src = getattr(cm, "centroid_source", None) if cm is not None else None
        if src == "user":
            # Reference model_config.py:697: 'user' trains on first-class
            # UserCentroid annotations (pure-centroid seeding). Only the
            # centroid family consumes them; other families need poses.
            if self.model_type != "centroid":
                raise ValueError(
                    "centroid_source='user' only applies to centroid "
                    f"models, not {self.model_type!r}."
                )
            if not any(
                lf.user_centroids
                for labels in self.train_labels
                for lf in labels.labeled_frames
            ):
                raise ValueError(
                    "centroid_source='user' but the training labels carry "
                    "no user-annotated centroid records; annotate centroids "
                    "or use centroid_source='computed'."
                )
        pafs = getattr(head, "pafs", None)
        if pafs is not None and pafs.edges is None:
            pafs.edges = [list(e) for e in skel.edge_names]
        for leaf_name in ("class_maps", "class_vectors"):
            leaf = getattr(head, leaf_name, None)
            if leaf is not None and leaf.classes is None:
                leaf.classes = [t.name for t in labels.tracks]

        merged = Labels(
            labeled_frames=[lf for L in self.train_labels for lf in L.labeled_frames],
            # Carry skeletons/videos explicitly: pure-centroid seeding frames
            # have no pose instances for Labels to infer the skeleton from.
            videos=[v for L in self.train_labels for v in L.videos],
            skeletons=[s for L in self.train_labels for s in L.skeletons],
        )
        self.ctx = build_pipeline_context(self.config, merged, self.model_type)
        if self.ctx.crop_size is not None:
            pre.crop_size = self.ctx.crop_size
        # persist skeleton into the config (reference stores skeletons list)
        self.config.data_config.skeletons = [
            {
                "nodes": [{"name": n} for n in skel.node_names],
                "edges": [
                    {"source": {"name": s}, "destination": {"name": d}}
                    for s, d in skel.edge_names
                ],
                "symmetries": [list(pair) for pair in skel.symmetry_inds],
                "name": skel.name,
            }
        ]

    # -- setup ---------------------------------------------------------------
    def setup(self):
        if self._setup_done:
            return
        cfg = self.config

        # Backend selection MUST precede every JAX computation in setup
        # (the probe render / model.init below initialize the backend, after
        # which neither jax.distributed.initialize nor a platform switch
        # can take effect).
        # trainer_accelerator (reference Lightning accelerator knob):
        # "cpu" forces the CPU backend; "auto"/"tpu"/"gpu" keep the default.
        # Unrecognized values warn and fall back to auto rather than
        # crashing mid-setup (reference verify_accelerator_config,
        # tests/training/test_model_trainer.py:1350).
        accel = (cfg.trainer_config.trainer_accelerator or "auto").lower()
        if accel == "cpu":
            jax.config.update("jax_platforms", "cpu")
        elif accel not in ("auto", "tpu", "gpu"):
            print(
                f"WARNING: unrecognized trainer_accelerator "
                f"{cfg.trainer_config.trainer_accelerator!r}; falling back "
                "to 'auto'."
            )
            cfg.trainer_config.trainer_accelerator = "auto"
        # Multi-host: join the cluster (no-op single-process; env
        # SLEAP_NN_TPU_COORDINATOR/_NUM_PROCESSES/_PROCESS_ID mirror
        # torchrun's launch contract). jax.devices() later then spans every
        # process and the mesh is global.
        from sleap_nn_tpu.parallel import initialize_distributed

        initialize_distributed()

        seed = cfg.trainer_config.seed if cfg.trainer_config.seed is not None else 0
        self.key = jax.random.PRNGKey(seed)

        # datasets + loaders
        use_negatives = cfg.data_config.use_negative_frames
        if use_negatives and self.model_type in (
            "centered_instance",
            "multi_class_topdown",
            "centered_instance_segmentation",
        ):
            # Crop-level models have no frame-level sample to attach a
            # negative to (reference custom_datasets.py:4862-4872 disables
            # with the same warning).
            import warnings

            warnings.warn(
                f"use_negative_frames is enabled but model_type="
                f"'{self.model_type}' operates at instance-crop level and "
                f"does not support frame-level negatives. Negative frames "
                f"will be disabled.",
                stacklevel=2,
            )
            use_negatives = False
        ds_kwargs = dict(
            user_instances_only=cfg.data_config.user_instances_only,
            use_negative_frames=use_negatives,
            negative_loss_weight=cfg.data_config.negative_loss_weight,
            # Suffix match so the reference's torch_dataset_cache_img_disk
            # spelling engages the disk cache too (drop-in YAML compat).
            cache_mode="disk" if str(cfg.data_config.data_pipeline_fw).endswith("cache_img_disk") else "memory",
            cache_dir=cfg.data_config.cache_img_path,
            use_existing_imgs=cfg.data_config.use_existing_imgs,
            cache_workers=(
                cfg.data_config.cache_workers
                if cfg.data_config.cache_workers
                else (4 if cfg.data_config.parallel_caching else 0)
            ),
            centroid_from_user=(
                self.model_type == "centroid"
                and getattr(
                    getattr(get_head_config(cfg), "confmaps", None),
                    "centroid_source", None,
                ) == "user"
            ),
        )
        # Cache fill must succeed on EVERY process before anyone enters the
        # training loop: a rank whose disk cache failed would otherwise
        # deadlock the healthy ranks at the first collective (reference
        # parallel-caching dist-sync semantics).
        from sleap_nn_tpu.parallel.distributed import sync_cache_fill_status

        cache_error: Optional[Exception] = None
        try:
            self.train_ds = make_dataset(
                self.model_type, self.train_labels, self.ctx, **ds_kwargs
            )
            val_ctx = dataclasses.replace(self.ctx, use_augmentations=False)
            self.val_ds = make_dataset(
                self.model_type, self.val_labels, val_ctx,
                **{**ds_kwargs, "use_negative_frames": False},
            )
        except Exception as e:  # noqa: BLE001 — re-raised by the sync below
            cache_error = e
        sync_cache_fill_status(cache_error)
        tiling = cfg.data_config.preprocessing.tiling
        if tiling is not None and tiling.enabled:
            if self.model_type in ("centered_instance", "centered_instance_segmentation",
                                   "multi_class_topdown"):
                raise ValueError(
                    f"Tiled training is not supported for crop-based model type "
                    f"{self.model_type!r}."
                )
            # Geometry normalization (reference check_tiling): tile_size
            # rounds UP to the backbone stride (warn), overlap rounds UP to
            # the output stride and is floored at min_overlap_fraction of
            # the tile; an overlap >= tile_size cannot advance the grid.
            import math as _math

            if not tiling.tile_size:
                raise ValueError("tiling.enabled requires tiling.tile_size.")
            unit = int(get_backbone_config(cfg).max_stride)
            rounded = int(_math.ceil(tiling.tile_size / unit) * unit)
            if rounded != tiling.tile_size:
                print(
                    f"WARNING: tiling.tile_size {tiling.tile_size} is not a "
                    f"multiple of max_stride {unit}; rounded up to {rounded}."
                )
                tiling.tile_size = rounded
            out_stride = int(getattr(self.ctx, "output_stride", 1) or 1)
            ov = int(tiling.overlap or 0)
            if ov % out_stride:
                ov2 = int(_math.ceil(ov / out_stride) * out_stride)
                print(
                    f"WARNING: tiling.overlap {ov} is not a multiple of the "
                    f"output stride {out_stride}; rounded up to {ov2}."
                )
                ov = ov2
            floor = int(_math.ceil(
                (tiling.min_overlap_fraction or 0) * tiling.tile_size
            ))
            if ov < floor:
                # Keep the floored value output-stride-aligned too.
                floor = int(_math.ceil(floor / out_stride) * out_stride)
                print(
                    f"WARNING: tiling.overlap {ov} is below the "
                    f"min_overlap_fraction floor ({floor}); raised."
                )
                ov = floor
            if ov >= tiling.tile_size:
                raise ValueError(
                    f"tiling.overlap ({ov}) must be smaller than "
                    f"tiling.tile_size ({tiling.tile_size})."
                )
            tiling.overlap = ov

            from sleap_nn_tpu.data.pipeline import TiledDataset

            use_halo = bool(
                cfg.data_config.use_augmentations_train
                and cfg.data_config.augmentation_config is not None
                and cfg.data_config.augmentation_config.geometric is not None
            )
            self.train_ds = TiledDataset(
                self.train_ds, tiling, base_seed=seed, use_halo=use_halo
            )
            # Val tiles stay fixed (epoch 0) so val/loss is comparable.
            self.val_ds = TiledDataset(self.val_ds, tiling, base_seed=seed + 1)
            # Tiles are already fixed-size: the labels-derived sizematcher dims
            # would rescale every tile back up to the full-frame size.
            self.ctx = dataclasses.replace(
                self.ctx,
                max_height=None,
                max_width=None,
                halo_crop_to=tiling.tile_size if use_halo else None,
            )
        if len(self.train_ds) == 0:
            raise ValueError("Train dataset is empty (no usable labeled frames).")
        if len(self.val_ds) == 0:
            raise ValueError("Val dataset is empty (no usable labeled frames).")
        bs = cfg.trainer_config.train_data_loader.batch_size
        # num_workers maps to the background-prefetch depth (this loader
        # overlaps host decode/collate with the device step via a thread,
        # not worker processes — the reference's DataLoader worker count
        # becomes the producer-queue depth here).
        n_workers = int(getattr(cfg.trainer_config.train_data_loader,
                                "num_workers", 0) or 0)
        prefetch = max(2, n_workers)
        self.train_loader = Loader(
            self.train_ds, bs, shuffle=cfg.trainer_config.train_data_loader.shuffle,
            seed=seed, prefetch=prefetch,
        )
        self.val_loader = Loader(
            self.val_ds, cfg.trainer_config.val_data_loader.batch_size,
            prefetch=max(2, int(getattr(cfg.trainer_config.val_data_loader,
                                        "num_workers", 0) or 0)),
        )

        # model
        backbone_cfg = get_backbone_config(cfg)
        head_cfg = get_head_config(cfg)
        self.model = Model.from_config(
            self.backbone_type, backbone_cfg, head_cfg, self.model_type
        )
        # Packed level-0 execution (exact, same param tree) for narrow
        # UNets on TPU — trainer_config.packed_level0: None=auto/on/off.
        from sleap_nn_tpu.inference.backends import maybe_pack_level0

        self.model = maybe_pack_level0(
            self.model, getattr(cfg.trainer_config, "packed_level0", None)
        )
        # Probe with a VAL sample: train tiles may carry a halo that the
        # train render crops away, so val shapes are the network's true
        # input shapes.
        sample = self.val_ds.make_batch([0])
        render = make_render_fn(self.ctx, train=False)
        probe = render({k: jnp.asarray(v) for k, v in sample.items()})
        self._input_shape = probe["image"].shape
        init_key, xavier_key, self.key = jax.random.split(self.key, 3)
        params = self.model.init(init_key, jnp.zeros_like(probe["image"]))
        if cfg.model_config.init_weights in ("default", "xavier"):
            params = xavier_init_params(params, xavier_key)
        self._frozen_mask = None
        if self.backbone_type == "pretrained":
            bb = get_backbone_config(cfg)
            if getattr(bb, "weights", True):
                from sleap_nn_tpu.models.pretrained import load_hf_encoder_params

                params, _ = load_hf_encoder_params(
                    bb.model_name, params,
                    revision=getattr(bb, "revision", None),
                )
            freeze = bool(getattr(bb, "freeze", False))

            # BatchNorm running stats are inference-mode constants
            # (frozen-BN fine-tuning); they must never receive optimizer
            # updates. With freeze=True the whole encoder is masked too
            # (reference freezes via requires_grad, pretrained.py:428).
            def mark(path, _):
                names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
                if "batch_stats" in names:
                    return False
                return not (freeze and any(n in ("enc", "encoder") for n in names))

            self._frozen_mask = jax.tree_util.tree_map_with_path(mark, params)
        if (cfg.model_config.pretrained_backbone_weights
                or cfg.model_config.pretrained_head_weights):
            # Transfer learning (reference model_config.py:133-140 +
            # model_trainer ckpt surgery): initialize the backbone and/or
            # head subtrees from another trained checkpoint. Shapes must
            # match; mismatches raise instead of silently mixing weights.
            params = _init_subtrees_from_ckpts(
                params,
                cfg.model_config.pretrained_backbone_weights,
                cfg.model_config.pretrained_head_weights,
            )
        if cfg.trainer_config.resume_ckpt_path:
            # Resume: restore params + epoch + best-val from a saved ckpt
            # (reference trainer_config.py:349 resume_ckpt_path). The
            # optimizer state restarts fresh (warm restart); the deterministic
            # seeded splits keep train/val membership identical across runs.
            self._warn_on_resume_seed_mismatch(cfg)
            state = self.load_checkpoint_params(cfg.trainer_config.resume_ckpt_path)
            restored = state["params"]
            # Compare structure AND leaf shapes: a same-shaped tree with
            # different layer widths (e.g. filters 8 vs 16) has an identical
            # tree structure but incompatible parameters.
            want = jax.tree_util.tree_map(lambda a: tuple(a.shape), params)
            got = jax.tree_util.tree_map(
                lambda a: tuple(np.asarray(a).shape), restored
            )
            if want != got:
                raise ValueError(
                    f"resume_ckpt_path params do not match the configured "
                    f"model architecture ({cfg.trainer_config.resume_ckpt_path})."
                )
            params = jax.tree_util.tree_map(jnp.asarray, restored)
            self.current_epoch = int(state.get("epoch", -1)) + 1
            self.best_val_loss = float(state.get("best_val_loss", math.inf))
        self.params = params
        cfg.model_config.total_params = int(
            sum(p.size for p in jax.tree_util.tree_leaves(params))
        )

        # optimizer (+ injected LR for host-side schedulers)
        opt_name = cfg.trainer_config.optimizer_name.lower()
        base_lr = cfg.trainer_config.optimizer.lr
        # amsgrad (OptimizerConfig knob): optax ships it as its own
        # transform; adamw has no amsgrad variant in optax, so reject the
        # combination loudly rather than silently dropping the flag.
        amsgrad = bool(getattr(cfg.trainer_config.optimizer, "amsgrad", False))
        if amsgrad and opt_name == "adam":
            opt_fn = optax.amsgrad
        elif amsgrad:
            raise ValueError(
                "optimizer.amsgrad is only supported with optimizer_name "
                f"'adam' (got {cfg.trainer_config.optimizer_name!r})."
            )
        else:
            opt_fn = {"adam": optax.adam, "adamw": optax.adamw}.get(opt_name)
        if opt_fn is None:
            raise ValueError(f"Unsupported optimizer: {cfg.trainer_config.optimizer_name}")
        self.tx = optax.inject_hyperparams(opt_fn)(learning_rate=base_lr)
        self.opt_state = self.tx.init(self.params)
        self.scheduler = make_scheduler(
            cfg.trainer_config.lr_scheduler, base_lr, cfg.trainer_config.max_epochs
        )

        # mesh + sharding — use the largest device count that divides BOTH
        # batch sizes (replaces the reference's DDP device selection,
        # model_trainer.py:1698-1716)
        n_avail = len(jax.devices())
        want = cfg.trainer_config.trainer_devices
        n_dev = int(want) if isinstance(want, int) and want > 0 else n_avail
        n_dev = min(n_dev, n_avail)
        vbs = cfg.trainer_config.val_data_loader.batch_size
        n_dev = math.gcd(math.gcd(bs, vbs), n_dev)
        self.mesh = get_mesh(num_devices=n_dev)
        rep = replicate(self.mesh)
        self.params = jax.device_put(self.params, rep)
        self.opt_state = jax.device_put(self.opt_state, rep)

        ohkm_cfg = cfg.trainer_config.online_hard_keypoint_mining
        ohkm = dataclasses.asdict(ohkm_cfg) if ohkm_cfg else None
        heads = self.model.heads
        train_render = make_render_fn(self.ctx, train=True)
        val_render = make_render_fn(self.ctx, train=False)
        model = self.model

        def _sample_weights(batch, train=True):
            w = batch.get("batch_mask")
            w = None if w is None else w.astype(jnp.float32)
            sw = batch.get("sample_weight")
            # negative_loss_weight down-weights negatives in the TRAIN loss
            # only; validation loss stays unweighted so val/loss (ckpt
            # selection, early stopping) is comparable across weight settings
            # (reference negative-frames loss weighting: val stage never
            # weighted). Padding masks apply in both stages.
            if train and sw is not None:
                w = sw if w is None else w * sw
            return w

        def train_step(params, opt_state, batch, key):
            processed = train_render(batch, key)

            def loss_fn(p):
                preds = model.apply(p, processed["image"])
                loss, parts = compute_loss(
                    preds, processed, heads, _sample_weights(batch), ohkm
                )
                return loss, parts

            (loss, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            if self._frozen_mask is not None:
                # Frozen pretrained encoder: zero its updates (optimizer
                # moments still step; the params never move).
                updates = jax.tree_util.tree_map(
                    lambda u, keep: u * keep, updates, self._frozen_mask
                )
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss, parts

        def val_step(params, batch):
            processed = val_render(batch, None)
            preds = model.apply(params, processed["image"])
            loss, parts = compute_loss(
                preds, processed, heads, _sample_weights(batch, train=False), None
            )
            return loss, parts

        self._train_step = jax.jit(train_step, donate_argnums=(0, 1))
        self._val_step = jax.jit(val_step)

        # checkpoint dir + contract files
        if cfg.trainer_config.save_ckpt:
            self._setup_ckpt_dir()

        # callbacks
        self.callbacks = [ProgressCallback(cfg.trainer_config.enable_progress_bar)]
        if self.ckpt_dir is not None:
            self.callbacks.append(CSVLoggerCallback(self.ckpt_dir / "training_log.csv"))
        es = cfg.trainer_config.early_stopping
        if es is not None and es.stop_training_on_plateau:
            self.callbacks.append(
                EarlyStopping(min_delta=es.min_delta, patience=es.patience)
            )
        if cfg.trainer_config.eval is not None and cfg.trainer_config.eval.enabled:
            from sleap_nn_tpu.training.callbacks import EpochEndEvaluationCallback

            # Insert ahead of the CSV logger so eval keys land in the row.
            self.callbacks.insert(
                0,
                EpochEndEvaluationCallback(
                    self,
                    frequency=cfg.trainer_config.eval.frequency,
                    oks_stddev=cfg.trainer_config.eval.oks_stddev,
                    match_threshold=cfg.trainer_config.eval.match_threshold,
                ),
            )
        if cfg.trainer_config.visualize_preds_during_training and self.ckpt_dir is not None:
            from sleap_nn_tpu.training.viz import VizCallback

            self.callbacks.append(VizCallback(self, self.ckpt_dir / "viz"))
        if cfg.trainer_config.use_wandb:
            from sleap_nn_tpu.training.wandb_logging import WandbLoggerCallback

            self.callbacks.append(WandbLoggerCallback(self))
        zmq_cfg = cfg.trainer_config.zmq
        if zmq_cfg is not None and zmq_cfg.controller_port:
            self.callbacks.append(
                TrainingControllerZMQ(
                    address=f"tcp://127.0.0.1:{zmq_cfg.controller_port}",
                    poll_timeout=zmq_cfg.controller_polling_timeout,
                )
            )
        if zmq_cfg is not None and zmq_cfg.publish_port:
            self.callbacks.append(
                ProgressReporterZMQ(address=f"tcp://127.0.0.1:{zmq_cfg.publish_port}")
            )
        self._setup_done = True

    @staticmethod
    def _warn_on_resume_seed_mismatch(cfg):
        """Warn when resuming with a different train/val-split seed.

        A different ``trainer_config.seed`` re-splits train/val, so frames
        the original run validated on may leak into training (reference:
        training/model_trainer.py:379-408).
        """
        import warnings

        orig_path = Path(cfg.trainer_config.resume_ckpt_path).parent / (
            "training_config.yaml"
        )
        if not orig_path.exists():
            warnings.warn(
                f"Resuming from checkpoint but {orig_path} was not found to "
                f"verify the train/val split seed. Ensure trainer_config.seed "
                f"matches the original run to avoid train/val leakage.",
                stacklevel=3,
            )
            return
        try:
            import yaml

            with open(orig_path) as fp:
                orig = yaml.safe_load(fp) or {}
            orig_seed = (orig.get("trainer_config") or {}).get("seed")
        except Exception:
            return
        seed = cfg.trainer_config.seed
        if orig_seed != seed:
            warnings.warn(
                f"Current seed ({seed}) differs from the original training "
                f"seed ({orig_seed}) in {orig_path}. This produces a "
                f"different train/val split and can leak former validation "
                f"frames into training. Set trainer_config.seed: {orig_seed} "
                f"to preserve the original split.",
                stacklevel=3,
            )

    def _setup_ckpt_dir(self):
        cfg = self.config
        run_name = cfg.trainer_config.run_name
        if not run_name:
            run_name = time.strftime(f"%y%m%d_%H%M%S.{self.model_type}")
            cfg.trainer_config.run_name = run_name
        base = Path(cfg.trainer_config.ckpt_dir or ".") / run_name
        # Existing non-empty run dir -> auto-suffix -1, -2, ... instead of
        # silently overwriting a previous run's artifacts (reference
        # model-ckpt-path duplication behavior,
        # tests/training/test_model_trainer.py:1459).
        # Multi-host: process 0 alone probes the filesystem and the chosen
        # suffix is broadcast, so every rank agrees on one dir — an
        # unsynchronized probe would race (rank 0 creates <base>, rank 1
        # then sees it non-empty and picks <base>-1).
        n = 0
        if jax.process_index() == 0:
            probe = base
            while probe.exists() and any(probe.iterdir()):
                n += 1
                probe = base.with_name(f"{base.name}-{n}")
        if jax.process_count() > 1:
            import numpy as _np
            from jax.experimental import multihost_utils

            n = int(multihost_utils.broadcast_one_to_all(_np.int32(n)))
        ckpt_dir = base if n == 0 else base.with_name(f"{base.name}-{n}")
        if n:
            cfg.trainer_config.run_name = ckpt_dir.name
        self.ckpt_dir = ckpt_dir
        if jax.process_index() == 0:
            # Artifact writes are rank-0-only (shared-filesystem safety);
            # every rank still records the agreed ckpt_dir.
            self.ckpt_dir.mkdir(parents=True, exist_ok=True)
            if self.initial_config is not None:
                self.initial_config.save_yaml(self.ckpt_dir / "initial_config.yaml")
            self.config.save_yaml(self.ckpt_dir / "training_config.yaml")
            for i, labels in enumerate(self.train_labels):
                labels.save(self.ckpt_dir / f"labels_train_gt_{i}.slp", embed=True)
            for i, labels in enumerate(self.val_labels):
                labels.save(self.ckpt_dir / f"labels_val_gt_{i}.slp", embed=True)

    # -- checkpointing -------------------------------------------------------
    def save_checkpoint(self, name: str = "best.ckpt"):
        if self.ckpt_dir is None:
            return
        import orbax.checkpoint as ocp

        from sleap_nn_tpu.parallel import barrier, process_index

        if process_index() == 0:
            path = (self.ckpt_dir / name).absolute()
            ckptr = ocp.PyTreeCheckpointer()
            state = {
                "params": jax.device_get(self.params),
                "epoch": self.current_epoch,
                "best_val_loss": float(self.best_val_loss),
            }
            ckptr.save(path, state, force=True)
        # Multi-host: everyone waits for process 0's write to land before
        # racing ahead (resume / post-train eval read this file).
        barrier(f"ckpt:{name}")

    def _update_top_k(self, epoch: int, val_loss: float, top_k: int):
        """Keep the ``top_k`` best epoch-stamped checkpoints on disk.

        ``save_top_k`` (reference ModelCheckpoint): each qualifying epoch
        writes ``epoch=NNN-val_loss=X.ckpt``; when more than ``top_k``
        exist, the worst is deleted.
        """
        if not hasattr(self, "_top_k_ckpts"):
            self._top_k_ckpts = []  # [(val_loss, path)]
        if len(self._top_k_ckpts) >= top_k and val_loss >= max(
            v for v, _ in self._top_k_ckpts
        ):
            return
        name = f"epoch={epoch:03d}-val_loss={val_loss:.5f}.ckpt"
        self.save_checkpoint(name)
        self._top_k_ckpts.append((val_loss, self.ckpt_dir / name))
        self._top_k_ckpts.sort(key=lambda t: t[0])
        from sleap_nn_tpu.parallel import process_index

        while len(self._top_k_ckpts) > top_k:
            _, worst = self._top_k_ckpts.pop()
            if process_index() == 0 and worst.exists():
                import shutil

                shutil.rmtree(worst, ignore_errors=True)

    @staticmethod
    def load_checkpoint_params(path):
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        state = ckptr.restore(str(Path(path).absolute()))
        return state

    # -- loops ----------------------------------------------------------------
    def _log_all(self, hook: str, *args):
        for cb in self.callbacks:
            getattr(cb, hook)(self, *args)

    def train(self):
        """Run the full training loop (reference: ModelTrainer.train :1645)."""
        self.setup()
        cfg = self.config
        self._log_all("on_train_start")
        # trainer_config.profiler (reference Lightning profiler knob):
        # 'simple'/'advanced' print a per-epoch timing summary at train end;
        # any other value ('jax', 'xla', 'pytorch') captures a jax.profiler
        # trace into <run_dir>/profile (open with TensorBoard/Perfetto).
        profiler = cfg.trainer_config.profiler
        trace_cm = None
        if profiler and profiler not in ("simple", "advanced", "passthrough"):
            import jax as _jax

            trace_dir = (self.ckpt_dir or Path(".")) / "profile"
            trace_cm = _jax.profiler.trace(str(trace_dir))
            trace_cm.__enter__()
        # Effective steps per epoch (reference trainer_config.py:338-371 /
        # Lightning limit_train_batches): an explicit train_steps_per_epoch
        # wins; otherwise max(n_batches, min_train_steps_per_epoch) so tiny
        # datasets still take a full optimization epoch by re-drawing data.
        steps_cap = cfg.trainer_config.train_steps_per_epoch
        tiling = getattr(cfg.data_config.preprocessing, "tiling", None)
        if steps_cap is None and tiling is not None and tiling.enabled \
                and tiling.steps_per_epoch:
            # Tiled training: tiling.steps_per_epoch caps the per-epoch tile
            # step count (reference data_config.py:30).
            steps_cap = int(tiling.steps_per_epoch)
        if steps_cap is None:
            steps_cap = max(
                len(self.train_loader), cfg.trainer_config.min_train_steps_per_epoch
            )

        try:
            for epoch in range(self.current_epoch, cfg.trainer_config.max_epochs):
                self.current_epoch = epoch
                self._log_all("on_epoch_start", epoch)
                self.train_loader.set_epoch(epoch)

                # -- train epoch
                t0 = time.perf_counter()
                train_losses, part_sums, n_steps, n_samples = [], {}, 0, 0
                data_iter = iter(self.train_loader)
                while True:
                    try:
                        batch = next(data_iter)
                    except StopIteration:
                        if steps_cap and n_steps < steps_cap:
                            self.train_loader.set_epoch(epoch * 1000 + n_steps)
                            data_iter = iter(self.train_loader)
                            continue
                        break
                    self._log_all("on_batch_start", n_steps)
                    step_key, self.key = jax.random.split(self.key)
                    dbatch = shard_batch(batch, self.mesh)
                    self.params, self.opt_state, loss, parts = self._train_step(
                        self.params, self.opt_state, dbatch, step_key
                    )
                    train_losses.append(loss)
                    for k, v in parts.items():
                        part_sums.setdefault(k, []).append(v)
                    n_steps += 1
                    n_samples += int(np.sum(batch["batch_mask"]))
                    self._log_all("on_batch_end", n_steps - 1, {})
                    if self.should_stop or (steps_cap and n_steps >= steps_cap):
                        break
                # Release the prefetch worker when iteration stopped early
                # (steps cap / stop command) — otherwise it leaks per epoch.
                if hasattr(data_iter, "close"):
                    data_iter.close()
                # Block on the final step's loss BEFORE stopping the epoch
                # timer: jax dispatch is async (and over the axon tunnel even
                # block_until_ready returns early), so without a real fetch
                # the timer measures dispatch rate, not training rate.
                if train_losses:
                    float(jax.device_get(train_losses[-1]))
                train_time = time.perf_counter() - t0
                train_loss = float(np.mean([jax.device_get(l) for l in train_losses]))

                # -- val epoch
                val_losses = []
                val_part_sums: Dict[str, list] = {}
                for batch in self.val_loader:
                    dbatch = shard_batch(batch, self.mesh)
                    loss, vparts = self._val_step(self.params, dbatch)
                    val_losses.append(loss)
                    for k, v in vparts.items():
                        if k.startswith("confmap_") or k == "class_accuracy":
                            val_part_sums.setdefault(k, []).append(v)
                val_loss = float(np.mean([jax.device_get(l) for l in val_losses]))

                # -- scheduler + logs
                lr = self.scheduler.step(epoch + 1, val_metric=val_loss)
                if self.lr_override is not None:
                    lr = self.lr_override
                self.opt_state.hyperparams["learning_rate"] = jnp.asarray(lr)

                logs = {
                    "train/loss": train_loss,
                    "val/loss": val_loss,
                    "learning_rate": float(lr),
                    "train/steps_per_sec": n_steps / max(train_time, 1e-9),
                    "train/samples_per_sec": n_samples / max(train_time, 1e-9),
                    "epoch_time_s": train_time,
                }
                for k, vals in part_sums.items():
                    # fg/bg + accuracy diagnostics carry their own full key
                    # names (reference {stage}/confmap_loss_fg); per-head
                    # parts get the _loss suffix.
                    key = (
                        f"train/{k}"
                        if k.startswith("confmap_") or k == "class_accuracy"
                        else f"train/{k}_loss"
                    )
                    logs[key] = float(np.mean([jax.device_get(v) for v in vals]))
                for k, vals in val_part_sums.items():
                    logs[f"val/{k}"] = float(
                        np.mean([jax.device_get(v) for v in vals])
                    )
                self.history.append(logs)

                # -- checkpoint best (+ top-k history when save_top_k > 1:
                # epoch-stamped copies, worst-beyond-k pruned; reference
                # ModelCheckpoint save_top_k semantics)
                if val_loss < self.best_val_loss:
                    self.best_val_loss = val_loss
                    self.save_checkpoint("best.ckpt")
                top_k = int(cfg.trainer_config.model_ckpt.save_top_k or 1)
                if top_k > 1:
                    self._update_top_k(epoch, val_loss, top_k)
                if cfg.trainer_config.model_ckpt.save_last:
                    self.save_checkpoint("last.ckpt")

                self._log_all("on_epoch_end", epoch, logs)
                if self.should_stop:
                    break
        except KeyboardInterrupt:
            # Ctrl-C cancels the run: the partial run dir is deleted so
            # aborted experiments don't masquerade as trained models
            # (reference model_trainer.py:1896-1940).
            self._interrupted = True
            print("Stopping training (KeyboardInterrupt)...")
        finally:
            self._log_all("on_train_end")
            for cb in self.callbacks:
                if hasattr(cb, "close"):
                    cb.close()
            import shutil

            if (
                self.ckpt_dir is not None
                and not cfg.trainer_config.keep_viz
                and (self.ckpt_dir / "viz").exists()
            ):
                shutil.rmtree(self.ckpt_dir / "viz", ignore_errors=True)
            if trace_cm is not None:
                trace_cm.__exit__(None, None, None)
            if profiler in ("simple", "advanced") and self.history:
                times = [h.get("epoch_time_s", 0.0) for h in self.history]
                sps = [h.get("train/steps_per_sec", 0.0) for h in self.history]
                print(
                    f"[profiler:{profiler}] {len(times)} epochs | "
                    f"epoch_time avg {np.mean(times):.2f}s "
                    f"min {np.min(times):.2f}s max {np.max(times):.2f}s | "
                    f"steps/sec avg {np.mean(sps):.2f}"
                )
            if (
                str(cfg.data_config.data_pipeline_fw).endswith("cache_img_disk")
                and cfg.data_config.delete_cache_imgs_after_training
            ):
                from sleap_nn_tpu.parallel import process_index as _pidx

                if _pidx() == 0:
                    for ds in (getattr(self, "train_ds", None),
                               getattr(self, "val_ds", None)):
                        cache = getattr(
                            getattr(ds, "inner", ds), "cache_dir", None
                        )
                        if cache:
                            shutil.rmtree(cache, ignore_errors=True)
            if getattr(self, "_interrupted", False) and self.ckpt_dir is not None:
                from sleap_nn_tpu.parallel import process_index

                if process_index() == 0 and self.ckpt_dir.exists():
                    print(f"Training canceled - cleaning up {self.ckpt_dir}...")
                    shutil.rmtree(self.ckpt_dir, ignore_errors=True)
        return self.history
