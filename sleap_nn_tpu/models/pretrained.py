"""Pretrained image backbones (HuggingFace checkpoints) as flax encoders.

Parity target: reference sleap_nn/architectures/pretrained.py:111-502 —
wrap a pretrained hierarchical vision backbone (ConvNeXtV2 / ResNet) as the
encoder of the standard encoder-decoder, with:

- a shape probe that discovers the feature pyramid (strides + channels),
- a probe-built SLEAP decoder over that pyramid (skips = all maps above the
  bottleneck; decoder blocks past the available skips take the no-concat
  path via the stem_blocks bookkeeping),
- model-specific mean/std input normalization inside forward,
- optional encoder freeze (applied as an optimizer mask by the trainer),
- weight loading from a LOCAL safetensors snapshot (a downloaded HF model
  dir or the HF cache). This environment has no network egress, so
  ``weights=True`` falls back to random init with a warning when no local
  snapshot exists — same contract as the reference's ``weights=False`` CI
  path.

TPU-first notes: the encoders run NHWC end to end (LayerNorm/GRN/Dense act
on the trailing channel axis with no transposes, depthwise+pointwise convs
lower onto the MXU), and ResNet BatchNorm always uses running statistics
(`use_running_average=True`) — the standard frozen-BN fine-tuning recipe,
which also keeps the train step free of cross-device batch-stat syncs.
"""

from __future__ import annotations

import json
import math
import warnings
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from sleap_nn_tpu.models.encoder_decoder import Decoder, decoder_block_filters

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)

# Offline-fallback architecture configs for the reference's recommended
# model ids (hyperparameters are public model-card facts, not weights).
_BUILTIN_CONFIGS = {
    "convnextv2-atto": {"model_type": "convnextv2", "depths": [2, 2, 6, 2], "hidden_sizes": [40, 80, 160, 320]},
    "convnextv2-femto": {"model_type": "convnextv2", "depths": [2, 2, 6, 2], "hidden_sizes": [48, 96, 192, 384]},
    "convnextv2-pico": {"model_type": "convnextv2", "depths": [2, 2, 6, 2], "hidden_sizes": [64, 128, 256, 512]},
    "convnextv2-nano": {"model_type": "convnextv2", "depths": [2, 2, 8, 2], "hidden_sizes": [80, 160, 320, 640]},
    "convnextv2-tiny": {"model_type": "convnextv2", "depths": [3, 3, 9, 3], "hidden_sizes": [96, 192, 384, 768]},
    "resnet-18": {"model_type": "resnet", "depths": [2, 2, 2, 2], "hidden_sizes": [64, 128, 256, 512], "embedding_size": 64, "layer_type": "basic"},
    "resnet-50": {"model_type": "resnet", "depths": [3, 4, 6, 3], "hidden_sizes": [256, 512, 1024, 2048], "embedding_size": 64, "layer_type": "bottleneck"},
    "swinv2-tiny": {"model_type": "swinv2", "embed_dim": 96, "depths": [2, 2, 6, 2], "num_heads": [3, 6, 12, 24], "window_size": 8, "image_size": 256},
    "swinv2-small": {"model_type": "swinv2", "embed_dim": 96, "depths": [2, 2, 18, 2], "num_heads": [3, 6, 12, 24], "window_size": 8, "image_size": 256},
    "swinv2-base": {"model_type": "swinv2", "embed_dim": 128, "depths": [2, 2, 18, 2], "num_heads": [4, 8, 16, 32], "window_size": 8, "image_size": 256},
    "dinov2-small": {"model_type": "dinov2", "hidden_size": 384, "num_hidden_layers": 12, "num_attention_heads": 6, "intermediate_size": 1536, "patch_size": 14, "image_size": 518},
    "dinov2-base": {"model_type": "dinov2", "hidden_size": 768, "num_hidden_layers": 12, "num_attention_heads": 12, "intermediate_size": 3072, "patch_size": 14, "image_size": 518},
    "vit-base-patch16": {"model_type": "vit", "hidden_size": 768, "num_hidden_layers": 12, "num_attention_heads": 12, "intermediate_size": 3072, "patch_size": 16, "image_size": 224},
}


def find_local_snapshot(model_name: str, revision: Optional[str] = None) -> Optional[Path]:
    """Resolve a local HF snapshot dir for ``model_name`` (no network).

    ``revision`` pins a snapshot by commit prefix (the HF cache names
    snapshot dirs by commit sha); unset picks the newest local snapshot.

    Accepts a filesystem path directly, else searches the HF hub cache
    (``~/.cache/huggingface/hub/models--org--name/snapshots/*``).
    """
    p = Path(model_name)
    if p.is_dir() and (p / "config.json").exists():
        return p
    cache = Path.home() / ".cache/huggingface/hub"
    slug = "models--" + model_name.replace("/", "--")
    snaps = sorted((cache / slug / "snapshots").glob("*")) if (cache / slug).exists() else []
    if revision:
        pinned = [s for s in snaps if s.name.startswith(revision)]
        if not pinned:
            raise FileNotFoundError(
                f"No local snapshot of {model_name!r} at revision "
                f"{revision!r} (found: {[s.name[:12] for s in snaps]})."
            )
        snaps = pinned
    for snap in reversed(snaps):
        if (snap / "config.json").exists():
            return snap
    return None


def resolve_hf_config(model_name: str, revision: "Optional[str]" = None,
                      ) -> Tuple[Dict[str, Any], Optional[Path]]:
    """Return (architecture config dict, local snapshot path or None).

    ``revision`` pins a snapshot by commit-sha prefix (errors if absent).
    """
    snap = find_local_snapshot(model_name, revision=revision)
    if snap is not None:
        with open(snap / "config.json") as fp:
            return json.load(fp), snap
    for key, cfg in _BUILTIN_CONFIGS.items():
        if key in model_name:
            return dict(cfg), None
    raise ValueError(
        f"Cannot resolve pretrained backbone {model_name!r}: no local "
        f"snapshot found and no built-in architecture config matches. "
        f"Download the model to a directory and pass its path as model_name."
    )


# ── ConvNeXtV2 ────────────────────────────────────────────────────────────────


class GRN(nn.Module):
    """Global response normalization (ConvNeXtV2), NHWC."""

    dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        weight = self.param("weight", nn.initializers.zeros, (self.dim,))
        bias = self.param("bias", nn.initializers.zeros, (self.dim,))
        gx = jnp.sqrt(jnp.sum(jnp.square(x), axis=(1, 2), keepdims=True))  # (N,1,1,C)
        nx = gx / (jnp.mean(gx, axis=-1, keepdims=True) + 1e-6)
        return weight * (x * nx) + bias + x


class ConvNeXtV2Block(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        residual = x
        x = nn.Conv(
            self.dim, (7, 7), padding=3, feature_group_count=self.dim, name="dwconv"
        )(x)
        x = nn.LayerNorm(epsilon=1e-6, name="norm")(x)
        x = nn.Dense(4 * self.dim, name="pwconv1")(x)
        x = jax.nn.gelu(x, approximate=False)
        x = GRN(4 * self.dim, name="grn")(x)
        x = nn.Dense(self.dim, name="pwconv2")(x)
        return residual + x


class ConvNeXtV2Encoder(nn.Module):
    """HF-compatible ConvNeXtV2 backbone returning the 4-stage pyramid."""

    depths: Sequence[int] = (2, 2, 6, 2)
    hidden_sizes: Sequence[int] = (40, 80, 160, 320)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        x = nn.Conv(self.hidden_sizes[0], (4, 4), strides=(4, 4), name="patch_embed")(x)
        x = nn.LayerNorm(epsilon=1e-6, name="embed_norm")(x)
        feats = []
        for s, (depth, dim) in enumerate(zip(self.depths, self.hidden_sizes)):
            if s > 0:
                x = nn.LayerNorm(epsilon=1e-6, name=f"stage{s}_down_norm")(x)
                x = nn.Conv(dim, (2, 2), strides=(2, 2), name=f"stage{s}_down_conv")(x)
            for i in range(depth):
                x = ConvNeXtV2Block(dim, name=f"stage{s}_block{i}")(x)
            # Backbone taps are LayerNorm'ed per stage (HF hidden_states_norms).
            feats.append(nn.LayerNorm(epsilon=1e-6, name=f"out_norm{s}")(x))
        return feats


# ── ResNet ────────────────────────────────────────────────────────────────────


def _bn(name: str):
    return nn.BatchNorm(use_running_average=True, epsilon=1e-5, name=name)


class ResNetBottleneck(nn.Module):
    out_channels: int
    stride: int = 1
    reduction: int = 4
    downsample_in_bottleneck: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        mid = self.out_channels // self.reduction
        shortcut = x
        if x.shape[-1] != self.out_channels or self.stride != 1:
            shortcut = nn.Conv(
                self.out_channels, (1, 1), strides=self.stride, use_bias=False,
                name="shortcut_conv",
            )(x)
            shortcut = _bn("shortcut_bn")(shortcut)
        s0 = self.stride if self.downsample_in_bottleneck else 1
        s1 = 1 if self.downsample_in_bottleneck else self.stride
        x = nn.Conv(mid, (1, 1), strides=s0, use_bias=False, name="conv0")(x)
        x = nn.relu(_bn("bn0")(x))
        x = nn.Conv(mid, (3, 3), strides=s1, padding=1, use_bias=False, name="conv1")(x)
        x = nn.relu(_bn("bn1")(x))
        x = nn.Conv(self.out_channels, (1, 1), use_bias=False, name="conv2")(x)
        x = _bn("bn2")(x)
        return nn.relu(x + shortcut)


class ResNetBasicBlock(nn.Module):
    out_channels: int
    stride: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        shortcut = x
        if x.shape[-1] != self.out_channels or self.stride != 1:
            shortcut = nn.Conv(
                self.out_channels, (1, 1), strides=self.stride, use_bias=False,
                name="shortcut_conv",
            )(x)
            shortcut = _bn("shortcut_bn")(shortcut)
        x = nn.Conv(
            self.out_channels, (3, 3), strides=self.stride, padding=1,
            use_bias=False, name="conv0",
        )(x)
        x = nn.relu(_bn("bn0")(x))
        x = nn.Conv(self.out_channels, (3, 3), padding=1, use_bias=False, name="conv1")(x)
        x = _bn("bn1")(x)
        return nn.relu(x + shortcut)


class ResNetEncoder(nn.Module):
    """HF-compatible ResNet backbone returning the 4-stage pyramid."""

    depths: Sequence[int] = (3, 4, 6, 3)
    hidden_sizes: Sequence[int] = (256, 512, 1024, 2048)
    embedding_size: int = 64
    layer_type: str = "bottleneck"
    downsample_in_first_stage: bool = False
    downsample_in_bottleneck: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        x = nn.Conv(
            self.embedding_size, (7, 7), strides=2, padding=3, use_bias=False,
            name="stem_conv",
        )(x)
        x = nn.relu(_bn("stem_bn")(x))
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
        feats = []
        for s, (depth, dim) in enumerate(zip(self.depths, self.hidden_sizes)):
            stride = 2 if (s > 0 or self.downsample_in_first_stage) else 1
            for i in range(depth):
                kwargs = dict(out_channels=dim, stride=stride if i == 0 else 1)
                if self.layer_type == "bottleneck":
                    block = ResNetBottleneck(
                        downsample_in_bottleneck=self.downsample_in_bottleneck,
                        name=f"stage{s}_block{i}",
                        **kwargs,
                    )
                else:
                    block = ResNetBasicBlock(name=f"stage{s}_block{i}", **kwargs)
                x = block(x)
            feats.append(x)
        return feats


# ── Wrapper ───────────────────────────────────────────────────────────────────


# Config `model_type` strings that are isotropic (single-scale) ViTs.
# Case A (hierarchical decoder) cannot be built from these; with
# mode="auto" they route to Case B (reference pretrained.py:52-68,100-109).
ISOTROPIC_MODEL_TYPES = {
    "vit", "deit", "beit", "dinov2", "dinov2_with_registers",
    "dinov2-with-registers", "dinov3_vit", "dinov3-vit", "ijepa",
    "vitdet", "vit_det", "vit_mae", "vit_msn",
}

_VIT_FAMILY = ISOTROPIC_MODEL_TYPES


def resolve_mode(arch_cfg: Dict[str, Any], mode: str = "auto") -> str:
    """Resolve mode='auto' to 'decoder' (Case A) or 'encoder' (Case B)."""
    if mode in ("decoder", "encoder"):
        return mode
    mt = (arch_cfg.get("model_type") or "").lower()
    is_isotropic = mt in ISOTROPIC_MODEL_TYPES or not arch_cfg.get(
        "stage_names", arch_cfg.get("depths")
    )
    return "encoder" if is_isotropic else "decoder"


def build_encoder(arch_cfg: Dict[str, Any]) -> nn.Module:
    mt = arch_cfg.get("model_type", "convnextv2")
    if mt == "convnextv2":
        return ConvNeXtV2Encoder(
            depths=tuple(arch_cfg.get("depths", (2, 2, 6, 2))),
            hidden_sizes=tuple(arch_cfg.get("hidden_sizes", (40, 80, 160, 320))),
            name="enc",
        )
    if mt == "resnet":
        return ResNetEncoder(
            depths=tuple(arch_cfg.get("depths", (3, 4, 6, 3))),
            hidden_sizes=tuple(arch_cfg.get("hidden_sizes", (256, 512, 1024, 2048))),
            embedding_size=int(arch_cfg.get("embedding_size", 64)),
            layer_type=arch_cfg.get("layer_type", "bottleneck"),
            downsample_in_first_stage=bool(arch_cfg.get("downsample_in_first_stage", False)),
            downsample_in_bottleneck=bool(arch_cfg.get("downsample_in_bottleneck", False)),
            name="enc",
        )
    if mt == "swinv2":
        from sleap_nn_tpu.models.transformer_encoders import build_swinv2_encoder

        return build_swinv2_encoder(arch_cfg)
    if mt in _VIT_FAMILY:
        from sleap_nn_tpu.models.transformer_encoders import build_vit_encoder

        return build_vit_encoder(arch_cfg)
    raise ValueError(
        f"Unsupported pretrained backbone model_type {mt!r} "
        f"(supported: convnextv2, resnet, swinv2, "
        f"{', '.join(sorted(_VIT_FAMILY))})."
    )


def probe_pyramid(encoder: nn.Module, in_channels: int = 3) -> Tuple[List[int], List[int]]:
    """Shape-probe the encoder: (strides, channels) of its feature pyramid.

    Uses ``jax.eval_shape`` — no FLOPs, no device use (reference probes with
    a real dummy forward, pretrained.py:299).
    """
    size = 448  # divisible by every supported patch stride (4/14/16/32)

    def run():
        variables = encoder.init(jax.random.PRNGKey(0), jnp.zeros((1, size, size, in_channels)))
        return encoder.apply(variables, jnp.zeros((1, size, size, in_channels)))

    feats = jax.eval_shape(run)
    by_stride = {size // f.shape[1]: f.shape[-1] for f in feats}
    strides = sorted(by_stride)
    return strides, [by_stride[s] for s in strides]


class _StageSubsetEncoder(nn.Module):
    """Wrap an encoder to expose only the ``out_indices`` feature stages."""

    inner: nn.Module
    indices: Tuple[int, ...]

    def __call__(self, x):
        feats = self.inner(x)
        return [feats[i] for i in self.indices]


class PretrainedBackbone(nn.Module):
    """Pretrained encoder + probe-built SLEAP decoder (standard output dict)."""

    encoder: nn.Module
    pyramid_strides: Tuple[int, ...]
    pyramid_channels: Tuple[int, ...]
    output_stride: int = 2
    filters_rate: float = 2.0
    convs_per_block: int = 2
    kernel_size: int = 3
    up_interpolate: bool = True
    normalize: bool = True
    image_mean: Tuple[float, float, float] = IMAGENET_MEAN
    image_std: Tuple[float, float, float] = IMAGENET_STD
    # 'decoder' (Case A): pyramid -> SLEAP decoder, spatial heads bind to
    # decoder strides. 'encoder' (Case B, isotropic ViTs): no decoder; the
    # single bottleneck map is exposed as middle_output and every head
    # binds there (reference pretrained.py:409 _build_encoder_only).
    mode: str = "decoder"

    @property
    def max_stride(self) -> int:
        return self.pyramid_strides[-1]

    @property
    def _n_skips(self) -> int:
        return len(self.pyramid_strides) - 1

    @property
    def _up_blocks(self) -> int:
        return int(math.log2(self.max_stride / self.output_stride))

    def _decoder_def(self) -> Decoder:
        # stem_blocks=1 + down_blocks=n_skips-1 puts the no-concat threshold
        # exactly at n_skips: decoder blocks past the available skips take
        # the skip-free path (reference pretrained.py:336-404).
        return Decoder(
            filters=self.pyramid_channels[0],
            up_blocks=self._up_blocks,
            down_blocks=self._n_skips - 1,
            filters_rate=self.filters_rate,
            current_stride=self.max_stride,
            stem_blocks=1,
            convs_per_block=self.convs_per_block,
            kernel_size=self.kernel_size,
            up_interpolate=self.up_interpolate,
            name="dec",
        )

    @property
    def stride_to_filters(self) -> Dict[int, int]:
        if self.mode == "encoder":
            return {}  # no decoder: heads route to middle_output
        out = {self.max_stride: self.pyramid_channels[-1]}
        stride = self.max_stride
        for block in range(self._up_blocks):
            stride //= 2
            out[stride] = decoder_block_filters(
                self.pyramid_channels[0],
                self.filters_rate,
                self._n_skips - 1,
                1,
                False,
                block,
            )
        return out

    @property
    def middle_channels(self) -> int:
        return self.pyramid_channels[-1]

    @classmethod
    def from_config(cls, config) -> "PretrainedBackbone":
        arch_cfg, _ = resolve_hf_config(config.model_name,
                                        getattr(config, "revision", None))
        encoder = build_encoder(arch_cfg)
        mode = resolve_mode(arch_cfg, getattr(config, "mode", "auto") or "auto")
        strides, channels = probe_pyramid(encoder)
        if mode == "decoder" and len(strides) < 2:
            raise ValueError(
                f"Backbone {config.model_name!r} produced a single-scale "
                f"feature map (strides={strides}); it is isotropic and "
                f"cannot feed a spatial decoder. Use a hierarchical "
                f"backbone (ConvNeXtV2/ResNet/Swinv2) for spatial heads, "
                f"or mode='encoder' for a pooled head."
            )
        # out_indices (reference pretrained.py out_indices): restrict which
        # encoder stages feed the pyramid — the deepest selected stage
        # becomes the bottleneck, earlier ones the skips.
        oi = getattr(config, "out_indices", None)
        if oi:
            oi = sorted(int(i) for i in oi)
            bad = [i for i in oi if not 0 <= i < len(strides)]
            if bad:
                raise ValueError(
                    f"out_indices {bad} out of range for a "
                    f"{len(strides)}-stage encoder."
                )
            strides = [strides[i] for i in oi]
            channels = [channels[i] for i in oi]
            encoder = _StageSubsetEncoder(encoder, tuple(oi))
        mean = tuple(config.image_mean) if config.image_mean else IMAGENET_MEAN
        std = tuple(config.image_std) if config.image_std else IMAGENET_STD
        return cls(
            encoder=encoder,
            pyramid_strides=tuple(strides),
            pyramid_channels=tuple(channels),
            output_stride=config.output_stride,
            filters_rate=config.filters_rate,
            convs_per_block=config.convs_per_block,
            kernel_size=config.kernel_size,
            up_interpolate=config.up_interpolate,
            normalize=bool(getattr(config, "normalize", True)),
            image_mean=mean,
            image_std=std,
            mode=mode,
        )

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Dict[str, Any]:
        if self.normalize:
            mean = jnp.asarray(self.image_mean, dtype=x.dtype)
            std = jnp.asarray(self.image_std, dtype=x.dtype)
            x = (x - mean) / std
        feats = self.encoder(x)
        bottleneck = feats[-1]
        if self.mode == "encoder":
            # Case B: single spatial bottleneck; Model routes every head
            # (incl. class-vectors) through middle_output/intermediate_feat.
            return {
                "outputs": [],
                "strides": [],
                "middle_output": bottleneck,
                "intermediate_feat": bottleneck,
            }
        skips = feats[:-1][::-1]  # deepest-first, paired with decoder blocks
        result = self._decoder_def()(bottleneck, skips)
        result["middle_output"] = bottleneck
        return result


# ── Weight import ─────────────────────────────────────────────────────────────


def _assign(tree: Dict, path: Tuple[str, ...], value: np.ndarray, errors: List[str]):
    node = tree
    for name in path[:-1]:
        if name not in node:
            errors.append(f"missing subtree {'/'.join(path)}")
            return
        node = node[name]
    leaf = path[-1]
    if leaf not in node:
        errors.append(f"missing leaf {'/'.join(path)}")
        return
    if tuple(node[leaf].shape) != tuple(value.shape):
        errors.append(
            f"shape mismatch at {'/'.join(path)}: {value.shape} != {node[leaf].shape}"
        )
        return
    node[leaf] = value.astype(node[leaf].dtype)


def _map_convnextv2_key(key: str) -> Optional[Tuple[Tuple[str, ...], str]]:
    """HF ConvNeXtV2 state-dict key -> (flax path under enc/, transform)."""
    import re

    k = key
    if k.startswith("embeddings.patch_embeddings."):
        leaf = k.rsplit(".", 1)[1]
        return (("patch_embed", "kernel") if leaf == "weight" else ("patch_embed", "bias")), (
            "conv" if leaf == "weight" else "none"
        )
    if k.startswith("embeddings.layernorm."):
        leaf = k.rsplit(".", 1)[1]
        return ("embed_norm", "scale" if leaf == "weight" else "bias"), "none"
    m = re.match(r"encoder\.stages\.(\d+)\.downsampling_layer\.(\d)\.(weight|bias)$", k)
    if m:
        s, idx, leaf = int(m[1]), int(m[2]), m[3]
        if idx == 0:
            return (f"stage{s}_down_norm", "scale" if leaf == "weight" else "bias"), "none"
        return (f"stage{s}_down_conv", "kernel" if leaf == "weight" else "bias"), (
            "conv" if leaf == "weight" else "none"
        )
    m = re.match(r"encoder\.stages\.(\d+)\.layers\.(\d+)\.(\w+)\.(weight|bias)$", k)
    if m:
        s, i, mod, leaf = int(m[1]), int(m[2]), m[3], m[4]
        base = (f"stage{s}_block{i}",)
        if mod == "dwconv":
            return base + ("dwconv", "kernel" if leaf == "weight" else "bias"), (
                "conv" if leaf == "weight" else "none"
            )
        if mod == "layernorm":
            return base + ("norm", "scale" if leaf == "weight" else "bias"), "none"
        if mod in ("pwconv1", "pwconv2"):
            return base + (mod, "kernel" if leaf == "weight" else "bias"), (
                "dense" if leaf == "weight" else "none"
            )
        if mod == "grn":
            return base + ("grn", leaf), "squeeze"
    m = re.match(r"hidden_states_norms\.stage(\d+)\.(weight|bias)$", k)
    if m:
        s, leaf = int(m[1]) - 1, m[2]
        return (f"out_norm{s}", "scale" if leaf == "weight" else "bias"), "none"
    return None


def _map_resnet_key(key: str) -> Optional[Tuple[Tuple[str, ...], str, str]]:
    """HF ResNet key -> (flax path under enc/, transform, collection)."""
    import re

    def norm_leaf(leaf):
        return {
            "weight": ("scale", "params"),
            "bias": ("bias", "params"),
            "running_mean": ("mean", "batch_stats"),
            "running_var": ("var", "batch_stats"),
        }.get(leaf)

    if key.startswith("embedder.embedder.convolution."):
        return ("stem_conv", "kernel"), "conv", "params"
    if key.startswith("embedder.embedder.normalization."):
        got = norm_leaf(key.rsplit(".", 1)[1])
        if got is None:
            return "skip"
        leaf, coll = got
        return ("stem_bn", leaf), "none", coll
    m = re.match(
        r"encoder\.stages\.(\d+)\.layers\.(\d+)\.(shortcut|layer)\.?(\d*)\.(convolution|normalization)\.(\w+)$",
        key,
    )
    if m:
        s, i, kind, idx, mod, leaf = m[1], m[2], m[3], m[4], m[5], m[6]
        base = f"stage{s}_block{i}"
        if kind == "shortcut":
            sub = "shortcut_conv" if mod == "convolution" else "shortcut_bn"
        else:
            sub = (f"conv{idx}") if mod == "convolution" else (f"bn{idx}")
        if mod == "convolution":
            return (base, sub, "kernel"), "conv", "params"
        got = norm_leaf(leaf)
        if got is None:
            return "skip"
        nleaf, coll = got
        return (base, sub, nleaf), "none", coll
    if key.endswith("num_batches_tracked"):
        return "skip"
    return None


def _transform(value: np.ndarray, how: str) -> np.ndarray:
    if how == "conv":
        return np.ascontiguousarray(value.transpose(2, 3, 1, 0))  # OIHW -> HWIO
    if how == "dense":
        return np.ascontiguousarray(value.transpose(1, 0))
    if how == "squeeze":
        return np.ascontiguousarray(value.reshape(-1))
    return value


def load_hf_encoder_params(model_name: str, variables, backbone_scope: str = "backbone",
                           revision: "Optional[str]" = None):
    """Load pretrained encoder weights into a Model's variables, if available.

    Returns (variables, loaded: bool). Looks for a local safetensors
    snapshot; when none exists, warns and returns the input unchanged
    (random init) — mirroring the reference's offline ``weights=False`` path.
    """
    arch_cfg, snap = resolve_hf_config(model_name, revision=revision)
    if snap is None:
        warnings.warn(
            f"No local snapshot for pretrained backbone {model_name!r}; "
            f"training from random init. Download the checkpoint (e.g. "
            f"huggingface-cli download {model_name}) to enable transfer "
            f"learning.",
            stacklevel=2,
        )
        return variables, False

    tensors: Dict[str, np.ndarray] = {}
    st_files = sorted(snap.glob("*.safetensors"))
    if st_files:
        from safetensors.numpy import load_file

        for f in st_files:
            tensors.update(load_file(str(f)))
    elif (snap / "pytorch_model.bin").exists():
        from sleap_nn_tpu.torch_models import load_torch_state_dict

        tensors = load_torch_state_dict(snap / "pytorch_model.bin")
    else:
        warnings.warn(f"Snapshot {snap} has no weight files; using random init.")
        return variables, False

    import flax

    variables = flax.core.unfreeze(variables) if hasattr(flax.core, "unfreeze") else variables
    mt = arch_cfg.get("model_type", "convnextv2")
    if mt == "convnextv2":
        mapper, has_coll = _map_convnextv2_key, False
    elif mt == "resnet":
        mapper, has_coll = _map_resnet_key, True
    elif mt == "swinv2":
        from sleap_nn_tpu.models.transformer_encoders import map_swinv2_key

        mapper, has_coll = map_swinv2_key, False
    elif mt in _VIT_FAMILY:
        from sleap_nn_tpu.models.transformer_encoders import map_vit_key

        mapper, has_coll = map_vit_key, False
    else:
        raise ValueError(f"No weight mapper for model_type {mt!r}.")
    errors: List[str] = []
    n_loaded = 0
    for key, value in tensors.items():
        value = np.asarray(value)
        got = mapper(key)
        if got is None:
            errors.append(f"unmapped key {key}")
            continue
        if got == "skip":
            continue
        if has_coll:
            path, how, coll = got
        else:
            path, how = got
            coll = "params"
        root = variables.get(coll, {})
        scope = root.get(backbone_scope, root)
        enc = scope.get("enc") or scope.get("encoder")
        if enc is not None and set(enc) == {"inner"}:
            # out_indices wraps the encoder in _StageSubsetEncoder; the real
            # encoder params live one level down under 'inner'.
            enc = enc["inner"]
        if enc is None and any(
            k.startswith(("patch_embed", "embed", "stem", "stage", "out_norm"))
            for k in scope
        ):
            enc = scope  # a bare encoder initialized as the top-level module
        if enc is None:
            errors.append(f"no encoder subtree under {coll}/{backbone_scope}")
            break
        _assign(enc, path, _transform(value, how), errors)
        n_loaded += 1
    if errors:
        raise ValueError(
            "pretrained weight import failed:\n  " + "\n  ".join(errors[:20])
        )
    return variables, n_loaded > 0
