"""Model output heads.

Parity target: reference sleap_nn/architectures/heads.py:12-700. Each head
is a small dataclass describing channels/activation/loss plus a flax layer
builder (1x1 conv + activation; class-vectors: pooled FC stack). Heads are
framework metadata first — the training loop and inference layers key off
``head.name``, ``head.loss_function`` and ``head.sigma`` exactly as the
reference does.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from sleap_nn_tpu.models.encoder_decoder import get_act_fn


class ConvHeadLayer(nn.Module):
    """1x1 conv + activation head layer.

    ``packed=True`` consumes a space-to-depth PACKED feature (B, H/2, W/2,
    4C) and returns the pixel-space (B, H, W, channels) output — identical
    params (``head_conv/kernel|bias``) and math, but the 1x1 conv runs in
    packed layout (block-diagonal over phases) so the sub-128-channel
    full-resolution feature never materializes lane-padded in HBM (see
    ops/packed_conv.py).
    """

    channels: int
    activation: str = "identity"
    packed: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.packed:
            from sleap_nn_tpu.models.encoder_decoder import _ConvParams
            from sleap_nn_tpu.ops.packed_conv import depth_to_space, packed_conv

            kernel, bias = _ConvParams(
                features=self.channels,
                in_features=int(x.shape[-1]) // 4,
                kernel_size=1,
                name="head_conv",
            )()
            y = packed_conv(x, kernel, bias)
            return depth_to_space(get_act_fn(self.activation)(y))
        x = nn.Conv(self.channels, (1, 1), padding="SAME", name="head_conv")(x)
        return get_act_fn(self.activation)(x)


class ClassVectorsHeadLayer(nn.Module):
    """Global-pool -> FC stack -> class logits (+softmax) head layer."""

    channels: int
    num_fc_layers: int = 1
    num_fc_units: int = 64
    global_pool: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.global_pool:
            x = jnp.max(x, axis=(1, 2))  # (B, C)
        else:
            x = x.reshape(x.shape[0], -1)
        for i in range(self.num_fc_layers):
            x = nn.relu(nn.Dense(self.num_fc_units, name=f"fc{i}")(x))
        x = nn.Dense(self.channels, name="logits")(x)
        return nn.softmax(x, axis=-1)


@dataclass(frozen=True)
class Head:
    """Base head descriptor.

    Frozen + tuple-normalized so head tuples are hashable static metadata
    on flax modules (jit cache keys).
    """

    output_stride: int = 1
    loss_weight: float = 1.0

    def __post_init__(self):
        for attr in ("part_names", "edges", "classes"):
            if hasattr(self, attr):
                val = getattr(self, attr)
                if val is not None and not isinstance(val, tuple):
                    object.__setattr__(
                        self,
                        attr,
                        tuple(tuple(v) if isinstance(v, (list, tuple)) else v for v in val),
                    )

    @property
    def name(self) -> str:
        return type(self).__name__

    @property
    def channels(self) -> int:
        raise NotImplementedError

    @property
    def activation(self) -> str:
        return "identity"

    @property
    def loss_function(self) -> str:
        return "mse"

    def make_layer(self, packed: bool = False) -> nn.Module:
        return ConvHeadLayer(
            channels=self.channels,
            activation=self.activation,
            packed=packed,
            name=self.name,
        )


@dataclass(frozen=True)
class SingleInstanceConfmapsHead(Head):
    part_names: Sequence[str] = ()
    sigma: float = 5.0

    @property
    def channels(self) -> int:
        return len(self.part_names)


@dataclass(frozen=True)
class CentroidConfmapsHead(Head):
    anchor_part: Optional[str] = None
    sigma: float = 5.0

    @property
    def channels(self) -> int:
        return 1


@dataclass(frozen=True)
class CenteredInstanceConfmapsHead(Head):
    part_names: Sequence[str] = ()
    anchor_part: Optional[str] = None
    sigma: float = 5.0

    @property
    def channels(self) -> int:
        return len(self.part_names)


@dataclass(frozen=True)
class MultiInstanceConfmapsHead(Head):
    part_names: Sequence[str] = ()
    sigma: float = 5.0

    @property
    def channels(self) -> int:
        return len(self.part_names)


@dataclass(frozen=True)
class PartAffinityFieldsHead(Head):
    edges: Sequence = ()
    sigma: float = 15.0

    @property
    def channels(self) -> int:
        return 2 * len(self.edges)


@dataclass(frozen=True)
class ClassMapsHead(Head):
    classes: Sequence[str] = ()
    sigma: float = 5.0

    @property
    def channels(self) -> int:
        return len(self.classes)

    @property
    def activation(self) -> str:
        return "sigmoid"


@dataclass(frozen=True)
class ClassVectorsHead(Head):
    classes: Sequence[str] = ()
    num_fc_layers: int = 1
    num_fc_units: int = 64
    global_pool: bool = True

    @property
    def channels(self) -> int:
        return len(self.classes)

    @property
    def activation(self) -> str:
        return "softmax"

    @property
    def loss_function(self) -> str:
        return "categorical_crossentropy"

    def make_layer(self, packed: bool = False) -> nn.Module:
        # class-vectors layer pools globally; packed layout does not apply
        return ClassVectorsHeadLayer(
            channels=self.channels,
            num_fc_layers=self.num_fc_layers,
            num_fc_units=self.num_fc_units,
            global_pool=self.global_pool,
            name=self.name,
        )


@dataclass(frozen=True)
class OffsetRefinementHead(Head):
    part_names: Sequence[str] = ()
    sigma_threshold: float = 0.2

    @property
    def channels(self) -> int:
        return 2 * len(self.part_names)


@dataclass(frozen=True)
class SegmentationHead(Head):
    output_stride: int = 2
    # BCE+Dice blend (config SegmentationHeadConfig.bce_weight/dice_weight/
    # bce_pos_weight) carried on the descriptor so compute_loss can honor it.
    bce_weight: float = 0.5
    dice_weight: float = 0.5
    bce_pos_weight: float = None

    @property
    def channels(self) -> int:
        return 1

    @property
    def activation(self) -> str:
        return "sigmoid"

    @property
    def loss_function(self) -> str:
        return "bce_dice"


@dataclass(frozen=True)
class InstanceCenterHead(Head):
    output_stride: int = 2
    sigma: float = 4.0

    @property
    def channels(self) -> int:
        return 1


@dataclass(frozen=True)
class CenterOffsetHead(Head):
    output_stride: int = 2
    loss_weight: float = 0.1

    @property
    def channels(self) -> int:
        return 2

    @property
    def loss_function(self) -> str:
        return "smooth_l1"
