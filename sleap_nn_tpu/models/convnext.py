"""ConvNeXt encoder + SLEAP decoder backbone (flax, NHWC).

Parity target: reference sleap_nn/architectures/convnext.py:19-361 — same
stage/stem geometry (stem conv k4 s2 p1, 4 stages with k2 s2 downsamples,
extra 2x pool before the middle blocks), skip features at
[stem, down1, down2, down3] outputs, and the SLEAP Decoder on top.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from sleap_nn_tpu.models.encoder_decoder import (
    Decoder,
    SimpleConvBlock,
    decoder_block_filters,
    max_pool_same,
)

ARCHS = {
    "tiny": {"depths": [3, 3, 9, 3], "channels": [96, 192, 384, 768]},
    "small": {"depths": [3, 3, 27, 3], "channels": [96, 192, 384, 768]},
    "base": {"depths": [3, 3, 27, 3], "channels": [128, 256, 512, 1024]},
    "large": {"depths": [3, 3, 27, 3], "channels": [192, 384, 768, 1536]},
}


class CNBlock(nn.Module):
    """ConvNeXt block: dwconv7 -> LN -> MLP(4x) -> layer scale -> residual."""

    dim: int
    layer_scale: float = 1e-6

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        residual = x
        x = nn.Conv(
            self.dim,
            (7, 7),
            padding="SAME",
            feature_group_count=self.dim,
            name="dwconv",
        )(x)
        x = nn.LayerNorm(epsilon=1e-6, name="norm")(x)
        x = nn.Dense(4 * self.dim, name="pwconv1")(x)
        x = nn.gelu(x)
        x = nn.Dense(self.dim, name="pwconv2")(x)
        gamma = self.param(
            "gamma", lambda k, s: jnp.full(s, self.layer_scale), (self.dim,)
        )
        return residual + x * gamma


class ConvNeXtEncoder(nn.Module):
    """4-stage ConvNeXt returning per-layer features (reference: :19)."""

    depths: Tuple[int, ...] = (3, 3, 9, 3)
    channels: Tuple[int, ...] = (96, 192, 384, 768)
    stem_kernel: int = 4
    stem_stride: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        feats = []
        # Stem: conv k=stem_kernel s=stem_stride p=1 (torch padding=1) + LN.
        x = nn.Conv(
            self.channels[0],
            (self.stem_kernel, self.stem_kernel),
            strides=(self.stem_stride, self.stem_stride),
            padding=[(1, 1), (1, 1)],
            name="stem_conv",
        )(x)
        x = nn.LayerNorm(epsilon=1e-6, name="stem_norm")(x)
        feats.append(x)

        for i, (depth, dim) in enumerate(zip(self.depths, self.channels)):
            for b in range(depth):
                x = CNBlock(dim, name=f"stage{i}_block{b}")(x)
            feats.append(x)
            if i < len(self.depths) - 1:
                x = nn.LayerNorm(epsilon=1e-6, name=f"down{i}_norm")(x)
                x = nn.Conv(
                    self.channels[i + 1],
                    (2, 2),
                    strides=(2, 2),
                    name=f"down{i}_conv",
                )(x)
                feats.append(x)
        return feats


class ConvNextWrapper(nn.Module):
    """ConvNeXt encoder + SLEAP decoder (reference: ConvNextWrapper :133)."""

    model_type: str = "tiny"
    arch: Optional[Tuple[Tuple[int, ...], Tuple[int, ...]]] = None  # (depths, channels)
    stem_patch_kernel: int = 4
    stem_patch_stride: int = 2
    kernel_size: int = 3
    filters_rate: float = 2.0
    convs_per_block: int = 2
    up_interpolate: bool = True
    output_stride_cfg: int = 1
    block_contraction: bool = False

    def _arch(self):
        if self.arch is not None:
            return {"depths": list(self.arch[0]), "channels": list(self.arch[1])}
        return ARCHS[self.model_type]

    @property
    def max_stride(self) -> int:
        # stem_stride * 2^3 stage downsamples * final 2x pool (reference: :66).
        return self.stem_patch_stride * (2**3) * 2

    @property
    def down_blocks(self) -> int:
        return 3

    @property
    def stem_blocks(self) -> int:
        return 1

    @property
    def up_blocks(self) -> int:
        return int(
            math.log2(self.max_stride / (self.stem_patch_stride * self.output_stride_cfg))
        ) + int(math.log2(self.stem_patch_stride))

    @property
    def middle_channels(self) -> int:
        ch = self._arch()["channels"]
        return int(ch[-1] * self.filters_rate)

    def _decoder_in_channels(self) -> int:
        ch = self._arch()["channels"]
        return int(ch[-1]) if self.block_contraction else int(ch[-1] * self.filters_rate)

    @property
    def stride_to_filters(self) -> Dict[int, int]:
        filters = self._arch()["channels"][0]
        out = {self.max_stride: self._decoder_in_channels()}
        stride = self.max_stride
        for block in range(self.up_blocks):
            stride //= 2
            out[stride] = decoder_block_filters(
                filters, self.filters_rate, self.down_blocks, self.stem_blocks,
                self.block_contraction, block,
            )
        return out

    @classmethod
    def from_config(cls, config) -> "ConvNextWrapper":
        arch = getattr(config, "arch", None)
        if isinstance(arch, dict):
            if len(arch["depths"]) != 4:
                raise ValueError(
                    f"convnext arch must have 4 stages, got "
                    f"{len(arch['depths'])} (depths={arch['depths']})."
                )
            arch = (tuple(arch["depths"]), tuple(arch["channels"]))
        return cls(
            model_type=getattr(config, "model_type", "tiny"),
            arch=arch,
            stem_patch_kernel=config.stem_patch_kernel,
            stem_patch_stride=config.stem_patch_stride,
            kernel_size=config.kernel_size,
            filters_rate=config.filters_rate,
            convs_per_block=config.convs_per_block,
            up_interpolate=config.up_interpolate,
            output_stride_cfg=config.output_stride,
            block_contraction=getattr(config, "block_contraction", False) or False,
        )

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Dict[str, Any]:
        arch = self._arch()
        feats = ConvNeXtEncoder(
            depths=tuple(arch["depths"]),
            channels=tuple(arch["channels"]),
            stem_kernel=self.stem_patch_kernel,
            stem_stride=self.stem_patch_stride,
            name="enc",
        )(x)
        # Skips = [stem, down0, down1, down2] outputs, deepest first
        # (reference forward: enc_output[::2][::-1]).
        skips = feats[::2][::-1]
        x = feats[-1]
        x = max_pool_same(x)  # additional 2x pool (reference: :90)

        middle = x
        if self.convs_per_block > 1:
            middle = SimpleConvBlock(
                filters=self.middle_channels,
                num_convs=self.convs_per_block - 1,
                kernel_size=self.kernel_size,
                pool=False,
                name="middle_expand",
            )(middle)
        middle = SimpleConvBlock(
            filters=self._decoder_in_channels(),
            num_convs=1,
            kernel_size=self.kernel_size,
            pool=False,
            name="middle_contract",
        )(middle)

        result = Decoder(
            filters=arch["channels"][0],
            up_blocks=self.up_blocks,
            down_blocks=self.down_blocks,
            filters_rate=self.filters_rate,
            current_stride=self.max_stride,
            stem_blocks=self.stem_blocks,
            convs_per_block=self.convs_per_block,
            kernel_size=self.kernel_size,
            up_interpolate=self.up_interpolate,
            block_contraction=self.block_contraction,
            name="dec",
        )(middle, skips)
        result["middle_output"] = middle
        return result
