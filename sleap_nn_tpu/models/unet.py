"""Stride-anchored UNet backbone (flax.linen, NHWC).

Parity target: reference sleap_nn/architectures/unet.py:16-299 — same
filter schedule (``filters * filters_rate**level``), stem/middle-block
semantics, stacks, and per-stride decoder outputs, rebuilt as a flax module.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional

import flax.linen as nn
import jax.numpy as jnp

from sleap_nn_tpu.models.encoder_decoder import (
    Decoder,
    Encoder,
    SimpleConvBlock,
    StemBlock,
)


class UNet(nn.Module):
    """U-Net: encoder -> (middle) -> decoder with per-stride outputs.

    Returns a dict with:
      - ``outputs``: list of feature maps, one per decoder stride
      - ``strides``: list of ints matching ``outputs``
      - ``middle_output``: bottleneck feature (for class-vector heads)
      - ``intermediate_feat``: decoder input feature
    """

    filters: int = 32
    filters_rate: float = 1.5
    kernel_size: int = 3
    stem_kernel_size: int = 7
    down_blocks: int = 4
    up_blocks: int = 3
    stem_blocks: int = 0
    convs_per_block: int = 2
    middle_block: bool = True
    up_interpolate: bool = True
    block_contraction: bool = False
    stacks: int = 1
    trans_conv_phase: str = "torch"
    # TPU layout optimization: evaluate the first N encoder levels (and any
    # decoder up-block consuming their skips, plus the bound heads) in
    # space-to-depth packing (exact math, identical params; see
    # ops/packed_conv.py). Safe default-off; inference backends flip it on
    # for narrow-channel models on TPU.
    packed_levels: int = 0
    # A level only actually packs while its input resolution is >= this
    # (trace-time shape logic; see Encoder.pack_min_res for the v5e A/B
    # evidence). Identical param tree either way.
    pack_min_res: int = 1024
    # Evaluate double-conv blocks as one Pallas kernel (ops/fused_conv.py):
    # forward-only (no VJP), so inference backends opt in while training
    # keeps the differentiable flax path. Identical param tree.
    use_fused: bool = False

    @property
    def max_stride(self) -> int:
        """Bottleneck stride.

        With a stem, the encoder's first block also pools (reference
        Encoder pools when ``block + stem_blocks > 0``), so the true
        bottleneck stride is 2x the nominal ``2**(down+stem)`` — matching
        the reference's ``current_stride`` bookkeeping (unet.py:178-192).
        """
        s = 2 ** (self.down_blocks + self.stem_blocks)
        return s * 2 if self.stem_blocks > 0 else s

    @property
    def output_stride(self) -> int:
        return self.max_stride // (2**self.up_blocks)

    @property
    def stride_to_filters(self) -> Dict[int, int]:
        """Static map: decoder output stride -> channels (for head binding)."""
        from sleap_nn_tpu.models.encoder_decoder import decoder_block_filters

        out = {self.max_stride: self._decoder_in_channels()}
        stride = self.max_stride
        for block in range(self.up_blocks):
            stride //= 2
            out[stride] = decoder_block_filters(
                self.filters,
                self.filters_rate,
                self.down_blocks,
                self.stem_blocks,
                self.block_contraction,
                block,
            )
        return out

    @property
    def middle_channels(self) -> int:
        return int(self.filters * (self.filters_rate ** (self.down_blocks + self.stem_blocks)))

    def _decoder_in_channels(self) -> int:
        if self.block_contraction:
            return int(
                self.filters * (self.filters_rate ** (self.down_blocks + self.stem_blocks - 1))
            )
        return self.middle_channels

    def _decoder_def(self, name: Optional[str] = None) -> Decoder:
        return Decoder(
            filters=self.filters,
            up_blocks=self.up_blocks,
            down_blocks=self.down_blocks,
            filters_rate=self.filters_rate,
            current_stride=self.max_stride,
            stem_blocks=self.stem_blocks,
            convs_per_block=self.convs_per_block,
            kernel_size=self.kernel_size,
            up_interpolate=self.up_interpolate,
            block_contraction=self.block_contraction,
            trans_conv_phase=self.trans_conv_phase,
            use_fused=self.use_fused,
            name=name,
        )

    @classmethod
    def from_config(cls, config) -> "UNet":
        """Build from a UNetConfig-shaped object (max_stride/output_stride anchored)."""
        stem_blocks = 0
        stem_stride = getattr(config, "stem_stride", None)
        if stem_stride:
            stem_blocks = int(math.log2(stem_stride))
        down_blocks = int(math.log2(config.max_stride)) - stem_blocks
        up_blocks = int(math.log2(config.max_stride / config.output_stride)) + stem_blocks
        return cls(
            filters=config.filters,
            filters_rate=config.filters_rate,
            kernel_size=config.kernel_size,
            down_blocks=down_blocks,
            up_blocks=up_blocks,
            stem_blocks=stem_blocks,
            convs_per_block=config.convs_per_block,
            middle_block=config.middle_block,
            up_interpolate=config.up_interpolate,
            stacks=getattr(config, "stacks", 1),
            trans_conv_phase=getattr(config, "trans_conv_phase", None) or "torch",
        )

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Dict[str, Any]:
        if self.stem_blocks > 0:
            x = StemBlock(
                filters=self.filters,
                stem_blocks=self.stem_blocks,
                filters_rate=self.filters_rate,
                convs_per_block=self.convs_per_block,
                kernel_size=self.stem_kernel_size,
                name="stem",
            )(x)
        stem_output = x

        output = stem_output
        result = None
        for i in range(self.stacks):
            encoded, features, packed_features = Encoder(
                filters=self.filters,
                down_blocks=self.down_blocks,
                filters_rate=self.filters_rate,
                convs_per_block=self.convs_per_block,
                kernel_size=self.kernel_size,
                stem_blocks=self.stem_blocks,
                packed_levels=self.packed_levels if i == 0 else 0,
                pack_min_res=self.pack_min_res,
                use_fused=self.use_fused,
                name=f"stack{i}_enc",
            )(output)

            middle = encoded
            if self.middle_block:
                if self.convs_per_block > 1:
                    middle = SimpleConvBlock(
                        filters=self.middle_channels,
                        num_convs=self.convs_per_block - 1,
                        kernel_size=self.kernel_size,
                        pool=False,
                        name=f"stack{i}_middle_expand",
                    )(middle)
                middle = SimpleConvBlock(
                    filters=self._decoder_in_channels(),
                    num_convs=1,
                    kernel_size=self.kernel_size,
                    pool=False,
                    name=f"stack{i}_middle_contract",
                )(middle)

            if self.stem_blocks > 0:
                features = list(features) + [stem_output]
                packed_features = list(packed_features) + [None]

            result = self._decoder_def(name=f"stack{i}_dec")(
                middle, features, packed_features
            )
            result["middle_output"] = middle
            output = result["outputs"][-1] if result["outputs"] else middle
        return result
