"""Generic encoder-decoder conv blocks (flax.linen, NHWC).

Behavioral parity with the reference block semantics (reference:
sleap_nn/architectures/encoder_decoder.py:38,144,228,339,561): same
filter/stride schedules and skip topology, re-expressed as flax modules in
channel-last layout so convolutions map directly onto the TPU MXU.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

_ACTS = {
    "relu": nn.relu,
    "sigmoid": nn.sigmoid,
    "tanh": jnp.tanh,
    "softmax": lambda x: nn.softmax(x, axis=-1),
    "identity": lambda x: x,
    None: lambda x: x,
    "": lambda x: x,
}


def get_act_fn(name: Optional[str]):
    """Activation registry (reference: sleap_nn/architectures/utils.py:8)."""
    if name not in _ACTS:
        raise KeyError(f"Unsupported activation: {name}")
    return _ACTS[name]


def max_pool_same(x: jnp.ndarray, stride: int = 2) -> jnp.ndarray:
    """2x2 max pool, stride 2, same padding (reference: common.py:8)."""
    return nn.max_pool(x, (2, 2), strides=(stride, stride), padding="SAME")


def bilinear_upsample(x: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """Bilinear 2x upsample with half-pixel centers (== torch align_corners=False)."""
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, h * factor, w * factor, c), method="bilinear")


class SimpleConvBlock(nn.Module):
    """Conv block: [pool] -> num_convs x (conv + act) -> [pool]."""

    filters: int
    num_convs: int = 2
    kernel_size: int = 3
    pool: bool = True
    pool_before_convs: bool = False
    pooling_stride: int = 2
    activation: str = "relu"
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        act = get_act_fn(self.activation)
        if self.pool and self.pool_before_convs:
            x = max_pool_same(x, self.pooling_stride)
        for i in range(self.num_convs):
            x = nn.Conv(
                self.filters,
                (self.kernel_size, self.kernel_size),
                padding="SAME",
                use_bias=self.use_bias,
                name=f"conv{i}",
            )(x)
            x = act(x)
        if self.pool and not self.pool_before_convs:
            x = max_pool_same(x, self.pooling_stride)
        return x


class StemBlock(nn.Module):
    """Initial downsampling stack run before the encoder (stride 2^stem_blocks... x2).

    Mirrors reference StemBlock (encoder_decoder.py:144): ``stem_blocks``
    conv blocks (block 0 unpooled, later blocks pool-before-convs) followed
    by a final 2x pool.
    """

    filters: int
    stem_blocks: int
    filters_rate: float
    convs_per_block: int = 2
    kernel_size: int = 7

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for block in range(self.stem_blocks):
            x = SimpleConvBlock(
                filters=int(self.filters * (self.filters_rate**block)),
                num_convs=self.convs_per_block,
                kernel_size=self.kernel_size,
                pool=block > 0,
                pool_before_convs=True,
                name=f"stem{block}",
            )(x)
        return max_pool_same(x)


class Encoder(nn.Module):
    """Downsampling feature stack; returns bottleneck + skip features.

    Skip features are the outputs of each conv block (pre-final-pool),
    returned deepest-first to pair with the decoder's up blocks.
    """

    filters: int
    down_blocks: int
    filters_rate: float
    convs_per_block: int = 2
    kernel_size: int = 3
    stem_blocks: int = 0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        features = []
        for block in range(self.down_blocks):
            x = SimpleConvBlock(
                filters=int(self.filters * (self.filters_rate ** (block + self.stem_blocks))),
                num_convs=self.convs_per_block,
                kernel_size=self.kernel_size,
                pool=(block + self.stem_blocks) > 0,
                pool_before_convs=True,
                name=f"enc{block}",
            )(x)
            features.append(x)
        x = max_pool_same(x)
        return x, features[::-1]


class SimpleUpsamplingBlock(nn.Module):
    """Upsample (bilinear or transposed conv) -> concat skip -> refine convs."""

    refine_convs_filters: int
    refine_convs: int = 2
    kernel_size: int = 3
    up_interpolate: bool = True
    transpose_convs_filters: Optional[int] = None
    feat_concat: bool = True
    trans_conv_phase: str = "torch"

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, feature: Optional[jnp.ndarray]
    ) -> jnp.ndarray:
        if self.up_interpolate:
            x = bilinear_upsample(x)
        else:
            # "torch" phase: explicit ((1,2),(1,2)) padding makes this layer
            # numerically identical (given a spatially-flipped kernel) to the
            # reference's ConvTranspose2d(k=3, s=2, padding=1, output_padding=1)
            # (reference: encoder_decoder.py:439-445), which is what the torch
            # checkpoint importer relies on. "tf" phase keeps flax's SAME
            # convention for legacy Keras (SLEAP v1) imports.
            padding = ((1, 2), (1, 2)) if self.trans_conv_phase == "torch" else "SAME"
            x = nn.ConvTranspose(
                self.transpose_convs_filters or self.refine_convs_filters,
                (self.kernel_size, self.kernel_size),
                strides=(2, 2),
                padding=padding,
                name="trans_conv",
            )(x)
            x = nn.relu(x)
        if feature is not None and self.feat_concat:
            if x.shape[1:3] != feature.shape[1:3]:
                x = jax.image.resize(
                    x,
                    (x.shape[0], feature.shape[1], feature.shape[2], x.shape[3]),
                    method="bilinear",
                )
            x = jnp.concatenate([feature, x], axis=-1)
        for i in range(self.refine_convs):
            x = nn.Conv(
                self.refine_convs_filters,
                (self.kernel_size, self.kernel_size),
                padding="SAME",
                name=f"refine_conv{i}",
            )(x)
            x = nn.relu(x)
        return x


def decoder_block_filters(
    filters: int,
    filters_rate: float,
    down_blocks: int,
    stem_blocks: int,
    block_contraction: bool,
    block: int,
) -> int:
    """Decoder refine-conv filter schedule (reference: Decoder.__init__)."""
    if block_contraction:
        return int(filters * (filters_rate ** (down_blocks + stem_blocks - 2 - block)))
    return int(filters * (filters_rate ** max(0, down_blocks + stem_blocks - 1 - block)))


class Decoder(nn.Module):
    """Upsampling stack emitting one feature map per stride level.

    ``stride_to_filters`` (static) maps output stride -> channel count, used
    to bind heads (reference: Decoder.stride_to_filters, model.py:157).
    """

    filters: int
    up_blocks: int
    down_blocks: int
    filters_rate: float
    current_stride: int
    stem_blocks: int = 0
    convs_per_block: int = 2
    kernel_size: int = 3
    up_interpolate: bool = True
    block_contraction: bool = False
    trans_conv_phase: str = "torch"

    def block_filters(self, block: int) -> int:
        return decoder_block_filters(
            self.filters,
            self.filters_rate,
            self.down_blocks,
            self.stem_blocks,
            self.block_contraction,
            block,
        )

    @property
    def strides(self) -> List[int]:
        s, out = self.current_stride, []
        for _ in range(self.up_blocks):
            s //= 2
            out.append(s)
        return out

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, features: Sequence[jnp.ndarray]
    ) -> dict:
        outputs = {"intermediate_feat": x, "outputs": [], "strides": self.strides}
        stride = self.current_stride
        for block in range(self.up_blocks):
            no_skip = self.stem_blocks > 0 and block >= self.down_blocks + self.stem_blocks
            feature = features[block] if (block < len(features) and not no_skip) else None
            x = SimpleUpsamplingBlock(
                refine_convs_filters=self.block_filters(block),
                refine_convs=1 if no_skip else self.convs_per_block,
                kernel_size=self.kernel_size,
                up_interpolate=self.up_interpolate,
                transpose_convs_filters=self.block_filters(block),
                feat_concat=not no_skip,
                trans_conv_phase=self.trans_conv_phase,
                name=f"dec{block}_s{stride}_to_s{stride // 2}",
            )(x, feature)
            stride //= 2
            outputs["outputs"].append(x)
        return outputs
