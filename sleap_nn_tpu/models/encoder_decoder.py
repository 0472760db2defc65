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


class _ConvParams(nn.Module):
    """Parameter holder that mirrors ``nn.Conv``'s param tree exactly.

    Declares ``kernel``/``bias`` with the same names, shapes, and
    initializers as ``nn.Conv(features, (k, k))`` so a module can swap
    between the standard conv and a custom evaluation (the space-to-depth
    packed path) without changing checkpoints or fresh-init values.
    """

    features: int
    in_features: int
    kernel_size: int
    use_bias: bool = True

    @nn.compact
    def __call__(self) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        k = self.kernel_size
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (k, k, self.in_features, self.features),
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,))
            if self.use_bias
            else None
        )
        return kernel, bias


class PackedConvBlock(nn.Module):
    """``SimpleConvBlock(pool=False)`` evaluated in space-to-depth layout.

    TPU-only optimization for narrow-channel stride-1 levels (see
    ops/packed_conv.py): parameters are IDENTICAL to the plain block
    (``conv{i}/kernel|bias``), the math is exact, only the layout differs —
    input/output are packed ``(B, H/2, W/2, 4C)`` tensors so the level's
    activations never hit HBM at the lane-padded full resolution.
    """

    filters: int
    in_features: int
    num_convs: int = 2
    kernel_size: int = 3
    activation: str = "relu"
    use_bias: bool = True

    @nn.compact
    def __call__(self, x_packed: jnp.ndarray) -> jnp.ndarray:
        from sleap_nn_tpu.ops.packed_conv import packed_conv

        act = get_act_fn(self.activation)
        cin = self.in_features
        for i in range(self.num_convs):
            kernel, bias = _ConvParams(
                features=self.filters,
                in_features=cin,
                kernel_size=self.kernel_size,
                use_bias=self.use_bias,
                name=f"conv{i}",
            )()
            x_packed = act(packed_conv(x_packed, kernel, bias))
            cin = self.filters
        return x_packed


class Encoder(nn.Module):
    """Downsampling feature stack; returns bottleneck + skip features.

    Skip features are the outputs of each conv block (pre-final-pool),
    returned deepest-first to pair with the decoder's up blocks.

    ``packed_level0``: evaluate the first (stride-1, un-pooled) block in
    space-to-depth layout — exact math, same params, ~4x less HBM traffic
    on lane-padding-bound narrow models (see ops/packed_conv.py). The
    pixel-space skip feature is still emitted (XLA dead-code-eliminates it
    when the decoder doesn't consume the stride-1 skip, i.e. whenever
    output_stride >= 2). Requires even H/W and no stem; silently falls back
    to the plain path otherwise.
    """

    filters: int
    down_blocks: int
    filters_rate: float
    convs_per_block: int = 2
    kernel_size: int = 3
    stem_blocks: int = 0
    packed_level0: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        from sleap_nn_tpu.ops.packed_conv import (
            depth_to_space,
            packed_phase_max_pool,
            space_to_depth,
        )

        features = []
        use_packed = (
            self.packed_level0
            and self.stem_blocks == 0
            and self.down_blocks >= 2
            and x.shape[1] % 2 == 0
            and x.shape[2] % 2 == 0
        )
        for block in range(self.down_blocks):
            if block == 0 and use_packed:
                xp = PackedConvBlock(
                    filters=int(self.filters),
                    in_features=int(x.shape[-1]),
                    num_convs=self.convs_per_block,
                    kernel_size=self.kernel_size,
                    name="enc0",
                )(space_to_depth(x))
                # Pixel-space skip (dead code unless the decoder lifts all
                # the way back to stride 1).
                features.append(depth_to_space(xp))
                # Block 1's pool-before, computed in packed space; block 1
                # is then built WITHOUT its pool (pool has no params, so
                # the param tree is unchanged).
                x = packed_phase_max_pool(xp)
                continue
            x = SimpleConvBlock(
                filters=int(self.filters * (self.filters_rate ** (block + self.stem_blocks))),
                num_convs=self.convs_per_block,
                kernel_size=self.kernel_size,
                pool=(block + self.stem_blocks) > 0 and not (block == 1 and use_packed),
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
