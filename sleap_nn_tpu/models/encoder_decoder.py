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
    """Conv block: [pool] -> num_convs x (conv + act) -> [pool].

    ``use_fused``: evaluate the two convs as ONE Pallas kernel with the
    inter-conv activation VMEM-resident (ops/fused_conv.py) — same param
    tree (``conv{i}/kernel|bias`` via `_ConvParams`), forward-only (the
    kernel has no VJP), so inference backends opt in while training keeps
    the differentiable flax path.
    """

    filters: int
    num_convs: int = 2
    kernel_size: int = 3
    pool: bool = True
    pool_before_convs: bool = False
    pooling_stride: int = 2
    activation: str = "relu"
    use_bias: bool = True
    use_fused: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        act = get_act_fn(self.activation)
        if self.pool and self.pool_before_convs:
            x = max_pool_same(x, self.pooling_stride)
        if (
            self.use_fused
            and self.num_convs == 2
            and self.kernel_size == 3
            and self.activation in ("relu", "identity")
        ):
            from sleap_nn_tpu.ops.fused_conv import fused_double_conv3x3

            k0, b0 = _ConvParams(
                features=self.filters, in_features=int(x.shape[-1]),
                kernel_size=3, use_bias=self.use_bias, name="conv0")()
            k1, b1 = _ConvParams(
                features=self.filters, in_features=self.filters,
                kernel_size=3, use_bias=self.use_bias, name="conv1")()
            x = fused_double_conv3x3(x, k0, b0, k1, b1,
                                     activation=self.activation)
        else:
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

    ``packed_levels``: evaluate the first N encoder levels in
    space-to-depth layout — exact math, same params, sidestepping the
    128-lane padding waste of narrow-channel megapixel activations (see
    ops/packed_conv.py). Level b runs on cells of pixel stride 2^(b+1);
    level-to-level pooling + repacking never materializes the pixel map
    (`packed_pool_s2d`). Pixel-space skips are still emitted for each
    packed level (XLA dead-code-eliminates them when the decoder consumes
    the PACKED skip instead — the third return value). Requires no stem
    and H/W divisible by 2^(packed_levels+1); silently reduces the packed
    depth otherwise.

    ``pack_min_res``: packed execution engages only when the INPUT
    resolution (min(H, W)) is at least this; below it packing switches
    off entirely. DCE-proof A/Bs on a v5e (medium_rf topdown) showed
    packing only pays at megapixel scale — XLA's own space-to-batch
    handling of narrow convs wins below it (os4 @384px B=128: 3,690 f/s
    unpacked vs 2,075 packed-2; @512px B=64: 1,634 vs 1,249) — while at
    1024px the full allowed depth wins (2026-08-21, os2 B=32: 179.6
    unpacked / 209.1 depth-1 / 217.4 depth-2 / 215.3 depth-3; the
    depth-2 step is the packed skip reaching the decoder's finest level,
    engaging the packed up-block + head). Trace-time shape logic only —
    the param tree is identical either way, so one checkpoint serves all
    input sizes. Tests that exercise packed numerics at fixture scale
    override this to 1.
    """

    filters: int
    down_blocks: int
    filters_rate: float
    convs_per_block: int = 2
    kernel_size: int = 3
    stem_blocks: int = 0
    packed_levels: int = 0
    pack_min_res: int = 1024
    use_fused: bool = False

    @nn.compact
    def __call__(
        self, x: jnp.ndarray
    ) -> Tuple[jnp.ndarray, List[jnp.ndarray], List[Optional[jnp.ndarray]]]:
        from sleap_nn_tpu.ops.packed_conv import (
            depth_to_space,
            packed_phase_max_pool,
            packed_pool_s2d,
            space_to_depth,
        )

        n_packed = min(self.packed_levels, self.down_blocks - 1)
        if self.stem_blocks > 0:
            n_packed = 0
        while n_packed > 0 and (
            x.shape[1] % (2 ** (n_packed + 1)) != 0
            or x.shape[2] % (2 ** (n_packed + 1)) != 0
        ):
            n_packed -= 1
        # Resolution gate (see class docstring): packed execution pays only
        # on megapixel INPUTS — below pack_min_res XLA's native narrow-conv
        # handling wins, so packing switches off entirely. Above the gate,
        # pack the full allowed depth: the r5 DCE-proof A/B (medium_rf
        # topdown @1024 os2 B=32, v5e) measured 179.6 f/s unpacked, 209.1
        # at depth 1, 217.4 at depth 2 — the depth-2 win comes from the
        # packed skip reaching the decoder's finest level, which engages
        # the packed up-block + packed head and removes the full-res
        # concat layout copies (depth 3: 215.3, past the sweet spot).
        if n_packed > 0 and min(x.shape[1], x.shape[2]) < self.pack_min_res:
            n_packed = 0

        features: List[jnp.ndarray] = []
        packed_features: List[Optional[jnp.ndarray]] = [None] * self.down_blocks
        if n_packed > 0:
            xp = space_to_depth(x)
            c_in = int(x.shape[-1])
            for b in range(n_packed):
                f_b = int(self.filters * (self.filters_rate ** b))
                xp = PackedConvBlock(
                    filters=f_b,
                    in_features=c_in,
                    num_convs=self.convs_per_block,
                    kernel_size=self.kernel_size,
                    name=f"enc{b}",
                )(xp)
                # Pixel-space skip (dead code when the decoder takes the
                # packed skip or never lifts to this stride).
                features.append(depth_to_space(xp))
                packed_features[b] = xp
                if b + 1 < n_packed:
                    xp = packed_pool_s2d(xp)  # next level's pooled, packed
                    c_in = f_b
            # First unpacked block's pool-before, computed in packed space;
            # that block is then built WITHOUT its pool (pool has no
            # params, so the param tree is unchanged).
            x = packed_phase_max_pool(xp)
        for block in range(n_packed, self.down_blocks):
            x = SimpleConvBlock(
                filters=int(self.filters * (self.filters_rate ** (block + self.stem_blocks))),
                num_convs=self.convs_per_block,
                kernel_size=self.kernel_size,
                pool=(block + self.stem_blocks) > 0
                and not (n_packed > 0 and block == n_packed),
                pool_before_convs=True,
                use_fused=self.use_fused,
                name=f"enc{block}",
            )(x)
            features.append(x)
        x = max_pool_same(x)
        return x, features[::-1], packed_features[::-1]


class SimpleUpsamplingBlock(nn.Module):
    """Upsample (bilinear or transposed conv) -> concat skip -> refine convs."""

    refine_convs_filters: int
    refine_convs: int = 2
    kernel_size: int = 3
    up_interpolate: bool = True
    transpose_convs_filters: Optional[int] = None
    feat_concat: bool = True
    trans_conv_phase: str = "torch"
    use_fused: bool = False

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
        if self.use_fused and self.refine_convs == 2 and self.kernel_size == 3:
            from sleap_nn_tpu.ops.fused_conv import fused_double_conv3x3

            k0, b0 = _ConvParams(
                features=self.refine_convs_filters,
                in_features=int(x.shape[-1]), kernel_size=3,
                name="refine_conv0")()
            k1, b1 = _ConvParams(
                features=self.refine_convs_filters,
                in_features=self.refine_convs_filters, kernel_size=3,
                name="refine_conv1")()
            return fused_double_conv3x3(x, k0, b0, k1, b1, activation="relu")
        for i in range(self.refine_convs):
            x = nn.Conv(
                self.refine_convs_filters,
                (self.kernel_size, self.kernel_size),
                padding="SAME",
                name=f"refine_conv{i}",
            )(x)
            x = nn.relu(x)
        return x


class PackedUpsamplingBlock(nn.Module):
    """`SimpleUpsamplingBlock` (bilinear up + concat skip + refine convs)
    evaluated in space-to-depth layout.

    TPU layout optimization (see ops/packed_conv.py): parameters are
    IDENTICAL to the plain block (``refine_conv{i}/kernel|bias``); the
    bilinear-upsample + first refine conv collapse into ONE conv on the
    pre-upsample feature (`packed_upsample_conv`, exact incl. borders),
    the skip contribution is a packed conv of the PACKED skip, and the
    concat never exists — so none of the sub-128-channel full-resolution
    tensors (upsampled x, concat, refine outputs) ever hit HBM at the
    128-lane-padded full size. Output is the packed (B, H/2, W/2, 4C)
    form of the pixel-space block output. k=3, bilinear-up, with-skip
    only (the caller gates).
    """

    refine_convs_filters: int
    skip_channels: int  # per-phase channels of the packed skip
    refine_convs: int = 2
    kernel_size: int = 3
    in_channels: int = 0  # channels of the pre-upsample input x

    @nn.compact
    def __call__(self, x: jnp.ndarray, skip_packed: jnp.ndarray) -> jnp.ndarray:
        from sleap_nn_tpu.ops.packed_conv import (
            pack_conv_bias,
            packed_conv,
            packed_upsample_conv,
        )

        cin = self.skip_channels + int(x.shape[-1])
        k0, b0 = _ConvParams(
            features=self.refine_convs_filters,
            in_features=cin,
            kernel_size=self.kernel_size,
            name="refine_conv0",
        )()
        # concat order is [skip, upsampled-x] (SimpleUpsamplingBlock), so
        # the leading skip_channels of the kernel act on the skip.
        w_skip = k0[:, :, : self.skip_channels, :]
        w_up = k0[:, :, self.skip_channels :, :]
        y = packed_upsample_conv(x, w_up) + packed_conv(skip_packed, w_skip)
        y = nn.relu(y + pack_conv_bias(b0).astype(y.dtype))
        c = self.refine_convs_filters
        for i in range(1, self.refine_convs):
            ki, bi = _ConvParams(
                features=self.refine_convs_filters,
                in_features=c,
                kernel_size=self.kernel_size,
                name=f"refine_conv{i}",
            )()
            y = nn.relu(packed_conv(y, ki, bi))
        return y


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
    use_fused: bool = False

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
        self,
        x: jnp.ndarray,
        features: Sequence[jnp.ndarray],
        packed_features: Optional[Sequence[Optional[jnp.ndarray]]] = None,
    ) -> dict:
        from sleap_nn_tpu.ops.packed_conv import depth_to_space

        outputs = {
            "intermediate_feat": x,
            "outputs": [],
            "strides": self.strides,
            "packed_outputs": {},
        }
        stride = self.current_stride
        for block in range(self.up_blocks):
            no_skip = self.stem_blocks > 0 and block >= self.down_blocks + self.stem_blocks
            feature = features[block] if (block < len(features) and not no_skip) else None
            packed_skip = (
                packed_features[block]
                if (packed_features is not None and block < len(packed_features) and not no_skip)
                else None
            )
            name = f"dec{block}_s{stride}_to_s{stride // 2}"
            if (
                packed_skip is not None
                and self.up_interpolate
                and self.kernel_size == 3
                and x.shape[1] == packed_skip.shape[1]
                and x.shape[2] == packed_skip.shape[2]
            ):
                y_packed = PackedUpsamplingBlock(
                    refine_convs_filters=self.block_filters(block),
                    skip_channels=int(packed_skip.shape[-1]) // 4,
                    refine_convs=self.convs_per_block,
                    kernel_size=self.kernel_size,
                    name=name,
                )(x, packed_skip)
                # Pixel-space view for plain consumers; DCE'd when the
                # head runs on the packed tensor instead.
                x = depth_to_space(y_packed)
                outputs["packed_outputs"][stride // 2] = y_packed
            else:
                x = SimpleUpsamplingBlock(
                    refine_convs_filters=self.block_filters(block),
                    refine_convs=1 if no_skip else self.convs_per_block,
                    kernel_size=self.kernel_size,
                    up_interpolate=self.up_interpolate,
                    transpose_convs_filters=self.block_filters(block),
                    feat_concat=not no_skip,
                    trans_conv_phase=self.trans_conv_phase,
                    use_fused=self.use_fused,
                    name=name,
                )(x, feature)
            stride //= 2
            outputs["outputs"].append(x)
        return outputs
