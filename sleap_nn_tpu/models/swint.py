"""Swin Transformer encoder + SLEAP decoder backbone (flax, NHWC).

Parity target: reference sleap_nn/architectures/swint.py:41-400 — same
geometry (patch embed k=patch_size s=stem_patch_stride, 4 stages of shifted
-window attention with patch merging, extra 2x pool before middle blocks,
skips at [patch_embed, merge0, merge1, merge2]) with the SLEAP decoder.
Swin runs natively channel-last, which maps directly onto NHWC TPU layout.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from sleap_nn_tpu.models.encoder_decoder import (
    Decoder,
    SimpleConvBlock,
    decoder_block_filters,
    max_pool_same,
)

ARCHS = {
    "tiny": {"embed": 96, "depths": [2, 2, 6, 2], "num_heads": [3, 6, 12, 24]},
    "small": {"embed": 96, "depths": [2, 2, 18, 2], "num_heads": [3, 6, 12, 24]},
    "base": {"embed": 128, "depths": [2, 2, 18, 2], "num_heads": [4, 8, 16, 32]},
}


def _rel_position_index(wh: int, ww: int) -> np.ndarray:
    """Relative position index table for a (wh, ww) window."""
    coords = np.stack(np.meshgrid(np.arange(wh), np.arange(ww), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # (2, N, N)
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    return rel.sum(-1)  # (N, N)


class WindowAttention(nn.Module):
    """Multi-head self-attention inside (shifted) windows with rel-pos bias."""

    dim: int
    num_heads: int
    window_size: int
    shift: int = 0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        ws = self.window_size
        shift = self.shift if min(h, w) > ws else 0
        pad_h = (ws - h % ws) % ws
        pad_w = (ws - w % ws) % ws
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        hp, wp = h + pad_h, w + pad_w

        if shift:
            x = jnp.roll(x, shift=(-shift, -shift), axis=(1, 2))

        # Partition into windows: (B*nW, ws*ws, C)
        nh, nw = hp // ws, wp // ws
        xw = x.reshape(b, nh, ws, nw, ws, c).transpose(0, 1, 3, 2, 4, 5)
        xw = xw.reshape(b * nh * nw, ws * ws, c)

        qkv = nn.Dense(3 * c, name="qkv")(xw)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        heads = self.num_heads
        hd = c // heads

        def split_heads(t):
            return t.reshape(t.shape[0], t.shape[1], heads, hd).transpose(0, 2, 1, 3)

        q, k, v = map(split_heads, (q, k, v))
        attn = (q @ k.transpose(0, 1, 3, 2)) / math.sqrt(hd)

        # Relative position bias.
        table = self.param(
            "rel_pos_bias",
            nn.initializers.truncated_normal(0.02),
            ((2 * ws - 1) * (2 * ws - 1), heads),
        )
        index = jnp.asarray(_rel_position_index(ws, ws))
        bias = table[index.reshape(-1)].reshape(ws * ws, ws * ws, heads)
        attn = attn + bias.transpose(2, 0, 1)[None]

        if shift:
            # Mask cross-boundary attention in shifted windows.
            img_mask = np.zeros((hp, wp))
            cnt = 0
            for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
                for wslice in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
                    img_mask[hs, wslice] = cnt
                    cnt += 1
            mask = img_mask.reshape(nh, ws, nw, ws).transpose(0, 2, 1, 3).reshape(
                nh * nw, ws * ws
            )
            attn_mask = (mask[:, None, :] != mask[:, :, None]) * -100.0
            attn_mask = jnp.asarray(attn_mask, dtype=attn.dtype)
            attn = attn.reshape(b, nh * nw, heads, ws * ws, ws * ws)
            attn = attn + attn_mask[None, :, None]
            attn = attn.reshape(b * nh * nw, heads, ws * ws, ws * ws)

        attn = nn.softmax(attn, axis=-1)
        out = (attn @ v).transpose(0, 2, 1, 3).reshape(b * nh * nw, ws * ws, c)
        out = nn.Dense(c, name="proj")(out)

        # Un-window.
        out = out.reshape(b, nh, nw, ws, ws, c).transpose(0, 1, 3, 2, 4, 5)
        out = out.reshape(b, hp, wp, c)
        if shift:
            out = jnp.roll(out, shift=(shift, shift), axis=(1, 2))
        return out[:, :h, :w, :]


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    shift: int = 0
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = x + WindowAttention(
            self.dim, self.num_heads, self.window_size, self.shift, name="attn"
        )(nn.LayerNorm(epsilon=1e-5, name="norm1")(x))
        y = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        y = nn.Dense(int(self.dim * self.mlp_ratio), name="mlp1")(y)
        y = nn.gelu(y)
        y = nn.Dense(self.dim, name="mlp2")(y)
        return x + y


class PatchMerging(nn.Module):
    """2x2 neighborhood concat -> LN -> Dense(2C) (torchvision semantics)."""

    dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        pad_h, pad_w = h % 2, w % 2
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        x0 = x[:, 0::2, 0::2, :]
        x1 = x[:, 1::2, 0::2, :]
        x2 = x[:, 0::2, 1::2, :]
        x3 = x[:, 1::2, 1::2, :]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        return nn.Dense(2 * self.dim, use_bias=False, name="reduction")(x)


class SwinTransformerEncoder(nn.Module):
    """Swin encoder returning per-layer features (reference: swint.py:41)."""

    embed_dim: int = 96
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    patch_size: int = 4
    stem_stride: int = 2
    window_size: int = 7

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        feats = []
        x = nn.Conv(
            self.embed_dim,
            (self.patch_size, self.patch_size),
            strides=(self.stem_stride, self.stem_stride),
            padding=[(1, 1), (1, 1)],
            name="patch_embed",
        )(x)
        x = nn.LayerNorm(epsilon=1e-5, name="patch_norm")(x)
        feats.append(x)

        for i, depth in enumerate(self.depths):
            dim = self.embed_dim * (2**i)
            for b in range(depth):
                x = SwinBlock(
                    dim,
                    self.num_heads[i],
                    self.window_size,
                    shift=0 if b % 2 == 0 else self.window_size // 2,
                    name=f"stage{i}_block{b}",
                )(x)
            if i == len(self.depths) - 1:
                x = nn.LayerNorm(epsilon=1e-5, name="final_norm")(x)
            feats.append(x)
            if i < len(self.depths) - 1:
                x = PatchMerging(dim, name=f"merge{i}")(x)
                feats.append(x)
        return feats


class SwinTWrapper(nn.Module):
    """Swin encoder + SLEAP decoder (reference: SwinTWrapper :166)."""

    model_type: str = "tiny"
    arch: Optional[Tuple[int, Tuple[int, ...], Tuple[int, ...]]] = None
    patch_size: int = 4
    stem_patch_stride: int = 2
    window_size: int = 7
    kernel_size: int = 3
    filters_rate: float = 2.0
    convs_per_block: int = 2
    up_interpolate: bool = True
    output_stride_cfg: int = 1
    block_contraction: bool = False

    def _arch(self) -> Dict:
        if self.arch is not None:
            return {
                "embed": self.arch[0],
                "depths": list(self.arch[1]),
                "num_heads": list(self.arch[2]),
            }
        return ARCHS[self.model_type]

    @property
    def channels(self) -> List[int]:
        a = self._arch()
        return [a["embed"] * (2**i) for i in range(len(a["depths"]))]

    @property
    def max_stride(self) -> int:
        return self.stem_patch_stride * (2**3) * 2

    @property
    def down_blocks(self) -> int:
        return len(self._arch()["depths"]) - 1

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
        return int(self.channels[-1] * self.filters_rate)

    def _decoder_in_channels(self) -> int:
        return (
            int(self.channels[-1])
            if self.block_contraction
            else int(self.channels[-1] * self.filters_rate)
        )

    @property
    def stride_to_filters(self) -> Dict[int, int]:
        filters = self.channels[0]
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
    def from_config(cls, config) -> "SwinTWrapper":
        arch = getattr(config, "arch", None)
        if isinstance(arch, dict):
            if len(arch["depths"]) != 4:
                # The decoder skip schedule and the configured max_stride both
                # assume the standard 4-stage layout; a different stage count
                # would silently shift every claimed output stride.
                raise ValueError(
                    f"swint arch must have 4 stages, got "
                    f"{len(arch['depths'])} (depths={arch['depths']})."
                )
            arch = (arch["embed"], tuple(arch["depths"]), tuple(arch["num_heads"]))
        return cls(
            model_type=getattr(config, "model_type", "tiny"),
            arch=arch,
            patch_size=config.patch_size,
            stem_patch_stride=config.stem_patch_stride,
            window_size=config.window_size,
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
        feats = SwinTransformerEncoder(
            embed_dim=arch["embed"],
            depths=tuple(arch["depths"]),
            num_heads=tuple(arch["num_heads"]),
            patch_size=self.patch_size,
            stem_stride=self.stem_patch_stride,
            window_size=self.window_size,
            name="enc",
        )(x)
        skips = feats[::2][::-1]
        x = feats[-1]
        x = max_pool_same(x)

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
            filters=self.channels[0],
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
