"""Transformer pretrained-backbone encoders: Swinv2 (hierarchical) and
ViT/DINOv2 (isotropic), HF-weight-compatible, NHWC flax.

Parity targets: reference sleap_nn/architectures/pretrained.py wraps
HuggingFace ``AutoBackbone`` — Swinv2 feeds the SLEAP decoder ("Case A"),
isotropic ViTs resolve to encoder-only mode ("Case B",
reference pretrained.py:100-140,409). This module reimplements the exact
HF forward math in flax so the weight importer reproduces
``transformers`` outputs numerically (verified in
tests/models/test_pretrained_transformers.py):

- Swinv2: scaled-cosine window attention with a per-head learned
  ``logit_scale``, continuous log-spaced relative position bias from a
  2-layer MLP, res-post-norm blocks, shifted windows with the attention
  mask added TWICE (an HF quirk kept for bit-parity — mask values are
  0/-100 so the softmax effect is identical), end-of-stage patch merging,
  and before-downsample feature taps.
- DINOv2/ViT: CLS (+register) tokens, bicubic position-embedding
  interpolation, pre-norm blocks (DINOv2 adds LayerScale), final
  LayerNorm, tokens stripped and reshaped to an NHWC map.

TPU notes: everything is static-shape under jit (window partition uses
trace-time H/W; attention masks are numpy constants), channel-last
throughout, and window attention batches as one big matmul over
``(B*num_windows, tokens, C)`` — MXU-friendly with no gathers in the hot
path (the relative-bias gather is over a small static table).
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


# ── Swinv2 ────────────────────────────────────────────────────────────────────


def _swin_relative_coords_table(window: int, pretrained_window: int) -> np.ndarray:
    """Log-spaced continuous relative coords, (1, 2W-1, 2W-1, 2) float32."""
    rh = np.arange(-(window - 1), window, dtype=np.float32)
    rw = np.arange(-(window - 1), window, dtype=np.float32)
    table = np.stack(np.meshgrid(rh, rw, indexing="ij"), axis=-1)[None]
    denom = (pretrained_window - 1) if pretrained_window > 0 else (window - 1)
    if denom > 0:
        table = table / denom
    table *= 8.0
    table = np.sign(table) * np.log2(np.abs(table) + 1.0) / math.log2(8)
    return table.astype(np.float32)


def _swin_relative_position_index(window: int) -> np.ndarray:
    """(W², W²) indices into the flattened (2W-1)² bias table."""
    coords = np.stack(
        np.meshgrid(np.arange(window), np.arange(window), indexing="ij")
    ).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += window - 1
    rel[:, :, 1] += window - 1
    rel[:, :, 0] *= 2 * window - 1
    return rel.sum(-1)


def _swin_attn_mask(h_pad: int, w_pad: int, window: int, shift: int) -> Optional[np.ndarray]:
    """(num_windows, W², W²) additive mask with 0 / -100 entries."""
    if shift <= 0:
        return None
    img = np.zeros((h_pad, w_pad), np.float32)
    slices = (slice(0, -window), slice(-window, -shift), slice(-shift, None))
    count = 0
    for hs in slices:
        for ws in slices:
            img[hs, ws] = count
            count += 1
    win = img.reshape(h_pad // window, window, w_pad // window, window)
    win = win.transpose(0, 2, 1, 3).reshape(-1, window * window)
    mask = win[:, None, :] - win[:, :, None]
    return np.where(mask != 0, -100.0, 0.0).astype(np.float32)


class Swinv2WindowAttention(nn.Module):
    """Scaled-cosine window attention with continuous relative bias."""

    dim: int
    num_heads: int
    window: int
    qkv_bias: bool = True
    pretrained_window: int = 0

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[np.ndarray]) -> jnp.ndarray:
        bnw, n, c = x.shape
        h = self.num_heads
        hd = c // h
        q = nn.Dense(c, use_bias=self.qkv_bias, name="query")(x)
        k = nn.Dense(c, use_bias=False, name="key")(x)
        v = nn.Dense(c, use_bias=self.qkv_bias, name="value")(x)
        q = q.reshape(bnw, n, h, hd).transpose(0, 2, 1, 3)
        k = k.reshape(bnw, n, h, hd).transpose(0, 2, 1, 3)
        v = v.reshape(bnw, n, h, hd).transpose(0, 2, 1, 3)
        # cosine attention (torch F.normalize eps=1e-12)
        q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
        k = k / jnp.maximum(jnp.linalg.norm(k, axis=-1, keepdims=True), 1e-12)
        attn = q @ k.transpose(0, 1, 3, 2)
        logit_scale = self.param(
            "logit_scale",
            lambda key, shape: jnp.full(shape, math.log(10.0), jnp.float32),
            (h, 1, 1),
        )
        attn = attn * jnp.exp(jnp.minimum(logit_scale, math.log(1.0 / 0.01)))
        # continuous position bias: tiny MLP over the static coords table
        table = jnp.asarray(
            _swin_relative_coords_table(self.window, self.pretrained_window)
        )
        cpb = nn.Dense(512, name="cpb_fc1")(table)
        cpb = nn.relu(cpb)
        cpb = nn.Dense(h, use_bias=False, name="cpb_fc2")(cpb)
        cpb = cpb.reshape(-1, h)
        idx = _swin_relative_position_index(self.window).reshape(-1)
        bias = cpb[idx].reshape(n, n, h).transpose(2, 0, 1)
        bias = 16.0 * jax.nn.sigmoid(bias)
        attn = attn + bias[None]
        if mask is not None:
            nw = mask.shape[0]
            m = jnp.asarray(mask)
            attn = attn.reshape(bnw // nw, nw, h, n, n)
            # HF adds the mask twice (modeling_swinv2.py Swinv2SelfAttention
            # forward); values are 0/-100 so softmax is unaffected, but we
            # reproduce it for numerical bit-parity with the importer tests.
            attn = attn + 2.0 * m[None, :, None]
            attn = attn.reshape(bnw, h, n, n)
        attn = jax.nn.softmax(attn, axis=-1)
        out = (attn @ v).transpose(0, 2, 1, 3).reshape(bnw, n, c)
        return nn.Dense(c, name="proj")(out)


class Swinv2Block(nn.Module):
    """Res-post-norm Swinv2 block (HF Swinv2Layer)."""

    dim: int
    num_heads: int
    input_resolution: Tuple[int, int]
    target_window: int
    shift: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    eps: float = 1e-5
    pretrained_window: int = 0

    @nn.compact
    def __call__(self, x: jnp.ndarray, hw: Tuple[int, int]) -> jnp.ndarray:
        h, w = hw
        b, _, c = x.shape
        # Window capped by the config's static input resolution (HF
        # _compute_window_shift uses init-time resolution, not runtime).
        window = min(self.target_window, *self.input_resolution)
        shift = 0 if min(self.input_resolution) <= window else self.shift

        shortcut = x
        x = x.reshape(b, h, w, c)
        pad_h = (-h) % window
        pad_w = (-w) % window
        if pad_h or pad_w:
            x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        hp, wp = h + pad_h, w + pad_w
        if shift > 0:
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
        x = x.reshape(b, hp // window, window, wp // window, window, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window * window, c)
        mask = _swin_attn_mask(hp, wp, window, shift)
        x = Swinv2WindowAttention(
            self.dim, self.num_heads, window, self.qkv_bias,
            self.pretrained_window, name="attn",
        )(x, mask)
        x = x.reshape(b, hp // window, wp // window, window, window, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, c)
        if shift > 0:
            x = jnp.roll(x, (shift, shift), axis=(1, 2))
        if pad_h or pad_w:
            x = x[:, :h, :w]
        x = x.reshape(b, h * w, c)
        x = shortcut + nn.LayerNorm(epsilon=self.eps, name="norm1")(x)

        y = nn.Dense(int(self.dim * self.mlp_ratio), name="mlp_fc1")(x)
        y = jax.nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, name="mlp_fc2")(y)
        return x + nn.LayerNorm(epsilon=self.eps, name="norm2")(y)


class Swinv2PatchMerging(nn.Module):
    dim: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray, hw: Tuple[int, int]) -> jnp.ndarray:
        h, w = hw
        b, _, c = x.shape
        x = x.reshape(b, h, w, c)
        if h % 2 or w % 2:
            x = jnp.pad(x, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)))
        x = jnp.concatenate(
            [x[:, 0::2, 0::2], x[:, 1::2, 0::2], x[:, 0::2, 1::2], x[:, 1::2, 1::2]],
            axis=-1,
        )
        x = x.reshape(b, -1, 4 * c)
        x = nn.Dense(2 * self.dim, use_bias=False, name="reduction")(x)
        return nn.LayerNorm(epsilon=self.eps, name="norm")(x)


class Swinv2Encoder(nn.Module):
    """HF-compatible Swinv2 backbone returning the 4-stage pyramid.

    Feature taps are the BEFORE-downsample maps of each stage (HF
    Swinv2Backbone with out_features=stage1..4 — no extra norms).
    """

    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 7
    patch_size: int = 4
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    layer_norm_eps: float = 1e-5
    image_size: int = 224
    pretrained_window_sizes: Sequence[int] = (0, 0, 0, 0)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        b = x.shape[0]
        pad_h = (-x.shape[1]) % self.patch_size
        pad_w = (-x.shape[2]) % self.patch_size
        if pad_h or pad_w:
            x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        x = nn.Conv(
            self.embed_dim, (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size), name="patch_embed",
        )(x)
        h, w = x.shape[1], x.shape[2]
        x = x.reshape(b, h * w, self.embed_dim)
        x = nn.LayerNorm(epsilon=self.layer_norm_eps, name="embed_norm")(x)

        grid = self.image_size // self.patch_size
        feats = []
        dim = self.embed_dim
        for s, depth in enumerate(self.depths):
            res = (max(grid // (2 ** s), 1),) * 2  # static config resolution
            for i in range(depth):
                x = Swinv2Block(
                    dim=dim,
                    num_heads=self.num_heads[s],
                    input_resolution=res,
                    target_window=self.window_size,
                    shift=0 if i % 2 == 0 else self.window_size // 2,
                    mlp_ratio=self.mlp_ratio,
                    qkv_bias=self.qkv_bias,
                    eps=self.layer_norm_eps,
                    pretrained_window=self.pretrained_window_sizes[s]
                    if s < len(self.pretrained_window_sizes) else 0,
                    name=f"stage{s}_block{i}",
                )(x, (h, w))
            feats.append(x.reshape(b, h, w, dim))
            if s < len(self.depths) - 1:
                x = Swinv2PatchMerging(
                    dim, eps=self.layer_norm_eps, name=f"stage{s}_downsample"
                )(x, (h, w))
                h, w = (h + 1) // 2, (w + 1) // 2
                dim *= 2
        return feats


# ── ViT / DINOv2 (isotropic) ──────────────────────────────────────────────────


def _torch_bicubic_matrix(n_in: int, n_out: int) -> np.ndarray:
    """Interpolation weights replicating torch ``interpolate(mode='bicubic',
    align_corners=False)`` — cubic convolution with a=-0.75, half-pixel
    centers, border taps clamped. jax.image.resize's 'cubic' uses a=-0.5
    (Catmull-Rom), which would break numeric parity with HF pos-embed
    interpolation."""
    a = -0.75

    def kern(t: float) -> float:
        t = abs(t)
        if t <= 1.0:
            return (a + 2) * t ** 3 - (a + 3) * t ** 2 + 1
        if t < 2.0:
            return a * t ** 3 - 5 * a * t ** 2 + 8 * a * t - 4 * a
        return 0.0

    w = np.zeros((n_out, n_in), np.float32)
    scale = n_in / n_out
    for i in range(n_out):
        x = (i + 0.5) * scale - 0.5
        x0 = math.floor(x)
        for m_ in range(-1, 3):
            idx = min(max(x0 + m_, 0), n_in - 1)
            w[i, idx] += kern(x - (x0 + m_))
    return w


class ViTSelfAttention(nn.Module):
    dim: int
    num_heads: int
    qkv_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, n, c = x.shape
        h = self.num_heads
        hd = c // h
        q = nn.Dense(c, use_bias=self.qkv_bias, name="query")(x)
        k = nn.Dense(c, use_bias=self.qkv_bias, name="key")(x)
        v = nn.Dense(c, use_bias=self.qkv_bias, name="value")(x)
        q = q.reshape(b, n, h, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, n, h, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, n, h, hd).transpose(0, 2, 1, 3)
        attn = jax.nn.softmax(q @ k.transpose(0, 1, 3, 2) / math.sqrt(hd), axis=-1)
        out = (attn @ v).transpose(0, 2, 1, 3).reshape(b, n, c)
        return nn.Dense(c, name="proj")(out)


class ViTBlock(nn.Module):
    """Pre-norm transformer block; DINOv2 style adds LayerScale."""

    dim: int
    num_heads: int
    intermediate: int
    use_layerscale: bool = False
    use_swiglu: bool = False
    qkv_bias: bool = True
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = nn.LayerNorm(epsilon=self.eps, name="norm1")(x)
        y = ViTSelfAttention(self.dim, self.num_heads, self.qkv_bias, name="attn")(y)
        if self.use_layerscale:
            y = y * self.param("ls1", nn.initializers.ones, (self.dim,))
        x = x + y
        y = nn.LayerNorm(epsilon=self.eps, name="norm2")(x)
        if self.use_swiglu:
            # DINOv2-giant SwiGLU FFN (weights_in emits both halves).
            hidden = (int(self.dim * 4) * 2 // 3 + 7) // 8 * 8
            wio = nn.Dense(2 * hidden, name="swiglu_in")(y)
            x1, x2 = jnp.split(wio, 2, axis=-1)
            y = nn.Dense(self.dim, name="swiglu_out")(jax.nn.silu(x1) * x2)
        else:
            y = nn.Dense(self.intermediate, name="mlp_fc1")(y)
            y = jax.nn.gelu(y, approximate=False)
            y = nn.Dense(self.dim, name="mlp_fc2")(y)
        if self.use_layerscale:
            y = y * self.param("ls2", nn.initializers.ones, (self.dim,))
        return x + y


class ViTEncoder(nn.Module):
    """Isotropic ViT/DINOv2 encoder returning ONE spatial bottleneck map.

    Output: a single ``(B, H/p, W/p, C)`` feature (CLS/register tokens
    stripped, final LayerNorm applied) — the reference's Case-B contract
    (AutoBackbone(out_indices=(-1,), reshape_hidden_states=True,
    apply_layernorm=True), reference pretrained.py:208-215).
    """

    hidden_size: int = 384
    num_layers: int = 12
    num_heads: int = 6
    intermediate_size: int = 1536
    patch_size: int = 14
    image_size: int = 518
    num_register_tokens: int = 0
    use_layerscale: bool = True  # DINOv2; plain ViT sets False
    use_swiglu: bool = False
    qkv_bias: bool = True
    layer_norm_eps: float = 1e-6

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        b, h, w, _ = x.shape
        x = nn.Conv(
            self.hidden_size, (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size), padding="VALID",
            name="patch_embed",
        )(x)
        gh, gw = x.shape[1], x.shape[2]
        tokens = x.reshape(b, gh * gw, self.hidden_size)
        cls = self.param(
            "cls_token", nn.initializers.normal(1.0), (1, 1, self.hidden_size)
        )
        n_grid = self.image_size // self.patch_size
        pos = self.param(
            "position_embeddings",
            nn.initializers.normal(1.0),
            (1, n_grid * n_grid + 1, self.hidden_size),
        )
        pos_cls, pos_patch = pos[:, :1], pos[:, 1:]
        if (gh, gw) != (n_grid, n_grid):
            # torch-exact bicubic interpolation of the position grid (HF
            # interpolate_pos_encoding, align_corners=False, a=-0.75).
            wh = jnp.asarray(_torch_bicubic_matrix(n_grid, gh))
            ww = jnp.asarray(_torch_bicubic_matrix(n_grid, gw))
            grid = pos_patch.reshape(n_grid, n_grid, self.hidden_size)
            grid = jnp.einsum("ih,hwc,jw->ijc", wh, grid, ww)
            pos_patch = grid.reshape(1, gh * gw, self.hidden_size)
        tokens = jnp.concatenate([jnp.tile(cls, (b, 1, 1)), tokens], axis=1)
        tokens = tokens + jnp.concatenate([pos_cls, pos_patch], axis=1)
        n_special = 1
        if self.num_register_tokens:
            regs = self.param(
                "register_tokens",
                nn.initializers.normal(1.0),
                (1, self.num_register_tokens, self.hidden_size),
            )
            tokens = jnp.concatenate(
                [tokens[:, :1], jnp.tile(regs, (b, 1, 1)), tokens[:, 1:]], axis=1
            )
            n_special += self.num_register_tokens
        for i in range(self.num_layers):
            tokens = ViTBlock(
                dim=self.hidden_size,
                num_heads=self.num_heads,
                intermediate=self.intermediate_size,
                use_layerscale=self.use_layerscale,
                use_swiglu=self.use_swiglu,
                qkv_bias=self.qkv_bias,
                eps=self.layer_norm_eps,
                name=f"block{i}",
            )(tokens)
        tokens = nn.LayerNorm(epsilon=self.layer_norm_eps, name="final_norm")(tokens)
        patch_tokens = tokens[:, n_special:]
        return [patch_tokens.reshape(b, gh, gw, self.hidden_size)]


# ── HF weight-key mappers ─────────────────────────────────────────────────────
# Each returns (flax path under enc/, transform) like pretrained._map_*_key,
# "skip" for buffers, or None for unknown keys.


def map_swinv2_key(key: str):
    import re

    if key.startswith("embeddings.patch_embeddings.projection."):
        leaf = key.rsplit(".", 1)[1]
        return ("patch_embed", "kernel" if leaf == "weight" else "bias"), (
            "conv" if leaf == "weight" else "none"
        )
    if key.startswith("embeddings.norm."):
        leaf = key.rsplit(".", 1)[1]
        return ("embed_norm", "scale" if leaf == "weight" else "bias"), "none"
    if key.startswith("embeddings.mask_token") or key.startswith(
        "embeddings.position_embeddings"
    ):
        return "skip"
    m = re.match(r"encoder\.layers\.(\d+)\.downsample\.(reduction|norm)\.(weight|bias)$", key)
    if m:
        s, mod, leaf = int(m[1]), m[2], m[3]
        base = (f"stage{s}_downsample",)
        if mod == "reduction":
            return base + ("reduction", "kernel"), "dense"
        return base + ("norm", "scale" if leaf == "weight" else "bias"), "none"
    m = re.match(r"encoder\.layers\.(\d+)\.blocks\.(\d+)\.(.+)$", key)
    if not m:
        return None
    s, b, rest = int(m[1]), int(m[2]), m[3]
    base = (f"stage{s}_block{b}",)
    leaf = rest.rsplit(".", 1)[1]
    if rest.startswith("attention.self.query."):
        return base + ("attn", "query", "kernel" if leaf == "weight" else "bias"), (
            "dense" if leaf == "weight" else "none"
        )
    if rest.startswith("attention.self.key."):
        return base + ("attn", "key", "kernel"), "dense"
    if rest.startswith("attention.self.value."):
        return base + ("attn", "value", "kernel" if leaf == "weight" else "bias"), (
            "dense" if leaf == "weight" else "none"
        )
    if rest == "attention.self.logit_scale":
        return base + ("attn", "logit_scale"), "none"
    if rest.startswith("attention.self.continuous_position_bias_mlp.0."):
        return base + ("attn", "cpb_fc1", "kernel" if leaf == "weight" else "bias"), (
            "dense" if leaf == "weight" else "none"
        )
    if rest.startswith("attention.self.continuous_position_bias_mlp.2."):
        return base + ("attn", "cpb_fc2", "kernel"), "dense"
    if rest.startswith("attention.output.dense."):
        return base + ("attn", "proj", "kernel" if leaf == "weight" else "bias"), (
            "dense" if leaf == "weight" else "none"
        )
    if rest.startswith("layernorm_before."):
        return base + ("norm1", "scale" if leaf == "weight" else "bias"), "none"
    if rest.startswith("layernorm_after."):
        return base + ("norm2", "scale" if leaf == "weight" else "bias"), "none"
    if rest.startswith("intermediate.dense."):
        return base + ("mlp_fc1", "kernel" if leaf == "weight" else "bias"), (
            "dense" if leaf == "weight" else "none"
        )
    if rest.startswith("output.dense."):
        return base + ("mlp_fc2", "kernel" if leaf == "weight" else "bias"), (
            "dense" if leaf == "weight" else "none"
        )
    if "relative_position_index" in rest or "relative_coords_table" in rest:
        return "skip"
    return None


def map_vit_key(key: str):
    """DINOv2 / plain-ViT state-dict key -> flax path (shared module)."""
    import re

    if key == "embeddings.cls_token":
        return ("cls_token",), "none"
    if key == "embeddings.position_embeddings":
        return ("position_embeddings",), "none"
    if key == "embeddings.register_tokens":
        return ("register_tokens",), "none"
    if key == "embeddings.mask_token":
        return "skip"
    if key.startswith("embeddings.patch_embeddings.projection."):
        leaf = key.rsplit(".", 1)[1]
        return ("patch_embed", "kernel" if leaf == "weight" else "bias"), (
            "conv" if leaf == "weight" else "none"
        )
    if key.startswith("layernorm."):  # final norm (backbone / ViTModel)
        leaf = key.rsplit(".", 1)[1]
        return ("final_norm", "scale" if leaf == "weight" else "bias"), "none"
    if key.startswith("pooler."):
        return "skip"
    m = re.match(r"encoder\.layer\.(\d+)\.(.+)$", key)
    if not m:
        return None
    i, rest = int(m[1]), m[2]
    base = (f"block{i}",)
    leaf = rest.rsplit(".", 1)[1]
    dense_t = "dense" if leaf == "weight" else "none"
    for probe, path in (
        ("attention.attention.query.", ("attn", "query")),
        ("attention.attention.key.", ("attn", "key")),
        ("attention.attention.value.", ("attn", "value")),
        ("attention.output.dense.", ("attn", "proj")),
    ):
        if rest.startswith(probe):
            return base + path + ("kernel" if leaf == "weight" else "bias",), dense_t
    for probe, name in (
        ("norm1.", "norm1"), ("norm2.", "norm2"),
        ("layernorm_before.", "norm1"), ("layernorm_after.", "norm2"),
    ):
        if rest.startswith(probe):
            return base + (name, "scale" if leaf == "weight" else "bias"), "none"
    for probe, name in (
        ("mlp.fc1.", "mlp_fc1"), ("mlp.fc2.", "mlp_fc2"),
        ("intermediate.dense.", "mlp_fc1"), ("output.dense.", "mlp_fc2"),
        ("mlp.weights_in.", "swiglu_in"), ("mlp.weights_out.", "swiglu_out"),
    ):
        if rest.startswith(probe):
            return base + (name, "kernel" if leaf == "weight" else "bias"), dense_t
    if rest == "layer_scale1.lambda1":
        return base + ("ls1",), "none"
    if rest == "layer_scale2.lambda1":
        return base + ("ls2",), "none"
    return None


def build_swinv2_encoder(arch_cfg: Dict[str, Any]) -> Swinv2Encoder:
    return Swinv2Encoder(
        embed_dim=int(arch_cfg.get("embed_dim", 96)),
        depths=tuple(arch_cfg.get("depths", (2, 2, 6, 2))),
        num_heads=tuple(arch_cfg.get("num_heads", (3, 6, 12, 24))),
        window_size=int(arch_cfg.get("window_size", 7)),
        patch_size=int(arch_cfg.get("patch_size", 4)),
        mlp_ratio=float(arch_cfg.get("mlp_ratio", 4.0)),
        qkv_bias=bool(arch_cfg.get("qkv_bias", True)),
        layer_norm_eps=float(arch_cfg.get("layer_norm_eps", 1e-5)),
        image_size=int(arch_cfg.get("image_size", 224)),
        pretrained_window_sizes=tuple(
            arch_cfg.get("pretrained_window_sizes", (0, 0, 0, 0))
        ),
        name="enc",
    )


def build_vit_encoder(arch_cfg: Dict[str, Any]) -> ViTEncoder:
    mt = arch_cfg.get("model_type", "dinov2")
    is_dinov2 = mt.startswith("dinov2")
    hidden = int(arch_cfg.get("hidden_size", 384))
    if is_dinov2:
        # Dinov2MLP sizes its hidden layer from mlp_ratio, ignoring the
        # config's intermediate_size field.
        intermediate = int(hidden * float(arch_cfg.get("mlp_ratio", 4)))
    else:
        intermediate = int(arch_cfg.get("intermediate_size", 4 * hidden))
    return ViTEncoder(
        hidden_size=hidden,
        num_layers=int(arch_cfg.get("num_hidden_layers", 12)),
        num_heads=int(arch_cfg.get("num_attention_heads", 6)),
        intermediate_size=intermediate,
        patch_size=int(arch_cfg.get("patch_size", 14 if is_dinov2 else 16)),
        image_size=int(arch_cfg.get("image_size", 518 if is_dinov2 else 224)),
        num_register_tokens=int(arch_cfg.get("num_register_tokens", 0)),
        use_layerscale=is_dinov2,
        use_swiglu=bool(arch_cfg.get("use_swiglu_ffn", False)),
        qkv_bias=bool(arch_cfg.get("qkv_bias", True)),
        layer_norm_eps=float(arch_cfg.get("layer_norm_eps", 1e-6)),
        name="enc",
    )
