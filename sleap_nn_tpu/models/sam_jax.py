"""SAM (Segment Anything) re-implemented in JAX for TPU execution.

Parity target: the reference wraps SAM through torch backends
(reference sleap_nn/inference/sam/backends.py:347 SamBackend); this module
instead runs the FULL SAM graph — ViT-det image encoder, prompt encoder,
two-way-transformer mask decoder — as ONE functional JAX program so prompted
mask prediction executes on the TPU next to the pose models instead of on
host torch-CPU.

Design notes (TPU-first):

* NHWC layout end to end; the image encoder's windowed attention partitions
  to static ``(B·nW, 14, 14, C)`` tiles (shapes fixed at trace time, no
  dynamic control flow), global-attention layers run full 4096-token
  attention on the MXU.
* Inference-only: parameters live in a FLAT dict keyed by the upstream
  checkpoint names (``vision_encoder.layers.0.attn.qkv.weight`` …) with
  layout transposes applied once at import (:func:`convert_sam_state_dict`).
  A flat dict is a valid pytree, so the whole model jits/donates cleanly and
  there is no init/probe machinery for a model that never trains here.
* Numerics mirror the ``transformers`` SAM port exactly (softmax in fp32,
  decomposed relative positions, erf-GELU); ``tests/models/test_sam_jax.py``
  asserts logit-level agreement against ``transformers.SamModel`` on random
  weights.

The 2×2-stride-2 transposed convolutions in the mask decoder are written as
an einsum + block reshape (each input pixel expands to an independent 2×2
block), which is exact and avoids framework kernel-flip conventions.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class SamArch:
    """Static architecture hyperparameters (defaults = ``facebook/sam-vit-base``)."""

    # vision encoder
    image_size: int = 1024
    patch_size: int = 16
    num_channels: int = 3
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    mlp_dim: int = 3072
    window_size: int = 14
    global_attn_indexes: Tuple[int, ...] = (2, 5, 8, 11)
    use_rel_pos: bool = True
    use_abs_pos: bool = True
    output_channels: int = 256
    layer_norm_eps: float = 1e-6
    # prompt encoder / mask decoder (share hidden size = output_channels)
    num_pos_feats: int = 128
    decoder_hidden: int = 256
    decoder_layers: int = 2
    decoder_heads: int = 8
    decoder_mlp_dim: int = 2048
    num_multimask_outputs: int = 3
    iou_head_depth: int = 3
    iou_head_hidden_dim: int = 256
    attention_downsample_rate: int = 2
    mask_input_channels: int = 16

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @classmethod
    def from_hf_config(cls, config) -> "SamArch":
        """Build from a ``transformers.SamConfig`` (object or nested dict)."""
        if isinstance(config, dict):
            v = config.get("vision_config", {})
            d = config.get("mask_decoder_config", {})

            def g(src, key, default):
                return src.get(key, default)
        else:
            v, d = config.vision_config, config.mask_decoder_config

            def g(src, key, default):
                return getattr(src, key, default)

        return cls(
            image_size=g(v, "image_size", 1024),
            patch_size=g(v, "patch_size", 16),
            num_channels=g(v, "num_channels", 3),
            hidden_size=g(v, "hidden_size", 768),
            num_hidden_layers=g(v, "num_hidden_layers", 12),
            num_attention_heads=g(v, "num_attention_heads", 12),
            mlp_dim=g(v, "mlp_dim", 3072),
            window_size=g(v, "window_size", 14),
            global_attn_indexes=tuple(g(v, "global_attn_indexes", (2, 5, 8, 11))),
            use_rel_pos=g(v, "use_rel_pos", True),
            use_abs_pos=g(v, "use_abs_pos", True),
            output_channels=g(v, "output_channels", 256),
            layer_norm_eps=g(v, "layer_norm_eps", 1e-6),
            num_pos_feats=g(v, "num_pos_feats", 128),
            decoder_hidden=g(d, "hidden_size", 256),
            decoder_layers=g(d, "num_hidden_layers", 2),
            decoder_heads=g(d, "num_attention_heads", 8),
            decoder_mlp_dim=g(d, "mlp_dim", 2048),
            num_multimask_outputs=g(d, "num_multimask_outputs", 3),
            iou_head_depth=g(d, "iou_head_depth", 3),
            iou_head_hidden_dim=g(d, "iou_head_hidden_dim", 256),
            attention_downsample_rate=g(d, "attention_downsample_rate", 2),
            mask_input_channels=(
                config.get("prompt_encoder_config", {}).get(
                    "mask_input_channels", 16)
                if isinstance(config, dict)
                else getattr(config.prompt_encoder_config,
                             "mask_input_channels", 16)
            ),
        )


# ── Weight import ────────────────────────────────────────────────────────────

_CONV_SUFFIXES = (
    "patch_embed.projection.weight",
    "neck.conv1.weight",
    "neck.conv2.weight",
    "mask_embed.conv1.weight",
    "mask_embed.conv2.weight",
    "mask_embed.conv3.weight",
)
_CONVT_SUFFIXES = ("upscale_conv1.weight", "upscale_conv2.weight")
_DIRECT_2D_MARKERS = (
    "rel_pos_h",
    "rel_pos_w",
    "positional_embedding",
    "iou_token.weight",
    "mask_tokens.weight",
    "not_a_point_embed.weight",
    "no_mask_embed.weight",
)


def convert_sam_state_dict(state_dict) -> Dict[str, jnp.ndarray]:
    """Torch ``SamModel.state_dict()`` → flat jax param dict (NHWC layouts).

    Conv weights OIHW→HWIO; linear weights (out,in)→(in,out); transposed-conv
    weights stay (in,out,kh,kw) for the einsum path; embeddings / norms /
    relative-position tables pass through unchanged.
    """
    params: Dict[str, jnp.ndarray] = {}
    for key, value in state_dict.items():
        arr = np.asarray(
            value.detach().cpu().numpy() if hasattr(value, "detach") else value,
            dtype=np.float32,
        )
        if any(key.endswith(s) for s in _CONV_SUFFIXES):
            arr = arr.transpose(2, 3, 1, 0)  # OIHW -> HWIO
        elif any(key.endswith(s) for s in _CONVT_SUFFIXES):
            pass  # (in, out, kh, kw), consumed by the einsum upscaler
        elif "point_embed" in key and key.endswith(".weight"):
            pass  # nn.Embedding rows
        elif arr.ndim == 2 and key.endswith(".weight") and not any(
            m in key for m in _DIRECT_2D_MARKERS
        ):
            arr = arr.T  # nn.Linear
        params[key] = jnp.asarray(arr)
    return params


def _linear(params, prefix: str, x: jnp.ndarray) -> jnp.ndarray:
    return x @ params[f"{prefix}.weight"] + params[f"{prefix}.bias"]


def _layer_norm(params, prefix: str, x: jnp.ndarray, eps: float) -> jnp.ndarray:
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) / jnp.sqrt(var + eps) * params[f"{prefix}.weight"] + params[
        f"{prefix}.bias"
    ]


def _conv(params, prefix: str, x: jnp.ndarray, stride: int, padding) -> jnp.ndarray:
    w = params[f"{prefix}.weight"]
    out = jax.lax.conv_general_dilated(
        x, w, (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    b = params.get(f"{prefix}.bias")
    return out if b is None else out + b


def _upscale2x(params, prefix: str, x: jnp.ndarray) -> jnp.ndarray:
    """Exact 2×2-stride-2 ConvTranspose2d: per-pixel 2×2 block expansion."""
    w = params[f"{prefix}.weight"]  # (in, out, 2, 2)
    b, h, wd, _ = x.shape
    out = jnp.einsum("bhwc,coij->bhiwjo", x, w)
    out = out.reshape(b, h * 2, wd * 2, w.shape[1])
    return out + params[f"{prefix}.bias"]


# ── Vision encoder ───────────────────────────────────────────────────────────


def _get_rel_pos(rel_pos: jnp.ndarray, q_size: int, k_size: int) -> jnp.ndarray:
    """Slice (and, off the pretrain grid, linearly resample) relative positions."""
    max_rel_dist = 2 * max(q_size, k_size) - 1
    if rel_pos.shape[0] != max_rel_dist:
        rel_pos = jax.image.resize(
            rel_pos, (max_rel_dist, rel_pos.shape[1]), method="linear"
        )
    q_coords = np.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    k_coords = np.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    rel = (q_coords - k_coords) + (k_size - 1) * max(q_size / k_size, 1.0)
    return rel_pos[jnp.asarray(rel.astype(np.int64))]


def _vision_attention(params, prefix: str, x: jnp.ndarray, arch: SamArch,
                      input_size: int) -> jnp.ndarray:
    """Windowed/global multi-head attention with decomposed relative positions."""
    b, h, w, c = x.shape
    nh = arch.num_attention_heads
    hd = c // nh
    qkv = _linear(params, f"{prefix}.qkv", x.reshape(b, h * w, c))
    qkv = qkv.reshape(b, h * w, 3, nh, hd).transpose(2, 0, 3, 1, 4)
    q, k, v = (t.reshape(b * nh, h * w, hd) for t in qkv)

    attn = (q * (hd ** -0.5)) @ k.transpose(0, 2, 1)
    if arch.use_rel_pos:
        rh = _get_rel_pos(params[f"{prefix}.rel_pos_h"], h, h)
        rw = _get_rel_pos(params[f"{prefix}.rel_pos_w"], w, w)
        rq = q.reshape(b * nh, h, w, hd)
        rel_h = jnp.einsum("bhwc,hkc->bhwk", rq, rh)
        rel_w = jnp.einsum("bhwc,wkc->bhwk", rq, rw)
        attn = attn + (rel_h[:, :, :, :, None] + rel_w[:, :, :, None, :]).reshape(
            b * nh, h * w, h * w
        )
    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(q.dtype)
    out = (attn @ v).reshape(b, nh, h, w, hd)
    out = out.transpose(0, 2, 3, 1, 4).reshape(b, h, w, c)
    return _linear(params, f"{prefix}.proj", out)


def _window_partition(x: jnp.ndarray, ws: int):
    b, h, w, c = x.shape
    pad_h = (ws - h % ws) % ws
    pad_w = (ws - w % ws) % ws
    x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    ph, pw = h + pad_h, w + pad_w
    x = x.reshape(b, ph // ws, ws, pw // ws, ws, c)
    return (
        x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, c),
        (ph, pw),
    )


def _window_unpartition(wins: jnp.ndarray, ws: int, padded, original):
    ph, pw = padded
    h, w = original
    c = wins.shape[-1]
    b = wins.shape[0] // ((ph // ws) * (pw // ws))
    x = wins.reshape(b, ph // ws, pw // ws, ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, ph, pw, c)
    return x[:, :h, :w, :]


def _vision_layer(params, prefix: str, x: jnp.ndarray, arch: SamArch,
                  window_size: int) -> jnp.ndarray:
    residual = x
    x = _layer_norm(params, f"{prefix}.layer_norm1", x, arch.layer_norm_eps)
    if window_size > 0:
        h, w = x.shape[1], x.shape[2]
        x, padded = _window_partition(x, window_size)
        x = _vision_attention(params, f"{prefix}.attn", x, arch, window_size)
        x = _window_unpartition(x, window_size, padded, (h, w))
    else:
        x = _vision_attention(params, f"{prefix}.attn", x, arch, arch.grid)
    x = residual + x
    y = _layer_norm(params, f"{prefix}.layer_norm2", x, arch.layer_norm_eps)
    y = _linear(params, f"{prefix}.mlp.lin1", y)
    y = jax.nn.gelu(y, approximate=False)
    y = _linear(params, f"{prefix}.mlp.lin2", y)
    return x + y


def sam_image_encoder(params, arch: SamArch, pixel_values: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, 3) preprocessed image → (B, grid, grid, output_channels)."""
    x = _conv(params, "vision_encoder.patch_embed.projection", pixel_values,
              arch.patch_size, "VALID")
    if arch.use_abs_pos:
        x = x + params["vision_encoder.pos_embed"]
    for i in range(arch.num_hidden_layers):
        ws = 0 if i in arch.global_attn_indexes else arch.window_size
        x = _vision_layer(params, f"vision_encoder.layers.{i}", x, arch, ws)
    # neck: 1x1 conv → LN → 3x3 conv → LN (channel-last LN is native in NHWC)
    x = _conv(params, "vision_encoder.neck.conv1", x, 1, "VALID")
    x = _layer_norm(params, "vision_encoder.neck.layer_norm1", x, 1e-6)
    x = _conv(params, "vision_encoder.neck.conv2", x, 1, [(1, 1), (1, 1)])
    x = _layer_norm(params, "vision_encoder.neck.layer_norm2", x, 1e-6)
    return x


# ── Prompt encoder ───────────────────────────────────────────────────────────


def _fourier_embed(params, coords01: jnp.ndarray) -> jnp.ndarray:
    """[0,1]-normalized coords (..., 2) → (..., 2*num_pos_feats)."""
    pe = params["shared_image_embedding.positional_embedding"]  # (2, F)
    c = (2.0 * coords01 - 1.0) @ pe
    c = 2.0 * jnp.pi * c
    return jnp.concatenate([jnp.sin(c), jnp.cos(c)], axis=-1)


def _embed_points(params, arch: SamArch, points: jnp.ndarray,
                  labels: jnp.ndarray, pad: bool) -> jnp.ndarray:
    """(B, P, N, 2) pixel coords + (B, P, N) labels → (B, P, N[+1], C).

    Label semantics follow the upstream port: 1 = foreground, 0 = background,
    -1 = "not a point" (padding point added when no box accompanies the
    points), -10 = processor padding (embedding zeroed).
    """
    points = points + 0.5
    if pad:
        pad_pts = jnp.zeros((*points.shape[:2], 1, 2), points.dtype)
        pad_lab = -jnp.ones((*labels.shape[:2], 1), labels.dtype)
        points = jnp.concatenate([points, pad_pts], axis=2)
        labels = jnp.concatenate([labels, pad_lab], axis=2)
    emb = _fourier_embed(params, points / arch.image_size)
    not_a_point = params["prompt_encoder.not_a_point_embed.weight"][0]
    emb = jnp.where(labels[..., None] == -1, not_a_point, emb)
    emb = jnp.where(labels[..., None] == -10, jnp.zeros_like(emb), emb)
    emb = jnp.where(
        (labels == 0)[..., None],
        emb + params["prompt_encoder.point_embed.0.weight"][0],
        emb,
    )
    emb = jnp.where(
        (labels == 1)[..., None],
        emb + params["prompt_encoder.point_embed.1.weight"][0],
        emb,
    )
    return emb


def _embed_boxes(params, arch: SamArch, boxes: jnp.ndarray) -> jnp.ndarray:
    """(B, nb, 4) xyxy pixel boxes → (B, nb, 2, C) corner embeddings."""
    b, nb = boxes.shape[:2]
    corners = (boxes + 0.5).reshape(b, nb, 2, 2)
    emb = _fourier_embed(params, corners / arch.image_size)
    emb = emb.at[:, :, 0, :].add(params["prompt_encoder.point_embed.2.weight"][0])
    emb = emb.at[:, :, 1, :].add(params["prompt_encoder.point_embed.3.weight"][0])
    return emb


def sam_prompt_encoder(
    params,
    arch: SamArch,
    input_points: Optional[jnp.ndarray],
    input_labels: Optional[jnp.ndarray],
    input_boxes: Optional[jnp.ndarray],
    batch_size: int,
) -> Tuple[Optional[jnp.ndarray], jnp.ndarray]:
    """→ (sparse (B, P, T, C) or None, dense (B, grid, grid, C))."""
    sparse = None
    if input_points is not None:
        sparse = _embed_points(params, arch, input_points, input_labels,
                               pad=input_boxes is None)
    if input_boxes is not None:
        box_emb = _embed_boxes(params, arch, input_boxes)
        sparse = box_emb if sparse is None else jnp.concatenate(
            [sparse, box_emb], axis=2
        )
    dense = jnp.broadcast_to(
        params["prompt_encoder.no_mask_embed.weight"].reshape(1, 1, 1, -1),
        (batch_size, arch.grid, arch.grid, arch.decoder_hidden),
    )
    return sparse, dense


def image_grid_positional_embedding(params, arch: SamArch) -> jnp.ndarray:
    """Dense per-cell Fourier positions of the embedding grid → (grid, grid, C)."""
    size = arch.grid
    coords = (np.arange(size, dtype=np.float32) + 0.5) / size
    x_embed = np.broadcast_to(coords[None, :], (size, size))
    y_embed = np.broadcast_to(coords[:, None], (size, size))
    grid = jnp.asarray(np.stack([x_embed, y_embed], axis=-1))
    return _fourier_embed(params, grid)


# ── Mask decoder ─────────────────────────────────────────────────────────────


def _decoder_attention(params, prefix: str, query, key, value, num_heads: int):
    """SamAttention: (B, P, T, C) tensors, optional internal downsampling."""
    q = _linear(params, f"{prefix}.q_proj", query)
    k = _linear(params, f"{prefix}.k_proj", key)
    v = _linear(params, f"{prefix}.v_proj", value)
    b, p, tq, ci = q.shape
    tk = k.shape[2]
    hd = ci // num_heads

    def split(t, n):
        return t.reshape(b * p, n, num_heads, hd).transpose(0, 2, 1, 3)

    qh, kh, vh = split(q, tq), split(k, tk), split(v, tk)
    attn = (qh @ kh.transpose(0, 1, 3, 2)) * (hd ** -0.5)
    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(qh.dtype)
    out = (attn @ vh).transpose(0, 2, 1, 3).reshape(b, p, tq, ci)
    return _linear(params, f"{prefix}.out_proj", out)


def _two_way_block(params, prefix: str, arch: SamArch, queries, keys,
                   query_pe, key_pe, skip_first_layer_pe: bool):
    nh = arch.decoder_heads
    eps = arch.layer_norm_eps
    if skip_first_layer_pe:
        queries = _decoder_attention(params, f"{prefix}.self_attn",
                                     queries, queries, queries, nh)
    else:
        q = queries + query_pe
        queries = queries + _decoder_attention(params, f"{prefix}.self_attn",
                                               q, q, queries, nh)
    queries = _layer_norm(params, f"{prefix}.layer_norm1", queries, eps)

    q = queries + query_pe
    k = keys + key_pe
    queries = queries + _decoder_attention(
        params, f"{prefix}.cross_attn_token_to_image", q, k, keys, nh
    )
    queries = _layer_norm(params, f"{prefix}.layer_norm2", queries, eps)

    y = _linear(params, f"{prefix}.mlp.lin1", queries)
    y = jax.nn.relu(y)
    y = _linear(params, f"{prefix}.mlp.lin2", y)
    queries = _layer_norm(params, f"{prefix}.layer_norm3", queries + y, eps)

    q = queries + query_pe
    k = keys + key_pe
    keys = keys + _decoder_attention(
        params, f"{prefix}.cross_attn_image_to_token", k, q, queries, nh
    )
    keys = _layer_norm(params, f"{prefix}.layer_norm4", keys, eps)
    return queries, keys


def _feed_forward(params, prefix: str, x: jnp.ndarray, depth: int,
                  sigmoid_output: bool = False) -> jnp.ndarray:
    x = jax.nn.relu(_linear(params, f"{prefix}.proj_in", x))
    for i in range(depth - 2):
        x = jax.nn.relu(_linear(params, f"{prefix}.layers.{i}", x))
    x = _linear(params, f"{prefix}.proj_out", x)
    return jax.nn.sigmoid(x) if sigmoid_output else x


def sam_mask_decoder(
    params,
    arch: SamArch,
    image_embeddings: jnp.ndarray,   # (B, grid, grid, C) NHWC
    sparse_prompt: Optional[jnp.ndarray],  # (B, P, T, C)
    dense_prompt: jnp.ndarray,       # (B, grid, grid, C)
    multimask_output: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """→ (low-res masks (B, P, K, 4·grid, 4·grid), iou scores (B, P, K))."""
    b, gh, gw, c = image_embeddings.shape
    p = sparse_prompt.shape[1] if sparse_prompt is not None else 1
    n_mask_tokens = arch.num_multimask_outputs + 1

    output_tokens = jnp.concatenate(
        [params["mask_decoder.iou_token.weight"],
         params["mask_decoder.mask_tokens.weight"]], axis=0
    )  # (1+K, C)
    tokens = jnp.broadcast_to(output_tokens, (b, p, *output_tokens.shape))
    if sparse_prompt is not None:
        tokens = jnp.concatenate([tokens, sparse_prompt], axis=2)

    src = image_embeddings + dense_prompt
    keys = jnp.repeat(src.reshape(b, 1, gh * gw, c), p, axis=0)  # (B·P, 1, HW, C)
    pos = image_grid_positional_embedding(params, arch).reshape(1, 1, gh * gw, c)
    key_pe = jnp.broadcast_to(pos, keys.shape)

    queries = tokens
    for i in range(arch.decoder_layers):
        queries, keys = _two_way_block(
            params, f"mask_decoder.transformer.layers.{i}", arch,
            queries, keys, tokens, key_pe, skip_first_layer_pe=(i == 0),
        )
    q = queries + tokens
    k = keys + key_pe
    queries = queries + _decoder_attention(
        params, "mask_decoder.transformer.final_attn_token_to_image",
        q, k, keys, arch.decoder_heads,
    )
    queries = _layer_norm(
        params, "mask_decoder.transformer.layer_norm_final_attn", queries,
        1e-5,  # upstream uses nn.LayerNorm default eps here
    )

    iou_token_out = queries[:, :, 0, :]
    mask_tokens_out = queries[:, :, 1:1 + n_mask_tokens, :]

    up = keys.reshape(b * p, gh, gw, c)
    up = _upscale2x(params, "mask_decoder.upscale_conv1", up)
    up = _layer_norm(params, "mask_decoder.upscale_layer_norm", up, 1e-6)
    up = jax.nn.gelu(up, approximate=False)
    up = _upscale2x(params, "mask_decoder.upscale_conv2", up)
    up = jax.nn.gelu(up, approximate=False)

    hyper = jnp.stack(
        [
            _feed_forward(params, f"mask_decoder.output_hypernetworks_mlps.{i}",
                          mask_tokens_out[:, :, i, :], 3)
            for i in range(n_mask_tokens)
        ],
        axis=2,
    )  # (B, P, K+1, C/8)
    uh, uw, uc = up.shape[1], up.shape[2], up.shape[3]
    flat = up.reshape(b, p, uh * uw, uc)
    masks = jnp.einsum("bpkc,bpnc->bpkn", hyper, flat).reshape(b, p, -1, uh, uw)

    iou_pred = _feed_forward(params, "mask_decoder.iou_prediction_head",
                             iou_token_out, arch.iou_head_depth)
    sl = slice(1, None) if multimask_output else slice(0, 1)
    return masks[:, :, sl], iou_pred[:, :, sl]


def sam_predict(
    params,
    arch: SamArch,
    pixel_values: jnp.ndarray,
    input_points: Optional[jnp.ndarray] = None,
    input_labels: Optional[jnp.ndarray] = None,
    input_boxes: Optional[jnp.ndarray] = None,
    multimask_output: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full SAM forward: preprocessed NHWC image + prompts → (masks, iou)."""
    embeddings = sam_image_encoder(params, arch, pixel_values)
    return sam_decode(params, arch, embeddings, input_points, input_labels,
                      input_boxes, multimask_output)


def sam_decode(
    params,
    arch: SamArch,
    image_embeddings: jnp.ndarray,
    input_points: Optional[jnp.ndarray] = None,
    input_labels: Optional[jnp.ndarray] = None,
    input_boxes: Optional[jnp.ndarray] = None,
    multimask_output: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Prompt-encode + mask-decode against cached image embeddings."""
    if input_points is not None and input_labels is None:
        input_labels = jnp.ones(input_points.shape[:3], jnp.int32)
    sparse, dense = sam_prompt_encoder(
        params, arch, input_points, input_labels, input_boxes,
        batch_size=image_embeddings.shape[0],
    )
    return sam_mask_decoder(params, arch, image_embeddings, sparse, dense,
                            multimask_output)
