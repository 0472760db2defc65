"""Device-side, RNG-keyed augmentation (image + keypoints + optional masks).

Parity target: reference sleap_nn/data/augmentation.py:16-200 and
skia_augmentation.py — flip (with symmetric-node swap), affine
(rotation/scale/translation, bundled or independent probabilities),
intensity (uniform/gaussian noise, contrast, brightness), random erase and
mixup. Rebuilt as pure jax functions over batches with per-sample
``jax.random`` keys so augmentation fuses into the device preprocessing
graph (the reference runs these per-sample on CPU workers).

Conventions: image ``(B, H, W, C)`` float32 in [0, 1]; instances
``(B, ..., 2)`` in (x, y) pixel coords; NaNs preserved.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Affine machinery
# ---------------------------------------------------------------------------


def _affine_matrices(
    key: jax.Array,
    batch: int,
    height: int,
    width: int,
    rotation_min: float,
    rotation_max: float,
    rotation_p: Optional[float],
    scale_min: float,
    scale_max: float,
    scale_p: Optional[float],
    translate_width: float,
    translate_height: float,
    translate_p: Optional[float],
    affine_p: float,
) -> jnp.ndarray:
    """Sample per-sample 3x3 forward affine matrices (keypoint transform).

    Rotation/scale are about the image center; translation is a fraction of
    the image dims. Independent ``*_p`` probabilities override the bundled
    ``affine_p`` (reference GeometricConfig semantics).
    """
    k_rot, k_scale, k_tx, k_ty, k_prot, k_pscale, k_ptrans, k_paff = jax.random.split(key, 8)

    angle = jax.random.uniform(
        k_rot, (batch,), minval=rotation_min, maxval=rotation_max
    ) * (jnp.pi / 180.0)
    scale = jax.random.uniform(k_scale, (batch,), minval=scale_min, maxval=scale_max)
    tx = jax.random.uniform(k_tx, (batch,), minval=-translate_width, maxval=translate_width) * width
    ty = (
        jax.random.uniform(k_ty, (batch,), minval=-translate_height, maxval=translate_height)
        * height
    )

    bundled = jax.random.uniform(k_paff, (batch,)) < affine_p
    rot_on = (
        jax.random.uniform(k_prot, (batch,)) < rotation_p if rotation_p is not None else bundled
    )
    scale_on = (
        jax.random.uniform(k_pscale, (batch,)) < scale_p if scale_p is not None else bundled
    )
    trans_on = (
        jax.random.uniform(k_ptrans, (batch,)) < translate_p if translate_p is not None else bundled
    )

    angle = jnp.where(rot_on, angle, 0.0)
    scale = jnp.where(scale_on, scale, 1.0)
    tx = jnp.where(trans_on, tx, 0.0)
    ty = jnp.where(trans_on, ty, 0.0)

    cx, cy = (width - 1) / 2.0, (height - 1) / 2.0
    cos, sin = jnp.cos(angle), jnp.sin(angle)
    # T = Translate(c + t) @ Scale @ Rot @ Translate(-c)
    a = scale * cos
    b = -scale * sin
    c = scale * sin
    d = scale * cos
    e = cx + tx - (a * cx + b * cy)
    f = cy + ty - (c * cx + d * cy)
    zeros = jnp.zeros_like(a)
    ones = jnp.ones_like(a)
    mats = jnp.stack(
        [
            jnp.stack([a, b, e], axis=-1),
            jnp.stack([c, d, f], axis=-1),
            jnp.stack([zeros, zeros, ones], axis=-1),
        ],
        axis=-2,
    )  # (B, 3, 3)
    return mats


def transform_points(points: jnp.ndarray, mats: jnp.ndarray) -> jnp.ndarray:
    """Apply per-sample forward affines to (x, y) points.

    Args:
        points: ``(B, ..., 2)``; mats: ``(B, 3, 3)``.
    """
    b = points.shape[0]
    flat = points.reshape(b, -1, 2)
    ones = jnp.ones_like(flat[..., :1])
    hom = jnp.concatenate([flat, ones], axis=-1)  # (B, P, 3)
    out = jnp.einsum("bij,bpj->bpi", mats, hom)[..., :2]
    return out.reshape(points.shape)


def warp_image(image: jnp.ndarray, mats: jnp.ndarray, order: int = 1) -> jnp.ndarray:
    """Warp images by the INVERSE of per-sample forward affines.

    Bilinear sampling, zeros outside (reference: skia affine with black
    border). image: ``(B, H, W, C)``.
    """
    b, h, w, c = image.shape
    inv = jnp.linalg.inv(mats)  # (B, 3, 3)
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32), indexing="ij")
    grid = jnp.stack([xx, yy, jnp.ones_like(xx)], axis=-1)  # (H, W, 3)

    def warp_one(img, m):
        src = jnp.einsum("ij,hwj->hwi", m, grid)  # (H, W, 3)
        sx, sy = src[..., 0], src[..., 1]
        coords = jnp.stack([sy, sx], axis=0)  # (2, H, W) for map_coordinates

        def per_channel(ch):
            return jax.scipy.ndimage.map_coordinates(ch, [coords[0], coords[1]], order=order, cval=0.0)

        return jnp.stack([per_channel(img[..., k]) for k in range(c)], axis=-1)

    return jax.vmap(warp_one)(image, inv)


def apply_geometric_augmentation(
    key: jax.Array,
    image: jnp.ndarray,
    instances: jnp.ndarray,
    rotation_min: float = -15.0,
    rotation_max: float = 15.0,
    rotation_p: Optional[float] = None,
    scale_min: float = 0.9,
    scale_max: float = 1.1,
    scale_p: Optional[float] = None,
    translate_width: float = 0.0,
    translate_height: float = 0.0,
    translate_p: Optional[float] = None,
    affine_p: float = 0.0,
    erase_scale_min: float = 0.0001,
    erase_scale_max: float = 0.01,
    erase_ratio_min: float = 1.0,
    erase_ratio_max: float = 1.0,
    erase_p: float = 0.0,
    mixup_lambda_min: float = 0.01,
    mixup_lambda_max: float = 0.05,
    mixup_p: float = 0.0,
    flip_p: float = 0.0,
    symmetric_inds: Optional[Sequence[Tuple[int, int]]] = None,
    masks: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, ...]:
    """Full geometric augmentation chain under one RNG key (batched)."""
    b, h, w, _ = image.shape
    k_flip, k_aff, k_erase, k_mix = jax.random.split(key, 4)

    if flip_p > 0:
        image, instances, masks = apply_flip_augmentation(
            k_flip, image, instances, symmetric_inds=symmetric_inds, flip_p=flip_p, masks=masks
        )

    needs_affine = (
        affine_p > 0
        or (rotation_p or 0) > 0
        or (scale_p or 0) > 0
        or (translate_p or 0) > 0
    )
    if needs_affine:
        mats = _affine_matrices(
            k_aff, b, h, w,
            rotation_min, rotation_max, rotation_p,
            scale_min, scale_max, scale_p,
            translate_width, translate_height, translate_p,
            affine_p,
        )
        image = warp_image(image, mats)
        instances = transform_points(instances, mats)
        if masks is not None:
            masks = (warp_image(masks, mats, order=0) > 0.5).astype(masks.dtype)

    if erase_p > 0:
        image = apply_random_erase(
            k_erase, image, erase_scale_min, erase_scale_max,
            erase_ratio_min, erase_ratio_max, erase_p,
        )

    if mixup_p > 0:
        lam = jax.random.uniform(k_mix, (b, 1, 1, 1), minval=mixup_lambda_min, maxval=mixup_lambda_max)
        on = (jax.random.uniform(jax.random.fold_in(k_mix, 1), (b, 1, 1, 1)) < mixup_p).astype(image.dtype)
        lam = lam * on
        image = (1 - lam) * image + lam * jnp.roll(image, 1, axis=0)

    if masks is not None:
        return image, instances, masks
    return image, instances


def apply_flip_augmentation(
    key: jax.Array,
    image: jnp.ndarray,
    instances: jnp.ndarray,
    symmetric_inds: Optional[Sequence[Tuple[int, int]]] = None,
    flip_p: float = 0.0,
    masks: Optional[jnp.ndarray] = None,
):
    """Random left/right mirror with symmetric-node swap (batched)."""
    b, h, w, _ = image.shape
    do = jax.random.uniform(key, (b,)) < flip_p  # (B,)

    flipped_img = image[:, :, ::-1, :]
    image = jnp.where(do[:, None, None, None], flipped_img, image)
    if masks is not None:
        masks = jnp.where(do[:, None, None, None], masks[:, :, ::-1, :], masks)

    flipped_pts = instances.at[..., 0].set((w - 1) - instances[..., 0])
    if symmetric_inds:
        perm = list(range(instances.shape[-2]))
        for i, j in symmetric_inds:
            perm[i], perm[j] = perm[j], perm[i]
        flipped_pts = jnp.take(flipped_pts, jnp.array(perm), axis=-2)
    do_b = do.reshape((b,) + (1,) * (instances.ndim - 1))
    instances = jnp.where(do_b, flipped_pts, instances)
    return image, instances, masks


def apply_random_erase(
    key: jax.Array,
    image: jnp.ndarray,
    scale_min: float,
    scale_max: float,
    ratio_min: float,
    ratio_max: float,
    erase_p: float,
) -> jnp.ndarray:
    """Zero out a random rectangle per sample with probability ``erase_p``."""
    b, h, w, _ = image.shape
    k_area, k_ratio, k_x, k_y, k_p = jax.random.split(key, 5)
    area = jax.random.uniform(k_area, (b,), minval=scale_min, maxval=scale_max) * h * w
    ratio = jax.random.uniform(k_ratio, (b,), minval=ratio_min, maxval=ratio_max)
    eh = jnp.sqrt(area * ratio)
    ew = jnp.sqrt(area / ratio)
    y0 = jax.random.uniform(k_y, (b,), maxval=1.0) * (h - eh)
    x0 = jax.random.uniform(k_x, (b,), maxval=1.0) * (w - ew)
    on = jax.random.uniform(k_p, (b,)) < erase_p

    yy = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    xx = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    inside = (
        (yy >= y0[:, None, None])
        & (yy < (y0 + eh)[:, None, None])
        & (xx >= x0[:, None, None])
        & (xx < (x0 + ew)[:, None, None])
    )
    erase_mask = inside & on[:, None, None]
    return jnp.where(erase_mask[..., None], 0.0, image)


def apply_intensity_augmentation(
    key: jax.Array,
    image: jnp.ndarray,
    uniform_noise_min: float = 0.0,
    uniform_noise_max: float = 0.04,
    uniform_noise_p: float = 0.0,
    gaussian_noise_mean: float = 0.0,
    gaussian_noise_std: float = 0.02,
    gaussian_noise_p: float = 0.0,
    contrast_min: float = 0.9,
    contrast_max: float = 1.1,
    contrast_p: float = 0.0,
    brightness_min: float = 0.9,
    brightness_max: float = 1.1,
    brightness_p: float = 0.0,
) -> jnp.ndarray:
    """Intensity augmentation chain on [0, 1] images (keypoints untouched)."""
    b = image.shape[0]
    keys = jax.random.split(key, 8)

    if uniform_noise_p > 0:
        noise = jax.random.uniform(
            keys[0], image.shape, minval=uniform_noise_min, maxval=uniform_noise_max
        )
        on = (jax.random.uniform(keys[1], (b, 1, 1, 1)) < uniform_noise_p).astype(image.dtype)
        image = image + noise * on

    if gaussian_noise_p > 0:
        noise = gaussian_noise_mean + gaussian_noise_std * jax.random.normal(keys[2], image.shape)
        on = (jax.random.uniform(keys[3], (b, 1, 1, 1)) < gaussian_noise_p).astype(image.dtype)
        image = image + noise * on

    if contrast_p > 0:
        factor = jax.random.uniform(keys[4], (b, 1, 1, 1), minval=contrast_min, maxval=contrast_max)
        on = jax.random.uniform(keys[5], (b, 1, 1, 1)) < contrast_p
        mean = jnp.mean(image, axis=(1, 2, 3), keepdims=True)
        contrasted = (image - mean) * factor + mean
        image = jnp.where(on, contrasted, image)

    if brightness_p > 0:
        factor = jax.random.uniform(
            keys[6], (b, 1, 1, 1), minval=brightness_min, maxval=brightness_max
        )
        on = jax.random.uniform(keys[7], (b, 1, 1, 1)) < brightness_p
        image = jnp.where(on, image * factor, image)

    return jnp.clip(image, 0.0, 1.0)
