"""Architecture math: receptive fields, stride sizing, crop/tile suggestions.

Parity target: reference config_generator/architecture_estimates.py:23-380.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple


def encoder_blocks(max_stride: int) -> int:
    return int(math.log2(max_stride))


def decoder_blocks(max_stride: int, output_stride: int) -> int:
    return int(math.log2(max_stride / output_stride))


def compute_receptive_field(
    max_stride: int, convs_per_block: int = 2, kernel_size: int = 3
) -> int:
    """Theoretical receptive field of the stride-anchored UNet encoder.

    Each encoder level adds ``convs_per_block`` kxk convs then halves
    resolution; RF grows by ``convs*(k-1)*stride`` per level
    (reference: architecture_estimates.py:23).
    """
    rf = 1
    stride = 1
    for _ in range(encoder_blocks(max_stride)):
        rf += convs_per_block * (kernel_size - 1) * stride
        stride *= 2
    return rf


def compute_max_stride_for_animal_size(
    animal_size: float, convs_per_block: int = 2, kernel_size: int = 3
) -> int:
    """Smallest max_stride whose receptive field covers the animal (reference: :75)."""
    for exp in range(2, 8):
        max_stride = 2**exp
        if compute_receptive_field(max_stride, convs_per_block, kernel_size) >= animal_size:
            return max_stride
    return 128


def recommend_default_max_stride(avg_animal_size: float, scale: float = 1.0) -> int:
    """Bucketed default max_stride from the scaled animal size (reference: :96)."""
    size = avg_animal_size * scale
    if size < 32:
        return 8
    if size < 64:
        return 16
    if size < 128:
        return 32
    return 64


def estimate_unet_params(
    filters: int = 32,
    filters_rate: float = 1.5,
    max_stride: int = 16,
    output_stride: int = 2,
    convs_per_block: int = 2,
    kernel_size: int = 3,
    in_channels: int = 1,
    head_channels: int = 1,
) -> int:
    """Analytic UNet parameter count (matches the flax model construction)."""
    k2 = kernel_size * kernel_size
    total = 0
    down = encoder_blocks(max_stride)
    prev = in_channels
    for block in range(down):
        f = int(filters * (filters_rate**block))
        for i in range(convs_per_block):
            cin = prev if i == 0 else f
            total += cin * f * k2 + f
        prev = f
    # middle expand + contract
    mid = int(filters * (filters_rate**down))
    for i in range(max(convs_per_block - 1, 0)):
        cin = prev if i == 0 else mid
        total += cin * mid * k2 + mid
        prev = mid
    total += prev * mid * k2 + mid
    prev = mid
    # decoder
    up = decoder_blocks(max_stride, output_stride)
    for block in range(up):
        f = int(filters * (filters_rate ** max(0, down - 1 - block)))
        skip = int(filters * (filters_rate ** max(0, down - 1 - block)))
        for i in range(convs_per_block):
            cin = (prev + skip) if i == 0 else f
            total += cin * f * k2 + f
        prev = f
    total += prev * head_channels + head_channels  # 1x1 head
    return total


def compute_augmentation_padding(
    bbox_size: float, rotation_max: float = 0.0, scale_max: float = 1.0
) -> int:
    from sleap_nn_tpu.data.instance_cropping import compute_augmentation_padding as f

    return f(bbox_size, rotation_max, scale_max)


def compute_suggested_crop_size(
    max_bbox_size: float,
    max_stride: int,
    rotation_max: float = 0.0,
    scale_max: float = 1.0,
    min_crop_size: int = 0,
) -> int:
    """Crop size covering the largest instance + augmentation expansion."""
    pad = compute_augmentation_padding(max_bbox_size, rotation_max, scale_max)
    size = max(max_bbox_size + pad, min_crop_size)
    return int(math.ceil(size / max_stride) * max_stride)


def compute_pad_to_stride(height: int, width: int, max_stride: int) -> Tuple[int, int]:
    from sleap_nn_tpu.data.resizing import find_padding_for_stride

    ph, pw = find_padding_for_stride(height, width, max_stride)
    return height + ph, width + pw


def compute_backbone_context_margin(
    max_stride: int, convs_per_block: int = 2, kernel_size: int = 3
) -> int:
    """Half the receptive field: context a prediction needs around a point."""
    return compute_receptive_field(max_stride, convs_per_block, kernel_size) // 2


def compute_suggested_tile_size(
    avg_bbox_size: float,
    max_stride: int,
    output_stride: int,
    sigma: float = 5.0,
    min_tile: int = 128,
    max_tile: int = 1024,
) -> int:
    """Tile size: a few animal diameters + context margin, stride-aligned
    (reference: :312; used by trainer tiling auto-size)."""
    margin = compute_backbone_context_margin(max_stride)
    size = max(2.5 * avg_bbox_size + 2 * margin, min_tile)
    size = min(size, max_tile)
    unit = max(max_stride, output_stride)
    return int(math.ceil(size / unit) * unit)


def compute_suggested_tile_overlap(
    avg_bbox_size: float,
    max_stride: int,
    sigma: float = 5.0,
    tile_size: Optional[int] = None,
) -> int:
    """Overlap: one animal + confmap spread + context margin (reference: :344)."""
    margin = compute_backbone_context_margin(max_stride)
    overlap = int(math.ceil(avg_bbox_size + 4 * sigma + margin))
    if tile_size is not None:
        overlap = min(overlap, tile_size // 2)
    return overlap
