"""Data pipeline: host-side indexing/decoding + device-side fused preprocessing.

TPU-first redesign of the reference's ``sleap_nn/data`` package: the
reference renders targets (confmaps/PAFs) on CPU in dataloader workers
(reference: sleap_nn/data/custom_datasets.py); here the whole
normalize -> sizematch -> augment -> pad-to-stride -> render-targets chain
is one jitted, statically-shaped device function fed by a host-side decode
thread — the main throughput lever on TPU.
"""

from sleap_nn_tpu.data.providers import (
    get_max_height_width,
    get_max_instances,
    process_lf,
)
from sleap_nn_tpu.data.normalization import ensure_grayscale, ensure_rgb, normalize_image
from sleap_nn_tpu.data.resizing import (
    apply_pad_to_stride,
    apply_resizer,
    apply_sizematcher,
    find_padding_for_stride,
)
from sleap_nn_tpu.data.instance_centroids import generate_centroids
from sleap_nn_tpu.data.instance_cropping import find_instance_crop_size

__all__ = [
    "process_lf",
    "get_max_instances",
    "get_max_height_width",
    "normalize_image",
    "ensure_rgb",
    "ensure_grayscale",
    "apply_pad_to_stride",
    "apply_resizer",
    "apply_sizematcher",
    "find_padding_for_stride",
    "generate_centroids",
    "find_instance_crop_size",
]
