"""Pure-function XLA/Pallas kernel library.

All image-like tensors in this framework are **channel-last** ``(B, H, W, C)``
— the TPU-native layout (the reference is NCHW PyTorch; axis order is part of
the TPU-first redesign, not a translation). All functions are jittable, use
static shapes, and encode "missing" with NaN and validity masks rather than
ragged tensors.
"""

from sleap_nn_tpu.ops.grid import gaussian_pdf, make_grid_vectors
from sleap_nn_tpu.ops.confmaps import (
    make_confmaps,
    make_multi_confmaps,
)
from sleap_nn_tpu.ops.edge_maps import (
    distance_to_edge,
    get_edge_points,
    make_edge_maps,
    make_multi_pafs,
    make_pafs,
)
from sleap_nn_tpu.ops.peaks import (
    find_global_peaks,
    find_global_peaks_rough,
    find_local_peaks,
    find_local_peaks_rough,
    integral_regression,
    nms_max_pool,
)
from sleap_nn_tpu.ops.crops import crop_bboxes, make_centered_bboxes

__all__ = [
    "crop_bboxes",
    "distance_to_edge",
    "find_global_peaks",
    "find_global_peaks_rough",
    "find_local_peaks",
    "find_local_peaks_rough",
    "gaussian_pdf",
    "get_edge_points",
    "integral_regression",
    "make_centered_bboxes",
    "make_confmaps",
    "make_edge_maps",
    "make_grid_vectors",
    "make_multi_confmaps",
    "make_multi_pafs",
    "make_pafs",
    "nms_max_pool",
]
