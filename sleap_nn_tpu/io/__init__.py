"""Labels / video I/O: a minimal, self-contained sleap-io equivalent.

The reference depends on the external ``sleap-io`` library for the labels
data model and ``.slp`` (HDF5) serialization (reference:
sleap_nn/data/providers.py:1-40). That library is not available in this
environment, so this subpackage implements the subset of the data model and
the ``.slp`` container format the framework needs: skeletons, videos
(media / embedded / image-sequence backends), user + predicted instances,
tracks, labeled frames, and round-trippable ``.slp`` read/write.
"""

from sleap_nn_tpu.io.model import (
    Edge,
    SegmentationMask,
    Instance,
    LabeledFrame,
    Labels,
    Node,
    PredictedCentroid,
    UserCentroid,
    PredictedInstance,
    PredictedROI,
    Skeleton,
    Symmetry,
    Track,
)
from sleap_nn_tpu.io.slp import load_slp, save_slp
from sleap_nn_tpu.io.video import Video

__all__ = [
    "Edge",
    "Instance",
    "LabeledFrame",
    "Labels",
    "Node",
    "PredictedCentroid",
    "UserCentroid",
    "PredictedInstance",
    "PredictedROI",
    "SegmentationMask",
    "Skeleton",
    "Symmetry",
    "Track",
    "Video",
    "load_slp",
    "save_slp",
]


def load_file(path):
    """Load a labels file (currently only ``.slp``)."""
    return load_slp(path)
