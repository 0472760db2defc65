"""Frame-by-frame identity tracking (host-side numpy/scipy).

Parity target: reference sleap_nn/tracking/ — feature extraction
(keypoints/centroids/bboxes), OKS/IoU/cosine/euclidean scoring,
Hungarian/greedy assignment, fixed-window and local-queue candidates,
optical-flow shifting, and Kalman smoothing.
"""

from sleap_nn_tpu.tracking.tracker import (
    FlowShiftTracker,
    KalmanShiftTracker,
    Tracker,
    connect_single_breaks,
    run_tracker,
)

__all__ = [
    "Tracker",
    "FlowShiftTracker",
    "KalmanShiftTracker",
    "run_tracker",
    "connect_single_breaks",
]
