"""Incremental-writer streaming matrix: flush boundaries + rich records.

Parity target: reference writer scenarios (video memoization covered in
the multivideo matrix; here: crash-recoverable temp readability, exact
flush cadence, mask/ROI/centroid records surviving the stream) against
sleap_nn_tpu/inference/writer.py.
"""

from __future__ import annotations

import numpy as np
import pytest

from sleap_nn_tpu.inference.writer import IncrementalLabelsWriter
from sleap_nn_tpu.io import (
    LabeledFrame,
    Labels,
    PredictedInstance,
    Skeleton,
    load_slp,
)
from sleap_nn_tpu.io.model import PredictedCentroid, PredictedROI, SegmentationMask

SKEL = Skeleton(nodes=["a", "b"])


def _frame(t, with_mask=False, with_roi=False, with_centroid=False):
    lf = LabeledFrame(video=None, frame_idx=t, instances=[
        PredictedInstance(points=np.array([[1.0 + t, 2.0], [3.0, 4.0]]),
                          skeleton=SKEL, point_scores=np.ones(2), score=0.9)
    ])
    if with_mask:
        m = np.zeros((16, 16), bool)
        m[2:6, 2:6] = True
        lf.masks = [SegmentationMask(m, score=0.8)]
    if with_roi:
        lf.rois = [PredictedROI(np.array([[1.0, 1.0], [5.0, 1.0], [5.0, 5.0]]),
                                score=0.7)]
    if with_centroid:
        lf.centroids = [PredictedCentroid(np.array([4.0, 5.0]), score=0.6)]
    return lf


def test_flush_cadence_exact(tmp_path):
    w = IncrementalLabelsWriter(tmp_path / "out.slp", flush_every=3)
    w.add_frames([_frame(0), _frame(1)])
    assert not w.tmp_path.exists()  # below the cadence
    w.add_frames([_frame(2)])
    assert w.tmp_path.exists()  # 3 frames -> flushed


def test_temp_file_readable_mid_run(tmp_path):
    w = IncrementalLabelsWriter(tmp_path / "out.slp", flush_every=2)
    w.add_frames([_frame(0), _frame(1)])
    mid = load_slp(str(w.tmp_path))
    assert len(mid.labeled_frames) == 2
    assert len(mid[0].predicted_instances) == 1


def test_finalize_removes_temp_and_writes_output(tmp_path):
    w = IncrementalLabelsWriter(tmp_path / "out.slp", flush_every=1)
    w.add_frames([_frame(0)])
    assert w.tmp_path.exists()
    w.finalize()
    assert not w.tmp_path.exists()
    assert (tmp_path / "out.slp").exists()


def test_masks_rois_centroids_survive_streaming(tmp_path):
    w = IncrementalLabelsWriter(tmp_path / "out.slp", flush_every=1)
    w.add_frames([_frame(0, with_mask=True, with_roi=True,
                         with_centroid=True)])
    w.add_frames([_frame(1, with_mask=True)])
    w.finalize()
    re = load_slp(str(tmp_path / "out.slp"))
    lf0 = re.labeled_frames[0]
    assert len(lf0.masks) == 1 and lf0.masks[0].mask.sum() == 16
    assert len(lf0.rois) == 1 and lf0.rois[0].score == pytest.approx(0.7)
    assert len(lf0.centroids) == 1
    np.testing.assert_allclose(lf0.centroids[0].point, [4.0, 5.0])
    assert len(re.labeled_frames[1].masks) == 1


def test_provenance_present_in_temp_and_final(tmp_path):
    w = IncrementalLabelsWriter(tmp_path / "out.slp", flush_every=1,
                                provenance={"pipeline": "stream"})
    w.add_frames([_frame(0)])
    assert load_slp(str(w.tmp_path)).provenance.get("pipeline") == "stream"
    w.finalize()
    assert load_slp(str(tmp_path / "out.slp")).provenance["pipeline"] == "stream"


def test_context_exit_on_exception_keeps_temp_for_recovery(tmp_path):
    with pytest.raises(RuntimeError):
        with IncrementalLabelsWriter(tmp_path / "out.slp", flush_every=1) as w:
            w.add_frames([_frame(0)])
            raise RuntimeError("crash mid-run")
    assert w.tmp_path.exists()
    assert not (tmp_path / "out.slp").exists()
    recovered = load_slp(str(w.tmp_path))
    assert len(recovered.labeled_frames) == 1


def test_double_finalize_via_context_is_single_write(tmp_path):
    with IncrementalLabelsWriter(tmp_path / "out.slp", flush_every=10) as w:
        w.add_frames([_frame(0)])
        w.finalize()
    # __exit__ must not re-finalize (temp already replaced).
    assert (tmp_path / "out.slp").exists()
    assert not w.tmp_path.exists()
