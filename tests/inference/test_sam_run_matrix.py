"""run_sam_segmentation orchestration scenario matrix.

Reference scenario source: tests/inference/sam/test_run_sam_segmentation.py —
frame subsets, clean_empty_frames, embed self-containment, disjointify,
prompt-less frames, the predict() SAM short-circuit, and overlay edge cases.
Targets sleap_nn_tpu/inference/sam/__init__.py::run_sam_segmentation
(reference sam/__init__.py:143) using the deterministic DiskBackend fake.
"""

from __future__ import annotations

import numpy as np
import pytest

from tests.inference.test_sam import DiskBackend, make_pose_labels

from sleap_nn_tpu.inference.sam import run_sam_segmentation
from sleap_nn_tpu.io import load_slp
from sleap_nn_tpu.io.model import (
    LabeledFrame,
    Labels,
    PredictedInstance,
    Skeleton,
    Track,
)


def two_frame_labels():
    """Frame 0 with two tracked poses, frame 1 with none."""
    lab = make_pose_labels()
    lf0 = lab.labeled_frames[0]
    empty = LabeledFrame(video=lf0.video, frame_idx=1, instances=[])
    return Labels(labeled_frames=[lf0, empty], videos=lab.videos,
                  skeletons=lab.skeletons, tracks=lab.tracks)


def test_emits_masks_and_keeps_poses():
    out = run_sam_segmentation(make_pose_labels(), "sam", backend=DiskBackend())
    assert len(out[0].masks) == 2
    assert len(out[0].instances) == 2
    assert {m.track.name for m in out[0].masks} == {"animal1", "animal2"}


def test_promptless_frame_kept_with_empty_masks():
    out = run_sam_segmentation(two_frame_labels(), "sam", backend=DiskBackend())
    assert len(out.labeled_frames) == 2
    empty = next(lf for lf in out.labeled_frames if lf.frame_idx == 1)
    assert list(empty.masks) == []  # kept, nothing silently disappears


def test_clean_empty_frames_drops_maskless():
    out = run_sam_segmentation(two_frame_labels(), "sam", backend=DiskBackend(),
                               clean_empty_frames=True)
    assert [lf.frame_idx for lf in out.labeled_frames] == [0]


def test_frames_subset_existing():
    out = run_sam_segmentation(two_frame_labels(), "sam", backend=DiskBackend(),
                               frames=[0])
    with_masks = [lf for lf in out.labeled_frames if lf.masks]
    assert [lf.frame_idx for lf in with_masks] == [0]


def test_frames_subset_nonexistent_yields_no_masks():
    out = run_sam_segmentation(two_frame_labels(), "sam", backend=DiskBackend(),
                               frames=[99])
    assert all(not lf.masks for lf in out.labeled_frames)


def test_output_slp_roundtrip_not_embedded(tmp_path):
    out_path = tmp_path / "masks.slp"
    run_sam_segmentation(make_pose_labels(), "sam", backend=DiskBackend(),
                         output_path=out_path)
    back = load_slp(str(out_path))
    assert len(back[0].masks) == 2
    # not embedded: the video reference survives as a backend pointer
    assert back.videos and not getattr(back.videos[0], "embedded", False)


def test_output_slp_embed_self_contained(tmp_path):
    out_path = tmp_path / "masks_embed.pkg.slp"
    run_sam_segmentation(make_pose_labels(), "sam", backend=DiskBackend(),
                         output_path=out_path, embed=True)
    back = load_slp(str(out_path))
    img = back[0].image  # decodable without the source video on disk
    assert img is not None and img.shape[0] == 96


def test_disjointify_multi_instance_masks_do_not_overlap():
    # Two poses close together -> DiskBackend disks overlap; disjointify
    # assigns each contested pixel to exactly one mask.
    lab = make_pose_labels()
    lf = lab.labeled_frames[0]
    lf.instances[1].points[:] = np.array([[34.0, 24.0], [40.0, 28.0]])
    out = run_sam_segmentation(lab, "sam", backend=DiskBackend(radius=16),
                               disjointify_masks=True)
    m0, m1 = (np.asarray(m.mask, bool) for m in out[0].masks)
    assert not np.logical_and(m0, m1).any()
    assert m0.any() and m1.any()


def test_overlay_png_written(tmp_path):
    overlay = tmp_path / "ov.png"
    run_sam_segmentation(make_pose_labels(), "sam", backend=DiskBackend(),
                         overlay_path=overlay)
    assert overlay.exists() and overlay.stat().st_size > 0


def test_predict_sam_short_circuit(tmp_path):
    """predict(mask_backend=...) routes to SAM with no trained model."""
    from sleap_nn_tpu.inference.run import predict

    src = tmp_path / "poses.slp"
    make_pose_labels().save(str(src), embed=True)
    out_path = tmp_path / "sam_out.slp"
    result = predict(str(src), model_paths=None, mask_backend="sam",
                     sam_backend=DiskBackend(), output_path=str(out_path))
    assert out_path.exists()
    assert any(lf.masks for lf in result.labeled_frames)


def test_predict_sam_rejects_models_plus_backend(tmp_path):
    from sleap_nn_tpu.inference.run import predict

    src = tmp_path / "poses.slp"
    make_pose_labels().save(str(src), embed=True)
    with pytest.raises(ValueError):
        predict(str(src), model_paths=["/some/model"], mask_backend="sam")
