"""save_predictions / analysis-export edge matrix.

Parity target: reference tests/inference/test_run.py save_predictions
scenarios — format validation, analysis-only skipping slp, empty-video
skipping, colliding-stem disambiguation — against
sleap_nn_tpu/inference/run.py save_predictions and
io/analysis.py save_analysis_h5_files.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pytest

from sleap_nn_tpu.inference.run import save_predictions
from sleap_nn_tpu.io import LabeledFrame, Labels, PredictedInstance, Skeleton
from sleap_nn_tpu.io.analysis import save_analysis_h5_files

SKEL = Skeleton(nodes=["a", "b"])


class _FakeVideo:
    def __init__(self, filename, h=32, w=32):
        self.filename = filename
        self.shape = (4, h, w, 1)

    def __len__(self):
        return 4


def _labels(video_names, frames_per_video=2):
    videos = [_FakeVideo(n) for n in video_names]
    lfs = []
    for v in videos:
        for t in range(frames_per_video):
            lfs.append(LabeledFrame(video=v, frame_idx=t, instances=[
                PredictedInstance(
                    points=np.array([[1.0 + t, 2.0], [3.0, 4.0 + t]]),
                    skeleton=SKEL, point_scores=np.ones(2), score=1.0)
            ]))
    return Labels(lfs, videos=videos, skeletons=[SKEL])


def test_invalid_output_format_raises(tmp_path):
    with pytest.raises(ValueError, match="Unknown output_format"):
        save_predictions(_labels(["/v/a.mp4"]), tmp_path / "o.slp",
                         output_format="csv")


def test_both_formats_write_slp_and_h5(tmp_path):
    # A saveable source: the embedded reference fixture with a prediction.
    from sleap_nn_tpu.io import load_slp

    labels = load_slp(
        "/root/reference/tests/assets/datasets/minimal_instance.pkg.slp"
    )
    lf = labels.labeled_frames[0]
    lf.instances.append(PredictedInstance(
        points=np.array([[5.0, 6.0], [7.0, 8.0]]),
        skeleton=labels.skeletons[0],
        point_scores=np.ones(2), score=0.9,
    ))
    out = tmp_path / "preds.slp"
    paths = save_predictions(labels, out, output_format=["slp", "analysis_h5"])
    assert out.exists()
    assert paths and all(p.exists() for p in paths)
    assert all(p.suffix == ".h5" for p in paths)


def test_analysis_only_skips_slp(tmp_path):
    out = tmp_path / "preds.slp"
    paths = save_predictions(_labels(["/v/a.mp4"]), out,
                             output_format="analysis_h5")
    assert not out.exists()
    assert len(paths) == 1


def test_one_h5_per_video_with_video_names(tmp_path):
    labels = _labels(["/data/mouse1.mp4", "/data/mouse2.mp4"])
    paths = save_analysis_h5_files(labels, tmp_path / "run.predictions.slp")
    assert len(paths) == 2
    names = sorted(p.name for p in paths)
    assert any("mouse1" in n for n in names)
    assert any("mouse2" in n for n in names)
    # .predictions.slp suffix stripped from the base stem.
    assert all(n.startswith("run") for n in names)


def test_single_video_omits_video_name(tmp_path):
    labels = _labels(["/data/mouse1.mp4"])
    (p,) = save_analysis_h5_files(labels, tmp_path / "run.slp")
    assert p.name == "run.analysis.h5"


def test_videos_without_predictions_skipped(tmp_path):
    labels = _labels(["/data/a.mp4", "/data/b.mp4"])
    # Strip predictions from video b.
    vb = labels.videos[1]
    labels.labeled_frames = [
        lf if lf.video is not vb
        else LabeledFrame(video=vb, frame_idx=lf.frame_idx, instances=[])
        for lf in labels.labeled_frames
    ]
    paths = save_analysis_h5_files(labels, tmp_path / "run.slp")
    assert len(paths) == 1
    assert "a" in paths[0].name


def test_colliding_video_stems_disambiguated(tmp_path):
    labels = _labels(["/d1/clip.mp4", "/d2/clip.mp4"])
    paths = save_analysis_h5_files(labels, tmp_path / "run.slp")
    assert len(paths) == 2
    assert len({p.name for p in paths}) == 2  # unique filenames


def test_video_index_scopes_to_one_video(tmp_path):
    labels = _labels(["/d/a.mp4", "/d/b.mp4"])
    paths = save_analysis_h5_files(labels, tmp_path / "run.slp", video_index=1)
    # One scoped target -> plain stem (no video-name infix needed).
    assert len(paths) == 1
    assert paths[0].name == "run.analysis.h5"
    import h5py

    with h5py.File(paths[0]) as f:
        assert f["video_path"][()].decode() == "/d/b.mp4"


def test_out_of_range_video_index_raises(tmp_path):
    labels = _labels(["/d/a.mp4"])
    with pytest.raises(ValueError, match="out of range"):
        save_analysis_h5_files(labels, tmp_path / "run.slp", video_index=5)
