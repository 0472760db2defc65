"""Stale media-path recovery when loading .slp files.

Parity target: the reference's sleap-io video-path resolution — labels
files move between machines with their videos beside them while the
stored (often relative) path still points at the original layout. The
loader tries the slp file's own directory, then progressively strips
leading directories from the stored path (tests/assets/datasets/
small_robot_minimal.slp stores ``tests/data/videos/small_robot.mp4``;
the mp4 actually sits next to the slp).
"""

from pathlib import Path

import numpy as np
import pytest

from sleap_nn_tpu.io import load_slp
from sleap_nn_tpu.io.video import Video

DATASETS = Path("/root/reference/tests/assets/datasets")

pytestmark = pytest.mark.skipif(
    not DATASETS.exists(), reason="reference assets unavailable"
)


def test_fixture_resolves_video_beside_slp():
    labels = load_slp(DATASETS / "small_robot_minimal.slp")
    v = labels.videos[0]
    assert v.exists(), v.filename
    assert Path(v.filename) == DATASETS / "small_robot.mp4"
    img = labels.labeled_frames[0].image
    assert img.shape == (320, 560, 3) and img.dtype == np.uint8


def test_existing_path_untouched(tmp_path):
    target = tmp_path / "real.mp4"
    target.write_bytes(b"x")
    assert Video._resolve_media_path(str(target), "/elsewhere/file.slp") == str(target)


def test_relative_path_joined_to_slp_dir(tmp_path):
    (tmp_path / "videos").mkdir()
    target = tmp_path / "videos" / "clip.mp4"
    target.write_bytes(b"x")
    resolved = Video._resolve_media_path(
        "videos/clip.mp4", str(tmp_path / "labels.slp")
    )
    assert Path(resolved) == target


def test_leading_directories_stripped(tmp_path):
    target = tmp_path / "clip.mp4"
    target.write_bytes(b"x")
    resolved = Video._resolve_media_path(
        "/home/elsewhere/project/data/clip.mp4", str(tmp_path / "labels.slp")
    )
    assert Path(resolved) == target


def test_intermediate_suffix_match(tmp_path):
    (tmp_path / "data" / "videos").mkdir(parents=True)
    target = tmp_path / "data" / "videos" / "clip.mp4"
    target.write_bytes(b"x")
    resolved = Video._resolve_media_path(
        "/original/machine/data/videos/clip.mp4", str(tmp_path / "l.slp")
    )
    assert Path(resolved) == target


def test_unresolvable_path_preserved():
    stored = "/nowhere/at/all/clip.mp4"
    assert Video._resolve_media_path(stored, "/also/nowhere/l.slp") == stored


def test_empty_and_missing_slp_path_noop():
    assert Video._resolve_media_path("", "/x/l.slp") == ""
    assert Video._resolve_media_path("a/b.mp4", None) == "a/b.mp4"


def test_predict_on_relative_path_slp(tmp_path):
    """End-to-end: predict straight off the fixture whose stored video path
    is stale — provider decode must go through the resolved mp4."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from sleap_nn_tpu.inference import predict

    out = predict(
        load_slp(DATASETS / "small_robot_minimal.slp"),
        ["/root/reference/tests/assets/model_ckpts/minimal_instance_centroid"],
        peak_threshold=0.1,
        make_labels=True,
    )
    assert len(out.labeled_frames) >= 1
