"""Video backend scenario matrix: media / HDF5-embedded / image-list.

Parity target: the reference's sleap-io video-backend behaviors exercised
throughout its suite (shape/meta inference, grayscale conversion, frame
formats, error paths), against sleap_nn_tpu/io/video.py.
"""

from __future__ import annotations

from pathlib import Path

import cv2
import numpy as np
import pytest

from sleap_nn_tpu.io import load_slp
from sleap_nn_tpu.io.video import Video

MP4 = "/root/reference/tests/assets/datasets/small_robot.mp4"
PKG = "/root/reference/tests/assets/datasets/minimal_instance.pkg.slp"

pytestmark = pytest.mark.skipif(
    not Path(MP4).exists(), reason="reference assets unavailable"
)


# ------------------------------------------------------------ media backend


def test_media_len_and_shape():
    v = Video.from_filename(MP4)
    assert len(v) == 166
    n, h, w, c = v.shape
    assert (n, h, w, c) == (166, 320, 560, 3)


def test_media_frame_dtype_and_layout():
    v = Video.from_filename(MP4)
    f = v[0]
    assert f.dtype == np.uint8
    assert f.shape == (320, 560, 3)


def test_media_gray_format_single_channel():
    v = Video.from_filename(MP4)
    g = v.backend.get_frame(0, fmt="gray")
    assert g.shape == (320, 560, 1)
    assert g.dtype == np.uint8


def test_media_grayscale_flag_at_construction():
    v = Video.from_filename(MP4, grayscale=True)
    assert v[0].shape[-1] == 1


def test_media_out_of_range_frame_raises():
    v = Video.from_filename(MP4)
    with pytest.raises((IndexError, ValueError)):
        v[999]


def test_media_nonexistent_file():
    v = Video.from_filename("/nonexistent/clip.mp4")
    assert v.exists() is False


# ------------------------------------------------------- embedded (pkg.slp)


def test_embedded_video_frame_roundtrip():
    labels = load_slp(PKG)
    lf = labels.labeled_frames[0]
    img = lf.image
    assert img.dtype == np.uint8
    assert img.shape == (384, 384, 1)


def test_embedded_video_shape_metadata():
    labels = load_slp(PKG)
    v = labels.videos[0]
    n, h, w, c = v.shape
    assert (h, w, c) == (384, 384, 1)


# ------------------------------------------------------------- image lists


@pytest.fixture()
def png_list(tmp_path):
    paths = []
    for i in range(4):
        img = np.full((24, 32), 10 * i, np.uint8)
        p = tmp_path / f"f{i}.png"
        cv2.imwrite(str(p), img)
        paths.append(str(p))
    return paths


def test_image_list_video_len_shape(png_list):
    v = Video.from_filename(png_list)
    assert len(v) == 4
    n, h, w, c = v.shape
    assert (n, h, w) == (4, 24, 32)


def test_image_list_frames_in_order(png_list):
    v = Video.from_filename(png_list)
    for i in range(4):
        f = v[i]
        assert int(f.reshape(-1)[0]) == 10 * i


def test_image_list_grayscale(png_list):
    v = Video.from_filename(png_list, grayscale=True)
    assert v[0].shape == (24, 32, 1)


def test_image_list_out_of_range(png_list):
    v = Video.from_filename(png_list)
    with pytest.raises((IndexError, ValueError)):
        v[99]
