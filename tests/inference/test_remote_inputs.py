"""Remote-URL data-path routing (reference tests/cli/test_predict_remote.py).

URL inputs must not be mangled by ``Path()``; http(s) fetch to a temp file
with headers on the request; file:// resolves in place; cloud schemes give
actionable guidance.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
import pytest

from sleap_nn_tpu.inference.run import fetch_remote_data, is_remote_url

FIXTURE = "/root/reference/tests/assets/datasets/minimal_instance.pkg.slp"
CKPT = "/root/reference/tests/assets/model_ckpts/minimal_instance_single_instance"


def test_is_remote_url_truth_table():
    assert is_remote_url("http://host/a.slp")
    assert is_remote_url("https://host/a.mp4?sig=x")
    assert is_remote_url("s3://bucket/key.slp")
    assert is_remote_url("gs://bucket/key.slp")
    assert is_remote_url("file:///tmp/a.slp")
    assert not is_remote_url("/abs/path/a.slp")
    assert not is_remote_url("rel/path/a.slp")
    assert not is_remote_url("C:\\windows\\style.slp")
    assert not is_remote_url("just_a_name.mp4")


def test_fetch_file_url_resolves_in_place():
    local = fetch_remote_data(f"file://{FIXTURE}")
    assert local == FIXTURE


def test_fetch_cloud_scheme_raises_actionable():
    with pytest.raises(ValueError, match="s3"):
        fetch_remote_data("s3://bucket/key.slp")


def test_fetch_http_downloads_with_headers(monkeypatch, tmp_path):
    """http(s) URLs download via urllib with the given headers; the temp
    file preserves the URL suffix for downstream .slp/.mp4 routing."""
    import io
    import urllib.request as ur

    seen = {}

    def fake_urlopen(req, timeout=None):
        seen["url"] = req.full_url
        seen["headers"] = dict(req.header_items())
        return io.BytesIO(b"payload-bytes")

    monkeypatch.setattr(ur, "urlopen", fake_urlopen)
    # fetch_remote_data imports urlopen by name inside the function, so patch
    # the module attribute it resolves from.
    import sleap_nn_tpu.inference.run as run_mod
    local = run_mod.fetch_remote_data(
        "https://example.test/videos/clip%201.pkg.slp?sig=abc",
        headers={"Authorization": "Bearer tok"},
    )
    try:
        assert seen["url"].startswith("https://example.test/")
        assert any(k.lower() == "authorization" for k in seen["headers"])
        assert local.endswith(".pkg.slp")
        assert Path(local).read_bytes() == b"payload-bytes"
    finally:
        Path(local).unlink(missing_ok=True)


def test_predict_accepts_file_url_end_to_end():
    """A file:// URL routes through predict() unmangled and produces labels."""
    from sleap_nn_tpu.inference import predict

    out = predict(f"file://{FIXTURE}", [CKPT], peak_threshold=0.1)
    assert len(out.labeled_frames) == 1
    assert out[0].predicted_instances


def test_default_predictions_path_for_urls():
    from sleap_nn_tpu.cli import _default_predictions_path

    got = _default_predictions_path("https://h/a/b/video%20x.mp4?sig=1")
    assert got == "video x.predictions.slp"
    assert _default_predictions_path("/d/file.mp4") == "/d/file.predictions.slp"


def test_parse_headers_json():
    from sleap_nn_tpu.cli import _parse_headers

    assert _parse_headers(None) is None
    assert _parse_headers('{"A": "b"}') == {"A": "b"}
    import click
    with pytest.raises(click.UsageError):
        _parse_headers("not-json")
    with pytest.raises(click.UsageError):
        _parse_headers('["list"]')
