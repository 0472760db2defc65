"""Incremental writer + provenance + model/system info surfaces."""

import numpy as np
import pytest

from sleap_nn_tpu.inference.writer import IncrementalLabelsWriter
from sleap_nn_tpu.io import Instance, LabeledFrame, Labels, Skeleton, load_slp

SKEL = Skeleton(nodes=["a", "b"])


def _lf(i):
    return LabeledFrame(video=None, frame_idx=i,
                        instances=[Instance(np.full((2, 2), float(i)), SKEL)])


def test_writer_periodic_flush_creates_temp(tmp_path):
    out = tmp_path / "w.slp"
    w = IncrementalLabelsWriter(out, flush_every=2)
    w.add_frames([_lf(0)])
    assert not w.tmp_path.exists()  # below the flush threshold
    w.add_frames([_lf(1)])
    assert w.tmp_path.exists()  # crash-recovery temp written
    recovered = load_slp(str(w.tmp_path))
    assert len(recovered) == 2
    w.finalize()
    assert out.exists() and not w.tmp_path.exists()  # atomic rename


def test_writer_context_manager_finalizes(tmp_path):
    out = tmp_path / "ctx.slp"
    with IncrementalLabelsWriter(out, flush_every=100,
                                 provenance={"tool": "test"}) as w:
        w.add_frames([_lf(0), _lf(1), _lf(2)])
    labels = load_slp(str(out))
    assert len(labels) == 3
    assert labels.provenance.get("tool") == "test"


def test_writer_exception_leaves_temp_for_recovery(tmp_path):
    out = tmp_path / "err.slp"
    with pytest.raises(RuntimeError):
        with IncrementalLabelsWriter(out, flush_every=1) as w:
            w.add_frames([_lf(0)])
            raise RuntimeError("boom")
    assert not out.exists()
    assert w.tmp_path.exists()  # partial progress survives the crash
    assert len(load_slp(str(w.tmp_path))) == 1


def test_inference_provenance_contents(tmp_path):
    from sleap_nn_tpu.inference.provenance import build_inference_provenance

    prov = build_inference_provenance(
        ["/models/a"], stats={"fps": 10.0, "n_frames": 5, "elapsed_s": 0.5}
    )
    assert "sleap_nn_tpu_version" in prov or "model_paths" in prov
    flat = str(prov)
    assert "/models/a" in flat


def test_system_info_smoke():
    from sleap_nn_tpu.system_info import get_startup_info_string

    s = get_startup_info_string()
    assert "accelerator" in s
    assert "jax" in s.lower()
