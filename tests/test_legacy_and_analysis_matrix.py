"""Legacy SLEAP-v1 config mapping, torch importer utilities, and
Analysis-HDF5 export matrix.

Reference scenario sources: tests/test_legacy_models.py (config mapping per
head family), the torch-checkpoint importer used by the fixture ckpts, and
the SLEAP Analysis HDF5 contract (run.py:42 save_analysis_h5_files).
"""

from __future__ import annotations

import json
from pathlib import Path

import h5py
import numpy as np
import pytest

from sleap_nn_tpu.io import LabeledFrame, Labels, PredictedInstance, Skeleton, Track
from sleap_nn_tpu.io.analysis import save_analysis_h5, save_analysis_h5_files
from sleap_nn_tpu.io.video import Video
from sleap_nn_tpu.legacy_models import legacy_config_mapper

LEGACY = Path("/root/reference/tests/assets/legacy_models")
CKPTS = Path("/root/reference/tests/assets/model_ckpts")


# ── legacy config mapping ────────────────────────────────────────────────────


def _legacy_cfg(name):
    p = LEGACY / name / "training_config.json"
    if not p.exists():
        pytest.skip("legacy assets unavailable")
    return json.loads(p.read_text())


def test_legacy_single_instance_mapping():
    cfg = legacy_config_mapper(_legacy_cfg("minimal_robot.UNet.single_instance"))
    assert cfg.model_config.head_configs.which() == "single_instance"
    bb = cfg.model_config.backbone_config.unet
    assert bb is not None and bb.trans_conv_phase == "tf"
    head = cfg.model_config.head_configs.single_instance.confmaps
    assert head.part_names


def test_legacy_centroid_mapping():
    cfg = legacy_config_mapper(_legacy_cfg("minimal_instance.UNet.centroid"))
    assert cfg.model_config.head_configs.which() == "centroid"


def test_legacy_centered_instance_mapping():
    cfg = legacy_config_mapper(
        _legacy_cfg("minimal_instance.UNet.centered_instance"))
    assert cfg.model_config.head_configs.which() == "centered_instance"
    assert cfg.data_config.preprocessing.crop_size


def test_legacy_bottomup_mapping():
    cfg = legacy_config_mapper(_legacy_cfg("minimal_instance.UNet.bottomup"))
    assert cfg.model_config.head_configs.which() == "bottomup"
    head = cfg.model_config.head_configs.bottomup
    assert head.pafs.edges


def test_legacy_multiclass_mappings():
    bu = legacy_config_mapper(
        _legacy_cfg("min_tracks_2node.UNet.bottomup_multiclass"))
    assert bu.model_config.head_configs.which() == "multi_class_bottomup"
    td = legacy_config_mapper(
        _legacy_cfg("min_tracks_2node.UNet.topdown_multiclass"))
    assert td.model_config.head_configs.which() == "multi_class_topdown"


def test_legacy_preprocessing_scale_mapping():
    raw = _legacy_cfg("minimal_robot.UNet.single_instance")
    cfg = legacy_config_mapper(raw)
    want = raw["data"]["preprocessing"].get("input_scaling", 1.0)
    assert cfg.data_config.preprocessing.scale == want


def test_legacy_run_name_prefix_suffix_concatenation():
    # reference trainer_config.py:432-439 intends prefix+name+suffix (its
    # ternary has a precedence bug); the mapper implements the intent.
    raw = _legacy_cfg("minimal_robot.UNet.single_instance")
    raw.setdefault("outputs", {})
    raw["outputs"].update(
        {"run_name": "run", "run_name_prefix": "pre.", "run_name_suffix": ".post"}
    )
    cfg = legacy_config_mapper(raw)
    assert cfg.trainer_config.run_name == "pre.run.post"


def test_legacy_run_name_all_empty_maps_to_none():
    raw = _legacy_cfg("minimal_robot.UNet.single_instance")
    raw.setdefault("outputs", {})
    raw["outputs"].update(
        {"run_name": None, "run_name_prefix": None, "run_name_suffix": None}
    )
    cfg = legacy_config_mapper(raw)
    assert cfg.trainer_config.run_name is None


# ── torch importer utilities ─────────────────────────────────────────────────


def test_torch_ckpt_detection():
    from sleap_nn_tpu.torch_models import is_torch_checkpoint

    ckpt = CKPTS / "minimal_instance_single_instance" / "best.ckpt"
    if not ckpt.exists():
        pytest.skip("reference ckpts unavailable")
    assert is_torch_checkpoint(ckpt)


def test_torch_state_dict_loads_tensors():
    from sleap_nn_tpu.torch_models import load_torch_state_dict

    ckpt = CKPTS / "minimal_instance_single_instance" / "best.ckpt"
    if not ckpt.exists():
        pytest.skip("reference ckpts unavailable")
    sd = load_torch_state_dict(ckpt)
    assert sd
    conv_keys = [k for k in sd if k.endswith(".weight")
                 and np.asarray(sd[k]).ndim == 4]
    assert conv_keys  # OIHW conv weights present
    # Every tensor is a plain numpy array (no torch objects leak through).
    assert all(isinstance(np.asarray(v), np.ndarray) for v in sd.values())


def test_torch_transform_layouts():
    from sleap_nn_tpu.torch_models import _transform

    conv = np.arange(2 * 3 * 4 * 5).reshape(2, 3, 4, 5).astype(np.float32)
    assert _transform(conv, "conv_kernel").shape == (4, 5, 3, 2)  # OIHW->HWIO
    dense = np.arange(6).reshape(2, 3).astype(np.float32)
    assert _transform(dense, "dense_kernel").shape == (3, 2)
    # transposed convs flip spatially AND swap in/out differently
    tk = _transform(conv, "trans_conv_kernel")
    assert tk.shape == (4, 5, 2, 3)
    assert np.isclose(tk[0, 0, 0, 0], conv[0, 0, -1, -1])
    with pytest.raises(KeyError):
        _transform(conv, "mystery")


# ── analysis HDF5 ────────────────────────────────────────────────────────────

SKEL = Skeleton(nodes=["head", "tail"], edges=[("head", "tail")])


def _pred(xy, track=None, score=0.9):
    return PredictedInstance(points=np.asarray(xy, float), skeleton=SKEL,
                             point_scores=np.array([0.7, 0.8]), score=score,
                             track=track)


def _tracked_labels(n_frames=4):
    t0, t1 = Track(name="animal_a"), Track(name="animal_b")
    v = Video(filename="v.mp4")
    lfs = []
    for i in range(n_frames):
        lfs.append(LabeledFrame(v, i, [
            _pred([[i, 0.0], [i, 5.0]], track=t0),
            _pred([[50.0 + i, 0.0], [50.0 + i, 5.0]], track=t1),
        ]))
    return Labels(lfs, videos=[v], skeletons=[SKEL], tracks=[t0, t1])


def test_analysis_h5_layout_and_values(tmp_path):
    labels = _tracked_labels()
    out = save_analysis_h5(labels, tmp_path / "a.h5")
    with h5py.File(out) as f:
        assert "tracks" in f and "node_names" in f and "track_names" in f
        tracks = f["tracks"][:]
        node_names = [n.decode() if isinstance(n, bytes) else str(n)
                      for n in f["node_names"][:]]
        assert node_names == ["head", "tail"]
        tnames = [n.decode() if isinstance(n, bytes) else str(n)
                  for n in f["track_names"][:]]
        assert tnames == ["animal_a", "animal_b"]
        # tracks shape: (n_tracks, 2, n_nodes, n_frames) (SLEAP convention)
        assert tracks.shape[0] == 2 and tracks.shape[1] == 2
        # animal_a head x at frame 2 == 2
        assert np.isclose(tracks[0, 0, 0, 2], 2.0)
        # point scores dataset aligned
        assert "point_scores" in f


def test_analysis_h5_untracked_uses_rank_order(tmp_path):
    v = Video(filename="v.mp4")
    lfs = [LabeledFrame(v, 0, [_pred([[1.0, 1.0], [2.0, 2.0]]),
                               _pred([[5.0, 5.0], [6.0, 6.0]])])]
    labels = Labels(lfs, videos=[v], skeletons=[SKEL])
    out = save_analysis_h5(labels, tmp_path / "u.h5")
    with h5py.File(out) as f:
        tnames = [n.decode() if isinstance(n, bytes) else str(n)
                  for n in f["track_names"][:]]
        assert tnames == ["track_0", "track_1"]


def test_analysis_h5_files_one_per_video(tmp_path):
    va, vb = Video(filename="a.mp4"), Video(filename="b.mp4")
    lfs = [
        LabeledFrame(va, 0, [_pred([[1.0, 1.0], [2.0, 2.0]])]),
        LabeledFrame(vb, 0, [_pred([[3.0, 3.0], [4.0, 4.0]])]),
    ]
    labels = Labels(lfs, videos=[va, vb], skeletons=[SKEL])
    outs = save_analysis_h5_files(labels, tmp_path / "pred.slp")
    assert len(outs) == 2
    for p in outs:
        assert Path(p).exists()
        assert "analysis" in Path(p).name


def test_analysis_h5_video_index_scopes(tmp_path):
    va, vb = Video(filename="a.mp4"), Video(filename="b.mp4")
    lfs = [
        LabeledFrame(va, 0, [_pred([[1.0, 1.0], [2.0, 2.0]])]),
        LabeledFrame(vb, 0, [_pred([[3.0, 3.0], [4.0, 4.0]])]),
    ]
    labels = Labels(lfs, videos=[va, vb], skeletons=[SKEL])
    outs = save_analysis_h5_files(labels, tmp_path / "pred.slp", video_index=1)
    assert len(outs) == 1
