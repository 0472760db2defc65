"""Inference edge cases: empty frames, NaN instances, tiny sources, batch tails.

Reference analog: tests/inference covers empty/NaN paths per layer; here the
checks run through the public predict() path on fixture-derived sources.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pytest

from sleap_nn_tpu.config import TrainingJobConfig, apply_overrides
from sleap_nn_tpu.io import load_slp
from sleap_nn_tpu.io.model import Instance, LabeledFrame, Labels
from sleap_nn_tpu.training import ModelTrainer

FIXTURE = "/root/reference/tests/assets/datasets/minimal_instance.pkg.slp"
ROBOT = "/root/reference/tests/assets/datasets/small_robot.mp4"
REF_CKPTS = Path("/root/reference/tests/assets/model_ckpts")


@pytest.fixture(scope="module")
def tiny_model(tmp_path_factory):
    from tests.fixture_utils import single_instance_fixture

    out = tmp_path_factory.mktemp("edge_models")
    cfg = TrainingJobConfig()
    cfg.data_config.train_labels_path = [single_instance_fixture()]
    cfg.data_config.use_same_data_for_val = True
    cfg.data_config.use_augmentations_train = False
    cfg.data_config.preprocessing.scale = 0.25
    apply_overrides(cfg, {
        "model_config.backbone_config.unet.filters": 8,
        "model_config.backbone_config.unet.max_stride": 8,
        "model_config.backbone_config.unet.output_stride": 2,
        "model_config.head_configs.single_instance.confmaps.output_stride": 2,
    })
    cfg.trainer_config.max_epochs = 1
    cfg.trainer_config.min_train_steps_per_epoch = 1
    cfg.trainer_config.train_data_loader.batch_size = 1
    cfg.trainer_config.val_data_loader.batch_size = 1
    cfg.trainer_config.save_ckpt = True
    cfg.trainer_config.ckpt_dir = str(out)
    cfg.trainer_config.run_name = "edge"
    cfg.trainer_config.enable_progress_bar = False
    ModelTrainer.get_model_trainer_from_config(cfg).train()
    return str(out / "edge")


def test_predict_batch_larger_than_frames(tiny_model):
    """batch_size > n_frames: the padded tail batch is masked, not predicted."""
    from sleap_nn_tpu.inference import predict

    out = predict(ROBOT, [tiny_model], frames=[0, 1], batch_size=16,
                  make_labels=True, peak_threshold=0.0)
    assert len(out) == 2
    assert sorted(lf.frame_idx for lf in out) == [0, 1]


def test_predict_single_frame(tiny_model):
    from sleap_nn_tpu.inference import predict

    out = predict(ROBOT, [tiny_model], frames=[5], batch_size=4,
                  make_labels=True, peak_threshold=0.0)
    assert len(out) == 1 and out[0].frame_idx == 5


def test_predict_on_labels_with_empty_frame(tiny_model, tmp_path):
    """A labels source containing an instance-free frame predicts cleanly."""
    from sleap_nn_tpu.inference import predict

    labels = load_slp(FIXTURE)
    lf = labels[0]
    empty = LabeledFrame(video=lf.video, frame_idx=lf.frame_idx, instances=[])
    src = Labels(labeled_frames=[empty], videos=labels.videos,
                 skeletons=labels.skeletons)
    out = predict(src, [tiny_model], make_labels=True, peak_threshold=0.0)
    assert len(out) == 1


def test_predict_raw_results_mask_padded_rows(tiny_model):
    """make_labels=False: padded tail rows are flagged invalid."""
    from sleap_nn_tpu.inference import predict

    res = predict(ROBOT, [tiny_model], frames=[0, 1, 2], batch_size=2,
                  make_labels=False, peak_threshold=0.0)
    valid_total = sum(int(np.sum(b["valid"])) for b in res)
    assert valid_total == 3
    rows_total = sum(len(b["valid"]) for b in res)
    assert rows_total == 4  # one padded row in the tail batch


def test_gt_centroid_inference_with_all_nan_instance(tmp_path):
    """Centered-instance GT-centroid flow tolerates an all-NaN instance."""
    from sleap_nn_tpu.inference import predict

    labels = load_slp(FIXTURE)
    skel = labels.skeletons[0]
    lf = labels[0]
    nan_inst = Instance(np.full((len(skel.nodes), 2), np.nan), skeleton=skel)
    lf.instances.append(nan_inst)

    ci = REF_CKPTS / "minimal_instance_centered_instance"
    if not ci.exists():
        pytest.skip("reference ckpt unavailable")
    out = predict(labels, [str(ci)], make_labels=True, peak_threshold=0.1)
    assert len(out) >= 1


def test_bottomup_no_detections_frame(tiny_model):
    """An impossible threshold yields frames with zero instances, no crash."""
    from sleap_nn_tpu.inference import predict

    bu = REF_CKPTS / "minimal_instance_bottomup"
    if not bu.exists():
        pytest.skip("reference ckpt unavailable")
    out = predict(ROBOT, [str(bu)], frames=[0, 1], make_labels=True,
                  peak_threshold=0.999)
    assert all(len(lf.predicted_instances) == 0 for lf in out)


def test_predict_empty_frame_list_yields_nothing(tiny_model):
    from sleap_nn_tpu.inference import predict

    out = predict(ROBOT, [tiny_model], frames=[], make_labels=True)
    assert len(out) == 0


def test_model_path_resolution_forms(tmp_path):
    """Dir / trailing slash / best.ckpt / training_config.yaml / other files
    all resolve to the model dir; unrelated paths raise (reference
    tests/inference/test_compat_shims.py)."""
    from sleap_nn_tpu.config.utils import resolve_model_dir

    d = tmp_path / "model"
    d.mkdir()
    (d / "training_config.yaml").write_text("x: 1\n")
    (d / "best.ckpt").mkdir()  # orbax ckpts are directories
    (d / "training_log.csv").write_text("epoch\n")

    assert resolve_model_dir(d) == d
    assert resolve_model_dir(str(d) + "/") == d
    assert resolve_model_dir(d / "best.ckpt") == d
    assert resolve_model_dir(d / "training_config.yaml") == d
    assert resolve_model_dir(d / "training_log.csv") == d

    with pytest.raises(FileNotFoundError):
        resolve_model_dir(tmp_path / "nope")
    empty = tmp_path / "empty"
    empty.mkdir()
    with pytest.raises(FileNotFoundError):
        resolve_model_dir(empty)


def test_load_model_honors_explicit_ckpt(tmp_path):
    """Pointing -m at a specific .ckpt loads THOSE weights (e.g. a
    save_top_k epoch checkpoint), not best.ckpt."""
    import jax
    import numpy as np
    from sleap_nn_tpu.config import TrainingJobConfig, apply_overrides
    from sleap_nn_tpu.inference.loaders import load_model
    from sleap_nn_tpu.training import ModelTrainer

    from tests.fixture_utils import single_instance_fixture

    cfg = TrainingJobConfig()
    cfg.data_config.train_labels_path = [single_instance_fixture()]
    cfg.data_config.use_same_data_for_val = True
    cfg.data_config.use_augmentations_train = False
    cfg.data_config.preprocessing.scale = 0.25
    apply_overrides(cfg, {
        "model_config.backbone_config.unet.filters": 8,
        "model_config.backbone_config.unet.max_stride": 8,
        "model_config.backbone_config.unet.output_stride": 2,
        "model_config.head_configs.single_instance.confmaps.output_stride": 2,
    })
    cfg.trainer_config.max_epochs = 1
    cfg.trainer_config.min_train_steps_per_epoch = 1
    cfg.trainer_config.train_data_loader.batch_size = 1
    cfg.trainer_config.val_data_loader.batch_size = 1
    cfg.trainer_config.save_ckpt = True
    cfg.trainer_config.ckpt_dir = str(tmp_path)
    cfg.trainer_config.run_name = "m"
    cfg.trainer_config.enable_progress_bar = False
    cfg.trainer_config.model_ckpt.save_last = True
    trainer = ModelTrainer.get_model_trainer_from_config(cfg)
    trainer.train()
    run = tmp_path / "m"

    via_dir = load_model(run)
    via_last = load_model(run / "last.ckpt")
    a = jax.tree_util.tree_leaves(via_dir.params)
    b = jax.tree_util.tree_leaves(via_last.params)
    # Same single-epoch run: best == last here; the point is both FORMS load.
    assert all(np.allclose(x, y) for x, y in zip(a, b))
    assert via_last.model_type == "single_instance"


def test_host_resize_single_dim_sizematch():
    """Regression: host_resize with only ONE of max_height/max_width set
    must sizematch like the device path (it silently skipped before)."""
    import numpy as np
    from sleap_nn_tpu.inference.predictor import Predictor

    p = Predictor.__new__(Predictor)
    p._host_transform = (1.0, 256, None)  # scale=1, max_height only
    frames = np.zeros((2, 320, 560, 1), np.uint8)
    out, eff = Predictor._apply_host_resize(p, frames)
    assert eff == pytest.approx(256 / 320)
    assert out.shape[1] == 256
    assert out.shape[2] == int(round(560 * 256 / 320))

    # Width-only cap.
    p._host_transform = (1.0, None, 280)
    out2, eff2 = Predictor._apply_host_resize(p, frames)
    assert eff2 == pytest.approx(0.5)
    assert out2.shape[1:3] == (160, 280)

    # No caps, scale 1: exact passthrough.
    p._host_transform = (1.0, None, None)
    out3, eff3 = Predictor._apply_host_resize(p, frames)
    assert eff3 == 1.0 and out3.shape == frames.shape
