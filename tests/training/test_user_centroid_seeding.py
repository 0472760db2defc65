"""User-centroid (pure-centroid seeding) workflow matrix.

Parity target: reference ``sio.UserCentroid`` + ``centroid_source='user'``
training and the centroid-split regression
(reference tests/training/test_model_trainer.py:642), against this repo's
UserCentroid records (io/model.py), slp round-trip (io/slp.py), dataset
encoding (data/pipeline.py _make_user_centroid_sample) and the trainer
gates (training/model_trainer.py).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pytest
pytestmark = pytest.mark.slow  # integration tier: real training loops / model builds / subprocesses


from sleap_nn_tpu.config import TrainingJobConfig, apply_overrides
from sleap_nn_tpu.io import (
    LabeledFrame,
    Labels,
    UserCentroid,
    load_slp,
)
from sleap_nn_tpu.training import ModelTrainer

FIXTURE = "/root/reference/tests/assets/datasets/minimal_instance.pkg.slp"


def _centroid_only_labels(n_frames=6):
    """Frames carrying ONLY user centroids (no pose instances)."""
    base = load_slp(FIXTURE)
    video = base.videos[0]
    frames = [
        LabeledFrame(
            video=video, frame_idx=0,
            centroids=[UserCentroid(np.array([150.0 + 5 * i, 160.0 + 3 * i])),
                       UserCentroid(np.array([260.0 - 4 * i, 240.0]))],
        )
        for i in range(n_frames)
    ]
    return Labels(labeled_frames=frames, videos=[video],
                  skeletons=base.skeletons)


def _user_centroid_cfg(tmp_path, labels_path):
    cfg = TrainingJobConfig()
    cfg.data_config.train_labels_path = [str(labels_path)]
    cfg.data_config.use_same_data_for_val = True
    cfg.data_config.use_augmentations_train = False
    cfg.data_config.preprocessing.scale = 0.5
    apply_overrides(cfg, {
        "model_config.backbone_config.unet.filters": 8,
        "model_config.backbone_config.unet.max_stride": 8,
        "model_config.backbone_config.unet.output_stride": 2,
        "model_config.head_configs.centroid.confmaps.output_stride": 2,
        "model_config.head_configs.centroid.confmaps.centroid_source": "user",
    })
    cfg.trainer_config.max_epochs = 1
    cfg.trainer_config.min_train_steps_per_epoch = 1
    cfg.trainer_config.train_data_loader.batch_size = 2
    cfg.trainer_config.val_data_loader.batch_size = 2
    cfg.trainer_config.save_ckpt = False
    cfg.trainer_config.enable_progress_bar = False
    return cfg


def test_user_centroid_slp_round_trip(tmp_path):
    labels = _centroid_only_labels(2)
    p = tmp_path / "cent.slp"
    labels.save(str(p), embed=True)
    re = load_slp(str(p))
    lf = re.labeled_frames[0]
    assert len(lf.user_centroids) == 2
    assert all(isinstance(c, UserCentroid) for c in lf.user_centroids)
    np.testing.assert_allclose(lf.user_centroids[0].point, [150.0, 160.0])
    assert not lf.instances


def test_predicted_centroids_not_misread_as_user(tmp_path):
    from sleap_nn_tpu.io import PredictedCentroid

    base = load_slp(FIXTURE)
    lf = LabeledFrame(video=base.videos[0], frame_idx=0,
                      centroids=[PredictedCentroid(np.array([10.0, 20.0]),
                                                   score=0.7)])
    labels = Labels([lf], videos=base.videos, skeletons=base.skeletons)
    p = tmp_path / "pred_cent.slp"
    labels.save(str(p), embed=True)
    re = load_slp(str(p))
    got = re.labeled_frames[0].centroids[0]
    assert not isinstance(got, UserCentroid)
    assert got.score == pytest.approx(0.7)
    assert re.labeled_frames[0].user_centroids == []


def test_split_keeps_centroid_only_frames():
    labels = _centroid_only_labels(6)
    train, val = labels.make_training_splits(
        0.75, 0.25, seed=0, include_centroid_only_frames=True
    )
    n = len(train.labeled_frames) + len(val.labeled_frames)
    assert n == 6, "pure-centroid frames were dropped by the split"
    assert len(train.labeled_frames) >= 1 and len(val.labeled_frames) >= 1


def test_split_excludes_centroid_only_frames_by_default():
    """Non-centroid model families cannot train on centroid-only frames,
    so the default split excludes them (they'd shrink the effective set)."""
    labels = _centroid_only_labels(6)
    train, val = labels.make_training_splits(0.75, 0.25, seed=0)
    assert len(train.labeled_frames) + len(val.labeled_frames) == 0


def test_max_instances_ignores_centroids_for_pose_models():
    from sleap_nn_tpu.data.providers import get_max_instances

    labels = _centroid_only_labels(2)  # 2 user centroids per frame
    assert get_max_instances(labels) == 0  # no pose instances counted
    assert get_max_instances(labels, include_user_centroids=True) == 2


def test_dataset_encodes_user_centroids_as_broadcast_instances(tmp_path):
    labels = _centroid_only_labels(3)
    p = tmp_path / "cent.slp"
    labels.save(str(p), embed=True)
    cfg = _user_centroid_cfg(tmp_path, p)
    trainer = ModelTrainer.get_model_trainer_from_config(cfg)
    trainer.setup()
    assert len(trainer.train_ds) >= 1
    s = trainer.train_ds.get_sample(0)
    assert s["num_instances"] == 2
    # Every node of instance 0 sits exactly on the annotated centroid.
    pts = s["instances"][0]
    assert np.all(pts == pts[0])
    assert not np.isnan(pts).any()
    # Padded instance rows stay NaN.
    assert np.isnan(s["instances"][2:]).all()


def test_user_centroid_training_runs_end_to_end(tmp_path):
    labels = _centroid_only_labels(4)
    p = tmp_path / "cent.slp"
    labels.save(str(p), embed=True)
    cfg = _user_centroid_cfg(tmp_path, p)
    trainer = ModelTrainer.get_model_trainer_from_config(cfg)
    history = trainer.train()
    assert np.isfinite(history[-1]["train/loss"])
    assert np.isfinite(history[-1]["val/loss"])


def test_user_source_requires_centroid_model(tmp_path):
    labels = _centroid_only_labels(2)
    p = tmp_path / "cent.slp"
    labels.save(str(p), embed=True)
    cfg = _user_centroid_cfg(tmp_path, p)
    apply_overrides(cfg, {
        "model_config.head_configs.centroid": None,
        "model_config.head_configs.single_instance.confmaps.output_stride": 2,
    })
    # single_instance confmaps has no centroid_source field in the schema;
    # force the attribute to exercise the trainer's model-type gate.
    cfg.model_config.head_configs.single_instance.confmaps.centroid_source = "user"
    with pytest.raises(ValueError, match="only applies to centroid"):
        ModelTrainer.get_model_trainer_from_config(cfg).setup()


def test_user_source_without_annotations_errors(tmp_path):
    from tests.fixture_utils import single_instance_fixture

    cfg = _user_centroid_cfg(tmp_path, single_instance_fixture())
    with pytest.raises(ValueError, match="no user-annotated centroid"):
        ModelTrainer.get_model_trainer_from_config(cfg).setup()


def test_mixed_frames_prefer_user_centroids(tmp_path):
    # A frame with BOTH pose instances and user centroids trains on the
    # annotated centroids (the user's explicit choice).
    base = load_slp(FIXTURE)
    lf0 = base.labeled_frames[0]
    lf0.centroids = [UserCentroid(np.array([100.0, 110.0]))]
    p = tmp_path / "mixed.slp"
    base.save(str(p), embed=True)
    cfg = _user_centroid_cfg(tmp_path, p)
    trainer = ModelTrainer.get_model_trainer_from_config(cfg)
    trainer.setup()
    s = trainer.train_ds.get_sample(0)
    assert s["num_instances"] == 1
    np.testing.assert_allclose(s["instances"][0, 0], [100.0, 110.0])
