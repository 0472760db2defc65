"""Multiclass (supervised-ID) end-to-end tests + filters + writer."""

import numpy as np
import pytest
pytestmark = pytest.mark.slow  # integration tier: real training loops / model builds / subprocesses


from sleap_nn_tpu.config import TrainingJobConfig, apply_overrides
from sleap_nn_tpu.inference import predict
from sleap_nn_tpu.inference.filters import FilterConfig, FilterPipeline
from sleap_nn_tpu.inference.writer import IncrementalLabelsWriter
from sleap_nn_tpu.io import LabeledFrame, Labels, PredictedInstance, Skeleton, Track, load_slp
from sleap_nn_tpu.training import ModelTrainer

FIXTURE = "/root/reference/tests/assets/datasets/minimal_instance.pkg.slp"


@pytest.fixture(scope="module")
def tracked_labels(tmp_path_factory):
    """Fixture labels with tracks assigned (multiclass needs identities)."""
    labels = load_slp(FIXTURE)
    t0, t1 = Track("animal_0"), Track("animal_1")
    lf = labels[0]
    lf.instances[0].track = t0
    lf.instances[1].track = t1
    labels.tracks = [t0, t1]
    p = tmp_path_factory.mktemp("mc") / "tracked.slp"
    labels.save(p, embed=True)
    return str(p)


def _train(model_type, labels_path, out_dir, epochs=80):
    cfg = TrainingJobConfig()
    cfg.data_config.train_labels_path = [labels_path]
    cfg.data_config.use_same_data_for_val = True
    cfg.data_config.use_augmentations_train = False
    cfg.data_config.preprocessing.scale = 0.5
    apply_overrides(cfg, {
        "model_config.backbone_config.unet.filters": 16,
        "model_config.backbone_config.unet.filters_rate": 1.5,
        "model_config.backbone_config.unet.max_stride": 8,
        "model_config.backbone_config.unet.output_stride": 2,
    })
    if model_type == "multi_class_bottomup":
        apply_overrides(cfg, {
            "model_config.head_configs.multi_class_bottomup.confmaps.output_stride": 2,
            "model_config.head_configs.multi_class_bottomup.confmaps.sigma": 2.5,
            "model_config.head_configs.multi_class_bottomup.class_maps.output_stride": 2,
            "model_config.head_configs.multi_class_bottomup.class_maps.sigma": 2.5,
        })
    elif model_type == "multi_class_topdown":
        apply_overrides(cfg, {
            "model_config.head_configs.multi_class_topdown.confmaps.output_stride": 2,
            "model_config.head_configs.multi_class_topdown.confmaps.sigma": 2.5,
            "model_config.head_configs.multi_class_topdown.class_vectors.num_fc_units": 32,
        })
    elif model_type == "centroid":
        apply_overrides(cfg, {
            "model_config.head_configs.centroid.confmaps.output_stride": 2,
            "model_config.head_configs.centroid.confmaps.sigma": 3.5,
        })
    cfg.trainer_config.max_epochs = epochs
    cfg.trainer_config.min_train_steps_per_epoch = 1
    cfg.trainer_config.train_data_loader.batch_size = 1
    cfg.trainer_config.val_data_loader.batch_size = 1
    cfg.trainer_config.save_ckpt = True
    cfg.trainer_config.ckpt_dir = str(out_dir)
    cfg.trainer_config.run_name = model_type
    cfg.trainer_config.enable_progress_bar = False
    cfg.trainer_config.optimizer.lr = 2e-3
    cfg.trainer_config.early_stopping.stop_training_on_plateau = False
    ModelTrainer.get_model_trainer_from_config(cfg).train()
    return str(out_dir / model_type)


def test_multiclass_bottomup_e2e(tracked_labels, tmp_path_factory):
    model = _train("multi_class_bottomup", tracked_labels, tmp_path_factory.mktemp("mcb"),
                   epochs=150)
    labels = load_slp(tracked_labels)
    gt_nodes = labels[0].numpy().reshape(-1, 2)
    out = predict(labels, [model], make_labels=True, peak_threshold=0.2)
    lf = out[0]
    preds = lf.predicted_instances
    assert 1 <= len(preds) <= 2
    # Each predicted instance carries an identity track.
    names = {p.track.name for p in preds if p.track}
    assert names <= {"animal_0", "animal_1"}
    # Every predicted (visible) node lands on SOME GT node — the grouping
    # quality itself depends on class-map training strength, which a tiny
    # overfit run only partially develops.
    for p in preds:
        for node in p.numpy():
            if np.isnan(node).any():
                continue
            assert np.linalg.norm(gt_nodes - node, axis=-1).min() < 5.0


def test_multiclass_topdown_e2e(tracked_labels, tmp_path_factory):
    ct = _train("centroid", tracked_labels, tmp_path_factory.mktemp("mct_c"))
    mi = _train("multi_class_topdown", tracked_labels, tmp_path_factory.mktemp("mct_i"))
    labels = load_slp(tracked_labels)
    gt = labels[0].numpy()
    out = predict(labels, [ct, mi], make_labels=True, max_instances=4)
    preds = out[0].predicted_instances
    assert len(preds) == 2
    names = {p.track.name for p in preds if p.track}
    # Hungarian gives distinct identities to the two instances.
    assert len(names) == 2
    for g in gt:
        best = min(np.nanmean(np.linalg.norm(p.numpy() - g, axis=-1)) for p in preds)
        assert best < 5.0


def test_filter_pipeline():
    skel = Skeleton(["a", "b", "c"])

    def mk(pts, scores, score):
        return PredictedInstance(points=np.asarray(pts, float), skeleton=skel,
                                 point_scores=np.asarray(scores, float), score=score)

    good = mk([[0, 0], [5, 5], [10, 10]], [0.9, 0.9, 0.9], 0.9)
    weak_nodes = mk([[0, 0], [5, 5], [10, 10]], [0.9, 0.05, 0.05], 0.5)
    dup = mk([[0.5, 0.5], [5.5, 5.5], [10.5, 10.5]], [0.8, 0.8, 0.8], 0.3)

    cfg = FilterConfig(min_node_confidence=0.1, min_node_count=2,
                       overlap_method="iou", overlap_threshold=0.5)
    out = FilterPipeline(cfg).apply([good, weak_nodes, dup])
    # weak_nodes loses 2 nodes -> fails min_node_count; dup suppressed by NMS.
    assert out == [good]

    cfg2 = FilterConfig(min_instance_score=0.6)
    assert FilterPipeline(cfg2).apply([good, dup]) == [good]


def test_incremental_writer(tmp_path):
    skel = Skeleton(["a", "b"])
    out = tmp_path / "w.slp"
    with IncrementalLabelsWriter(out, flush_every=2, provenance={"src": "test"}) as w:
        for i in range(5):
            inst = PredictedInstance(points=np.array([[i, i], [i + 1, i + 1]], float),
                                     skeleton=skel, score=1.0)
            w.add_frames([LabeledFrame(video=None, frame_idx=i, instances=[inst])])
        assert w.tmp_path.exists()  # intermediate flush happened
    assert out.exists()
    assert not w.tmp_path.exists()
    re = load_slp(out)
    assert len(re) == 5
    assert re.provenance["src"] == "test"
