"""Negative-frame scenario matrix.

Reference scenario source: tests/data/test_negative_frames.py — the
user-confirmed-negatives collection rule, zero-target rendering per model
family, the `is_negative`/weight plumbing, and the `negative_loss_weight > 0`
config validator (reference data_config.py:363).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pytest
pytestmark = pytest.mark.slow  # integration tier: real model builds / e2e flows


from sleap_nn_tpu.data.pipeline import (
    Loader,
    PipelineContext,
    make_dataset,
    make_render_fn,
)
from sleap_nn_tpu.io import LabeledFrame, Labels, load_slp
from sleap_nn_tpu.io.model import Instance, PredictedInstance

FIXTURE = "/root/reference/tests/assets/datasets/minimal_instance.pkg.slp"


@pytest.fixture(scope="module")
def labels():
    return load_slp(FIXTURE)


def ctx_for(model_type, **kw):
    base = dict(model_type=model_type, n_nodes=2, max_instances=2,
                edge_inds=((0, 1),), scale=0.25, max_stride=8,
                output_stride=2, crop_size=96)
    base.update(kw)
    return PipelineContext(**base)


def with_extra(labels, extra_lfs):
    lf = labels.labeled_frames[0]
    return Labels(labeled_frames=[lf] + extra_lfs, videos=labels.videos,
                  skeletons=labels.skeletons)


# -- collection rule --------------------------------------------------------


def test_negative_frames_property_lists_empty_frames(labels):
    lf = labels.labeled_frames[0]
    empty = LabeledFrame(lf.video, 0, [])
    lab = with_extra(labels, [empty])
    assert lab.negative_frames == [empty]


def test_negative_frames_property_empty_when_all_labeled(labels):
    assert labels.negative_frames == []


def test_all_oob_instance_frame_is_not_a_negative(labels):
    # A frame whose instances are all out-of-bounds is an annotation error:
    # process_lf returns None but it must NOT become a negative sample
    # (reference collects only labels.negative_frames).
    lf = labels.labeled_frames[0]
    sk = labels.skeletons[0]
    oob = Instance(np.full((len(sk), 2), -50.0), sk)
    bad = LabeledFrame(lf.video, 0, [oob])
    ds = make_dataset("single_instance", [with_extra(labels, [bad])],
                      ctx_for("single_instance"),
                      use_negative_frames=True)
    assert len(ds) == 1  # only the positive frame
    assert ds.get_sample(0)["num_instances"] > 0


def test_predicted_only_frame_is_not_a_negative(labels):
    # Predicted-only frames train on predictions (process_lf keeps them when
    # no user instances exist) — they are not user-confirmed negatives.
    lf = labels.labeled_frames[0]
    sk = labels.skeletons[0]
    pred = PredictedInstance(np.array([[10.0, 10.0], [20.0, 20.0]]), sk,
                             score=0.9)
    predf = LabeledFrame(lf.video, 0, [pred])
    ds = make_dataset("single_instance", [with_extra(labels, [predf])],
                      ctx_for("single_instance"),
                      use_negative_frames=True)
    weights = [ds.get_sample(i)["sample_weight"] for i in range(len(ds))]
    assert len(ds) == 2 and all(w == 1.0 for w in weights)


def test_negatives_included_once_each(labels):
    lf = labels.labeled_frames[0]
    negs = [LabeledFrame(lf.video, 0, []), LabeledFrame(lf.video, 0, [])]
    ds = make_dataset("single_instance", [with_extra(labels, negs)],
                      ctx_for("single_instance"),
                      use_negative_frames=True, negative_loss_weight=0.25)
    weights = sorted(ds.get_sample(i)["sample_weight"] for i in range(len(ds)))
    assert weights == [0.25, 0.25, 1.0]


def test_negatives_collected_across_label_files(labels):
    lf = labels.labeled_frames[0]
    lab1 = with_extra(labels, [LabeledFrame(lf.video, 0, [])])
    lab2 = with_extra(labels, [LabeledFrame(lf.video, 0, [])])
    ds = make_dataset("single_instance", [lab1, lab2],
                      ctx_for("single_instance"), use_negative_frames=True,
                      negative_loss_weight=0.5)
    weights = sorted(ds.get_sample(i)["sample_weight"] for i in range(len(ds)))
    assert weights == [0.5, 0.5, 1.0, 1.0]


# -- sample contract --------------------------------------------------------


def test_negative_sample_contract(labels):
    lf = labels.labeled_frames[0]
    ds = make_dataset("single_instance",
                      [with_extra(labels, [LabeledFrame(lf.video, 0, [])])],
                      ctx_for("single_instance"),
                      use_negative_frames=True, negative_loss_weight=0.5)
    neg = next(ds.get_sample(i) for i in range(len(ds))
               if ds.get_sample(i)["sample_weight"] == 0.5)
    assert neg["num_instances"] == 0
    assert np.isnan(neg["instances"]).all()
    assert neg["instances"].shape == (2, 2, 2)
    assert (neg["track_ids"] == -1).all()
    assert neg["image"].ndim == 3


# -- zero-target rendering per family ---------------------------------------


@pytest.mark.parametrize("model_type,target", [
    ("single_instance", "confmaps"),
    ("centroid", "confmaps"),
    ("bottomup", "confmaps"),
])
def test_negative_frame_renders_zero_targets(labels, model_type, target):
    lf = labels.labeled_frames[0]
    ds = make_dataset(model_type,
                      [with_extra(labels, [LabeledFrame(lf.video, 0, [])])],
                      ctx_for(model_type),
                      use_negative_frames=True, negative_loss_weight=0.5)
    loader = Loader(ds, batch_size=len(ds), shuffle=False, drop_last=False)
    batch = next(iter(loader))
    render = make_render_fn(ctx_for(model_type), train=False)
    out = render({k: jnp.asarray(v) for k, v in batch.items()})
    neg_rows = np.flatnonzero(np.asarray(batch["sample_weight"]) == 0.5)
    assert neg_rows.size == 1
    cms = np.asarray(out[target])
    assert float(np.abs(cms[neg_rows[0]]).max()) == 0.0
    pos_rows = np.flatnonzero(np.asarray(batch["sample_weight"]) == 1.0)
    assert float(cms[pos_rows[0]].max()) > 0.1


def test_negative_frame_bottomup_pafs_zero(labels):
    lf = labels.labeled_frames[0]
    ds = make_dataset("bottomup",
                      [with_extra(labels, [LabeledFrame(lf.video, 0, [])])],
                      ctx_for("bottomup"),
                      use_negative_frames=True, negative_loss_weight=0.5)
    loader = Loader(ds, batch_size=len(ds), shuffle=False, drop_last=False)
    batch = next(iter(loader))
    render = make_render_fn(ctx_for("bottomup"), train=False)
    out = render({k: jnp.asarray(v) for k, v in batch.items()})
    neg = np.flatnonzero(np.asarray(batch["sample_weight"]) == 0.5)[0]
    assert float(np.abs(np.asarray(out["pafs"])[neg]).max()) == 0.0


def test_batch_sample_weight_vector_mixes_pos_and_neg(labels):
    lf = labels.labeled_frames[0]
    ds = make_dataset("single_instance",
                      [with_extra(labels, [LabeledFrame(lf.video, 0, [])])],
                      ctx_for("single_instance"),
                      use_negative_frames=True, negative_loss_weight=0.3)
    loader = Loader(ds, batch_size=2, shuffle=False, drop_last=False)
    batch = next(iter(loader))
    assert sorted(batch["sample_weight"].tolist()) == pytest.approx([0.3, 1.0])


# -- config validator --------------------------------------------------------


REF_CFG = ("/root/reference/tests/assets/model_ckpts/"
           "minimal_instance_single_instance/training_config.yaml")


@pytest.mark.parametrize("bad", [0.0, -1.0])
def test_negative_loss_weight_rejects_nonpositive(bad):
    from sleap_nn_tpu.config import TrainingJobConfig
    from sleap_nn_tpu.config.training_job_config import verify_training_cfg

    cfg = TrainingJobConfig.load_yaml(REF_CFG)
    cfg.data_config.negative_loss_weight = bad
    with pytest.raises(ValueError, match="negative_loss_weight"):
        verify_training_cfg(cfg)


def test_negative_loss_weight_accepts_default():
    from sleap_nn_tpu.config import TrainingJobConfig
    from sleap_nn_tpu.config.training_job_config import verify_training_cfg

    cfg = TrainingJobConfig.load_yaml(REF_CFG)
    assert cfg.data_config.negative_loss_weight == 1.0
    verify_training_cfg(cfg)


def test_crop_level_dataset_skips_negatives(labels):
    """Centered-instance (crop-level) datasets have no frame-level sample
    to attach a negative to: negatives are skipped even when requested
    (reference custom_datasets.py:4862-4872 disables them with a warning)."""
    ds_neg = make_dataset("centered_instance", [labels],
                          ctx_for("centered_instance"),
                          use_negative_frames=True)
    ds_plain = make_dataset("centered_instance", [labels],
                            ctx_for("centered_instance"),
                            use_negative_frames=False)
    assert len(ds_neg) == len(ds_plain)
    assert ds_neg.supports_negative_frames is False
    # And every sample still carries its crop selector — a mixed batch
    # could otherwise KeyError at collate time.
    for i in range(len(ds_neg)):
        assert "center_idx" in ds_neg.samples[i]


def test_trainer_warns_and_disables_negatives_for_crop_models(tmp_path):
    import warnings as _w

    from tests.training.test_trainer import make_cfg
    from sleap_nn_tpu.training import ModelTrainer

    cfg = make_cfg("centered_instance", tmp_path)
    cfg.data_config.use_negative_frames = True
    cfg.trainer_config.save_ckpt = False
    cfg.trainer_config.max_epochs = 1
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        trainer = ModelTrainer.get_model_trainer_from_config(cfg)
        trainer.setup()
    assert any("does not support frame-level negatives" in str(r.message)
               for r in rec)
    assert trainer.train_ds.use_negative_frames is False
