"""Data-pipeline matrix: dataset families, loader semantics, disk spill,
negative frames, render-fn target shapes per model type.

Reference scenario source: tests/data/test_custom_datasets.py — the dataset
registry, caching knobs, negative frames, and the per-type target shapes.
"""

from __future__ import annotations

import jax
import numpy as np
import pytest

from sleap_nn_tpu.data.pipeline import (
    Loader,
    PipelineContext,
    make_dataset,
    make_render_fn,
)
from sleap_nn_tpu.io import load_slp

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


FAMILY_CLASSES = {
    "single_instance": "SingleInstanceDataset",
    "centroid": "CentroidDataset",
    "bottomup": "BottomUpDataset",
    "multi_class_bottomup": "BottomUpMultiClassDataset",
    "centered_instance": "CenteredInstanceDataset",
    "multi_class_topdown": "TopDownCenteredInstanceMultiClassDataset",
    "bottomup_segmentation": "BottomUpSegmentationDataset",
    "semantic_segmentation": "SemanticSegmentationDataset",
    "centered_instance_segmentation": "CenteredInstanceSegmentationDataset",
}


@pytest.mark.parametrize("model_type", sorted(FAMILY_CLASSES))
def test_make_dataset_registry_covers_family(model_type, labels):
    ds = make_dataset(model_type, [labels], ctx_for(model_type))
    assert type(ds).__name__ == FAMILY_CLASSES[model_type]
    assert len(ds) >= 1


def test_make_dataset_unknown_type_raises(labels):
    with pytest.raises(NotImplementedError):
        make_dataset("psychic", [labels], ctx_for("single_instance"))


def test_dataset_sample_contract(labels):
    ds = make_dataset("single_instance", [labels], ctx_for("single_instance"))
    s = ds.get_sample(0)
    assert s["image"].shape == (384, 384, 1)
    assert s["instances"].shape == (2, 2, 2)  # (max_inst, n_nodes, 2)
    assert s["num_instances"] == 2
    assert s["track_ids"].shape == (2,)
    assert s["sample_weight"] == 1.0


def test_centered_instance_one_sample_per_instance(labels):
    ds_full = make_dataset("single_instance", [labels],
                           ctx_for("single_instance"))
    ds_crops = make_dataset("centered_instance", [labels],
                            ctx_for("centered_instance"))
    # fixture: 1 frame, 2 instances -> 2 crop samples
    assert len(ds_crops) == 2 * len(ds_full)
    assert {ds_crops.get_sample(i)["center_idx"] for i in range(2)} == {0, 1}


def test_disk_spill_roundtrip(labels, tmp_path):
    ds = make_dataset("single_instance", [labels], ctx_for("single_instance"),
                      cache_mode="disk", cache_dir=str(tmp_path))
    s = ds.get_sample(0)
    assert s["image"].shape == (384, 384, 1)
    assert (tmp_path / "sample_0.npy").exists()
    assert "image" not in ds.samples[0]  # spilled, loaded lazily


def test_disk_spill_use_existing(labels, tmp_path):
    make_dataset("single_instance", [labels], ctx_for("single_instance"),
                 cache_mode="disk", cache_dir=str(tmp_path))
    mtime = (tmp_path / "sample_0.npy").stat().st_mtime_ns
    make_dataset("single_instance", [labels], ctx_for("single_instance"),
                 cache_mode="disk", cache_dir=str(tmp_path), use_existing_imgs=True)
    assert (tmp_path / "sample_0.npy").stat().st_mtime_ns == mtime


def test_loader_pads_final_batch_with_mask(labels):
    ds = make_dataset("centered_instance", [labels],
                      ctx_for("centered_instance"))
    loader = Loader(ds, batch_size=4, prefetch=0)
    (batch,) = list(loader)
    assert batch["image"].shape[0] == 4
    assert batch["batch_mask"].tolist() == [True, True, False, False]


def test_loader_drop_last(labels):
    ds = make_dataset("centered_instance", [labels],
                      ctx_for("centered_instance"))
    loader = Loader(ds, batch_size=4, prefetch=0, drop_last=True)
    assert list(loader) == [] and len(loader) == 0


def test_loader_shuffle_deterministic_per_epoch(labels):
    ds = make_dataset("centered_instance", [labels],
                      ctx_for("centered_instance"))
    l1 = Loader(ds, batch_size=2, shuffle=True, seed=3, prefetch=0)
    l2 = Loader(ds, batch_size=2, shuffle=True, seed=3, prefetch=0)
    b1 = next(iter(l1))
    b2 = next(iter(l2))
    np.testing.assert_array_equal(b1["center_idx"], b2["center_idx"])
    l1.set_epoch(1)
    # with 2 samples the epoch shuffle may or may not permute; assert the
    # loader reshuffles deterministically rather than a specific order
    b3 = next(iter(l1))
    l2.set_epoch(1)
    b4 = next(iter(l2))
    np.testing.assert_array_equal(b3["center_idx"], b4["center_idx"])


def test_negative_frames_weighted(labels):
    from sleap_nn_tpu.io import LabeledFrame, Labels

    lf = labels.labeled_frames[0]
    with_empty = Labels(
        labeled_frames=[lf, LabeledFrame(lf.video, 0, [])],
        videos=labels.videos, skeletons=labels.skeletons,
    )
    ds = make_dataset("single_instance", [with_empty],
                      ctx_for("single_instance"),
                      use_negative_frames=True, negative_loss_weight=0.5)
    weights = sorted(ds.get_sample(i)["sample_weight"] for i in range(len(ds)))
    assert weights == [0.5, 1.0]
    neg = next(s for s in (ds.get_sample(i) for i in range(len(ds)))
               if s["sample_weight"] == 0.5)
    assert neg["num_instances"] == 0
    assert np.isnan(neg["instances"]).all()


def test_negative_frames_skipped_by_default(labels):
    from sleap_nn_tpu.io import LabeledFrame, Labels

    lf = labels.labeled_frames[0]
    with_empty = Labels(
        labeled_frames=[lf, LabeledFrame(lf.video, 0, [])],
        videos=labels.videos, skeletons=labels.skeletons,
    )
    ds = make_dataset("single_instance", [with_empty],
                      ctx_for("single_instance"))
    assert len(ds) == 1


# ── render fn target shapes per family ───────────────────────────────────────


def _batch_of(ds, n=1):
    return {k: (np.asarray(v) if not isinstance(v, np.ndarray) else v)
            for k, v in ds.make_batch(list(range(n))).items()}


def test_render_single_instance_targets(labels):
    ctx = ctx_for("single_instance")
    ds = make_dataset("single_instance", [labels], ctx)
    out = make_render_fn(ctx, train=False)(_batch_of(ds))
    # scale 0.25: 384 -> 96, pad to stride 8 -> 96; confmaps at stride 2
    assert out["image"].shape == (1, 96, 96, 1)
    assert out["confmaps"].shape == (1, 48, 48, 2)
    assert float(out["confmaps"].max()) > 0.5


def test_render_centroid_targets(labels):
    ctx = ctx_for("centroid")
    ds = make_dataset("centroid", [labels], ctx)
    out = make_render_fn(ctx, train=False)(_batch_of(ds))
    assert out["confmaps"].shape == (1, 48, 48, 1)
    assert out["centroids"].shape == (1, 2, 2)


def test_render_centered_instance_crops(labels):
    ctx = ctx_for("centered_instance")
    ds = make_dataset("centered_instance", [labels], ctx)
    out = make_render_fn(ctx, train=False)(_batch_of(ds))
    # crop 96 * 0.25 = 24 px
    assert out["image"].shape == (1, 24, 24, 1)
    assert out["confmaps"].shape == (1, 12, 12, 2)


def test_render_bottomup_confmaps_and_pafs(labels):
    ctx = ctx_for("bottomup", pafs_output_stride=4)
    ds = make_dataset("bottomup", [labels], ctx)
    out = make_render_fn(ctx, train=False)(_batch_of(ds))
    assert out["confmaps"].shape == (1, 48, 48, 2)
    assert out["pafs"].shape[-1] == 2  # flattened (2 * n_edges)
    assert out["pafs"].shape[1] == 24  # stride 4


def test_render_bottomup_segmentation_targets(labels):
    ctx = ctx_for("bottomup_segmentation")
    ds = make_dataset("bottomup_segmentation", [labels], ctx)
    out = make_render_fn(ctx, train=False)(_batch_of(ds))
    assert out["segmentation"].shape == (1, 48, 48, 1)
    assert out["center_heatmap"].shape[-1] == 1
    assert out["center_offsets"].shape[-1] == 2


def test_render_train_augmentation_changes_image(labels):
    ctx = ctx_for("single_instance", use_augmentations=True,
                  geometric={"rotation_min": -30.0, "rotation_max": 30.0,
                             "affine_p": 1.0})
    ds = make_dataset("single_instance", [labels], ctx)
    fn = make_render_fn(ctx, train=True)
    batch = _batch_of(ds)
    a = fn(batch, jax.random.PRNGKey(0))
    b = fn(batch, jax.random.PRNGKey(1))
    assert not np.allclose(np.asarray(a["image"]), np.asarray(b["image"]))
    eval_out = make_render_fn(ctx, train=False)(batch)
    c = make_render_fn(ctx, train=False)(batch)
    np.testing.assert_array_equal(np.asarray(eval_out["image"]),
                                  np.asarray(c["image"]))
