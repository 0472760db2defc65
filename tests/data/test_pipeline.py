"""Tests for the data pipeline: datasets, device render fns, augmentation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sleap_nn_tpu.config import TrainingJobConfig, apply_overrides
from sleap_nn_tpu.data.pipeline import (
    Loader,
    PipelineContext,
    build_pipeline_context,
    make_dataset,
    make_render_fn,
)
from sleap_nn_tpu.io import load_slp


@pytest.fixture(scope="module")
def labels():
    return load_slp("/root/reference/tests/assets/datasets/minimal_instance.pkg.slp")


def base_cfg(model_type: str, labels, **over):
    cfg = TrainingJobConfig()
    apply_overrides(cfg, {"model_config.backbone_config.unet.max_stride": 8,
                          "model_config.backbone_config.unet.output_stride": 2})
    names = labels.skeleton.node_names
    if model_type == "single_instance":
        apply_overrides(cfg, {"model_config.head_configs.single_instance.confmaps.part_names": names,
                              "model_config.head_configs.single_instance.confmaps.output_stride": 2})
    elif model_type == "centroid":
        apply_overrides(cfg, {"model_config.head_configs.centroid.confmaps.sigma": 2.5,
                              "model_config.head_configs.centroid.confmaps.output_stride": 2})
    elif model_type == "centered_instance":
        apply_overrides(cfg, {"model_config.head_configs.centered_instance.confmaps.part_names": names,
                              "model_config.head_configs.centered_instance.confmaps.output_stride": 2})
    elif model_type == "bottomup":
        apply_overrides(cfg, {
            "model_config.head_configs.bottomup.confmaps.part_names": names,
            "model_config.head_configs.bottomup.confmaps.output_stride": 2,
            "model_config.head_configs.bottomup.pafs.edges": [list(e) for e in labels.skeleton.edge_names],
            "model_config.head_configs.bottomup.pafs.output_stride": 4,
        })
    cfg.data_config.use_augmentations_train = False
    for k, v in over.items():
        apply_overrides(cfg, {k: v})
    return cfg


def test_single_instance_pipeline(labels):
    cfg = base_cfg("single_instance", labels)
    ctx = build_pipeline_context(cfg, labels, "single_instance")
    ds = make_dataset("single_instance", [labels], ctx)
    assert len(ds) == 1
    batch = ds.make_batch([0])
    assert batch["image"].shape == (1, 384, 384, 1)
    assert batch["instances"].shape == (1, 2, 2, 2)

    fn = jax.jit(lambda b: make_render_fn(ctx, train=False)(b))
    out = fn({k: jnp.asarray(v) for k, v in batch.items() if k != "batch_mask"})
    assert out["image"].shape == (1, 384, 384, 1)
    assert out["confmaps"].shape == (1, 192, 192, 2)
    # Peak of each channel at the keypoint (stride 2 coords).
    cm = np.asarray(out["confmaps"][0])
    pts = batch["instances"][0, 0]
    for k in range(2):
        yx = np.unravel_index(cm[..., k].argmax(), cm[..., k].shape)
        np.testing.assert_allclose(
            [yx[1] * 2, yx[0] * 2], pts[k], atol=2.0
        )


def test_centroid_pipeline(labels):
    cfg = base_cfg("centroid", labels)
    ctx = build_pipeline_context(cfg, labels, "centroid")
    ds = make_dataset("centroid", [labels], ctx)
    batch = ds.make_batch([0])
    out = make_render_fn(ctx, train=False)({k: jnp.asarray(v) for k, v in batch.items()})
    assert out["confmaps"].shape == (1, 192, 192, 1)
    assert out["centroids"].shape == (1, 2, 2)
    # Two blobs, one per instance centroid.
    cm = np.asarray(out["confmaps"][0, ..., 0])
    assert (cm > 0.9).sum() >= 2


def test_centered_instance_pipeline(labels):
    cfg = base_cfg("centered_instance", labels)
    ctx = build_pipeline_context(cfg, labels, "centered_instance")
    assert ctx.crop_size is not None and ctx.crop_size % 8 == 0
    ds = make_dataset("centered_instance", [labels], ctx)
    assert len(ds) == 2  # one per instance
    batch = ds.make_batch([0, 1])
    out = make_render_fn(ctx, train=False)({k: jnp.asarray(v) for k, v in batch.items()})
    cs = int(round(ctx.crop_size * ctx.scale))
    cs += (-cs) % ctx.max_stride
    assert out["image"].shape == (2, cs, cs, 1)
    assert out["confmaps"].shape == (2, cs // 2, cs // 2, 2)
    # The centered instance's keypoints must be inside the crop.
    inst = np.asarray(out["instances"])
    assert np.nanmin(inst) > 0 and np.nanmax(inst) < cs
    # Confmap peak matches shifted keypoint.
    cm = np.asarray(out["confmaps"][0, ..., 0])
    yx = np.unravel_index(cm.argmax(), cm.shape)
    np.testing.assert_allclose([yx[1] * 2, yx[0] * 2], inst[0, 0], atol=2.0)


def test_bottomup_pipeline(labels):
    cfg = base_cfg("bottomup", labels)
    ctx = build_pipeline_context(cfg, labels, "bottomup")
    ds = make_dataset("bottomup", [labels], ctx)
    batch = ds.make_batch([0])
    out = make_render_fn(ctx, train=False)({k: jnp.asarray(v) for k, v in batch.items()})
    assert out["confmaps"].shape == (1, 192, 192, 2)
    assert out["pafs"].shape == (1, 96, 96, 2)  # 1 edge -> 2 channels
    assert not np.isnan(np.asarray(out["pafs"])).any()
    assert np.abs(np.asarray(out["pafs"])).max() > 0.5


def test_scaled_pipeline(labels):
    cfg = base_cfg("single_instance", labels, **{"data_config.preprocessing.scale": 0.5})
    ctx = build_pipeline_context(cfg, labels, "single_instance")
    ds = make_dataset("single_instance", [labels], ctx)
    out = make_render_fn(ctx, train=False)(
        {k: jnp.asarray(v) for k, v in ds.make_batch([0]).items()}
    )
    assert out["image"].shape == (1, 192, 192, 1)
    assert out["confmaps"].shape == (1, 96, 96, 2)


def test_sizematcher_in_pipeline(labels):
    cfg = base_cfg(
        "single_instance", labels,
        **{"data_config.preprocessing.max_height": 512,
           "data_config.preprocessing.max_width": 448},
    )
    ctx = build_pipeline_context(cfg, labels, "single_instance")
    ds = make_dataset("single_instance", [labels], ctx)
    batch = {k: jnp.asarray(v) for k, v in ds.make_batch([0]).items()}
    out = make_render_fn(ctx, train=False)(batch)
    assert out["image"].shape == (1, 512, 448, 1)
    # eff_scale = min(512/384, 448/384) = 448/384
    assert abs(out["eff_scale"] - 448 / 384) < 1e-6
    # keypoints scaled accordingly: peak still matches.
    cm = np.asarray(out["confmaps"][0, ..., 0])
    yx = np.unravel_index(cm.argmax(), cm.shape)
    pts = np.asarray(batch["instances"][0, 0, 0]) * (448 / 384)
    np.testing.assert_allclose([yx[1] * 2, yx[0] * 2], pts, atol=2.5)


def test_augmentation_determinism_and_effect(labels):
    cfg = base_cfg("single_instance", labels)
    cfg.data_config.use_augmentations_train = True
    apply_overrides(cfg, {
        "data_config.augmentation_config.geometric.affine_p": 1.0,
        "data_config.augmentation_config.geometric.rotation_min": -30.0,
        "data_config.augmentation_config.geometric.rotation_max": 30.0,
        "data_config.augmentation_config.geometric.rotation_p": None,
        "data_config.augmentation_config.geometric.scale_p": None,
        "data_config.augmentation_config.intensity.brightness_p": 1.0,
    })
    ctx = build_pipeline_context(cfg, labels, "single_instance")
    ds = make_dataset("single_instance", [labels], ctx)
    batch = {k: jnp.asarray(v) for k, v in ds.make_batch([0]).items()}
    fn = make_render_fn(ctx, train=True)
    out1 = fn(batch, jax.random.PRNGKey(7))
    out2 = fn(batch, jax.random.PRNGKey(7))
    out3 = fn(batch, jax.random.PRNGKey(8))
    np.testing.assert_array_equal(np.asarray(out1["image"]), np.asarray(out2["image"]))
    assert not np.allclose(np.asarray(out1["image"]), np.asarray(out3["image"]))
    # Augmented keypoints track the augmented image: confmap peak == keypoint.
    cm = np.asarray(out1["confmaps"][0, ..., 0])
    inst = np.asarray(out1["instances"][0, 0, 0])
    yx = np.unravel_index(cm.argmax(), cm.shape)
    np.testing.assert_allclose([yx[1] * 2, yx[0] * 2], inst, atol=2.5)


def test_flip_symmetric_swap():
    key = jax.random.PRNGKey(0)
    from sleap_nn_tpu.data.augmentation import apply_flip_augmentation

    img = jnp.zeros((1, 8, 8, 1)).at[0, 2, 1, 0].set(1.0)
    pts = jnp.array([[[1.0, 2.0], [6.0, 5.0]]])  # (B, N, 2)
    out_img, out_pts, _ = apply_flip_augmentation(
        key, img, pts, symmetric_inds=[(0, 1)], flip_p=1.0
    )
    # x' = 7 - x and node swap.
    np.testing.assert_allclose(np.asarray(out_pts[0]), [[1.0, 5.0], [6.0, 2.0]])
    assert float(out_img[0, 2, 6, 0]) == 1.0


def test_loader_padding_and_shuffle(labels):
    cfg = base_cfg("centered_instance", labels)
    ctx = build_pipeline_context(cfg, labels, "centered_instance")
    ds = make_dataset("centered_instance", [labels], ctx)
    loader = Loader(ds, batch_size=4, shuffle=True, seed=1)
    batches = list(loader)
    assert len(batches) == 1
    b = batches[0]
    assert b["image"].shape[0] == 4  # padded to full batch
    assert b["batch_mask"].tolist() == [True, True, False, False]
    # drop_last
    loader2 = Loader(ds, batch_size=4, drop_last=True)
    assert list(loader2) == []


def test_negative_frames_and_disk_cache(labels, tmp_path):
    from sleap_nn_tpu.io.model import LabeledFrame, Labels as L

    # Add an instance-less frame -> negative sample when enabled.
    lf = labels[0]
    neg_labels = L(
        labeled_frames=[lf, LabeledFrame(video=lf.video, frame_idx=0, instances=[])],
        videos=labels.videos, skeletons=labels.skeletons,
    )
    cfg = base_cfg("single_instance", labels)
    ctx = build_pipeline_context(cfg, labels, "single_instance")

    ds = make_dataset("single_instance", [neg_labels], ctx,
                      use_negative_frames=True, negative_loss_weight=0.5)
    assert len(ds) == 2
    batch = ds.make_batch([0, 1])
    assert batch["sample_weight"].tolist() == [1.0, 0.5]
    assert np.isnan(batch["instances"][1]).all()
    # Negative sample renders zero confmaps.
    out = make_render_fn(ctx, train=False)({k: jnp.asarray(v) for k, v in batch.items()})
    assert float(out["confmaps"][1].max()) == 0.0
    assert float(out["confmaps"][0].max()) > 0.9

    # Disk cache: images spilled + reloaded identically.
    ds2 = make_dataset("single_instance", [labels], ctx,
                       cache_mode="disk", cache_dir=str(tmp_path / "cache"))
    assert "image" not in ds2.samples[0]
    s = ds2.get_sample(0)
    np.testing.assert_array_equal(s["image"], labels[0].image)


def test_tiled_dataset(labels):
    from sleap_nn_tpu.config.data_config import TilingConfig
    from sleap_nn_tpu.data.pipeline import TiledDataset

    cfg = base_cfg("single_instance", labels)
    ctx = build_pipeline_context(cfg, labels, "single_instance")
    inner = make_dataset("single_instance", [labels], ctx)
    tiling = TilingConfig(enabled=True, tile_size=128, samples_per_frame=4,
                          tile_fg_fraction=0.5, min_visible_keypoints=1)
    ds = TiledDataset(inner, tiling, base_seed=7)
    assert len(ds) == 4  # 1 frame x 4 tiles

    s = ds.get_sample(0)
    assert s["image"].shape == (128, 128, 1)
    assert s["instances"].shape == inner.get_sample(0)["instances"].shape
    # Deterministic for a fixed epoch; resamples on set_epoch.
    s2 = ds.get_sample(0)
    np.testing.assert_array_equal(s["image"], s2["image"])
    imgs_e0 = [ds.get_sample(i)["image"].copy() for i in range(4)]
    ds.set_epoch(1)
    imgs_e1 = [ds.get_sample(i)["image"] for i in range(4)]
    assert any(not np.array_equal(a, b) for a, b in zip(imgs_e0, imgs_e1))
    ds.set_epoch(0)

    # Foreground bias: the last tiles (force_fg slots) contain an instance.
    fg = ds.get_sample(3)
    assert not np.isnan(fg["instances"]).all()
    # Tile-local keypoints are inside the tile, and the confmap renders there.
    pts = fg["instances"][~np.isnan(fg["instances"][..., 0]).all(axis=-1)]
    assert np.nanmin(pts) >= 0 and np.nanmax(pts) < 128
    batch = ds.make_batch([3])
    out = make_render_fn(ctx, train=False)({k: jnp.asarray(v) for k, v in batch.items()})
    assert out["confmaps"].shape == (1, 64, 64, 2)
    cm = np.asarray(out["confmaps"][0, ..., 0])
    yx = np.unravel_index(cm.argmax(), cm.shape)
    kp = fg["instances"][np.nonzero(~np.isnan(fg["instances"][..., 0]).all(axis=-1))[0][0], 0]
    np.testing.assert_allclose([yx[1] * 2, yx[0] * 2], kp, atol=2.5)

    # Grid-count default when samples_per_frame is unset.
    auto = TiledDataset(inner, TilingConfig(enabled=True, tile_size=128))
    assert auto.samples_per_frame >= 9  # 384/128 grid with overlap

    with pytest.raises(ValueError):
        TiledDataset(inner, TilingConfig(enabled=True))


@pytest.mark.slow
def test_tiled_training_smoke(labels, tmp_path):
    """Tiled single_instance training runs end to end (2 epochs)."""
    from sleap_nn_tpu.config import TrainingJobConfig
    from sleap_nn_tpu.training import ModelTrainer

    cfg = TrainingJobConfig()
    from tests.fixture_utils import single_instance_fixture

    cfg.data_config.train_labels_path = [single_instance_fixture()]
    cfg.data_config.use_same_data_for_val = True
    cfg.data_config.use_augmentations_train = False
    apply_overrides(cfg, {
        "model_config.backbone_config.unet.filters": 8,
        "model_config.backbone_config.unet.max_stride": 8,
        "model_config.backbone_config.unet.output_stride": 2,
        "model_config.head_configs.single_instance.confmaps.output_stride": 2,
        "data_config.preprocessing.tiling.enabled": True,
        "data_config.preprocessing.tiling.tile_size": 128,
        "data_config.preprocessing.tiling.samples_per_frame": 4,
    })
    cfg.trainer_config.max_epochs = 2
    cfg.trainer_config.min_train_steps_per_epoch = 1
    cfg.trainer_config.train_data_loader.batch_size = 2
    cfg.trainer_config.val_data_loader.batch_size = 2
    cfg.trainer_config.enable_progress_bar = False
    trainer = ModelTrainer.get_model_trainer_from_config(cfg)
    history = trainer.train()
    assert len(trainer.train_ds) == 4
    assert len(history) == 2 and np.isfinite(history[-1]["train/loss"])
    assert trainer._input_shape[1:3] == (128, 128)

    # Crop-based types reject tiling.
    cfg2 = TrainingJobConfig()
    cfg2.data_config.train_labels_path = cfg.data_config.train_labels_path
    cfg2.data_config.use_same_data_for_val = True
    apply_overrides(cfg2, {
        "model_config.backbone_config.unet.max_stride": 8,
        "model_config.head_configs.centered_instance.confmaps.part_names": ["A", "B"],
        "data_config.preprocessing.tiling.enabled": True,
        "data_config.preprocessing.tiling.tile_size": 128,
    })
    with pytest.raises(ValueError, match="crop-based"):
        ModelTrainer.get_model_trainer_from_config(cfg2).train()


def test_disk_cache_knobs(labels, tmp_path):
    """use_existing_imgs reuses spilled files; cache_workers parallelizes."""
    import time
    from sleap_nn_tpu.data.pipeline import make_dataset

    ctx = build_pipeline_context(base_cfg("single_instance", labels), labels,
                                 "single_instance")
    cache = tmp_path / "imgcache"
    ds1 = make_dataset("single_instance", [labels], ctx,
                       cache_mode="disk", cache_dir=cache, cache_workers=4)
    files = sorted(cache.glob("sample_*.npy"))
    assert files
    mtimes = {f: f.stat().st_mtime_ns for f in files}
    time.sleep(0.01)

    # Re-spill with use_existing: files untouched.
    ds2 = make_dataset("single_instance", [labels], ctx,
                       cache_mode="disk", cache_dir=cache,
                       use_existing_imgs=True)
    for f in files:
        assert f.stat().st_mtime_ns == mtimes[f], "existing cache was rewritten"
    # Samples still load correctly from the reused cache.
    s = ds2.get_sample(0)
    assert s["image"].ndim == 3

    # Without use_existing the files are rewritten.
    make_dataset("single_instance", [labels], ctx,
                 cache_mode="disk", cache_dir=cache)
    assert any(f.stat().st_mtime_ns != mtimes[f] for f in files)


def test_delete_cache_imgs_after_training(tmp_path):
    from sleap_nn_tpu.config import TrainingJobConfig, apply_overrides
    from sleap_nn_tpu.training import ModelTrainer

    from tests.fixture_utils import single_instance_fixture

    cache = tmp_path / "cache"
    cfg = TrainingJobConfig()
    cfg.data_config.train_labels_path = [single_instance_fixture()]
    cfg.data_config.use_same_data_for_val = True
    cfg.data_config.use_augmentations_train = False
    cfg.data_config.preprocessing.scale = 0.25
    cfg.data_config.data_pipeline_fw = "jax_dataset_cache_img_disk"
    cfg.data_config.cache_img_path = str(cache)
    cfg.data_config.delete_cache_imgs_after_training = True
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
    cfg.trainer_config.save_ckpt = False
    cfg.trainer_config.enable_progress_bar = False
    ModelTrainer.get_model_trainer_from_config(cfg).train()
    assert not cache.exists() or not any(cache.glob("sample_*.npy"))


def test_prefetch_iterator_abandonment_releases_worker():
    """Regression: breaking out of a prefetched iterator mid-epoch must not
    leave the worker thread parked on the bounded queue."""
    import threading
    import time
    from sleap_nn_tpu.data.prefetch import PrefetchIterator

    def gen():
        for i in range(1000):
            yield i

    before = threading.active_count()
    for _ in range(8):  # epochs that each break early
        it = PrefetchIterator(gen(), prefetch=2)
        next(it)
        it.close()
    time.sleep(0.5)
    after = threading.active_count()
    assert after - before <= 1, "prefetch workers leaked"

    # GC-based release (no explicit close).
    it = PrefetchIterator(gen(), prefetch=2)
    next(it)
    del it
    import gc

    gc.collect()
    time.sleep(0.5)
    assert threading.active_count() - before <= 1
