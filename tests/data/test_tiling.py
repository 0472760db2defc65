"""Tiling primitives + tiled inference merging tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from sleap_nn_tpu.data.tiling import (
    FrameGroupedTileSampler,
    draw_tile_origin,
    extract_tile,
    frame_foreground_centers,
    generate_tile_grid,
    tile_sample_seed,
)
from sleap_nn_tpu.inference.tile_merger import build_importance_window, merge_tiles


def test_generate_tile_grid_covers_image():
    origins = generate_tile_grid((100, 150), tile_size=64, overlap=16, output_stride=4)
    assert all(y % 4 == 0 and x % 4 == 0 for y, x in origins)
    # Far edges covered up to the stride-snap remainder (< output_stride),
    # matching reference semantics (tiles never overrun the frame).
    ys = [y for y, _ in origins]
    xs = [x for _, x in origins]
    assert max(ys) + 64 >= 100 - 3 and max(ys) <= 100 - 64
    assert max(xs) + 64 >= 150 - 3 and max(xs) <= 150 - 64
    # Row-major ordering.
    assert origins == sorted(origins, key=lambda o: (o[0], o[1]))


def test_generate_tile_grid_small_image():
    assert generate_tile_grid((32, 32), tile_size=64, overlap=16, output_stride=4) == [(0, 0)]


def test_min_overlap_enforced():
    origins = generate_tile_grid((256, 256), 64, overlap=0, output_stride=2,
                                 min_overlap_fraction=0.5)
    ys = sorted({y for y, _ in origins})
    steps = np.diff(ys)
    assert (steps <= 32).all()  # step <= tile - 0.5*tile


def test_tile_sample_seed_deterministic():
    a = tile_sample_seed(1, "v0/f3", 2, 7)
    assert a == tile_sample_seed(1, "v0/f3", 2, 7)
    assert a != tile_sample_seed(1, "v0/f3", 2, 8)
    assert a != tile_sample_seed(1, "v0/f4", 2, 7)


def test_draw_tile_origin_fg_bias():
    centers = np.array([[100.0, 80.0]])
    rng = np.random.default_rng(0)
    # Foreground slot (last slot of 4 with fraction 0.5 -> slots 2,3 are fg).
    y0, x0 = draw_tile_origin(centers, (200, 200), 64, sample_k=3,
                              samples_per_frame=4, tile_fg_fraction=0.5,
                              center_jitter=0.0, rng=rng)
    assert (y0, x0) == (80 - 32, 100 - 32)
    # Background slot: uniform draw in-bounds.
    y0, x0 = draw_tile_origin(centers, (200, 200), 64, sample_k=0,
                              samples_per_frame=4, tile_fg_fraction=0.5,
                              center_jitter=0.0, rng=rng)
    assert 0 <= y0 <= 136 and 0 <= x0 <= 136


def test_extract_tile_padding_and_instances():
    img = np.arange(40 * 40 * 1, dtype=np.uint8).reshape(40, 40, 1)
    inst = np.array([[[10.0, 12.0], [35.0, 38.0]]])
    tile, pts = extract_tile(img, inst, (-8, 4), 32)
    assert tile.shape == (32, 32, 1)
    assert (tile[:8] == 0).all()  # zero-padded above frame
    np.testing.assert_array_equal(tile[8, 0], img[0, 4])
    # First point inside: shifted coords; second outside -> NaN.
    np.testing.assert_allclose(pts[0, 0], [6.0, 20.0])
    assert np.isnan(pts[0, 1]).all()


def test_extract_tile_min_visible():
    img = np.zeros((40, 40, 1), np.uint8)
    inst = np.array([[[2.0, 2.0], [200.0, 200.0]]])
    _, pts = extract_tile(img, inst, (0, 0), 32, min_visible_keypoints=2)
    assert np.isnan(pts).all()  # only 1 visible < 2 -> dropped entirely


def test_frame_grouped_sampler_sharding():
    s0 = FrameGroupedTileSampler(10, 3, seed=5, num_replicas=2, rank=0)
    s1 = FrameGroupedTileSampler(10, 3, seed=5, num_replicas=2, rank=1)
    s0.set_epoch(2)
    s1.set_epoch(2)
    i0, i1 = list(s0), list(s1)
    frames0 = {f for f, _ in i0}
    frames1 = {f for f, _ in i1}
    assert frames0 & frames1 == set()  # disjoint frame assignment
    assert frames0 | frames1 == set(range(10))
    # Each frame's tiles contiguous.
    ks = [k for _, k in i0[:3]]
    assert ks == [0, 1, 2]


def test_importance_window_modes():
    for mode in ("gaussian", "pyramid", "constant"):
        w = np.asarray(build_importance_window((16, 16), mode))
        assert w.shape == (16, 16)
        assert 0.9 <= w.max() <= 1.0  # even-sized windows have no exact center pixel
        assert w.min() >= 1e-3
    with pytest.raises(ValueError):
        build_importance_window((8, 8), "bogus")


def test_merge_tiles_constant_recovers_signal():
    # Two overlapping tiles of a constant field must merge back to it exactly.
    canvas_hw = (32, 48)
    field = np.random.default_rng(0).uniform(size=(32, 48, 2)).astype(np.float32)
    origins = [(0, 0), (0, 16), (0, 32 - 16)]
    th = tw = 32
    tiles = []
    ok_origins = [(0, 0), (0, 16)]
    tiles = np.stack([field[y:y+th, x:x+tw] for (y, x) in ok_origins])
    w = build_importance_window((th, tw), "gaussian")
    merged = np.asarray(merge_tiles(jnp.asarray(tiles), jnp.asarray(ok_origins), canvas_hw, w))
    np.testing.assert_allclose(merged, field, atol=1e-5)


def test_halo_tile_augmentation_no_zero_wedges():
    """Rotating a halo tile then center-cropping leaves no padding wedges.

    Reference semantics: data/tiling.py:262 halo path (extract a
    ceil(tile*sqrt(2)) halo, augment, crop back to tile_size).
    """
    import dataclasses
    import math

    import jax
    import jax.numpy as jnp

    from sleap_nn_tpu.data.pipeline import PipelineContext, preprocess_batch

    tile = 64
    halo = int(math.ceil(tile * math.sqrt(2)))
    geo = dict(rotation_min=45.0, rotation_max=45.0, affine_p=1.0,
               scale_min=1.0, scale_max=1.0)
    base = dict(
        model_type="single_instance", n_nodes=1, max_instances=1,
        max_stride=8, sigma=2.5, output_stride=2,
        use_augmentations=True, geometric=geo,
    )
    key = jax.random.PRNGKey(3)

    # Halo path: all-white halo tile -> rotated -> cropped: stays all-white.
    ctx = PipelineContext(halo_crop_to=tile, **base)
    img = jnp.full((1, halo, halo, 1), 255, jnp.uint8)
    center = (halo - 1) / 2.0
    inst = jnp.array([[[[center, center]]]], jnp.float32)
    out_img, out_inst, _ = preprocess_batch(ctx, img, inst, key, train=True)
    out_img = np.asarray(out_img)
    assert out_img.shape[1:3] == (tile, tile)
    # Interior fully preserved; the outermost ring may bilinear-blend with
    # the halo boundary (the halo is the minimal sqrt(2) cover).
    assert out_img[:, 1:-1, 1:-1].min() > 0.9
    assert out_img.min() > 0.5
    # The tile-center instance stays at the (cropped) tile center.
    got = np.asarray(out_inst)[0, 0, 0]
    np.testing.assert_allclose(got, [(tile - 1) / 2.0] * 2, atol=1.5)

    # Control: the same rotation WITHOUT a halo leaves zero corners.
    ctx2 = PipelineContext(**base)
    img2 = jnp.full((1, tile, tile, 1), 255, jnp.uint8)
    inst2 = jnp.array([[[[(tile - 1) / 2.0, (tile - 1) / 2.0]]]], jnp.float32)
    out2, _, _ = preprocess_batch(ctx2, img2, inst2, key, train=True)
    assert np.asarray(out2).min() < 0.1  # wedges present


def test_tiled_dataset_halo_shapes(minimal_instance_slp):
    """use_halo emits halo-sized tiles; the plain path emits tile-sized."""
    from sleap_nn_tpu.config import TrainingJobConfig, apply_overrides
    from sleap_nn_tpu.data.pipeline import (
        TiledDataset,
        build_pipeline_context,
        make_dataset,
    )
    from sleap_nn_tpu.io import load_slp

    labels = load_slp(str(minimal_instance_slp))
    cfg = TrainingJobConfig()
    cfg.data_config.train_labels_path = [str(minimal_instance_slp)]
    apply_overrides(cfg, {
        "model_config.backbone_config.unet.filters": 8,
        "model_config.backbone_config.unet.max_stride": 8,
        "model_config.backbone_config.unet.output_stride": 2,
        "model_config.head_configs.single_instance.confmaps.output_stride": 2,
        "data_config.preprocessing.tiling.enabled": True,
        "data_config.preprocessing.tiling.tile_size": 96,
        "data_config.preprocessing.tiling.samples_per_frame": 2,
    })
    ctx = build_pipeline_context(cfg, labels, "single_instance")
    inner = make_dataset("single_instance", [labels], ctx)
    tiling = cfg.data_config.preprocessing.tiling

    plain = TiledDataset(inner, tiling, base_seed=0)
    s = plain.get_sample(0)
    assert s["image"].shape[:2] == (96, 96)

    halo = TiledDataset(inner, tiling, base_seed=0, use_halo=True)
    sh = halo.get_sample(0)
    assert sh["image"].shape[:2] == (halo.halo_size, halo.halo_size)
    assert halo.halo_size == 136  # ceil(96*sqrt(2))


def test_grid_sampling_mode_covers_image(minimal_instance_slp):
    """tiling.sampling='grid' yields the deterministic full-coverage grid."""
    from sleap_nn_tpu.config import TrainingJobConfig, apply_overrides
    from sleap_nn_tpu.data.pipeline import build_pipeline_context, make_dataset
    from sleap_nn_tpu.io import load_slp

    labels = load_slp(minimal_instance_slp)
    cfg = TrainingJobConfig()
    cfg.data_config.use_augmentations_train = False
    apply_overrides(cfg, {
        "model_config.backbone_config.unet.max_stride": 8,
        "model_config.head_configs.bottomup.confmaps.output_stride": 2,
        "model_config.head_configs.bottomup.pafs.output_stride": 2,
        "data_config.preprocessing.tiling.enabled": True,
        "data_config.preprocessing.tiling.tile_size": 192,
        "data_config.preprocessing.tiling.sampling": "grid",
        "data_config.preprocessing.tiling.min_overlap_fraction": 0.0,
    })
    ctx = build_pipeline_context(cfg, labels, "bottomup")
    from sleap_nn_tpu.data.pipeline import TiledDataset

    inner = make_dataset("bottomup", [labels], ctx)
    ds = TiledDataset(inner, cfg.data_config.preprocessing.tiling, base_seed=0)
    # 384x384 at tile 192 -> 2x2 grid.
    assert ds.samples_per_frame == 4
    tiles = [ds.get_sample(i)["image"] for i in range(4)]
    assert all(t.shape[:2] == (192, 192) for t in tiles)
    # Deterministic: re-reading yields identical pixels; the 4 tiles
    # reassemble the full frame exactly (no overlap at this geometry).
    again = ds.get_sample(0)["image"]
    np.testing.assert_array_equal(tiles[0], again)
    top = np.concatenate([tiles[0], tiles[1]], axis=1)
    bottom = np.concatenate([tiles[2], tiles[3]], axis=1)
    full = np.concatenate([top, bottom], axis=0)
    src = ds.inner.get_sample(0)["image"]
    np.testing.assert_array_equal(full, src)


def test_full_frame_pass_extra_slot(minimal_instance_slp):
    from sleap_nn_tpu.config import TrainingJobConfig, apply_overrides
    from sleap_nn_tpu.data.pipeline import build_pipeline_context, make_dataset
    from sleap_nn_tpu.io import load_slp

    labels = load_slp(minimal_instance_slp)
    cfg = TrainingJobConfig()
    cfg.data_config.use_augmentations_train = False
    apply_overrides(cfg, {
        "model_config.backbone_config.unet.max_stride": 8,
        "model_config.head_configs.bottomup.confmaps.output_stride": 2,
        "model_config.head_configs.bottomup.pafs.output_stride": 2,
        "data_config.preprocessing.tiling.enabled": True,
        "data_config.preprocessing.tiling.tile_size": 192,
        "data_config.preprocessing.tiling.samples_per_frame": 2,
        "data_config.preprocessing.tiling.full_frame_pass": True,
    })
    ctx = build_pipeline_context(cfg, labels, "bottomup")
    from sleap_nn_tpu.data.pipeline import TiledDataset

    inner = make_dataset("bottomup", [labels], ctx)
    ds = TiledDataset(inner, cfg.data_config.preprocessing.tiling, base_seed=0)
    assert ds.samples_per_frame == 3  # 2 tiles + 1 full-frame slot
    ff = ds.get_sample(2)
    assert ff["image"].shape[:2] == (192, 192)
    # The downscaled frame keeps its instances (visible, in-bounds).
    vis = ~np.isnan(ff["instances"][..., 0]).all(axis=-1)
    assert vis.sum() >= 1
    pts = ff["instances"][vis]
    assert np.nanmax(pts) <= 192
