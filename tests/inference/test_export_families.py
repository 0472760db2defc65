"""Export round-trips for every remaining model family.

Keypoint families use the reference fixture checkpoints (imported through
torch_models) so no training is needed; segmentation families train a
1-epoch throwaway model — the contract under test is that the exported
graph reproduces the live layer bit-for-bit, not model quality.
Reference scope: export/wrappers/*.py bakes postproc for all keypoint
families; segmentation exports are an extension beyond the reference.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pytest

from sleap_nn_tpu.config import TrainingJobConfig, apply_overrides
from sleap_nn_tpu.export import export_model
from sleap_nn_tpu.inference.predictor import Predictor
from sleap_nn_tpu.training import ModelTrainer

CKPTS = Path("/root/reference/tests/assets/model_ckpts")
FIXTURE = "/root/reference/tests/assets/datasets/minimal_instance.pkg.slp"

pytestmark = [pytest.mark.slow,  # integration tier
    pytest.mark.skipif(
    not CKPTS.exists(), reason="reference assets unavailable"
)]


def _rand_frames(n, h, w, c=1):
    rng = np.random.default_rng(0)
    return rng.integers(0, 255, (n, h, w, c), dtype=np.uint8)


def _assert_same(a, b):
    assert sorted(a) == sorted(b)
    for k in a:
        x, y = np.asarray(a[k], dtype=object), np.asarray(b[k], dtype=object)
        if x.dtype == object:  # ragged segmentation outputs
            continue
        x = np.asarray(a[k], dtype=np.float64)
        y = np.asarray(b[k], dtype=np.float64)
        both_nan = np.isnan(x) & np.isnan(y)
        assert np.array_equal(np.isnan(x), np.isnan(y))
        np.testing.assert_allclose(
            np.where(both_nan, 0, x), np.where(both_nan, 0, y), atol=1e-4
        )


def test_export_multiclass_bottomup_roundtrip(tmp_path):
    src = CKPTS / "minimal_instance_multiclass_bottomup"
    out = export_model(src, output_dir=tmp_path / "exp", batch_size=2,
                       peak_threshold=0.05)
    p = Predictor.from_export_dir(out)
    frames = _rand_frames(2, 384, 384)
    live = Predictor.from_model_paths([src], peak_threshold=0.05)
    _assert_same(p.layer.predict(frames), live.layer.predict(frames))
    assert p.class_names == ["female", "male"]


def test_export_topdown_composite_roundtrip(tmp_path):
    srcs = [CKPTS / "minimal_instance_centroid",
            CKPTS / "minimal_instance_centered_instance"]
    out = export_model(srcs, output_dir=tmp_path / "exp", batch_size=2,
                       peak_threshold=0.03, max_instances=6)
    p = Predictor.from_export_dir(out)
    assert p.model_type == "topdown"
    frames = _rand_frames(2, 384, 384)
    live = Predictor.from_model_paths(
        [str(s) for s in srcs], peak_threshold=0.03, max_instances=6
    )
    _assert_same(p.layer.predict(frames), live.layer.predict(frames))


def test_export_multiclass_topdown_composite_roundtrip(tmp_path):
    srcs = [CKPTS / "minimal_instance_centroid",
            CKPTS / "minimal_instance_multiclass_centered_instance"]
    out = export_model(srcs, output_dir=tmp_path / "exp", batch_size=2,
                       peak_threshold=0.03, max_instances=6)
    p = Predictor.from_export_dir(out)
    assert p.model_type == "multi_class_topdown"
    frames = _rand_frames(2, 384, 384)
    live = Predictor.from_model_paths(
        [str(s) for s in srcs], peak_threshold=0.03, max_instances=6
    )
    mine, ref = p.layer.predict(frames), live.layer.predict(frames)
    assert np.array_equal(mine["pred_class_inds"], ref["pred_class_inds"])
    _assert_same(
        {k: v for k, v in mine.items() if k != "pred_class_inds"},
        {k: v for k, v in ref.items() if k != "pred_class_inds"},
    )


def _train_tiny(model_type: str, head_overrides: dict, tmp_path, epochs=1):
    from tests.fixture_utils import single_instance_fixture

    cfg = TrainingJobConfig()
    cfg.data_config.train_labels_path = [
        single_instance_fixture() if model_type == "single_instance" else FIXTURE
    ]
    cfg.data_config.use_same_data_for_val = True
    cfg.data_config.use_augmentations_train = False
    cfg.data_config.preprocessing.scale = 0.25
    apply_overrides(cfg, {
        "model_config.backbone_config.unet.filters": 8,
        "model_config.backbone_config.unet.filters_rate": 1.5,
        "model_config.backbone_config.unet.max_stride": 8,
        "model_config.backbone_config.unet.output_stride": 2,
        **head_overrides,
    })
    cfg.trainer_config.max_epochs = epochs
    cfg.trainer_config.min_train_steps_per_epoch = 1
    cfg.trainer_config.train_data_loader.batch_size = 1
    cfg.trainer_config.val_data_loader.batch_size = 1
    cfg.trainer_config.save_ckpt = True
    cfg.trainer_config.ckpt_dir = str(tmp_path)
    cfg.trainer_config.run_name = f"exp_{model_type}"
    cfg.trainer_config.enable_progress_bar = False
    ModelTrainer.get_model_trainer_from_config(cfg).train()
    return tmp_path / f"exp_{model_type}"


def test_export_bottomup_segmentation_roundtrip(tmp_path):
    src = _train_tiny("bottomup_segmentation", {
        "model_config.head_configs.bottomup_segmentation.segmentation.output_stride": 2,
        "model_config.head_configs.bottomup_segmentation.center.output_stride": 2,
        "model_config.head_configs.bottomup_segmentation.offsets.output_stride": 2,
    }, tmp_path)
    out = export_model(src, output_dir=tmp_path / "exp", batch_size=1,
                       peak_threshold=0.2)
    p = Predictor.from_export_dir(out)
    frames = _rand_frames(1, 384, 384)
    res = p.layer.predict(frames)
    assert "pred_masks" in res and "pred_centroids" in res
    # The finalize shim must carry the same grid->image context as the live
    # layer (#618): stride 2 / preprocessing 0.25 -> lift 8.
    assert res["mask_scale"] == pytest.approx(8.0)
    for sm in (m for fr in res["pred_masks"] for m in fr):
        assert sm.scale == pytest.approx(8.0)


def test_export_semantic_segmentation_roundtrip(tmp_path):
    src = _train_tiny("semantic_segmentation", {
        "model_config.head_configs.semantic_segmentation.segmentation.output_stride": 2,
    }, tmp_path)
    out = export_model(src, output_dir=tmp_path / "exp", batch_size=1,
                       peak_threshold=0.2)
    p = Predictor.from_export_dir(out)
    frames = _rand_frames(1, 384, 384)
    res = p.layer.predict(frames)
    assert "pred_masks" in res and "fg_probs" in res
    assert res["mask_scale"] == pytest.approx(8.0)  # stride 2 / scale 0.25
    for sm in (m for fr in res["pred_masks"] for m in fr):
        assert sm.scale == pytest.approx(8.0)


def test_export_centered_instance_segmentation(tmp_path):
    src = _train_tiny("centered_instance_segmentation", {
        "model_config.head_configs.centered_instance_segmentation.segmentation.output_stride": 2,
        "data_config.preprocessing.crop_size": 96,
    }, tmp_path)
    out = export_model(src, output_dir=tmp_path / "exp", batch_size=2,
                       peak_threshold=0.2)
    # Crop-level export: runs standalone on crops, but a full Predictor
    # needs the centroid pairing — loading must say so.
    from sleap_nn_tpu.export import load_exported_model

    call, meta = load_exported_model(out)
    assert meta.model_type == "centered_instance_segmentation"
    crops = _rand_frames(2, meta.input_shape[1], meta.input_shape[2])
    seg = np.asarray(call(crops)["seg_probs"])
    assert seg.shape[0] == 2
    with pytest.raises(NotImplementedError, match="topdown composite"):
        Predictor.from_export_dir(out)


def test_export_precision_bf16_and_input_overrides(tmp_path):
    """--precision bf16 bakes a bfloat16 forward; --input-height/-width
    override the baked geometry. Numerics stay close to fp32."""
    import numpy as np
    src = _train_tiny("single_instance", {
        "model_config.head_configs.single_instance.confmaps.output_stride": 2,
    }, tmp_path)
    out32 = export_model(src, output_dir=tmp_path / "e32", batch_size=1,
                         peak_threshold=0.1)
    out16 = export_model(src, output_dir=tmp_path / "e16", batch_size=1,
                         peak_threshold=0.1, precision="bf16")
    from sleap_nn_tpu.export import load_exported_model

    call32, meta32 = load_exported_model(out32)
    call16, meta16 = load_exported_model(out16)
    assert meta32.input_shape == meta16.input_shape
    x = _rand_frames(1, meta32.input_shape[1], meta32.input_shape[2])
    if meta32.input_shape[-1] == 1:
        x = x[..., :1]
    p32 = np.asarray(call32(x)["pred_keypoints"])
    p16 = np.asarray(call16(x)["pred_keypoints"])
    # bf16 keypoint drift stays small (reference quotes <=0.001 px for fp16;
    # bf16 has fewer mantissa bits so allow a looser but still tight bound).
    both = np.isfinite(p32) & np.isfinite(p16)
    if both.any():
        assert np.abs(p32[both] - p16[both]).max() < 0.5

    # Input overrides change the baked shape.
    out_sz = export_model(src, output_dir=tmp_path / "esz", batch_size=1,
                          peak_threshold=0.1, input_height=192, input_width=160)
    _, meta_sz = load_exported_model(out_sz)
    assert tuple(meta_sz.input_shape[1:3]) == (192, 160)


def test_export_savedmodel_roundtrip(tmp_path):
    """fmt='savedmodel' writes a real TF SavedModel that reproduces the
    eager numerics (previously the flag silently produced StableHLO)."""
    import numpy as np
    src = _train_tiny("single_instance", {
        "model_config.head_configs.single_instance.confmaps.output_stride": 2,
    }, tmp_path)
    out = export_model(src, output_dir=tmp_path / "sm", batch_size=1,
                       peak_threshold=0.1, fmt="savedmodel")
    assert (out / "savedmodel" / "saved_model.pb").exists()
    from sleap_nn_tpu.export import load_exported_model

    call, meta = load_exported_model(out)
    assert meta.artifact == "savedmodel"
    x = _rand_frames(1, meta.input_shape[1], meta.input_shape[2])
    if meta.input_shape[-1] == 1:
        x = x[..., :1]
    got = call(x)
    assert "pred_keypoints" in got
    assert np.asarray(got["pred_keypoints"]).shape[0] == 1


def test_predict_from_savedmodel_export_dir(tmp_path):
    """predict() loads a SavedModel export dir end-to-end (run.py routing)."""
    from sleap_nn_tpu.inference import predict
    from sleap_nn_tpu.io import load_slp

    src = _train_tiny("single_instance", {
        "model_config.head_configs.single_instance.confmaps.output_stride": 2,
    }, tmp_path, epochs=20)
    out = export_model(src, output_dir=tmp_path / "sm2", batch_size=1,
                       peak_threshold=0.1, fmt="savedmodel")
    labels = predict(FIXTURE, [str(out)],
                     output_path=str(tmp_path / "sm_preds.slp"))
    back = load_slp(str(tmp_path / "sm_preds.slp"))
    assert len(back) >= 0  # routed + ran the TF graph end to end
    # Runtime mismatch errors clearly.
    import pytest as _pytest
    with _pytest.raises(ValueError, match="metadata names"):
        predict(FIXTURE, [str(out)], runtime="stablehlo", make_labels=False)
