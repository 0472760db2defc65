"""Export wrapper forward-contract matrix, per model family.

Parity target: reference tests/export/test_wrappers.py — each export
wrapper's forward contract (output keys, shapes, dtypes, uint8 handling,
threshold gating, input-scale coordinate lifting, knob forwarding) —
re-expressed against this repo's baked-graph builders
(sleap_nn_tpu/export/exporter.py ``_build_wrapper`` /
``_build_composite_wrapper``) on the reference fixture checkpoints. The
builders are driven directly (no StableHLO serialization) so the matrix
stays fast; serialization round-trips live in test_export_families.py.
"""

from __future__ import annotations

import copy
from pathlib import Path

import numpy as np
import pytest

from sleap_nn_tpu.export.exporter import _build_composite_wrapper, _build_wrapper
from sleap_nn_tpu.inference.loaders import load_model

CKPTS = Path("/root/reference/tests/assets/model_ckpts")

pytestmark = [pytest.mark.slow,  # integration tier
    pytest.mark.skipif(
    not CKPTS.exists(), reason="reference assets unavailable"
)]


@pytest.fixture(scope="module")
def loaded_models():
    """Reference fixture checkpoints, loaded once (torch import path)."""
    return {
        name: load_model(CKPTS / f"minimal_instance_{name}")
        for name in (
            "single_instance", "centroid", "centered_instance", "bottomup",
            "multiclass_bottomup",
        )
    }


def _fresh(loaded_models, name):
    """An isolated copy so per-test config mutation can't leak."""
    m = copy.copy(loaded_models[name])
    m.config = copy.deepcopy(m.config)
    return m


def _frames(shape, seed=0):
    return np.random.default_rng(seed).integers(0, 255, shape, dtype=np.uint8)


# ─── single_instance ─────────────────────────────────────────────────────


def test_single_instance_output_contract(loaded_models):
    m = _fresh(loaded_models, "single_instance")
    fn, input_shape, outputs = _build_wrapper(m, 0.1, 2, 200)
    assert outputs == ("pred_keypoints", "pred_peak_values")
    out = fn(_frames(input_shape))
    n_nodes = len(m.skeleton_nodes)
    assert np.asarray(out["pred_keypoints"]).shape == (2, n_nodes, 2)
    assert np.asarray(out["pred_peak_values"]).shape == (2, n_nodes)
    assert np.issubdtype(np.asarray(out["pred_keypoints"]).dtype, np.floating)


def test_single_instance_input_shape_respects_channels(loaded_models):
    m = _fresh(loaded_models, "single_instance")
    _, input_shape, _ = _build_wrapper(m, 0.1, 3, 200)
    assert input_shape[0] == 3
    expected_c = 3 if m.config.data_config.preprocessing.ensure_rgb else 1
    assert input_shape[-1] == expected_c


def test_single_instance_impossible_threshold_nans_points(loaded_models):
    m = _fresh(loaded_models, "single_instance")
    # Raw (pre-sigmoid-free) confmap heads can exceed 1.0 — use an
    # unreachable threshold, not merely an improbable one.
    fn, input_shape, _ = _build_wrapper(m, 1e6, 1, 200)
    out = fn(_frames(input_shape))
    assert np.isnan(np.asarray(out["pred_keypoints"])).all()


def test_single_instance_scale_lifts_to_input_coords(loaded_models):
    """Coordinates come back in the ORIGINAL input space at any input scale.

    The same image pushed through a scale=1.0 and a scale=0.5 wrapper must
    produce keypoints at (approximately) the same full-resolution pixels —
    the lifting divides the grid peaks by (scale * eff).
    """
    m1 = _fresh(loaded_models, "single_instance")
    m1.config.data_config.preprocessing.scale = 1.0
    fn1, shape1, _ = _build_wrapper(m1, 0.05, 1, 200)
    m2 = _fresh(loaded_models, "single_instance")
    m2.config.data_config.preprocessing.scale = 0.5
    fn2, shape2, _ = _build_wrapper(m2, 0.05, 1, 200)
    assert shape1 == shape2  # scale is internal; the input contract is fixed
    img = _frames(shape1, seed=3)
    p1 = np.asarray(fn1(img)["pred_keypoints"])
    p2 = np.asarray(fn2(img)["pred_keypoints"])
    both = ~(np.isnan(p1) | np.isnan(p2))
    if both.any():
        # Random-noise input: the two resolutions may disagree on WHICH
        # blob wins, but coordinates must stay in the same (input) frame.
        assert np.nanmax(np.abs(p1[both])) <= shape1[2]
        assert np.nanmax(np.abs(p2[both])) <= shape1[2]


# ─── centroid ────────────────────────────────────────────────────────────


def test_centroid_output_contract(loaded_models):
    m = _fresh(loaded_models, "centroid")
    fn, input_shape, outputs = _build_wrapper(m, 0.1, 2, 50)
    assert outputs == ("pred_centroids", "centroid_vals", "centroid_valid")
    out = fn(_frames(input_shape))
    assert np.asarray(out["pred_centroids"]).shape == (2, 50, 2)
    assert np.asarray(out["centroid_vals"]).shape == (2, 50)
    assert np.asarray(out["centroid_valid"]).dtype == np.bool_


def test_centroid_max_peaks_cap_forwarded(loaded_models):
    m = _fresh(loaded_models, "centroid")
    fn, input_shape, _ = _build_wrapper(m, 0.1, 1, 7)
    out = fn(_frames(input_shape))
    assert np.asarray(out["pred_centroids"]).shape == (1, 7, 2)


def test_centroid_impossible_threshold_invalidates_all(loaded_models):
    m = _fresh(loaded_models, "centroid")
    fn, input_shape, _ = _build_wrapper(m, 1e6, 1, 20)
    out = fn(_frames(input_shape))
    assert np.asarray(out["centroid_valid"]).sum() == 0


# ─── centered_instance ───────────────────────────────────────────────────


def test_centered_instance_input_is_stride_aligned_crop(loaded_models):
    m = _fresh(loaded_models, "centered_instance")
    _, input_shape, outputs = _build_wrapper(m, 0.1, 2, 200)
    assert outputs == ("pred_keypoints", "pred_peak_values")
    _, h, w, _ = input_shape
    assert h == w  # square crop
    stride = m.backbone_config.max_stride
    assert h % stride == 0


def test_centered_instance_keypoints_in_crop_coords(loaded_models):
    m = _fresh(loaded_models, "centered_instance")
    fn, input_shape, _ = _build_wrapper(m, 0.05, 2, 200)
    out = fn(_frames(input_shape))
    pts = np.asarray(out["pred_keypoints"])
    assert pts.shape == (2, len(m.skeleton_nodes), 2)
    finite = pts[~np.isnan(pts)]
    if finite.size:
        assert finite.min() >= -1.0
        assert finite.max() <= input_shape[1] + 1.0


# ─── bottomup ────────────────────────────────────────────────────────────


def test_bottomup_output_contract(loaded_models):
    m = _fresh(loaded_models, "bottomup")
    fn, input_shape, outputs = _build_wrapper(m, 0.1, 2, 100)
    assert outputs == (
        "grouped_peaks", "grouped_vals", "grouped_mask", "paf_scores",
    )
    out = fn(_frames(input_shape))
    gp = np.asarray(out["grouped_peaks"])
    n_nodes = len(m.skeleton_nodes)
    n_edges = len(m.skeleton_edges)
    assert gp.shape[0] == 2 and gp.shape[1] == n_nodes and gp.shape[-1] == 2
    k = gp.shape[2]
    assert np.asarray(out["grouped_vals"]).shape == (2, n_nodes, k)
    assert np.asarray(out["grouped_mask"]).dtype == np.bool_
    assert np.asarray(out["paf_scores"]).shape == (2, n_edges, k, k)


def test_bottomup_paf_knobs_forwarded(loaded_models):
    m = _fresh(loaded_models, "bottomup")
    fn, input_shape, _ = _build_wrapper(
        m, 0.1, 1, 100, paf_knobs={"k_per_node": 4}
    )
    out = fn(_frames(input_shape))
    assert np.asarray(out["grouped_peaks"]).shape[2] == 4


def test_bottomup_masked_slots_have_finite_scores_only_where_valid(
    loaded_models,
):
    m = _fresh(loaded_models, "bottomup")
    fn, input_shape, _ = _build_wrapper(m, 0.1, 1, 100)
    out = fn(_frames(input_shape))
    mask = np.asarray(out["grouped_mask"])
    gp = np.asarray(out["grouped_peaks"])
    # Valid slots carry finite lifted coordinates.
    assert np.isfinite(gp[mask]).all()


# ─── multi_class_bottomup ────────────────────────────────────────────────


def test_multiclass_bottomup_output_contract(loaded_models):
    m = _fresh(loaded_models, "multiclass_bottomup")
    fn, input_shape, outputs = _build_wrapper(m, 0.1, 2, 64)
    assert "class_probs" in outputs and "lift" in outputs
    out = fn(_frames(input_shape))
    head = m.head_config
    n_classes = len(head.class_maps.classes)
    probs = np.asarray(out["class_probs"])
    assert probs.shape[0] == 2 and probs.shape[-1] == n_classes
    assert np.asarray(out["lift"]).shape == (2,)
    assert np.asarray(out["valid"]).dtype == np.bool_
    # points_grid and class_probs agree on the peak axis.
    assert np.asarray(out["points_grid"]).shape[1] == probs.shape[1]


def test_multiclass_bottomup_lift_is_uniform_scalar(loaded_models):
    m = _fresh(loaded_models, "multiclass_bottomup")
    fn, input_shape, _ = _build_wrapper(m, 0.1, 3, 64)
    lift = np.asarray(fn(_frames(input_shape))["lift"])
    assert np.all(lift == lift[0])
    assert lift[0] > 0


# ─── composite topdown ───────────────────────────────────────────────────


def test_composite_topdown_contract():
    dirs = [CKPTS / "minimal_instance_centroid",
            CKPTS / "minimal_instance_centered_instance"]
    p, fn, input_shape, outputs = _build_composite_wrapper(
        dirs, 0.1, 2, 50, max_instances=5
    )
    assert p.model_type == "topdown"
    assert set(outputs) == {
        "pred_keypoints", "pred_peak_values", "pred_centroids",
        "centroid_vals", "instance_valid",
    }
    out = fn(_frames(input_shape))
    kp = np.asarray(out["pred_keypoints"])
    assert kp.shape[0] == 2 and kp.shape[1] == 5  # batch, max_instances
    assert np.asarray(out["pred_centroids"]).shape[:2] == (2, 5)


def test_composite_topdown_geometry_overrides():
    dirs = [CKPTS / "minimal_instance_centroid",
            CKPTS / "minimal_instance_centered_instance"]
    _, _, input_shape, _ = _build_composite_wrapper(
        dirs, 0.1, 1, 50, max_instances=3,
        input_height=256, input_width=512,
    )
    assert input_shape == (1, 256, 512, 1)


def test_composite_multiclass_topdown_adds_class_probs():
    dirs = [CKPTS / "minimal_instance_centroid",
            CKPTS / "minimal_instance_multiclass_centered_instance"]
    p, fn, input_shape, outputs = _build_composite_wrapper(
        dirs, 0.1, 1, 50, max_instances=4
    )
    assert p.model_type == "multi_class_topdown"
    assert outputs[-1] == "class_probs"
    out = fn(_frames(input_shape))
    assert np.asarray(out["class_probs"]).shape[:2] == (1, 4)


def test_composite_rejects_non_topdown_pairs():
    with pytest.raises(NotImplementedError, match="Composite export"):
        _build_composite_wrapper(
            [CKPTS / "minimal_instance_bottomup"], 0.1, 1, 50, max_instances=2
        )


# ─── unknown family dispatch ─────────────────────────────────────────────


def test_unknown_model_type_raises(loaded_models):
    m = _fresh(loaded_models, "single_instance")
    m.model_type = "mystery_head"
    with pytest.raises(NotImplementedError, match="mystery_head"):
        _build_wrapper(m, 0.1, 1, 200)
