"""Predicting directly with SLEAP-v1 (Keras) model directories.

Parity target: reference inference/loaders.py:193-206 — the loader
auto-detects a legacy model dir (training_config.json + best_model.h5),
converts the Keras weights into the native model, and every predictor
family runs on it drop-in. The weight-mapping exactness itself is locked
by tests/test_legacy_models.py (dummy_activations oracles); this file
covers the INFERENCE wiring.
"""

from pathlib import Path

import pytest

from sleap_nn_tpu.config.utils import resolve_model_dir
from sleap_nn_tpu.inference import predict
from sleap_nn_tpu.inference.loaders import load_model
from sleap_nn_tpu.io import load_slp

LEGACY = Path("/root/reference/tests/assets/legacy_models")
FIXTURE = "/root/reference/tests/assets/datasets/minimal_instance.pkg.slp"

pytestmark = [pytest.mark.slow,  # integration tier
    pytest.mark.skipif(
    not LEGACY.exists(), reason="reference assets unavailable"
)]


def test_resolve_model_dir_accepts_legacy_layout():
    d = LEGACY / "minimal_instance.UNet.centroid"
    assert resolve_model_dir(d) == d


def test_resolve_model_dir_rejects_json_without_weights(tmp_path):
    (tmp_path / "training_config.json").write_text("{}")
    with pytest.raises(FileNotFoundError):
        resolve_model_dir(tmp_path)


def test_load_model_converts_legacy_centroid():
    m = load_model(LEGACY / "minimal_instance.UNet.centroid")
    assert m.model_type == "centroid"
    assert m.params is not None
    # jsonpickle skeleton decoded into node names.
    assert len(m.skeleton_nodes) == 2


def test_predict_with_lone_legacy_centroid():
    labels = load_slp(FIXTURE)
    out = predict(labels, [LEGACY / "minimal_instance.UNet.centroid"],
                  peak_threshold=0.1, max_instances=4)
    assert len(out.labeled_frames) == 1
    insts = out.labeled_frames[0].predicted_instances
    assert insts
    for i in insts:
        assert i.numpy().shape == (1, 2)  # single-node centroid skeleton


def test_predict_with_legacy_topdown_pair():
    labels = load_slp(FIXTURE)
    out = predict(
        labels,
        [LEGACY / "minimal_instance.UNet.centroid",
         LEGACY / "minimal_instance.UNet.centered_instance"],
        peak_threshold=0.1, max_instances=2,
    )
    insts = out.labeled_frames[0].predicted_instances
    assert len(insts) == 2
    assert insts[0].numpy().shape[-1] == 2


def test_predict_with_legacy_bottomup():
    labels = load_slp(FIXTURE)
    out = predict(labels, [LEGACY / "minimal_instance.UNet.bottomup"],
                  peak_threshold=0.1)
    assert len(out.labeled_frames[0].predicted_instances) >= 1


def test_mixed_legacy_and_modern_pair():
    """A v1 centroid stage can pair with a MODERN centered-instance
    checkpoint — both resolve to LoadedModel, the composite just works."""
    labels = load_slp(FIXTURE)
    modern = ("/root/reference/tests/assets/model_ckpts/"
              "minimal_instance_centered_instance")
    out = predict(
        labels,
        [LEGACY / "minimal_instance.UNet.centroid", modern],
        peak_threshold=0.1, max_instances=2,
    )
    assert len(out.labeled_frames[0].predicted_instances) >= 1
