"""Model-asset loading scenario matrix.

Parity target: reference tests/inference/test_loaders.py — bad paths,
missing configs, duplicate-model-type rejection, preprocess overrides
reaching the inference layers, and explicit-checkpoint selection, against
this repo's load_model (inference/loaders.py) and
Predictor.from_model_paths (inference/predictor.py).
"""

from __future__ import annotations

import pytest
pytestmark = pytest.mark.slow  # integration tier: real model builds / e2e flows


from sleap_nn_tpu.inference.loaders import load_model
from sleap_nn_tpu.inference.predictor import Predictor

@pytest.fixture(scope="module")
def tiny_centroid(tiny_centroid_2ep_model):
    """A 2-epoch throwaway centroid checkpoint (session-shared)."""
    return tiny_centroid_2ep_model


def test_load_model_bad_path_raises():
    with pytest.raises((FileNotFoundError, ValueError)):
        load_model("/nonexistent/model/dir")


def test_load_model_missing_training_config_raises(tmp_path):
    (tmp_path / "empty_model").mkdir()
    with pytest.raises((FileNotFoundError, ValueError)):
        load_model(tmp_path / "empty_model")


def test_load_model_resolves_type_and_skeleton(tiny_centroid):
    m = load_model(tiny_centroid)
    assert m.model_type == "centroid"
    assert m.skeleton_nodes == ["A", "B"]
    assert m.params is not None


def test_load_model_explicit_last_ckpt(tiny_centroid):
    from pathlib import Path

    last = Path(tiny_centroid) / "last.ckpt"
    if not last.exists():
        pytest.skip("trainer did not write last.ckpt")
    m = load_model(last)
    assert m.model_type == "centroid"


def test_duplicate_model_types_rejected(tiny_centroid):
    with pytest.raises(ValueError, match="Duplicate model type"):
        Predictor.from_model_paths([tiny_centroid, tiny_centroid])


def test_input_scale_override_reaches_preprocessing(tiny_centroid):
    p = Predictor.from_model_paths([tiny_centroid], input_scale=0.25)
    assert p.models[0].config.data_config.preprocessing.scale == 0.25


def test_max_dims_override_reaches_preprocessing(tiny_centroid):
    p = Predictor.from_model_paths(
        [tiny_centroid], max_height=256, max_width=512
    )
    pre = p.models[0].config.data_config.preprocessing
    assert (pre.max_height, pre.max_width) == (256, 512)


def test_no_override_keeps_trained_scale(tiny_centroid):
    p = Predictor.from_model_paths([tiny_centroid])
    assert p.models[0].config.data_config.preprocessing.scale == 0.5


def test_ensure_rgb_and_grayscale_together_rejected(tiny_centroid):
    with pytest.raises(ValueError):
        Predictor.from_model_paths(
            [tiny_centroid], ensure_rgb=True, ensure_grayscale=True
        )


def test_unsupported_model_combo_raises(tiny_centroid, tmp_path):
    # A centroid checkpoint alone with a fabricated second centroid copy is
    # covered above; an unknown combination errors with the type list.
    import shutil
    from pathlib import Path

    import yaml

    clone = tmp_path / "mangled"
    shutil.copytree(tiny_centroid, clone)
    cfgp = clone / "training_config.yaml"
    d = yaml.safe_load(cfgp.read_text())
    # Erase every head config: the model type becomes unresolvable.
    d["model_config"]["head_configs"] = {}
    cfgp.write_text(yaml.safe_dump(d))
    with pytest.raises(ValueError):
        Predictor.from_model_paths([clone])
