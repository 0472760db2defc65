"""Legacy ``predictors`` compatibility-shim contract.

Reference scenario source: tests/inference/test_compat_shims.py — deprecated
entries warn and forward to the new factory; internal-use wrapper silences.
"""

from __future__ import annotations

import warnings
from pathlib import Path

import numpy as np
import pytest

from sleap_nn_tpu.inference.predictors import (
    BottomUpMultiClassPredictor,
    BottomUpPredictor,
    Predictor as LegacyPredictor,
    SingleInstancePredictor,
    TopDownMultiClassPredictor,
    TopDownPredictor,
    legacy_predictor_internal_use,
)

CKPTS = Path("/root/reference/tests/assets/model_ckpts")


def _deprecations(callable_, *args, **kwargs):
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        try:
            callable_(*args, **kwargs)
        except Exception:
            pass  # bogus paths error downstream; the warning fires first
    return [w for w in caught if issubclass(w.category, DeprecationWarning)]


def test_legacy_dispatcher_warns():
    deps = _deprecations(LegacyPredictor.from_model_paths, ["/nonexistent"])
    assert deps
    msg = str(deps[0].message)
    assert "Predictor.from_model_paths" in msg
    assert "removed in a future release" in msg


@pytest.mark.parametrize("cls,kwargs", [
    (SingleInstancePredictor, dict(confmap_ckpt_path="/nope")),
    (TopDownPredictor, dict(centroid_ckpt_path="/nope", confmap_ckpt_path="/nope2")),
    (BottomUpPredictor, dict(bottomup_ckpt_path="/nope")),
    (BottomUpMultiClassPredictor, dict(bottomup_ckpt_path="/nope")),
    (TopDownMultiClassPredictor, dict(centroid_ckpt_path="/nope")),
])
def test_each_legacy_classmethod_warns(cls, kwargs):
    deps = _deprecations(cls.from_trained_models, **kwargs)
    assert deps, cls.__name__
    assert cls.__name__ in str(deps[0].message)


def test_internal_use_wrapper_silences():
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        with legacy_predictor_internal_use():
            try:
                SingleInstancePredictor.from_trained_models("/nope")
            except Exception:
                pass
    assert not [w for w in caught if issubclass(w.category, DeprecationWarning)]


def test_legacy_single_instance_forwards_and_predicts():
    """The shim builds a WORKING new-flow predictor from legacy kwargs."""
    from sleap_nn_tpu.io import load_slp

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        p = SingleInstancePredictor.from_trained_models(
            str(CKPTS / "minimal_instance_single_instance"),
            peak_threshold=0.1, integral_refinement="integral", batch_size=2,
        )
    labels = load_slp("/root/reference/tests/assets/datasets/minimal_instance.pkg.slp")
    out = p.predict(labels)
    assert out[0].predicted_instances
    assert p.layer.post.refinement == "integral"


def test_legacy_topdown_forwards_two_stages():
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        p = TopDownPredictor.from_trained_models(
            centroid_ckpt_path=str(CKPTS / "minimal_instance_centroid"),
            confmap_ckpt_path=str(CKPTS / "minimal_instance_centered_instance"),
            peak_threshold=0.1,
        )
    assert p.model_type == "topdown"
