"""Top-level public API surface: ``sleap_nn_tpu.{predict, Predictor,
load_models}`` (reference tests/test_public_api.py contract)."""

from unittest.mock import patch

import pytest

import sleap_nn_tpu


def test_top_level_names_are_discoverable():
    for name in ("predict", "Predictor", "load_models"):
        assert name in sleap_nn_tpu.__all__


def test_predict_and_predictor_resolve_to_inference():
    from sleap_nn_tpu import inference

    assert sleap_nn_tpu.predict is inference.predict
    assert sleap_nn_tpu.Predictor is inference.Predictor
    assert callable(sleap_nn_tpu.predict)


def test_load_models_wraps_from_model_paths():
    sentinel = object()
    with patch(
        "sleap_nn_tpu.inference.Predictor.from_model_paths",
        return_value=sentinel,
    ) as mock_fmp:
        result = sleap_nn_tpu.load_models(["/m1", "/m2"], batch_size=8)
    assert result is sentinel
    mock_fmp.assert_called_once_with(["/m1", "/m2"], batch_size=8)


def test_unknown_attribute_raises():
    with pytest.raises(AttributeError):
        sleap_nn_tpu.totally_made_up_name  # noqa: B018


def test_version_is_a_string():
    assert isinstance(sleap_nn_tpu.__version__, str)
    assert sleap_nn_tpu.__version__.count(".") >= 1
