"""Legacy ``*Predictor`` compatibility shim.

Parity target: reference sleap_nn/inference/predictors.py:184-3181 (the five
legacy predictor classes) and its compatibility-shim contract
(tests/inference/test_compat_shims.py): each ``from_trained_models``
classmethod and the abstract ``Predictor.from_model_paths`` dispatcher emit a
:class:`DeprecationWarning` pointing callers at
``sleap_nn_tpu.inference.Predictor.from_model_paths``, then forward to the
new factory. :func:`legacy_predictor_internal_use` silences the warning for
intentional internal delegation.
"""

from __future__ import annotations

import contextlib
import threading
import warnings
from typing import Optional

from sleap_nn_tpu.inference.predictor import Predictor as _NewPredictor

_LEGACY_INTERNAL_USE = threading.local()


@contextlib.contextmanager
def legacy_predictor_internal_use():
    """Silence :class:`DeprecationWarning` from legacy ``*Predictor`` entries.

    Wrap intentional internal calls to ``from_trained_models`` so the
    deprecation warning (meant for end users) is not spurious noise.
    """
    prev = getattr(_LEGACY_INTERNAL_USE, "active", False)
    _LEGACY_INTERNAL_USE.active = True
    try:
        yield
    finally:
        _LEGACY_INTERNAL_USE.active = prev


def _warn_deprecated(entry: str):
    if getattr(_LEGACY_INTERNAL_USE, "active", False):
        return
    warnings.warn(
        f"{entry} is deprecated and will be removed in a future release; "
        "use sleap_nn_tpu.inference.Predictor.from_model_paths instead.",
        DeprecationWarning,
        stacklevel=3,
    )


_FORWARDED = {
    "peak_threshold", "integral_patch_size", "batch_size", "max_instances",
    "return_confmaps", "backbone_ckpt_path", "head_ckpt_path", "anchor_part",
    "max_peaks", "crop_size",
    # PAF grouping knobs — same names in the new factory (legacy
    # BottomUpPredictor.from_trained_models, reference predictors.py:2225).
    "min_line_scores", "k_per_node", "n_points", "max_edge_length_ratio",
    "dist_penalty_weight", "min_instance_peaks", "return_paf_graph",
}


def _forward(model_paths, kwargs):
    """Map legacy kwargs onto the new factory and build the predictor."""
    mapped = {k: v for k, v in kwargs.items() if k in _FORWARDED}
    if "integral_refinement" in kwargs:
        mapped["refinement"] = kwargs["integral_refinement"]
    # Legacy-only knobs without a new-factory analog (device selection is
    # jax-platform-wide; preprocess_config comes from each model dir) are
    # accepted for drop-in compatibility and ignored.
    return _NewPredictor.from_model_paths([str(p) for p in model_paths], **mapped)


class Predictor:
    """Legacy dispatcher (reference predictors.py:184). Deprecated."""

    @classmethod
    def from_model_paths(cls, model_paths, **kwargs):
        _warn_deprecated("sleap_nn_tpu.inference.predictors.Predictor.from_model_paths")
        return _forward(model_paths, kwargs)


class SingleInstancePredictor(Predictor):
    """Legacy single-instance predictor (reference predictors.py:1625)."""

    @classmethod
    def from_trained_models(cls, confmap_ckpt_path: Optional[str] = None, **kwargs):
        _warn_deprecated(f"{cls.__name__}.from_trained_models")
        return _forward([confmap_ckpt_path], kwargs)


class TopDownPredictor(Predictor):
    """Legacy top-down predictor (reference predictors.py:789)."""

    @classmethod
    def from_trained_models(
        cls,
        centroid_ckpt_path: Optional[str] = None,
        confmap_ckpt_path: Optional[str] = None,
        **kwargs,
    ):
        _warn_deprecated(f"{cls.__name__}.from_trained_models")
        paths = [p for p in (centroid_ckpt_path, confmap_ckpt_path) if p]
        return _forward(paths, kwargs)


class BottomUpPredictor(Predictor):
    """Legacy bottom-up predictor (reference predictors.py:2028)."""

    @classmethod
    def from_trained_models(cls, bottomup_ckpt_path: Optional[str] = None, **kwargs):
        _warn_deprecated(f"{cls.__name__}.from_trained_models")
        return _forward([bottomup_ckpt_path], kwargs)


class BottomUpMultiClassPredictor(Predictor):
    """Legacy multiclass bottom-up predictor (reference predictors.py:2624)."""

    @classmethod
    def from_trained_models(cls, bottomup_ckpt_path: Optional[str] = None, **kwargs):
        _warn_deprecated(f"{cls.__name__}.from_trained_models")
        return _forward([bottomup_ckpt_path], kwargs)


class TopDownMultiClassPredictor(Predictor):
    """Legacy multiclass top-down predictor (reference predictors.py:3181)."""

    @classmethod
    def from_trained_models(
        cls,
        centroid_ckpt_path: Optional[str] = None,
        confmap_ckpt_path: Optional[str] = None,
        **kwargs,
    ):
        _warn_deprecated(f"{cls.__name__}.from_trained_models")
        paths = [p for p in (centroid_ckpt_path, confmap_ckpt_path) if p]
        return _forward(paths, kwargs)
