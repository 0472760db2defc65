"""Dataclass <-> dict/YAML conversion helpers for the config system.

The reference uses attrs + OmegaConf (reference: sleap_nn/config/*.py);
neither is available here, so this module provides the equivalent plumbing
for plain dataclasses: recursive ``from_dict``/``to_dict``, YAML round-trip,
and dotted-path overrides (the Hydra-style ``a.b.c=value`` CLI syntax).
"""

from __future__ import annotations

import dataclasses
import typing
from typing import Any, Dict, Optional, Type, Union

import yaml


def _resolve_type(tp):
    """Unwrap Optional[...] to its inner type; return (inner, is_optional)."""
    origin = typing.get_origin(tp)
    if origin is Union:
        args = [a for a in typing.get_args(tp) if a is not type(None)]
        if len(args) == 1:
            return args[0], True
        return None, True
    return tp, False


def from_dict(cls: Type, data: Any):
    """Recursively build a dataclass from a plain dict (unknown keys ignored)."""
    if data is None:
        return None
    if not dataclasses.is_dataclass(cls):
        return data
    if dataclasses.is_dataclass(type(data)):
        return data
    if not isinstance(data, dict):
        return data
    hints = typing.get_type_hints(cls)
    kwargs = {}
    for f in dataclasses.fields(cls):
        if f.name not in data:
            continue
        val = data[f.name]
        inner, _ = _resolve_type(hints.get(f.name, Any))
        if inner is not None and dataclasses.is_dataclass(inner):
            kwargs[f.name] = from_dict(inner, val)
        else:
            kwargs[f.name] = _coerce_scalar(inner, val)
    return cls(**kwargs)


def _coerce_scalar(inner: Optional[Type], val: Any) -> Any:
    """Coerce a YAML scalar onto the field's annotated numeric type.

    YAML 1.1 only resolves floats with a '.' — scientific notation like
    ``1e-06`` (how this library and the reference both serialize small
    floats) parses as a STRING, which would flow into arithmetic
    (``lr: 1e-4``, plateau thresholds) and explode mid-training. Ints that
    arrive as floats/strings are normalized the same way. Anything that
    doesn't parse is returned untouched so validation errors point at the
    real value.
    """
    if val is None:
        return val
    if inner is None or inner is Any:
        # Untyped (Any) fields — e.g. min_lr, which may be scalar or list —
        # still suffer the YAML sci-notation stringification; convert only
        # unambiguous numeric strings.
        if isinstance(val, str):
            import re

            if re.fullmatch(r"[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?", val.strip()):
                try:
                    f = float(val)
                    return int(f) if f.is_integer() and ("e" not in val.lower()
                                                         and "." not in val) else f
                except ValueError:
                    return val
        return val
    try:
        if inner is float and isinstance(val, (str, int)):
            return float(val)
        if inner is int and isinstance(val, (str, float)) and float(val) == int(float(val)):
            return int(float(val))
        if inner is bool and isinstance(val, str):
            if val.lower() in ("true", "1", "yes"):
                return True
            if val.lower() in ("false", "0", "no"):
                return False
    except (TypeError, ValueError):
        return val
    return val


def to_dict(obj: Any) -> Any:
    """Recursively convert dataclasses to plain dicts (yaml-serializable)."""
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        return {f.name: to_dict(getattr(obj, f.name)) for f in dataclasses.fields(obj)}
    if isinstance(obj, dict):
        return {k: to_dict(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [to_dict(v) for v in obj]
    return obj


def to_yaml(obj: Any) -> str:
    return yaml.safe_dump(to_dict(obj), sort_keys=False)


def save_yaml(obj: Any, path):
    with open(path, "w") as f:
        f.write(to_yaml(obj))


def load_yaml(cls: Type, path):
    with open(path) as f:
        data = yaml.safe_load(f)
    return from_dict(cls, data)


def apply_overrides(obj: Any, overrides: Dict[str, Any]):
    """Apply dotted-path overrides in place: ``{"a.b.c": 1}``.

    Intermediate ``None`` nodes are instantiated with their field's default
    dataclass type so ``model_config.backbone_config.unet.filters=16`` works
    even when ``unet`` is null in the YAML.
    """
    for path, value in overrides.items():
        parts = path.split(".")
        node = obj
        for i, part in enumerate(parts[:-1]):
            if dataclasses.is_dataclass(node) and part not in {
                f.name for f in dataclasses.fields(node)
            }:
                raise AttributeError(
                    f"Unknown config field '{part}' in override '{path}'."
                )
            child = getattr(node, part)
            if child is None:
                hints = typing.get_type_hints(type(node))
                inner, _ = _resolve_type(hints[part])
                if inner is not None and dataclasses.is_dataclass(inner):
                    child = inner()
                    setattr(node, part, child)
                else:
                    raise ValueError(f"Cannot descend into null non-dataclass field: {part}")
            node = child
        leaf = parts[-1]
        if dataclasses.is_dataclass(node) and leaf not in {
            f.name for f in dataclasses.fields(node)
        }:
            raise AttributeError(f"Unknown config field '{leaf}' in override '{path}'.")
        if isinstance(value, str):
            value = yaml.safe_load(value)
        if dataclasses.is_dataclass(node):
            # Same YAML-1.1 gotcha as from_dict: '1e-06' parses as a string
            # — land overrides on the field's annotated numeric type.
            hints = typing.get_type_hints(type(node))
            inner, _ = _resolve_type(hints.get(leaf, Any))
            if inner is not None and not dataclasses.is_dataclass(inner):
                value = _coerce_scalar(inner, value)
        setattr(node, leaf, value)
    return obj
