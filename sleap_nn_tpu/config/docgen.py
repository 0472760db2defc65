"""Generate the config-reference doc from the dataclass schema itself.

The reference ships hand-written per-section config docs
(reference docs/configuration/{data,model,trainer}.md); keeping such tables
current by hand drifts, so here the reference page is GENERATED from the
schema (single source of truth) and a test asserts the committed
``docs/config-reference.md`` matches ``generate_config_reference()``.
"""

from __future__ import annotations

import dataclasses
import typing
from typing import Any, List, Optional, Set, Type

HEADER = """# Config reference

Every field of the training-job YAML, generated from the schema
(`sleap_nn_tpu/config/`) — regenerate with
`python -m sleap_nn_tpu.config.docgen`. The file layout matches the
reference framework exactly: three top-level sections
(`data_config`, `model_config`, `trainer_config`); unknown keys are
ignored on load, dotted CLI overrides are validated strictly.
"""


def _type_name(tp: Any) -> str:
    """Compact human-readable type name."""
    origin = typing.get_origin(tp)
    args = typing.get_args(tp)
    if origin is typing.Union:
        non_none = [a for a in args if a is not type(None)]
        inner = ", ".join(_type_name(a) for a in non_none)
        return f"Optional[{inner}]" if len(non_none) < len(args) else inner
    if origin in (list, List):
        return f"list[{_type_name(args[0])}]" if args else "list"
    if origin in (tuple,):
        return "tuple"
    if origin in (dict,):
        return "dict"
    if dataclasses.is_dataclass(tp):
        return f"[{tp.__name__}](#{tp.__name__.lower()})"
    return getattr(tp, "__name__", str(tp).replace("typing.", ""))


def _default_repr(f: dataclasses.Field) -> str:
    if f.default is not dataclasses.MISSING:
        return f"`{f.default!r}`"
    if f.default_factory is not dataclasses.MISSING:  # type: ignore[misc]
        value = f.default_factory()  # type: ignore[misc]
        if dataclasses.is_dataclass(value):
            return f"[{type(value).__name__}](#{type(value).__name__.lower()}) defaults"
        return f"`{value!r}`"
    return "**required**"


def _walk(cls: Type, seen: Set[Type], out: List[str], level: int) -> None:
    if cls in seen:
        return
    seen.add(cls)
    doc = (cls.__doc__ or "").strip().splitlines()
    summary = doc[0] if doc else ""
    out.append(f"{'#' * min(level, 5)} {cls.__name__}\n")
    if summary:
        out.append(summary + "\n")
    out.append("| field | type | default |")
    out.append("|---|---|---|")
    hints = typing.get_type_hints(cls)
    children: List[Type] = []
    for f in dataclasses.fields(cls):
        tp = hints.get(f.name, f.type)
        out.append(f"| `{f.name}` | {_type_name(tp)} | {_default_repr(f)} |")
        # Collect nested dataclasses (including Optional[Nested]).
        stack = [tp]
        while stack:
            t = stack.pop()
            if dataclasses.is_dataclass(t):
                children.append(t)
            else:
                stack.extend(typing.get_args(t))
    out.append("")
    for child in children:
        _walk(child, seen, out, level + 1)


def generate_config_reference() -> str:
    from sleap_nn_tpu.config import TrainingJobConfig

    out: List[str] = [HEADER]
    seen: Set[Type] = set()
    _walk(TrainingJobConfig, seen, out, 2)
    return "\n".join(out).rstrip() + "\n"


def main() -> None:
    from pathlib import Path

    target = Path(__file__).resolve().parents[2] / "docs" / "config-reference.md"
    target.write_text(generate_config_reference())
    print(f"Wrote {target}")


if __name__ == "__main__":
    main()
