"""Generate the CLI reference doc from the click command tree itself.

Same pattern as :mod:`sleap_nn_tpu.config.docgen`: the reference documents
its ~90-option CLI by hand across guide pages; here the full flag surface
(reference cli.py:170 command group + _common_inference_options at
cli.py:2252) is GENERATED from the click declarations so the doc cannot
drift, and a test pins ``docs/cli-reference.md`` to the generator output.
"""

from __future__ import annotations

from typing import List

import click

HEADER = """# CLI reference

Every command and flag of `sleap-nn-tpu`, generated from the click
declarations (`sleap_nn_tpu/cli.py`) — regenerate with
`python -m sleap_nn_tpu.cli_docgen`. Flags accept both dashed and
underscored spellings (`--peak-threshold` / `--peak_threshold`), matching
the reference CLI. Hidden aliases (e.g. `infer`) are included and marked.
"""


def _fmt_default(opt: click.Option) -> str:
    if opt.required:
        return "**required**"
    if opt.is_flag:
        return "`True`" if opt.default else "`False`"
    # click's internal Sentinel repr (unset default) renders as absent.
    if opt.default is None or "Sentinel" in repr(opt.default):
        return "—"
    return f"`{opt.default!r}`"


def _fmt_type(opt: click.Option) -> str:
    if opt.is_flag:
        return "flag"
    name = getattr(opt.type, "name", str(opt.type))
    if opt.multiple:
        name += ", repeatable"
    return name


def _dedupe_spellings(opts: List[str]) -> str:
    """Collapse dash/underscore twin spellings into one canonical flag."""
    canon = []
    seen = set()
    for o in opts:
        key = o.replace("_", "-")
        if key not in seen:
            seen.add(key)
            canon.append(key)
    return ", ".join(f"`{c}`" for c in canon)


def generate_cli_reference() -> str:
    from sleap_nn_tpu.cli import cli

    out: List[str] = [HEADER]
    ctx = click.Context(cli, info_name="sleap-nn-tpu")
    for name in cli.list_commands(ctx):
        cmd = cli.get_command(ctx, name)
        if cmd is None:
            continue
        hidden = " *(hidden alias)*" if cmd.hidden else ""
        out.append(f"## `{name}`{hidden}\n")
        help_text = (cmd.help or "").strip().splitlines()
        if help_text:
            out.append(help_text[0] + "\n")
        args = [p for p in cmd.params if isinstance(p, click.Argument)]
        if args:
            out.append(
                "Arguments: "
                + ", ".join(f"`{a.name.upper()}`" for a in args)
                + "\n"
            )
        opts = [p for p in cmd.params if isinstance(p, click.Option)]
        if opts:
            out.append("| option | type | default | help |")
            out.append("|---|---|---|---|")
            for opt in opts:
                if opt.hidden:
                    continue
                flags = _dedupe_spellings(list(opt.opts) + list(opt.secondary_opts))
                hlp = (opt.help or "").replace("|", "\\|").replace("\n", " ")
                out.append(
                    f"| {flags} | {_fmt_type(opt)} | {_fmt_default(opt)} | {hlp} |"
                )
            out.append("")
    return "\n".join(out).rstrip() + "\n"


def main() -> None:
    from pathlib import Path

    target = Path(__file__).resolve().parents[1] / "docs" / "cli-reference.md"
    target.write_text(generate_cli_reference())
    print(f"Wrote {target}")


if __name__ == "__main__":
    main()
