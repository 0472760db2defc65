"""Interactive config-generator TUI.

Parity target: reference sleap_nn/config_generator/tui/app.py:449
(``launch_tui``) — an interactive flow that analyzes a SLEAP file,
recommends a training config, lets the user adjust the key fields, and
saves the YAML. The reference builds a 10k-LoC `textual` app; `textual`
is not available in this environment, so this implementation is a compact
``curses`` form (arrow keys + enter) with a plain-prompt fallback for
non-tty sessions. Both paths drive the exact same analyzer/recommender/
generator engine as ``sleap-nn-tpu config --auto``.
"""

from __future__ import annotations

import sys
from pathlib import Path
from typing import List, Optional

PIPELINES = ["topdown", "bottomup", "single_instance", "centroid"]
BACKBONES = ["unet", "convnext", "swint"]


def _analyze(slp_path: str):
    from sleap_nn_tpu.config_generator import analyze_slp, recommend_config

    stats = analyze_slp(slp_path)
    rec = recommend_config(stats)
    return stats, rec


def _stats_lines(stats) -> List[str]:
    return [
        f"frames: {stats.num_labeled_frames}   videos: {stats.num_videos}",
        f"image: {stats.max_width}x{stats.max_height}x{stats.num_channels}",
        f"skeleton: {stats.num_nodes} nodes / {stats.num_edges} edges",
        f"instances/frame: avg {stats.avg_instances_per_frame:.2f} "
        f"max {stats.max_instances_per_frame}",
        f"bbox: avg {stats.avg_bbox_size:.0f} px "
        f"(diag {stats.avg_bbox_diagonal:.0f})",
    ]


class _Field:
    def __init__(self, name: str, value, choices: Optional[List] = None,
                 caster=str, reason: str = ""):
        self.name = name
        self.value = value
        self.choices = choices
        self.caster = caster
        self.reason = reason

    def cycle(self, direction: int):
        if self.choices:
            i = self.choices.index(self.value) if self.value in self.choices else 0
            self.value = self.choices[(i + direction) % len(self.choices)]

    def set_text(self, text: str) -> bool:
        try:
            self.value = self.caster(text)
            return True
        except (TypeError, ValueError):
            return False


def _build_fields(slp_path: str, stats, rec) -> List[_Field]:
    default_out = str(Path(slp_path).parent / f"{Path(slp_path).stem}_config.yaml")
    return [
        _Field("pipeline", rec.pipeline.pipeline, choices=PIPELINES,
               reason=rec.pipeline.reason),
        _Field("backbone", rec.backbone, choices=BACKBONES,
               reason=rec.backbone_reason),
        _Field("sigma", rec.sigma, caster=float, reason=rec.sigma_reason),
        _Field("scale", rec.scale, caster=float, reason=rec.scale_reason),
        _Field("batch_size", rec.batch_size, caster=int,
               reason=rec.batch_size_reason),
        _Field("max_epochs", 100, caster=int),
        _Field("output", default_out),
    ]


def _apply_and_save(slp_path: str, stats, rec, fields: List[_Field]) -> str:
    from sleap_nn_tpu.config_generator import generate_config

    vals = {f.name: f.value for f in fields}
    rec.pipeline.pipeline = vals["pipeline"]
    rec.backbone = vals["backbone"]
    rec.sigma = float(vals["sigma"])
    rec.scale = float(vals["scale"])
    rec.batch_size = int(vals["batch_size"])
    out = str(vals["output"])
    generate_config(slp_path, output_path=out, stats=stats, recommendation=rec,
                    max_epochs=int(vals["max_epochs"]))
    return out


# --------------------------------------------------------------------------- #
# curses front end
# --------------------------------------------------------------------------- #


def _curses_form(stdscr, slp_path: str, stats, rec, fields: List[_Field]):
    import curses

    curses.curs_set(0)
    sel = 0
    msg = "↑/↓ select · ←/→ cycle · e edit · s save · q quit"
    while True:
        stdscr.erase()
        stdscr.addstr(0, 2, f"sleap-nn-tpu config — {Path(slp_path).name}",
                      curses.A_BOLD)
        row = 2
        for line in _stats_lines(stats):
            stdscr.addstr(row, 4, line)
            row += 1
        row += 1
        for i, f in enumerate(fields):
            attr = curses.A_REVERSE if i == sel else curses.A_NORMAL
            stdscr.addstr(row, 4, f"{f.name:<12} {f.value}", attr)
            if i == sel and f.reason:
                stdscr.addstr(row, 40, f"({f.reason})"[:38], curses.A_DIM)
            row += 1
        stdscr.addstr(row + 1, 2, msg, curses.A_DIM)
        stdscr.refresh()

        ch = stdscr.getch()
        if ch in (ord("q"), 27):
            return None
        if ch == curses.KEY_UP:
            sel = (sel - 1) % len(fields)
        elif ch == curses.KEY_DOWN:
            sel = (sel + 1) % len(fields)
        elif ch in (curses.KEY_LEFT, curses.KEY_RIGHT):
            fields[sel].cycle(1 if ch == curses.KEY_RIGHT else -1)
        elif ch in (ord("e"), ord("\n"), curses.KEY_ENTER, 10):
            if fields[sel].choices:
                fields[sel].cycle(1)
                continue
            import curses.textpad

            curses.curs_set(1)
            stdscr.addstr(row + 2, 2, f"{fields[sel].name}: ")
            curses.echo()
            text = stdscr.getstr(row + 2, 4 + len(fields[sel].name)).decode()
            curses.noecho()
            curses.curs_set(0)
            if text and not fields[sel].set_text(text):
                msg = f"invalid value for {fields[sel].name}"
            else:
                msg = "↑/↓ select · ←/→ cycle · e edit · s save · q quit"
        elif ch == ord("s"):
            return _apply_and_save(slp_path, stats, rec, fields)


def _prompt_flow(slp_path: str, stats, rec, fields: List[_Field]) -> Optional[str]:
    """Plain-prompt fallback when stdin/stdout is not a terminal."""
    print(f"sleap-nn-tpu config — {Path(slp_path).name}")
    for line in _stats_lines(stats):
        print("  " + line)
    print()
    for f in fields:
        suffix = f" [{'/'.join(map(str, f.choices))}]" if f.choices else ""
        reason = f"  ({f.reason})" if f.reason else ""
        try:
            raw = input(f"{f.name}{suffix} [{f.value}]{reason}: ").strip()
        except EOFError:
            raw = ""
        if raw:
            if f.choices and raw not in [str(c) for c in f.choices]:
                print(f"  keeping {f.value!r} (invalid choice)")
            elif not f.set_text(raw):
                print(f"  keeping {f.value!r} (invalid value)")
    return _apply_and_save(slp_path, stats, rec, fields)


def launch_tui(slp_path: Optional[str]) -> Optional[str]:
    """Run the interactive config generator; returns the saved YAML path."""
    if not slp_path:
        raise SystemExit("config: SLP_PATH is required for interactive mode.")
    stats, rec = _analyze(slp_path)
    fields = _build_fields(slp_path, stats, rec)
    if sys.stdin.isatty() and sys.stdout.isatty():
        import curses

        out = curses.wrapper(_curses_form, slp_path, stats, rec, fields)
    else:
        out = _prompt_flow(slp_path, stats, rec, fields)
    if out:
        print(f"Saved config to: {out}")
    return out
