"""Docs-tree integrity: the checks `mkdocs build --strict` would fail on.

mkdocs is not installed in this environment, so CI runs the real strict
build (.github/workflows/docs.yml); this test keeps the same failures
local — every nav entry must exist, every relative .md link inside
docs/ must resolve, and every docs page must be reachable from the nav.
"""

import re
from pathlib import Path

import yaml

REPO = Path(__file__).resolve().parents[1]
DOCS = REPO / "docs"
MKDOCS = REPO / "mkdocs.yml"

_LINK_RE = re.compile(r"\]\(([^)#\s]+)(?:#[^)]*)?\)")


def _nav_files(node):
    if isinstance(node, str):
        yield node
    elif isinstance(node, list):
        for item in node:
            yield from _nav_files(item)
    elif isinstance(node, dict):
        for v in node.values():
            yield from _nav_files(v)


def _load_nav():
    # mkdocs.yml uses python/name tags in some setups; ours is plain YAML.
    cfg = yaml.safe_load(MKDOCS.read_text())
    return list(_nav_files(cfg.get("nav", [])))


def test_every_nav_entry_exists():
    missing = [f for f in _load_nav() if not (DOCS / f).is_file()]
    assert not missing, f"nav entries with no file: {missing}"


def test_every_docs_page_is_in_nav():
    nav = set(_load_nav())
    pages = {p.relative_to(DOCS).as_posix() for p in DOCS.rglob("*.md")}
    orphans = sorted(pages - nav)
    assert not orphans, f"docs pages missing from mkdocs nav: {orphans}"


def test_relative_markdown_links_resolve():
    bad = []
    for page in DOCS.rglob("*.md"):
        for target in _LINK_RE.findall(page.read_text()):
            if "://" in target or target.startswith("mailto:"):
                continue
            resolved = (page.parent / target).resolve()
            if not resolved.exists():
                bad.append(f"{page.relative_to(REPO)} -> {target}")
    assert not bad, "broken relative links:\n" + "\n".join(bad)


def test_docs_page_count_at_parity():
    # Reference ships 41 docs pages; this tree must not regress below it.
    n = len(list(DOCS.rglob("*.md")))
    assert n >= 41, f"docs page count {n} < reference's 41"
