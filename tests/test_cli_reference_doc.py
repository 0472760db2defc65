"""The committed CLI-reference doc stays in sync with the click tree."""

from pathlib import Path

from sleap_nn_tpu.cli_docgen import generate_cli_reference

DOC = Path(__file__).resolve().parents[1] / "docs" / "cli-reference.md"


def test_cli_reference_doc_is_current():
    assert DOC.read_text() == generate_cli_reference(), (
        "docs/cli-reference.md is stale — regenerate with "
        "`python -m sleap_nn_tpu.cli_docgen`"
    )


def test_cli_reference_covers_all_commands():
    text = DOC.read_text()
    for cmd in ("train", "predict", "track", "eval", "export", "system",
                "info", "config", "sam", "track-only"):
        assert f"## `{cmd}`" in text, f"missing command {cmd}"


def test_cli_reference_has_no_internal_sentinels():
    assert "Sentinel" not in DOC.read_text()
