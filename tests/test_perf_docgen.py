"""The generated inference-performance doc stays structurally sound.

Values churn every bench run (the driver re-runs bench.py after the last
commit), so this pins STRUCTURE — the committed page must carry every
required section and one row per measured family — not exact text.
"""

from pathlib import Path

from sleap_nn_tpu.perf_docgen import DOC, generate_perf_doc

REPO = Path(__file__).resolve().parents[1]


def test_generator_runs_on_committed_detail():
    text = generate_perf_doc()
    for section in (
        "# Inference Performance",
        "## End-to-end vs the reference A40 baseline",
        "## Production scale",
        "## The 2,000 f/s/chip north star",
        "## Knobs that matter",
        "## Measurement honesty",
    ):
        assert section in text
    for fam in ("single_instance", "centroid", "topdown", "bottomup"):
        assert f"| {fam} |" in text


def test_committed_page_has_required_sections():
    text = DOC.read_text()
    for section in (
        "## End-to-end vs the reference A40 baseline",
        "## Production scale",
        "## Knobs that matter",
    ):
        assert section in text


def test_generator_handles_missing_rows():
    text = generate_perf_doc({"extra": {}})
    assert "# Inference Performance" in text
