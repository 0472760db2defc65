"""The committed config-reference doc stays in sync with the schema."""

from pathlib import Path

from sleap_nn_tpu.config.docgen import generate_config_reference

DOC = Path(__file__).resolve().parents[2] / "docs" / "config-reference.md"


def test_config_reference_doc_is_current():
    assert DOC.read_text() == generate_config_reference(), (
        "docs/config-reference.md is stale — regenerate with "
        "`python -m sleap_nn_tpu.config.docgen`"
    )


def test_config_reference_covers_all_sections():
    text = DOC.read_text()
    for section in (
        "DataConfig", "ModelConfig", "TrainerConfig", "PreprocessingConfig",
        "TilingConfig", "AugmentationConfig", "WandBConfig", "ZMQConfig",
    ):
        assert f" {section}\n" in text, f"missing section {section}"


def test_config_reference_marks_required_fields_consistently():
    # Every field renders a default or an explicit required marker; the
    # generator never emits an empty default cell.
    for line in DOC.read_text().splitlines():
        if line.startswith("| `"):
            cells = [c.strip() for c in line.strip("|").split("|")]
            assert len(cells) == 3 and cells[2], line
