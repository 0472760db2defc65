"""Export metadata resolution matrix: per-family field derivation.

Parity target: reference tests/export/test_utils.py resolver suites
(model type, input shape/scale overrides, node names, edge inds, crop
size, anchor part) — re-expressed against this repo's export_model
metadata output (sleap_nn_tpu/export/exporter.py) on the reference
fixture checkpoints.
"""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from sleap_nn_tpu.export import export_model
from sleap_nn_tpu.export.exporter import ExportMetadata, _anchor_part_from_config
from sleap_nn_tpu.inference.loaders import load_model

CKPTS = Path("/root/reference/tests/assets/model_ckpts")

pytestmark = pytest.mark.skipif(
    not CKPTS.exists(), reason="reference assets unavailable"
)


def _meta(out_dir) -> ExportMetadata:
    return ExportMetadata.from_json((out_dir / "metadata.json").read_text())


@pytest.fixture(scope="module")
def bottomup_export(tmp_path_factory):
    return export_model(
        CKPTS / "minimal_instance_bottomup",
        output_dir=tmp_path_factory.mktemp("bu_exp"),
        batch_size=2, peak_threshold=0.15, verify=False,
    )


@pytest.fixture(scope="module")
def topdown_export(tmp_path_factory):
    return export_model(
        [CKPTS / "minimal_instance_centroid",
         CKPTS / "minimal_instance_centered_instance"],
        output_dir=tmp_path_factory.mktemp("td_exp"),
        batch_size=2, verify=False,
    )


def test_bottomup_metadata_fields(bottomup_export):
    m = _meta(bottomup_export)
    assert m.model_type == "bottomup"
    assert m.input_dtype == "uint8"
    assert m.input_shape[0] == 2  # baked batch
    assert m.peak_threshold == 0.15
    assert list(m.skeleton_nodes) == ["A", "B"]
    assert [list(e) for e in m.skeleton_edges] == [["A", "B"]]
    assert m.anchor_part is None  # bottomup has no crop anchor
    assert m.format == "jax_export_stablehlo"
    assert m.artifact == "model.stablehlo"
    assert len(m.artifact_sha256) == 64


def test_topdown_composite_metadata_fields(topdown_export):
    m = _meta(topdown_export)
    assert m.model_type == "topdown"
    assert list(m.skeleton_nodes) == ["A", "B"]
    assert m.input_shape[0] == 2
    # Output names cover the composite's surface.
    assert "pred_keypoints" in m.output_names
    assert "pred_centroids" in m.output_names


def test_metadata_json_has_all_dataclass_fields(bottomup_export):
    d = json.loads((bottomup_export / "metadata.json").read_text())
    import dataclasses

    for f in dataclasses.fields(ExportMetadata):
        assert f.name in d, f.name


def test_training_config_copied_for_provenance(bottomup_export):
    assert (bottomup_export / "training_config.yaml").exists()


def test_input_geometry_overrides_change_baked_shape(tmp_path):
    out = export_model(
        CKPTS / "minimal_instance_bottomup",
        output_dir=tmp_path / "exp",
        batch_size=1, verify=False,
        input_height=256, input_width=512, input_scale=1.0,
    )
    m = _meta(out)
    # Baked H/W reflect the overrides (pad-to-stride may round up).
    assert m.input_shape[1] >= 256 and m.input_shape[1] <= 256 + 32
    assert m.input_shape[2] >= 512 and m.input_shape[2] <= 512 + 32


def test_invalid_precision_rejected(tmp_path):
    with pytest.raises(ValueError, match="precision"):
        export_model(CKPTS / "minimal_instance_bottomup",
                     output_dir=tmp_path, precision="fp64")


# ------------------------------------------------ anchor-part resolution


def _cfg_with_anchor(family, anchor):
    class _A:
        pass

    cm = _A(); cm.anchor_part = anchor
    head = _A(); head.confmaps = cm
    hc = _A(); setattr(hc, family, head)
    mc = _A(); mc.head_configs = hc
    cfg = _A(); cfg.model_config = mc
    return cfg


def test_anchor_part_from_centroid_config():
    assert _anchor_part_from_config(_cfg_with_anchor("centroid", "thorax")) == "thorax"


def test_anchor_part_from_centered_instance_config():
    assert (
        _anchor_part_from_config(_cfg_with_anchor("centered_instance", "head"))
        == "head"
    )


def test_anchor_part_none_when_unset():
    assert _anchor_part_from_config(_cfg_with_anchor("centroid", None)) is None


def test_anchor_part_none_for_headless_config():
    class _Empty:
        pass

    assert _anchor_part_from_config(_Empty()) is None


def test_centroid_anchor_from_real_fixture():
    loaded = load_model(CKPTS / "minimal_instance_centroid")
    # The fixture trains anchor-less; resolution must not invent one.
    assert _anchor_part_from_config(loaded.config) is None
