"""ExportMetadata unit contracts (reference tests/export/test_metadata.py)."""

import json

import pytest

from sleap_nn_tpu.export.exporter import ExportMetadata


def _meta(**over):
    base = dict(
        model_type="single_instance",
        input_shape=(4, 256, 256, 1),
        input_dtype="uint8",
        output_names=("pred_keypoints", "pred_peak_values"),
        peak_threshold=0.2,
        skeleton_nodes=("a", "b"),
        skeleton_edges=(("a", "b"),),
        artifact="model.stablehlo",
        artifact_sha256="ff" * 32,
    )
    base.update(over)
    return ExportMetadata(**base)


def test_metadata_json_roundtrip():
    m = _meta()
    back = ExportMetadata.from_json(m.to_json())
    assert back.model_type == "single_instance"
    assert tuple(back.input_shape) == (4, 256, 256, 1)
    assert tuple(back.output_names) == ("pred_keypoints", "pred_peak_values")
    assert back.artifact_sha256 == "ff" * 32
    assert back.peak_threshold == pytest.approx(0.2)


def test_metadata_from_json_ignores_unknown_keys():
    payload = json.loads(_meta().to_json())
    payload["future_field"] = {"anything": 1}
    back = ExportMetadata.from_json(json.dumps(payload))
    assert back.model_type == "single_instance"
    assert not hasattr(back, "future_field")


def test_metadata_json_is_valid_and_stable():
    a = _meta().to_json()
    b = _meta().to_json()
    assert a == b
    d = json.loads(a)
    assert d["format"] == "jax_export_stablehlo"
    assert d["skeleton_edges"] == [["a", "b"]]


def test_hash_tree_deterministic(tmp_path):
    from sleap_nn_tpu.export.exporter import _hash_tree

    d = tmp_path / "t"
    (d / "sub").mkdir(parents=True)
    (d / "a.bin").write_bytes(b"hello")
    (d / "sub" / "b.bin").write_bytes(b"world")
    h1 = _hash_tree(d)
    h2 = _hash_tree(d)
    assert h1 == h2 and len(h1) == 64
    (d / "a.bin").write_bytes(b"hello!")
    assert _hash_tree(d) != h1


def test_metadata_anchor_part_roundtrip_and_default():
    """anchor_part persists through json and defaults to None for old
    exports (reference finding 29, export/metadata.py anchor_part)."""
    from sleap_nn_tpu.export import ExportMetadata

    m = ExportMetadata(
        model_type="centroid", input_shape=(1, 64, 64, 1),
        input_dtype="uint8", output_names=("pred_centroids",),
        peak_threshold=0.2, skeleton_nodes=("a", "b"),
        skeleton_edges=(("a", "b"),), artifact="x", artifact_sha256="0",
        anchor_part="b",
    )
    m2 = ExportMetadata.from_json(m.to_json())
    assert m2.anchor_part == "b"
    import json as _json
    d = _json.loads(m.to_json())
    del d["anchor_part"]
    m3 = ExportMetadata.from_json(_json.dumps(d))
    assert m3.anchor_part is None
