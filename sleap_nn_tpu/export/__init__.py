"""Model export: serialized StableHLO with baked postprocessing.

Parity target: reference sleap_nn/export/ (ONNX/TensorRT wrappers +
exporters + metadata contract). The TPU-native artifact is a
``jax.export`` serialized function (StableHLO bytecode) whose graph bakes
uint8 normalization + forward + peak finding — the same wrapper pattern as
the reference's ONNX export (reference: export/wrappers/base.py:12-123) —
plus ``metadata.json`` (reference: export/metadata.py:16) and a numeric
verification pass (reference: export/exporters/onnx_exporter.py:147).
"""

from sleap_nn_tpu.export.exporter import (
    ExportMetadata,
    export_model,
    load_exported_model,
    verify_export_numerics,
)

__all__ = [
    "export_model",
    "load_exported_model",
    "verify_export_numerics",
    "ExportMetadata",
]
