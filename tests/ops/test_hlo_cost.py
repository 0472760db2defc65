"""Unit tests for the post-fusion HBM traffic estimator (ops/hlo_cost.py)."""

from sleap_nn_tpu.ops.hlo_cost import (
    estimate_traffic,
    shape_physical_bytes,
)


def test_shape_physical_bytes_tiled_padding():
    # (8,128) tile pads the minor dim to 128 lanes and the second-minor to
    # 8 sublanes; (2,1) packing doubles the effective sublane tile (bf16).
    assert shape_physical_bytes("f32[32,512,512,36]{3,2,1,0:T(8,128)}") == (
        32 * 512 * 512 * 128 * 4
    )
    assert shape_physical_bytes("bf16[32,512,512,36]{3,2,1,0:T(8,128)(2,1)}") == (
        32 * 512 * 512 * 128 * 2
    )
    # No layout block: logical size.
    assert shape_physical_bytes("f32[4,8]") == 4 * 8 * 4
    assert shape_physical_bytes("pred[16]") == 16


_SYNTHETIC = """
HloModule m

ENTRY %main (p0: f32[128,128]) -> f32[128,128] {
  %p0 = f32[128,128]{1,0:T(8,128)} parameter(0)
  %a = f32[128,128]{1,0:T(8,128)} exponential(%p0)
  %b = f32[128,128]{1,0:T(8,128)} fusion(%a, %p0), kind=kLoop, calls=%fc
  ROOT %c = f32[128,128]{1,0:T(8,128)} add(%b, %a)
}
"""


def test_operand_reads_resolved_by_name():
    """TPU HLO prints operands as bare %name refs; reads must still count."""
    t = estimate_traffic(_SYNTHETIC)
    tensor = 128 * 128 * 4
    # a: out + read(p0); b: out + read(a) + read(p0); c: out + read(b) + read(a)
    assert t["total_bytes"] == tensor * (2 + 3 + 3)
    by_name = {r["name"]: r for r in t["top"]}
    assert by_name["a"]["bytes"] == 2 * tensor
    assert by_name["b"]["bytes"] == 3 * tensor
    assert by_name["c"]["bytes"] == 3 * tensor
    # parameters themselves are not counted as instructions
    assert "p0" not in by_name


_WITH_SHAPES = """
HloModule m

ENTRY %main (p0: f32[64]) -> f32[64] {
  %p0 = f32[64]{0} parameter(0)
  ROOT %y = f32[64]{0} add(f32[64]{0} %p0, f32[64]{0} %p0)
}
"""


def test_printed_operand_shapes_still_used():
    t = estimate_traffic(_WITH_SHAPES)
    assert t["total_bytes"] == 64 * 4 * 3  # out + two reads


def test_views_resolve_through_tuples():
    hlo = """
HloModule m

ENTRY %main () -> f32[256] {
  %p0 = (f32[256]{0}, f32[8]{0}) parameter(0)
  %g = f32[256]{0} get-tuple-element(%p0), index=0
  ROOT %y = f32[256]{0} negate(%g)
}
"""
    t = estimate_traffic(hlo)
    # negate: out 1 KB + read of the 1 KB tuple element (via the GTE view);
    # the GTE itself is skipped as a view.
    assert t["total_bytes"] == 256 * 4 * 2
    assert t["n_instructions"] == 1


def test_bare_operands_without_percent_sigil():
    """Dumps printed without the % sigil still count operand reads."""
    hlo = """
HloModule m

ENTRY main (p0: f32[128]) -> f32[128] {
  p0 = f32[128]{0} parameter(0)
  a = f32[128]{0} exponential(p0)
  ROOT b = f32[128]{0} add(a, p0)
}
"""
    t = estimate_traffic(hlo)
    tensor = 128 * 4
    assert t["total_bytes"] == tensor * (2 + 3)


def test_mixed_shaped_and_bare_operands():
    """Per-operand parsing: a shaped operand and a bare ref both count,
    and the `shape %name` form is not double-counted."""
    hlo = """
HloModule m

ENTRY %main (p0: f32[64]) -> f32[64] {
  %p0 = f32[64]{0} parameter(0)
  %a = f32[64]{0} exponential(%p0)
  ROOT %y = f32[64]{0} add(f32[64]{0} %p0, %a)
}
"""
    t = estimate_traffic(hlo)
    tensor = 64 * 4
    # a: out + read(p0); y: out + read(p0 shaped) + read(a bare)
    assert t["total_bytes"] == tensor * (2 + 3)
