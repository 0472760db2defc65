"""Head-descriptor contract matrix: one scenario block per head class.

Parity target: reference tests/architectures/test_heads.py — each head's
channel math, activation, loss function, and layer forward shape — against
sleap_nn_tpu/models/heads.py. Heads here are frozen hashable descriptors
(jit cache keys), so the matrix also locks tuple normalization and
hashability, which the reference's mutable attrs classes never needed.
"""

import jax
import jax.numpy as jnp
import pytest

from sleap_nn_tpu.models.heads import (
    CenteredInstanceConfmapsHead,
    CenterOffsetHead,
    CentroidConfmapsHead,
    ClassMapsHead,
    ClassVectorsHead,
    Head,
    InstanceCenterHead,
    MultiInstanceConfmapsHead,
    OffsetRefinementHead,
    PartAffinityFieldsHead,
    SegmentationHead,
    SingleInstanceConfmapsHead,
)

PARTS = ("head", "thorax", "abdomen")
EDGES = (("head", "thorax"), ("thorax", "abdomen"))
CLASSES = ("female", "male")


def _forward(head, h=16, w=16, feat_c=8):
    layer = head.make_layer()
    x = jnp.ones((2, h, w, feat_c))
    params = layer.init(jax.random.PRNGKey(0), x)
    return layer.apply(params, x)


# ─── channel math ────────────────────────────────────────────────────────


@pytest.mark.parametrize(
    "head,expected",
    [
        (SingleInstanceConfmapsHead(part_names=PARTS), 3),
        (CentroidConfmapsHead(), 1),
        (CenteredInstanceConfmapsHead(part_names=PARTS), 3),
        (MultiInstanceConfmapsHead(part_names=PARTS), 3),
        (PartAffinityFieldsHead(edges=EDGES), 4),  # 2 per edge
        (ClassMapsHead(classes=CLASSES), 2),
        (ClassVectorsHead(classes=CLASSES), 2),
        (OffsetRefinementHead(part_names=PARTS), 6),  # 2 per part
        (SegmentationHead(), 1),
        (InstanceCenterHead(), 1),
        (CenterOffsetHead(), 2),
    ],
)
def test_channel_math(head, expected):
    assert head.channels == expected


def test_empty_parts_zero_channels():
    assert SingleInstanceConfmapsHead(part_names=()).channels == 0
    assert PartAffinityFieldsHead(edges=()).channels == 0


# ─── activation / loss selection ─────────────────────────────────────────


def test_confmap_heads_identity_mse():
    for head in (
        SingleInstanceConfmapsHead(part_names=PARTS),
        CentroidConfmapsHead(),
        CenteredInstanceConfmapsHead(part_names=PARTS),
        MultiInstanceConfmapsHead(part_names=PARTS),
        PartAffinityFieldsHead(edges=EDGES),
    ):
        assert head.activation == "identity"
        assert head.loss_function == "mse"


def test_class_maps_sigmoid():
    assert ClassMapsHead(classes=CLASSES).activation == "sigmoid"


def test_class_vectors_softmax_crossentropy():
    h = ClassVectorsHead(classes=CLASSES)
    assert h.activation == "softmax"
    assert h.loss_function == "categorical_crossentropy"


def test_segmentation_sigmoid_bce_dice():
    h = SegmentationHead()
    assert h.activation == "sigmoid"
    assert h.loss_function == "bce_dice"
    assert h.bce_weight + h.dice_weight == pytest.approx(1.0)


def test_center_offset_downweighted_loss():
    assert CenterOffsetHead().loss_weight == pytest.approx(0.1)
    assert InstanceCenterHead().loss_weight == pytest.approx(1.0)


# ─── layer forward contracts ─────────────────────────────────────────────


def test_conv_head_forward_shape_and_linearity():
    head = MultiInstanceConfmapsHead(part_names=PARTS)
    out = _forward(head)
    assert out.shape == (2, 16, 16, 3)


def test_sigmoid_head_output_in_unit_interval():
    out = _forward(ClassMapsHead(classes=CLASSES))
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0


def test_class_vectors_pools_to_vector_and_sums_to_one():
    out = _forward(ClassVectorsHead(classes=CLASSES, num_fc_layers=2,
                                    num_fc_units=32))
    assert out.shape == (2, 2)  # (B, n_classes) — spatial dims pooled away
    assert jnp.allclose(out.sum(axis=-1), 1.0, atol=1e-5)


def test_paf_head_two_channels_per_edge_forward():
    out = _forward(PartAffinityFieldsHead(edges=EDGES))
    assert out.shape[-1] == 4


def test_offset_head_forward_unbounded():
    out = _forward(CenterOffsetHead())
    assert out.shape == (2, 16, 16, 2)


# ─── descriptor semantics (static jit metadata) ──────────────────────────


def test_heads_are_frozen():
    h = SingleInstanceConfmapsHead(part_names=PARTS)
    with pytest.raises(Exception):
        h.sigma = 1.0


def test_heads_hashable_and_equal_by_value():
    a = PartAffinityFieldsHead(edges=[["head", "thorax"]])
    b = PartAffinityFieldsHead(edges=(("head", "thorax"),))
    assert a == b
    assert hash(a) == hash(b)
    assert len({a, b}) == 1


def test_list_inputs_normalized_to_tuples():
    h = SingleInstanceConfmapsHead(part_names=["a", "b"])
    assert isinstance(h.part_names, tuple)
    e = PartAffinityFieldsHead(edges=[["a", "b"], ["b", "c"]])
    assert all(isinstance(x, tuple) for x in e.edges)


def test_head_name_is_class_name():
    assert CentroidConfmapsHead().name == "CentroidConfmapsHead"
    assert SegmentationHead().name == "SegmentationHead"


def test_base_head_channels_abstract():
    with pytest.raises(NotImplementedError):
        Head().channels


def test_default_strides():
    assert SingleInstanceConfmapsHead().output_stride == 1
    # Segmentation-family heads default to the half-res grid.
    assert SegmentationHead().output_stride == 2
    assert InstanceCenterHead().output_stride == 2
    assert CenterOffsetHead().output_stride == 2
