"""Direct unit matrix for models/encoder_decoder.py building blocks.

Reference analog: tests/architectures/test_encoder_decoder.py +
test_common.py + test_architecture_utils.py — per-block shape/semantics
contracts (activation registry, same-pad pooling, bilinear upsample,
conv-block pooling order, encoder skip topology, decoder filter schedule
and per-stride outputs).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sleap_nn_tpu.models.encoder_decoder import (
    Decoder,
    Encoder,
    SimpleConvBlock,
    SimpleUpsamplingBlock,
    StemBlock,
    bilinear_upsample,
    decoder_block_filters,
    get_act_fn,
    max_pool_same,
)

KEY = jax.random.PRNGKey(0)


# ── activation registry ──────────────────────────────────────────────────────


@pytest.mark.parametrize("name", ["relu", "sigmoid", "tanh", "softmax",
                                  "identity", None, ""])
def test_act_registry_known_names(name):
    fn = get_act_fn(name)
    x = jnp.array([[-1.0, 0.0, 2.0]])
    out = fn(x)
    assert out.shape == x.shape


def test_act_registry_unknown_raises():
    with pytest.raises(KeyError, match="Unsupported activation"):
        get_act_fn("swishish")


def test_act_relu_clamps_negative():
    out = get_act_fn("relu")(jnp.array([-3.0, 4.0]))
    assert out.tolist() == [0.0, 4.0]


def test_act_sigmoid_range():
    out = get_act_fn("sigmoid")(jnp.array([-50.0, 0.0, 50.0]))
    assert float(out[0]) == pytest.approx(0.0, abs=1e-6)
    assert float(out[1]) == pytest.approx(0.5)
    assert float(out[2]) == pytest.approx(1.0, abs=1e-6)


def test_act_softmax_normalizes_last_axis():
    out = get_act_fn("softmax")(jnp.ones((2, 5)))
    np.testing.assert_allclose(np.asarray(out.sum(-1)), 1.0, rtol=1e-6)


def test_act_identity_passthrough():
    x = jnp.array([1.5, -2.5])
    assert get_act_fn("identity")(x) is x
    assert get_act_fn(None)(x) is x


# ── pooling / upsampling primitives ──────────────────────────────────────────


def test_max_pool_same_halves_even_dims():
    x = jnp.zeros((1, 8, 6, 3))
    assert max_pool_same(x).shape == (1, 4, 3, 3)


def test_max_pool_same_rounds_up_odd_dims():
    # SAME padding: ceil division (reference common.py:8 MaxPool2dWithSamePadding).
    x = jnp.zeros((1, 7, 5, 2))
    assert max_pool_same(x).shape == (1, 4, 3, 2)


def test_max_pool_same_takes_window_max():
    x = jnp.arange(16, dtype=jnp.float32).reshape(1, 4, 4, 1)
    out = max_pool_same(x)
    # windows: rows/cols pairs; max of each 2x2 window.
    np.testing.assert_array_equal(
        np.asarray(out[0, :, :, 0]), [[5.0, 7.0], [13.0, 15.0]]
    )


def test_max_pool_stride_one_keeps_shape():
    x = jnp.zeros((1, 6, 6, 1))
    assert max_pool_same(x, stride=1).shape == (1, 6, 6, 1)


def test_bilinear_upsample_doubles_spatial():
    x = jnp.zeros((2, 5, 7, 3))
    assert bilinear_upsample(x).shape == (2, 10, 14, 3)


def test_bilinear_upsample_factor_4():
    x = jnp.zeros((1, 3, 3, 1))
    assert bilinear_upsample(x, factor=4).shape == (1, 12, 12, 1)


def test_bilinear_upsample_constant_preserved():
    x = jnp.full((1, 4, 4, 1), 3.5)
    out = bilinear_upsample(x)
    np.testing.assert_allclose(np.asarray(out), 3.5, rtol=1e-6)


def test_bilinear_upsample_monotone_ramp():
    # A linear ramp stays monotone under half-pixel bilinear interpolation.
    x = jnp.arange(4, dtype=jnp.float32).reshape(1, 1, 4, 1)
    x = jnp.broadcast_to(x, (1, 2, 4, 1))
    out = np.asarray(bilinear_upsample(x))[0, 0, :, 0]
    assert (np.diff(out) >= -1e-6).all()


# ── SimpleConvBlock ──────────────────────────────────────────────────────────


def test_conv_block_pool_after_convs_shape():
    m = SimpleConvBlock(filters=8, num_convs=2, pool=True, pool_before_convs=False)
    x = jnp.zeros((1, 16, 16, 3))
    p = m.init(KEY, x)
    assert m.apply(p, x).shape == (1, 8, 8, 8)


def test_conv_block_pool_before_convs_shape():
    m = SimpleConvBlock(filters=4, num_convs=1, pool=True, pool_before_convs=True)
    x = jnp.zeros((1, 16, 16, 3))
    p = m.init(KEY, x)
    assert m.apply(p, x).shape == (1, 8, 8, 4)


def test_conv_block_no_pool_keeps_spatial():
    m = SimpleConvBlock(filters=4, pool=False)
    x = jnp.zeros((1, 10, 12, 2))
    p = m.init(KEY, x)
    assert m.apply(p, x).shape == (1, 10, 12, 4)


def test_conv_block_num_convs_params():
    m = SimpleConvBlock(filters=4, num_convs=3, pool=False)
    p = m.init(KEY, jnp.zeros((1, 8, 8, 1)))
    convs = p["params"]
    assert sorted(convs.keys()) == ["conv0", "conv1", "conv2"]


def test_conv_block_use_bias_false_has_no_bias_params():
    m = SimpleConvBlock(filters=4, num_convs=1, pool=False, use_bias=False)
    p = m.init(KEY, jnp.zeros((1, 8, 8, 1)))
    assert "bias" not in p["params"]["conv0"]


def test_conv_block_relu_output_nonnegative():
    m = SimpleConvBlock(filters=4, pool=False, activation="relu")
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 8, 8, 2)).astype(np.float32))
    p = m.init(KEY, x)
    assert float(m.apply(p, x).min()) >= 0.0


def test_conv_block_kernel_size_respected():
    m = SimpleConvBlock(filters=4, num_convs=1, pool=False, kernel_size=5)
    p = m.init(KEY, jnp.zeros((1, 8, 8, 3)))
    assert p["params"]["conv0"]["kernel"].shape == (5, 5, 3, 4)


# ── StemBlock ────────────────────────────────────────────────────────────────


def test_stem_single_block_stride_4():
    # 1 stem block (unpooled convs) + final pool => total stride 2... the
    # reference stem contributes 2^stem_blocks: with one block, stride 2.
    m = StemBlock(filters=8, stem_blocks=1, filters_rate=2.0)
    x = jnp.zeros((1, 32, 32, 1))
    p = m.init(KEY, x)
    assert m.apply(p, x).shape == (1, 16, 16, 8)


def test_stem_two_blocks_stride_4_and_filter_growth():
    m = StemBlock(filters=8, stem_blocks=2, filters_rate=2.0)
    x = jnp.zeros((1, 32, 32, 1))
    p = m.init(KEY, x)
    out = m.apply(p, x)
    # block0 no pool, block1 pools (2x), final pool (2x) => stride 4;
    # filters grow by filters_rate per block => 16 channels out.
    assert out.shape == (1, 8, 8, 16)


def test_stem_zero_blocks_is_single_pool():
    m = StemBlock(filters=8, stem_blocks=0, filters_rate=2.0)
    x = jnp.zeros((1, 16, 16, 3))
    p = m.init(KEY, x)
    out = m.apply(p, x)
    assert out.shape == (1, 8, 8, 3)  # no convs at all, just the final pool
    assert not jax.tree_util.tree_leaves(p["params"]) if "params" in p else True


# ── Encoder ──────────────────────────────────────────────────────────────────


def test_encoder_bottleneck_stride():
    m = Encoder(filters=4, down_blocks=3, filters_rate=2.0)
    x = jnp.zeros((1, 32, 32, 1))
    p = m.init(KEY, x)
    bottleneck, feats, _packed = m.apply(p, x)
    # block0 unpooled, blocks 1-2 pool (stride 4), final pool => stride 8.
    assert bottleneck.shape == (1, 4, 4, 16)


def test_encoder_returns_skips_deepest_first():
    m = Encoder(filters=4, down_blocks=3, filters_rate=2.0)
    x = jnp.zeros((1, 32, 32, 1))
    p = m.init(KEY, x)
    _, feats, _packed = m.apply(p, x)
    assert len(feats) == 3
    sizes = [f.shape[1] for f in feats]
    assert sizes == sorted(sizes)  # deepest (smallest) first
    assert feats[0].shape[1] == 8 and feats[-1].shape[1] == 32


def test_encoder_filter_schedule_follows_rate():
    m = Encoder(filters=4, down_blocks=3, filters_rate=1.5)
    x = jnp.zeros((1, 32, 32, 1))
    p = m.init(KEY, x)
    _, feats, _packed = m.apply(p, x)
    # deepest-first: int(4*1.5^2)=9, int(4*1.5)=6, 4.
    assert [f.shape[-1] for f in feats] == [9, 6, 4]


def test_encoder_stem_offset_shifts_filters_and_pools_block0():
    m = Encoder(filters=4, down_blocks=2, filters_rate=2.0, stem_blocks=1)
    x = jnp.zeros((1, 32, 32, 1))
    p = m.init(KEY, x)
    bottleneck, feats, _packed = m.apply(p, x)
    # with stem offset 1 every encoder block pools: stride 2,4 then final => 8.
    assert bottleneck.shape[1] == 4
    assert [f.shape[-1] for f in feats] == [16, 8]  # 4*2^(1+1), 4*2^(0+1)


# ── SimpleUpsamplingBlock ────────────────────────────────────────────────────


def test_upsampling_block_interp_concat_shape():
    m = SimpleUpsamplingBlock(refine_convs_filters=8)
    x = jnp.zeros((1, 4, 4, 16))
    skip = jnp.zeros((1, 8, 8, 8))
    p = m.init(KEY, x, skip)
    assert m.apply(p, x, skip).shape == (1, 8, 8, 8)


def test_upsampling_block_no_skip():
    m = SimpleUpsamplingBlock(refine_convs_filters=8, feat_concat=False)
    x = jnp.zeros((1, 4, 4, 16))
    p = m.init(KEY, x, None)
    assert m.apply(p, x, None).shape == (1, 8, 8, 8)


def test_upsampling_block_transposed_conv_torch_phase_shape():
    m = SimpleUpsamplingBlock(
        refine_convs_filters=8, up_interpolate=False, trans_conv_phase="torch"
    )
    x = jnp.zeros((1, 4, 4, 16))
    p = m.init(KEY, x, None)
    assert m.apply(p, x, None).shape == (1, 8, 8, 8)
    assert "trans_conv" in p["params"]


def test_upsampling_block_transposed_conv_tf_phase_shape():
    m = SimpleUpsamplingBlock(
        refine_convs_filters=8, up_interpolate=False, trans_conv_phase="tf"
    )
    x = jnp.zeros((1, 4, 4, 16))
    p = m.init(KEY, x, None)
    assert m.apply(p, x, None).shape == (1, 8, 8, 8)


def test_upsampling_block_odd_skip_resizes_to_match():
    # When the upsampled map and the skip disagree (odd input sizes), the
    # block resizes to the SKIP's spatial dims before concat.
    m = SimpleUpsamplingBlock(refine_convs_filters=4)
    x = jnp.zeros((1, 4, 4, 8))
    skip = jnp.zeros((1, 9, 9, 4))
    p = m.init(KEY, x, skip)
    assert m.apply(p, x, skip).shape == (1, 9, 9, 4)


def test_upsampling_block_refine_conv_count():
    m = SimpleUpsamplingBlock(refine_convs_filters=4, refine_convs=3,
                              feat_concat=False)
    p = m.init(KEY, jnp.zeros((1, 4, 4, 8)), None)
    names = [k for k in p["params"] if k.startswith("refine_conv")]
    assert sorted(names) == ["refine_conv0", "refine_conv1", "refine_conv2"]


# ── decoder filter schedule + Decoder ────────────────────────────────────────


@pytest.mark.parametrize(
    "block,expected",
    [(0, 32), (1, 16), (2, 8), (3, 4)],
)
def test_decoder_block_filters_no_contraction(block, expected):
    # filters=4, rate=2, down=4, stem=0: int(4 * 2^max(0, 3-block)).
    assert decoder_block_filters(4, 2.0, 4, 0, False, block) == expected


def test_decoder_block_filters_floors_at_base():
    # max(0, ...) keeps the schedule from dropping below `filters`.
    assert decoder_block_filters(4, 2.0, 2, 0, False, 5) == 4


@pytest.mark.parametrize("block,expected", [(0, 16), (1, 8), (2, 4)])
def test_decoder_block_filters_contraction(block, expected):
    # contraction: int(4 * 2^(down+stem-2-block)) with down=4.
    assert decoder_block_filters(4, 2.0, 4, 0, True, block) == expected


def test_decoder_strides_halve_from_current():
    d = Decoder(filters=4, up_blocks=3, down_blocks=3, filters_rate=2.0,
                current_stride=16)
    assert d.strides == [8, 4, 2]


def test_decoder_outputs_one_per_up_block():
    d = Decoder(filters=4, up_blocks=2, down_blocks=2, filters_rate=2.0,
                current_stride=8)
    x = jnp.zeros((1, 4, 4, 16))
    feats = [jnp.zeros((1, 8, 8, 8)), jnp.zeros((1, 16, 16, 4))]
    p = d.init(KEY, x, feats)
    out = d.apply(p, x, feats)
    assert out["strides"] == [4, 2]
    assert [o.shape[1] for o in out["outputs"]] == [8, 16]
    assert out["intermediate_feat"].shape == x.shape


def test_decoder_output_channels_match_schedule():
    d = Decoder(filters=4, up_blocks=2, down_blocks=2, filters_rate=2.0,
                current_stride=8)
    x = jnp.zeros((1, 4, 4, 16))
    feats = [jnp.zeros((1, 8, 8, 8)), jnp.zeros((1, 16, 16, 4))]
    p = d.init(KEY, x, feats)
    out = d.apply(p, x, feats)
    assert [o.shape[-1] for o in out["outputs"]] == [
        d.block_filters(0), d.block_filters(1)
    ]
