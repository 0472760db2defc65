"""Exactness tests for space-to-depth packed conv execution.

The packed path must be a mathematically exact re-layout of a stride-1
SAME conv (+ the 2x2/2 max pool): these tests compare against the plain
`lax.conv` / `nn.max_pool` formulations elementwise in float32, across
kernel sizes, channel counts, odd image sizes, and a full UNet level-0
block replay.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sleap_nn_tpu.models.encoder_decoder import max_pool_same
from sleap_nn_tpu.ops.packed_conv import (
    depth_to_space,
    pack_conv_bias,
    pack_conv_kernel,
    packed_conv,
    packed_phase_max_pool,
    pad_to_even,
    space_to_depth,
)


def plain_conv(x, w, b=None):
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    return y if b is None else y + b


def rand(shape, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).standard_normal(shape), jnp.float32
    )


# ── layout round-trip ────────────────────────────────────────────────────────


def test_space_to_depth_roundtrip():
    x = rand((2, 8, 10, 3))
    np.testing.assert_array_equal(depth_to_space(space_to_depth(x)), x)


def test_space_to_depth_phase_layout():
    # Phase (p, q) of pixel space lands at channel block p*2+q.
    x = rand((1, 4, 4, 2))
    packed = space_to_depth(x)
    for p in (0, 1):
        for q in (0, 1):
            blk = packed[0, :, :, (p * 2 + q) * 2 : (p * 2 + q + 1) * 2]
            np.testing.assert_array_equal(blk, x[0, p::2, q::2, :])


def test_pad_to_even_pads_bottom_right():
    x = rand((1, 5, 7, 2))
    padded, (ph, pw) = pad_to_even(x)
    assert padded.shape == (1, 6, 8, 2) and (ph, pw) == (1, 1)
    np.testing.assert_array_equal(padded[:, :5, :7], x)
    assert float(jnp.abs(padded[:, 5:]).sum()) == 0.0


# ── conv exactness ───────────────────────────────────────────────────────────


@pytest.mark.parametrize("k", [1, 3, 5])
@pytest.mark.parametrize("cin,cout", [(1, 24), (24, 24), (3, 17)])
def test_packed_conv_matches_plain(k, cin, cout):
    x = rand((2, 16, 12, cin), seed=k * 100 + cin)
    w = rand((k, k, cin, cout), seed=k * 100 + cin + 1) * 0.1
    b = rand((cout,), seed=7) * 0.1
    ref = plain_conv(x, w, b)
    got = depth_to_space(packed_conv(space_to_depth(x), w, b))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_packed_kernel_shape_and_sparsity():
    w = rand((3, 3, 4, 8))
    wp = pack_conv_kernel(w)
    assert wp.shape == (3, 3, 16, 32)
    # Each original tap appears exactly once per (phase-in, phase-out) pair
    # with a valid cell offset: total nonzero tap-blocks = 4*4*... just check
    # the packed kernel reproduces total mass 4x (each tap used by 4 output
    # phases across the input phases).
    np.testing.assert_allclose(
        float(jnp.abs(wp).sum()), 4 * float(jnp.abs(w).sum()), rtol=1e-6
    )


def test_packed_bias_tiles_over_phases():
    b = jnp.arange(5.0)
    np.testing.assert_array_equal(pack_conv_bias(b), jnp.tile(b, 4))


def test_prepacked_kernel_path():
    x = rand((1, 8, 8, 3))
    w = rand((3, 3, 3, 6))
    wp = pack_conv_kernel(w)
    a = packed_conv(space_to_depth(x), w)
    bb = packed_conv(space_to_depth(x), wp, prepacked=True)
    np.testing.assert_allclose(a, bb, rtol=1e-6, atol=1e-6)


# ── pool exactness ───────────────────────────────────────────────────────────


def test_phase_max_pool_matches_max_pool_same():
    x = rand((2, 16, 12, 5), seed=3)
    ref = max_pool_same(x, 2)
    got = packed_phase_max_pool(space_to_depth(x))
    np.testing.assert_array_equal(got, ref)


# ── full level-0 block replay ────────────────────────────────────────────────


def test_level0_block_packed_replay():
    """conv(1->24) -> relu -> conv(24->24) -> relu -> pool, both layouts."""
    x = rand((2, 32, 32, 1), seed=11)
    w0 = rand((3, 3, 1, 24), seed=12) * 0.2
    b0 = rand((24,), seed=13) * 0.1
    w1 = rand((3, 3, 24, 24), seed=14) * 0.2
    b1 = rand((24,), seed=15) * 0.1

    ref = jax.nn.relu(plain_conv(x, w0, b0))
    ref = jax.nn.relu(plain_conv(ref, w1, b1))
    ref_pooled = max_pool_same(ref, 2)

    xp = space_to_depth(x)
    yp = jax.nn.relu(packed_conv(xp, w0, b0))
    yp = jax.nn.relu(packed_conv(yp, w1, b1))
    np.testing.assert_allclose(depth_to_space(yp), ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        packed_phase_max_pool(yp), ref_pooled, rtol=1e-5, atol=1e-5
    )


def test_packed_conv_jit_and_grad():
    """The packed path is jittable and differentiable (kernel packing is a
    linear jnp transform, so gradients flow back to the original weights)."""
    x = rand((1, 8, 8, 2), seed=21)
    w = rand((3, 3, 2, 4), seed=22)

    def loss_packed(w):
        return jnp.sum(packed_conv(space_to_depth(x), w) ** 2)

    def loss_plain(w):
        return jnp.sum(plain_conv(x, w) ** 2)

    g_packed = jax.jit(jax.grad(loss_packed))(w)
    g_plain = jax.jit(jax.grad(loss_plain))(w)
    np.testing.assert_allclose(g_packed, g_plain, rtol=1e-4, atol=1e-4)


# ── whole-model exactness: packed UNet == plain UNet, same params ────────────


@pytest.mark.slow
def test_unet_packed_level0_exactness():
    from sleap_nn_tpu.models.unet import UNet

    plain = UNet(filters=8, filters_rate=1.5, down_blocks=3, up_blocks=2,
                 convs_per_block=2, middle_block=True)
    packed = plain.clone(packed_levels=2, pack_min_res=1)
    x = rand((2, 32, 48, 1), seed=31)
    params = plain.init(jax.random.PRNGKey(0), x)
    # Identical param trees: the packed path declares the same params.
    p2 = packed.init(jax.random.PRNGKey(0), x)
    flat1 = jax.tree_util.tree_leaves_with_path(params)
    flat2 = jax.tree_util.tree_leaves_with_path(p2)
    assert [jax.tree_util.keystr(k) for k, _ in flat1] == [
        jax.tree_util.keystr(k) for k, _ in flat2
    ]
    for (_, a), (_, b) in zip(flat1, flat2):
        np.testing.assert_array_equal(a, b)  # same RNG stream -> same init

    out_plain = plain.apply(params, x)
    out_packed = packed.apply(params, x)
    assert out_plain["strides"] == out_packed["strides"]
    for a, b in zip(out_plain["outputs"], out_packed["outputs"]):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-5)


def test_unet_packed_falls_back_on_odd_input():
    from sleap_nn_tpu.models.unet import UNet

    packed = UNet(filters=8, filters_rate=1.5, down_blocks=3, up_blocks=2,
                  packed_levels=2, pack_min_res=1)
    x = rand((1, 34, 34, 1), seed=41)  # not 4-divisible: odd at stride 1? 34 is even
    x = rand((1, 33, 35, 1), seed=41)
    plain = packed.clone(packed_levels=0)
    params = plain.init(jax.random.PRNGKey(0), rand((1, 36, 36, 1)))
    # Odd H/W -> the Encoder silently uses the plain path; outputs match.
    a = plain.apply(params, x)
    b = packed.apply(params, x)
    for t1, t2 in zip(a["outputs"], b["outputs"]):
        np.testing.assert_allclose(t1, t2, rtol=1e-6, atol=1e-6)


def test_maybe_pack_level0_auto_and_override():
    from sleap_nn_tpu.inference.backends import maybe_pack_level0
    from sleap_nn_tpu.models.model import Model
    import types as _t

    ns = _t.SimpleNamespace
    from sleap_nn_tpu.config.model_config import UNetConfig
    cfg = UNetConfig(filters=8, max_stride=8, output_stride=2, in_channels=1)
    model = Model.from_config(
        "unet", cfg,
        ns(confmaps=ns(part_names=["a"], anchor_part=None, sigma=3.0,
                       output_stride=2, loss_weight=None)),
        "single_instance",
    )
    assert model.backbone.packed_levels == 0
    forced = maybe_pack_level0(model, True)
    assert forced.backbone.packed_levels >= 1
    off = maybe_pack_level0(model, False)
    assert off.backbone.packed_levels == 0
    # Forced-on model still evaluates identically with the same params.
    x = rand((1, 16, 16, 1), seed=51)
    params = model.init(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(
        model.apply(params, x)["SingleInstanceConfmapsHead"],
        forced.apply(params, x)["SingleInstanceConfmapsHead"],
        rtol=2e-5, atol=2e-5,
    )


# ── packed upsample-conv (decoder fusion primitive) ──────────────────────────


def test_packed_upsample_conv_exact_incl_borders():
    """conv3_SAME(bilinear_up2x(x)) == depth_to_space(packed_upsample_conv)."""
    from sleap_nn_tpu.ops.packed_conv import (
        _conv_same,
        _upsample2x,
        depth_to_space,
        packed_upsample_conv,
    )

    for h, w, cin, cout, seed in [(8, 8, 5, 7, 0), (16, 12, 3, 4, 1), (6, 10, 1, 2, 2)]:
        x = rand((2, h, w, cin), seed=seed)
        k = rand((3, 3, cin, cout), seed=seed + 100)
        ref = _conv_same(_upsample2x(x), k)
        got = depth_to_space(packed_upsample_conv(x, k))
        np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_packed_upsample_conv_borders_matter():
    """Without the border fix the ring differs, interior matches — guards
    against the fix silently becoming a no-op."""
    from sleap_nn_tpu.ops.packed_conv import (
        _conv_same,
        _upsample2x,
        depth_to_space,
        packed_upsample_conv,
    )

    x = rand((1, 10, 10, 3), seed=3)
    k = rand((3, 3, 3, 2), seed=4)
    ref = _conv_same(_upsample2x(x), k)
    raw = depth_to_space(packed_upsample_conv(x, k, exact_borders=False))
    assert float(jnp.max(jnp.abs(ref - raw))) > 1e-3  # borders really differ
    np.testing.assert_allclose(raw[:, 2:-2, 2:-2], ref[:, 2:-2, 2:-2],
                               rtol=2e-5, atol=2e-5)


def test_packed_pool_s2d_fused_helper():
    from sleap_nn_tpu.ops.packed_conv import (
        depth_to_space,
        packed_pool_s2d,
        space_to_depth,
    )
    from sleap_nn_tpu.models.encoder_decoder import max_pool_same

    xp = rand((2, 8, 8, 4 * 6), seed=5)
    ref = space_to_depth(max_pool_same(depth_to_space(xp), 2))
    np.testing.assert_allclose(packed_pool_s2d(xp), ref, rtol=1e-6, atol=1e-6)


# ── whole-model exactness across model types / strides / packed depths ───────


def _build(model_type, cfg_kw, head_ns, seed=0, shape=(2, 64, 48, 1)):
    import types as _t

    from sleap_nn_tpu.config.model_config import UNetConfig
    from sleap_nn_tpu.models.model import Model

    cfg = UNetConfig(in_channels=1, **cfg_kw)
    model = Model.from_config("unet", cfg, head_ns, model_type)
    x = rand(shape, seed=seed)
    params = model.init(jax.random.PRNGKey(0), x)
    return model, params, x


@pytest.mark.slow
def test_packed_model_exactness_matrix():
    """packed_levels in {1, 2} reproduces the plain forward exactly for
    single-instance (os=1, both decoder blocks packed), centroid (os=2),
    and bottomup (two heads at different strides)."""
    import types as _t

    ns = _t.SimpleNamespace
    cases = [
        ("single_instance", dict(filters=16, max_stride=8, output_stride=1),
         ns(confmaps=ns(part_names=["a", "b", "c"], anchor_part=None,
                        sigma=3.0, output_stride=1, loss_weight=None))),
        ("centroid", dict(filters=24, max_stride=16, output_stride=2),
         ns(confmaps=ns(anchor_part=None, sigma=5.0, output_stride=2,
                        loss_weight=None))),
        ("bottomup", dict(filters=24, max_stride=16, output_stride=2),
         ns(confmaps=ns(part_names=["a", "b"], sigma=3.0, output_stride=2,
                        loss_weight=None),
            pafs=ns(edges=[("a", "b")], sigma=15.0, output_stride=4,
                    loss_weight=None))),
    ]
    for model_type, cfg_kw, head_ns in cases:
        model, params, x = _build(model_type, cfg_kw, head_ns)
        ref = model.apply(params, x)
        for levels in (1, 2):
            packed = model.clone(
                backbone=model.backbone.clone(packed_levels=levels,
                                              pack_min_res=1)
            )
            # identical param trees
            p2 = packed.init(jax.random.PRNGKey(0), x)
            assert jax.tree_util.tree_structure(params) == \
                jax.tree_util.tree_structure(p2)
            got = packed.apply(params, x)
            for key in ref:
                np.testing.assert_allclose(
                    got[key], ref[key], rtol=5e-5, atol=5e-5,
                    err_msg=f"{model_type} levels={levels} head={key}",
                )


@pytest.mark.slow
def test_packed_model_gradients_match():
    """Gradients through the fully-packed graph (encoder levels, packed
    decoder block, packed head) equal the plain graph's — packed training
    follows the same trajectory."""
    import types as _t

    ns = _t.SimpleNamespace
    model, params, x = _build(
        "centroid", dict(filters=16, max_stride=8, output_stride=2),
        ns(confmaps=ns(anchor_part=None, sigma=5.0, output_stride=2,
                       loss_weight=None)),
        shape=(1, 32, 32, 1),
    )
    packed = model.clone(backbone=model.backbone.clone(packed_levels=2,
                                                   pack_min_res=1))

    def loss(m):
        def f(p):
            return jnp.sum(m.apply(p, x)["CentroidConfmapsHead"] ** 2)
        return f

    g1 = jax.grad(loss(model))(params)
    g2 = jax.grad(loss(packed))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-4)


def test_choose_packed_levels_policy():
    from sleap_nn_tpu.inference.backends import choose_packed_levels
    from sleap_nn_tpu.models.unet import UNet

    # medium_rf: 24, 36 channels -> both packed
    assert choose_packed_levels(UNet(filters=24, filters_rate=1.5,
                                     down_blocks=5, up_blocks=4)) == 2
    # large_rf: 32, 64 -> only level 0
    assert choose_packed_levels(UNet(filters=32, filters_rate=2.0,
                                     down_blocks=4, up_blocks=3)) == 1
    # wide model: no packing
    assert choose_packed_levels(UNet(filters=64, filters_rate=2.0,
                                     down_blocks=4, up_blocks=3)) == 0
    # shallow model: never pack the last level
    assert choose_packed_levels(UNet(filters=8, filters_rate=1.5,
                                     down_blocks=1, up_blocks=0)) == 0


@pytest.mark.slow
def test_predictor_packed_knob_e2e_parity():
    """The real topdown Predictor with packed execution forced on returns
    the same keypoints as with it off (fixture ckpts, real video)."""
    from pathlib import Path

    import pytest

    from sleap_nn_tpu.inference.predictor import Predictor

    ckpts = Path("/root/reference/tests/assets/model_ckpts")
    video = Path("/root/reference/tests/assets/datasets/centered_pair_small.mp4")
    if not video.exists():
        pytest.skip("reference assets unavailable")
    paths = [str(ckpts / "minimal_instance_centroid"),
             str(ckpts / "minimal_instance_centered_instance")]
    p_plain = Predictor.from_model_paths(
        paths, batch_size=2, max_instances=4, packed_level0=False
    )
    p_packed = Predictor.from_model_paths(
        paths, batch_size=2, max_instances=4, packed_level0=2
    )
    def kp(outs):
        if isinstance(outs, dict):
            return np.asarray(outs["pred_keypoints"])
        return np.concatenate([np.asarray(o["pred_keypoints"]) for o in outs])

    a = p_plain.predict(str(video), frames=[0, 1], make_labels=False)
    b = p_packed.predict(str(video), frames=[0, 1], make_labels=False)
    ka, kb = kp(a), kp(b)
    assert np.array_equal(np.isnan(ka), np.isnan(kb))
    assert float(np.nanmax(np.abs(ka - kb))) < 1e-3
