"""Fused double-conv Pallas kernel: numerics vs the plain flax path.

The kernel itself runs in Pallas interpret mode on CPU (exact same
program the TPU executes, minus Mosaic lowering); the fallback path and
the module plumbing (`SimpleConvBlock.use_fused`,
`SimpleUpsamplingBlock.use_fused`, `maybe_fuse_convs`) are exercised
directly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
pytestmark = pytest.mark.slow  # integration tier: real training loops / model builds / subprocesses


from sleap_nn_tpu.ops.fused_conv import (
    _plain_double_conv,
    _supported,
    fused_double_conv3x3,
)


def rand(shape, seed=0, dtype=jnp.float32):
    return jnp.asarray(
        np.random.default_rng(seed).normal(size=shape), dtype)


@pytest.mark.parametrize(
    "shape,cmid,cout",
    [
        ((2, 16, 24, 1), 8, 8),      # C_in=1 stem-like
        ((1, 32, 32, 24), 24, 24),   # square, narrow
        ((1, 8, 16, 4), 96, 96),     # single strip (grid=1)
        ((2, 12, 20, 36), 54, 54),   # non-multiple-of-8 width
        ((1, 24, 8, 60), 36, 36),    # decoder concat-like channels
    ],
)
def test_interpret_matches_plain(shape, cmid, cout):
    cin = shape[3]
    x = rand(shape, 1)
    w1 = rand((3, 3, cin, cmid), 2) * 0.1
    b1 = rand((cmid,), 3) * 0.1
    w2 = rand((3, 3, cmid, cout), 4) * 0.1
    b2 = rand((cout,), 5) * 0.1
    ref = _plain_double_conv(x, w1, b1, w2, b2, "relu")
    got = fused_double_conv3x3(x, w1, b1, w2, b2, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_interpret_matches_plain_bf16():
    x = rand((1, 16, 16, 24), 7, jnp.bfloat16)
    w1 = rand((3, 3, 24, 24), 8) * 0.1
    b1 = rand((24,), 9) * 0.1
    w2 = rand((3, 3, 24, 24), 10) * 0.1
    b2 = rand((24,), 11) * 0.1
    ref = np.asarray(
        _plain_double_conv(x, w1, b1, w2, b2, "relu"), np.float32)
    got = np.asarray(
        fused_double_conv3x3(x, w1, b1, w2, b2, interpret=True), np.float32)
    # bf16 rounding differences only (accumulation order differs).
    np.testing.assert_allclose(got, ref, atol=0.15, rtol=0.05)


def test_no_bias():
    x = rand((1, 8, 8, 4), 12)
    w1 = rand((3, 3, 4, 8), 13) * 0.1
    w2 = rand((3, 3, 8, 8), 14) * 0.1
    ref = _plain_double_conv(x, w1, None, w2, None, "relu")
    got = fused_double_conv3x3(x, w1, None, w2, None, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_fallback_off_tpu():
    """On CPU (non-interpret) the public API silently uses the plain path."""
    x = rand((1, 16, 16, 8), 20)
    w1 = rand((3, 3, 8, 8), 21) * 0.1
    b1 = rand((8,), 22) * 0.1
    w2 = rand((3, 3, 8, 8), 23) * 0.1
    b2 = rand((8,), 24) * 0.1
    assert not _supported(x, w1, w2)  # cpu backend
    got = fused_double_conv3x3(x, w1, b1, w2, b2)
    ref = _plain_double_conv(x, w1, b1, w2, b2, "relu")
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_unsupported_kernel_size_falls_back():
    x = rand((1, 16, 16, 8), 30)
    w1 = rand((5, 5, 8, 8), 31) * 0.1
    w2 = rand((5, 5, 8, 8), 32) * 0.1
    got = fused_double_conv3x3(x, w1, None, w2, None)
    ref = _plain_double_conv(x, w1, None, w2, None, "relu")
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


# ── module plumbing ─────────────────────────────────────────────────────────


def test_simple_conv_block_use_fused_same_params_and_outputs():
    from sleap_nn_tpu.models.encoder_decoder import SimpleConvBlock

    plain = SimpleConvBlock(filters=8, num_convs=2, kernel_size=3, pool=False)
    fused = SimpleConvBlock(filters=8, num_convs=2, kernel_size=3, pool=False,
                            use_fused=True)
    x = rand((1, 16, 16, 4), 40)
    p1 = plain.init(jax.random.PRNGKey(0), x)
    p2 = fused.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(p1) == jax.tree_util.tree_structure(p2)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(a, b)
    # On CPU the fused path falls back to plain lax convs -> exact match.
    np.testing.assert_allclose(np.asarray(plain.apply(p1, x)),
                               np.asarray(fused.apply(p1, x)),
                               rtol=1e-6, atol=1e-6)


def test_unet_use_fused_parity():
    from sleap_nn_tpu.models.unet import UNet

    u = UNet(filters=8, filters_rate=1.5, down_blocks=3, up_blocks=2)
    uf = u.clone(use_fused=True)
    x = rand((1, 32, 48, 1), 41)
    p = u.init(jax.random.PRNGKey(0), x)
    p2 = uf.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(p) == jax.tree_util.tree_structure(p2)
    o1, o2 = u.apply(p, x), uf.apply(p, x)
    for a, b in zip(o1["outputs"], o2["outputs"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)


def test_maybe_fuse_convs_auto_and_override():
    import types as _t

    from sleap_nn_tpu.config.model_config import UNetConfig
    from sleap_nn_tpu.inference.backends import maybe_fuse_convs
    from sleap_nn_tpu.models.model import Model

    ns = _t.SimpleNamespace
    cfg = UNetConfig(filters=8, max_stride=8, output_stride=2, in_channels=1)
    model = Model.from_config(
        "unet", cfg,
        ns(confmaps=ns(part_names=["a"], anchor_part=None, sigma=3.0,
                       output_stride=2, loss_weight=None)),
        "single_instance",
    )
    assert model.backbone.use_fused is False
    on = maybe_fuse_convs(model, True)
    assert on.backbone.use_fused is True
    off = maybe_fuse_convs(on, False)
    assert off.backbone.use_fused is False
    # auto -> off on every backend: v5e A/B measured the kernel 3-5x
    # slower than XLA's conv lowering at narrow production channel counts
    # (see maybe_fuse_convs docstring); it stays an explicit opt-in.
    auto = maybe_fuse_convs(model, None)
    assert auto.backbone.use_fused is False


# ── VMEM gate (Mosaic tile padding) ─────────────────────────────────────────


def test_vmem_estimate_counts_lane_padding():
    """A 24-channel buffer occupies 128 lanes on TPU — the estimate must
    reflect that (the un-padded estimate let a 50 MB kernel through a
    16 MB scoped-vmem limit on hardware)."""
    from sleap_nn_tpu.ops.fused_conv import _vmem_bytes

    padded = _vmem_bytes(32, 256, 1, 24, 24)
    # th=32 at 256px with 24ch: ~17.7 MB padded (vs ~2 MB unpadded).
    assert padded > 16 * 1024 * 1024
    # Channel counts under 128 all pad to the same lane footprint.
    assert _vmem_bytes(8, 256, 24, 24, 24) == _vmem_bytes(8, 256, 24, 100, 100)


def test_pick_th_shrinks_to_fit_budget():
    from sleap_nn_tpu.ops.fused_conv import _pick_th, _vmem_bytes, _VMEM_BUDGET

    # The shape that OOM'd on a v5e at th=32 must now pick a smaller strip.
    th = _pick_th(256, 256, 24, 24, 24)
    assert th in (4, 8)
    assert _vmem_bytes(th, 256, 24, 24, 24) <= _VMEM_BUDGET
    # Megapixel-wide strips cannot fit: gate must reject entirely.
    assert _pick_th(1024, 1024, 24, 24, 24) == 0
    # Small shapes keep large strips.
    assert _pick_th(32, 32, 8, 8, 8) == 32
