"""Multi-device SPMD inference: batch sharded over the local mesh.

TPU-native capability beyond the reference (which binds one model per GPU
process): ``Predictor.from_model_paths(..., data_parallel=True)`` runs ONE
jitted program across every local device — params replicated, each batch's
leading axis split, XLA inserting any collectives. Exercised here on the
8-device virtual CPU mesh the conftest configures; on hardware the same
program spans the chips over ICI. Numerical parity with the single-device
predictor is the contract.
"""

from pathlib import Path

import jax
import numpy as np
import pytest

from sleap_nn_tpu.inference import predict
from sleap_nn_tpu.inference.predictor import Predictor
from sleap_nn_tpu.io import load_slp

CKPTS = Path("/root/reference/tests/assets/model_ckpts")
FIXTURE = "/root/reference/tests/assets/datasets/minimal_instance.pkg.slp"

pytestmark = [pytest.mark.slow,  # integration tier
    pytest.mark.skipif(
    not CKPTS.exists(), reason="reference assets unavailable"
)]

N_DEV = len(jax.devices())


def _frames(n, seed=0):
    return np.random.default_rng(seed).integers(
        0, 255, (n, 384, 384, 1), dtype=np.uint8
    )


def _assert_close(a: dict, b: dict):
    assert sorted(a) == sorted(b)
    for k in a:
        try:
            x = np.asarray(a[k], dtype=np.float64)
            y = np.asarray(b[k], dtype=np.float64)
        except (ValueError, TypeError):
            # Ragged host-grouped outputs (bottom-up per-sample instance
            # lists): compare flattened element-wise.
            xs = [np.asarray(v, np.float64) for s in a[k] for v in np.atleast_1d(s)]
            ys = [np.asarray(v, np.float64) for s in b[k] for v in np.atleast_1d(s)]
            assert len(xs) == len(ys), k
            for xe, ye in zip(xs, ys):
                nan = np.isnan(xe) & np.isnan(ye)
                np.testing.assert_allclose(
                    np.where(nan, 0, xe), np.where(nan, 0, ye),
                    atol=1e-4, err_msg=k,
                )
            continue
        nan = np.isnan(x) & np.isnan(y)
        assert np.array_equal(np.isnan(x), np.isnan(y)), k
        np.testing.assert_allclose(
            np.where(nan, 0, x), np.where(nan, 0, y), atol=1e-4, err_msg=k
        )


def test_requires_divisible_batch():
    with pytest.raises(ValueError, match="divisible"):
        Predictor.from_model_paths(
            [CKPTS / "minimal_instance_centroid"],
            batch_size=N_DEV + 1, data_parallel=True,
        )


def test_batch_actually_sharded_across_devices():
    p = Predictor.from_model_paths(
        [CKPTS / "minimal_instance_centroid"],
        batch_size=N_DEV, data_parallel=True,
    )
    frames = jax.device_put(_frames(N_DEV), p._batch_sharding)
    dev = p.layer.predict_async(frames)
    leaf = jax.tree_util.tree_leaves(dev)[0]
    assert len(leaf.sharding.device_set) == N_DEV


def test_centroid_parity_with_single_device():
    frames = _frames(N_DEV)
    single = Predictor.from_model_paths(
        [CKPTS / "minimal_instance_centroid"],
        peak_threshold=0.1, batch_size=N_DEV,
    )
    multi = Predictor.from_model_paths(
        [CKPTS / "minimal_instance_centroid"],
        peak_threshold=0.1, batch_size=N_DEV, data_parallel=True,
    )
    _assert_close(single.layer.predict(frames),
                  multi.layer.predict(frames))


def test_topdown_composite_parity_with_single_device():
    frames = _frames(N_DEV, seed=3)
    dirs = [CKPTS / "minimal_instance_centroid",
            CKPTS / "minimal_instance_centered_instance"]
    single = Predictor.from_model_paths(
        dirs, peak_threshold=0.1, batch_size=N_DEV, max_instances=4)
    multi = Predictor.from_model_paths(
        dirs, peak_threshold=0.1, batch_size=N_DEV, max_instances=4,
        data_parallel=True)
    _assert_close(single.layer.predict(frames),
                  multi.layer.predict(frames))


def test_bottomup_parity_with_single_device():
    frames = _frames(N_DEV, seed=7)
    src = [CKPTS / "minimal_instance_bottomup"]
    single = Predictor.from_model_paths(
        src, peak_threshold=0.1, batch_size=N_DEV)
    multi = Predictor.from_model_paths(
        src, peak_threshold=0.1, batch_size=N_DEV, data_parallel=True)
    _assert_close(single.layer.predict(frames),
                  multi.layer.predict(frames))


def test_end_to_end_labels_parity(tmp_path):
    """Full predict() (provider, padding, coordinate lift, Labels) matches
    the single-device run point-for-point."""
    labels = load_slp(FIXTURE)
    kw = dict(peak_threshold=0.1, batch_size=N_DEV, max_instances=2)
    base = predict(labels, [CKPTS / "minimal_instance_centroid",
                            CKPTS / "minimal_instance_centered_instance"], **kw)
    dp = predict(labels, [CKPTS / "minimal_instance_centroid",
                          CKPTS / "minimal_instance_centered_instance"],
                 data_parallel=True, **kw)
    assert len(base.labeled_frames) == len(dp.labeled_frames)
    for lf_a, lf_b in zip(base.labeled_frames, dp.labeled_frames):
        a = sorted(i.numpy().tolist() for i in lf_a.predicted_instances)
        b = sorted(i.numpy().tolist() for i in lf_b.predicted_instances)
        np.testing.assert_allclose(np.asarray(a, float),
                                   np.asarray(b, float), atol=1e-3)
