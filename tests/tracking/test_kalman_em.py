"""Unit tests for the numpy Kalman filter/smoother/EM (tracking/kalman.py).

The module re-implements the pykalman API slice the Kalman tracker needs
(reference sleap_nn/tracking/tracker.py:845-861); these tests pin the math:
EM monotonically increases the likelihood, masked observations coast, the
em_vars restriction leaves unlisted parameters untouched, and the filter
recovers a constant-velocity trajectory from noisy observations.
"""

from __future__ import annotations

import numpy as np
import pytest

from sleap_nn_tpu.tracking.kalman import KalmanFilter


def _cv_model():
    A = np.array([[1.0, 1, 0, 0], [0, 1, 0, 0], [0, 0, 1, 1], [0, 0, 0, 1]])
    C = np.array([[1.0, 0, 0, 0], [0, 0, 1, 0]])
    return A, C


def _simulate(T=40, q=0.05, r=1.5, seed=0, x0=(10.0, 1.2, 40.0, -0.8)):
    rng = np.random.default_rng(seed)
    A, C = _cv_model()
    x = np.asarray(x0, dtype=float)
    states, obs = [], []
    for _ in range(T):
        x = A @ x + rng.normal(0, np.sqrt(q), 4)
        states.append(x.copy())
        obs.append(C @ x + rng.normal(0, np.sqrt(r), 2))
    return np.asarray(states), np.asarray(obs)


def test_em_monotonically_increases_loglikelihood():
    A, C = _cv_model()
    _, obs = _simulate()
    X = np.ma.masked_invalid(obs)
    kf = KalmanFilter(transition_matrices=A, observation_matrices=C,
                      initial_state_mean=[10, 1.2, 40, -0.8])
    lls = [kf.loglikelihood(X)]
    for _ in range(6):
        kf.em(X, n_iter=1,
              em_vars=["transition_covariance", "observation_covariance",
                       "initial_state_covariance"])
        lls.append(kf.loglikelihood(X))
    assert all(b >= a - 1e-8 for a, b in zip(lls, lls[1:])), lls


def test_em_with_missing_frames():
    A, C = _cv_model()
    _, obs = _simulate(T=30, seed=3)
    obs = obs.copy()
    X = np.ma.masked_invalid(obs)
    X[5] = np.ma.masked
    X[12] = np.ma.masked
    kf = KalmanFilter(transition_matrices=A, observation_matrices=C,
                      initial_state_mean=[10, 1.2, 40, -0.8])
    ll0 = kf.loglikelihood(X)
    kf.em(X, n_iter=10,
          em_vars=["transition_covariance", "observation_covariance"])
    assert kf.loglikelihood(X) >= ll0
    means, covs = kf.filter(X)
    assert np.isfinite(means).all() and np.isfinite(covs).all()


def test_em_vars_restriction_leaves_others_untouched():
    A, C = _cv_model()
    _, obs = _simulate(T=20, seed=5)
    kf = KalmanFilter(transition_matrices=A, observation_matrices=C,
                      initial_state_mean=[10, 1.2, 40, -0.8])
    mu0 = kf.initial_state_mean.copy()
    sigma0 = kf.initial_state_covariance.copy()
    R0 = kf.observation_covariance.copy()
    kf.em(obs, n_iter=5, em_vars=["transition_covariance"])
    np.testing.assert_array_equal(kf.initial_state_mean, mu0)
    np.testing.assert_array_equal(kf.initial_state_covariance, sigma0)
    np.testing.assert_array_equal(kf.observation_covariance, R0)
    assert not np.allclose(kf.transition_covariance, np.eye(4))
    with pytest.raises(ValueError, match="Unknown em_vars"):
        kf.em(obs, n_iter=1, em_vars=["bogus"])


def test_filter_tracks_constant_velocity():
    A, C = _cv_model()
    states, obs = _simulate(T=60, q=0.01, r=1.0, seed=1)
    kf = KalmanFilter(
        transition_matrices=A, observation_matrices=C,
        initial_state_mean=[obs[0, 0], 1.0, obs[0, 1], -1.0],
    ).em(np.ma.masked_invalid(obs[:20]), n_iter=10,
         em_vars=["transition_covariance", "observation_covariance"])
    means, _ = kf.filter(obs)
    # Filtered position error should be well under the raw observation noise.
    pos_err = np.linalg.norm(means[-20:, [0, 2]] - states[-20:, [0, 2]], axis=1)
    raw_err = np.linalg.norm(obs[-20:] - states[-20:, [0, 2]], axis=1)
    assert pos_err.mean() < raw_err.mean()


def test_filter_update_masked_coasts_along_velocity():
    A, C = _cv_model()
    kf = KalmanFilter(transition_matrices=A, observation_matrices=C,
                      initial_state_mean=[0.0, 2.0, 0.0, -1.0])
    mean = np.array([0.0, 2.0, 0.0, -1.0])
    cov = np.eye(4)
    for step in range(1, 4):
        mean, cov = kf.filter_update(mean, cov, observation=np.ma.masked)
        assert mean[0] == pytest.approx(2.0 * step)
        assert mean[2] == pytest.approx(-1.0 * step)
    # Covariance grows while coasting (no information added).
    assert np.trace(cov) > 4.0


def test_partial_mask_skips_whole_observation():
    """pykalman rule: ANY masked component -> the whole timestep is missing."""
    A, C = _cv_model()
    kf = KalmanFilter(transition_matrices=A, observation_matrices=C,
                      initial_state_mean=[0.0, 2.0, 0.0, -1.0])
    mean = np.array([0.0, 2.0, 0.0, -1.0])
    cov = np.eye(4)
    partial = np.ma.asarray([5.0, 1.0])
    partial[1] = np.ma.masked
    m1, _ = kf.filter_update(mean, cov, observation=partial)
    m2, _ = kf.filter_update(mean, cov, observation=np.ma.masked)
    np.testing.assert_allclose(m1, m2)
    # NaNs behave like masks.
    m3, _ = kf.filter_update(mean, cov, observation=np.array([5.0, np.nan]))
    np.testing.assert_allclose(m3, m2)


def test_smooth_reduces_error_vs_filter():
    A, C = _cv_model()
    states, obs = _simulate(T=50, q=0.02, r=2.0, seed=9)
    kf = KalmanFilter(
        transition_matrices=A, observation_matrices=C,
        initial_state_mean=[obs[0, 0], 1.0, obs[0, 1], -1.0],
        transition_covariance=np.eye(4) * 0.02,
        observation_covariance=np.eye(2) * 2.0,
    )
    f_means, _ = kf.filter(obs)
    s_means, _ = kf.smooth(obs)
    f_err = np.linalg.norm(f_means[5:-5, [0, 2]] - states[5:-5, [0, 2]], axis=1)
    s_err = np.linalg.norm(s_means[5:-5, [0, 2]] - states[5:-5, [0, 2]], axis=1)
    assert s_err.mean() <= f_err.mean() + 1e-9


def test_shape_validation():
    with pytest.raises(ValueError, match="square"):
        KalmanFilter(transition_matrices=np.ones((2, 3)),
                     observation_matrices=np.eye(2))
    with pytest.raises(ValueError, match="incompatible"):
        KalmanFilter(transition_matrices=np.eye(4),
                     observation_matrices=np.eye(3))
