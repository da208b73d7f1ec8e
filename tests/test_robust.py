"""Robust kernel semantics (slam/solver.cpp:38-41 quirk included)."""

import numpy as np
import jax.numpy as jnp

from boslam.config import SolverConfig
from boslam.solver.robust import robust_cost, robust_weights


def test_threshold_quirk_scales_only_b():
    cfg = SolverConfig(robust="threshold", kernel_threshold=1.0)
    chi2 = jnp.array([0.5, 4.0])
    wH, wb = robust_weights(chi2, cfg)
    np.testing.assert_allclose(np.asarray(wH), [1.0, 1.0])  # H unscaled!
    np.testing.assert_allclose(np.asarray(wb), [1.0, 0.5])  # sqrt(1/4)


def test_textbook_mode_scales_both():
    cfg = SolverConfig(robust="threshold", reference_kernel_quirk=False)
    chi2 = jnp.array([0.5, 4.0])
    wH, wb = robust_weights(chi2, cfg)
    np.testing.assert_allclose(np.asarray(wH), [1.0, 0.5])
    np.testing.assert_allclose(np.asarray(wb), [1.0, 0.5])


def test_huber_weights_and_cost():
    cfg = SolverConfig(robust="huber", kernel_threshold=2.0)
    chi2 = jnp.array([1.0, 8.0])
    wH, wb = robust_weights(chi2, cfg)
    np.testing.assert_allclose(np.asarray(wH), [1.0, 0.5])
    np.testing.assert_allclose(np.asarray(wH), np.asarray(wb))
    cost = robust_cost(chi2, cfg)
    # below threshold: identity; above: 2*sqrt(kt*chi) - kt
    np.testing.assert_allclose(
        np.asarray(cost), [1.0, 2 * np.sqrt(2.0 * 8.0) - 2.0], rtol=1e-6
    )


def test_none_kernel():
    cfg = SolverConfig(robust="none")
    chi2 = jnp.array([0.5, 100.0])
    wH, wb = robust_weights(chi2, cfg)
    np.testing.assert_allclose(np.asarray(wH), 1.0)
    np.testing.assert_allclose(np.asarray(wb), 1.0)
    np.testing.assert_allclose(np.asarray(robust_cost(chi2, cfg)), np.asarray(chi2))


def test_threshold_cost_saturates():
    cfg = SolverConfig(robust="threshold", kernel_threshold=1.0)
    chi2 = jnp.array([0.25, 1.0, 9.0])
    np.testing.assert_allclose(np.asarray(robust_cost(chi2, cfg)), [0.25, 1.0, 1.0])


def test_zero_chi2_no_nan():
    cfg = SolverConfig(robust="huber")
    chi2 = jnp.zeros(4)
    wH, wb = robust_weights(chi2, cfg)
    assert np.all(np.isfinite(np.asarray(wH)))
    assert np.all(np.isfinite(np.asarray(robust_cost(chi2, cfg))))
