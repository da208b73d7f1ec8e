"""Cyclic-reduction block-tridiagonal solver (the chain preconditioner)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from boslam.solver.btridiag import (
    btridiag_dense,
    btridiag_factor,
    btridiag_solve,
)


def _random_spd_tridiag(n, rng, dtype=jnp.float64):
    """Random SPD block-tridiagonal: diagonally-dominant construction."""
    upper = jnp.asarray(rng.standard_normal((n - 1, 3, 3)), dtype)
    d = jnp.asarray(rng.standard_normal((n, 3, 3)), dtype)
    diag = jnp.einsum("nij,nkj->nik", d, d) + 8.0 * jnp.eye(3, dtype=dtype)
    return diag, upper


@pytest.mark.parametrize("n", [1, 2, 3, 5, 8, 17, 64, 100])
def test_solve_matches_dense(n):
    rng = np.random.default_rng(n)
    with jax.enable_x64(True):
        diag, upper = _random_spd_tridiag(n, rng)
        rhs = jnp.asarray(rng.standard_normal((n, 3)), jnp.float64)
        T = btridiag_dense(diag, upper)
        x_ref = jnp.linalg.solve(T, rhs.reshape(-1)).reshape(n, 3)
        x = btridiag_solve(btridiag_factor(diag, upper), rhs)
        np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref), rtol=1e-9)


def test_solve_f32_slam_like_conditioning():
    """f32 with SLAM-like block scales (odometry omega ~5000, damping 0.01)."""
    n = 257
    rng = np.random.default_rng(0)
    upper = jnp.asarray(rng.standard_normal((n - 1, 3, 3)), jnp.float32)
    upper = upper * jnp.asarray([500.0, 500.0, 5000.0], jnp.float32)[None, :, None]
    diag = (
        jnp.einsum("nij,nkj->nik", upper[: n - 1], upper[: n - 1])
        + jnp.einsum("nji,njk->nik", upper[: n - 1], upper[: n - 1])
    )
    diag = jnp.concatenate([diag, diag[-1:]]) / 100.0 + 1e4 * jnp.eye(3)
    rhs = jnp.asarray(rng.standard_normal((n, 3)), jnp.float32)
    T = np.asarray(btridiag_dense(diag, upper), np.float64)
    x_ref = np.linalg.solve(T, np.asarray(rhs, np.float64).reshape(-1)).reshape(n, 3)
    x = np.asarray(btridiag_solve(btridiag_factor(diag, upper), rhs), np.float64)
    resid = np.linalg.norm(T @ x.reshape(-1) - np.asarray(rhs).reshape(-1))
    assert resid / np.linalg.norm(rhs) < 1e-4
    np.testing.assert_allclose(x, x_ref, rtol=2e-3, atol=2e-3)


def test_jit_and_grad_shapes():
    rng = np.random.default_rng(3)
    diag, upper = _random_spd_tridiag(31, rng, jnp.float32)
    rhs = jnp.asarray(rng.standard_normal((31, 3)), jnp.float32)

    @jax.jit
    def solve(diag, upper, rhs):
        return btridiag_solve(btridiag_factor(diag, upper), rhs)

    x = solve(diag, upper, rhs)
    assert x.shape == (31, 3) and bool(jnp.all(jnp.isfinite(x)))
