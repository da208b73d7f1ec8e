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


@pytest.mark.slow
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


@pytest.mark.slow
def test_long_chain_f32_indefinite_and_block_cut_fix():
    """f32 cyclic reduction of a LONG strongly-coupled chain loses positive
    definiteness (measured on 10k-pose SLAM graphs: the preconditioner
    apply returned z with r.z < 0, silently breaking PCG).  Cutting the
    band every `block` rows bounds each sub-chain's condition and keeps
    the apply SPD.  This test reproduces the pathology directly on a
    SLAM-conditioned chain and checks the cut restores r.z > 0."""
    n = 20000
    c = 2500.0  # strong odometry-like coupling
    eye = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (n, 3, 3))
    # diag = sum of adjacent couplings + weak bearing/damping contribution
    diag = 2.0 * c * eye + 0.5 * eye
    upper = -c * jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (n - 1, 3, 3))

    rng = np.random.default_rng(0)
    r = jnp.asarray(rng.standard_normal((n, 3)), jnp.float32)

    block = 2048
    i = np.arange(n - 1)
    keep = jnp.asarray(((i + 1) % block) != 0, jnp.float32)
    z_cut = btridiag_solve(
        btridiag_factor(diag, upper * keep[:, None, None]), r
    )
    rz_cut = float(jnp.sum(r * z_cut))
    assert np.isfinite(rz_cut) and rz_cut > 0, rz_cut
    # and the cut factorization still solves ITS OWN (block-limited) T:
    # residual check per block is implied by the global dense check being
    # too big here; instead verify the apply is symmetric-ish via a
    # second vector (SPD operators: u.M(v) == v.M(u))
    u = jnp.asarray(rng.standard_normal((n, 3)), jnp.float32)
    z_u = btridiag_solve(
        btridiag_factor(diag, upper * keep[:, None, None]), u
    )
    a = float(jnp.sum(u * z_cut))
    b = float(jnp.sum(r * z_u))
    assert abs(a - b) / max(abs(a), abs(b)) < 1e-3, (a, b)
