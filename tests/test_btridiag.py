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


def test_prescaled_factor_exactness(rng):
    """Prescaling is a pure reparametrization: solve stays exact."""
    import jax.numpy as jnp

    from boslam.solver.btridiag import (
        btridiag_dense,
        btridiag_factor,
        btridiag_solve,
    )

    N = 257
    d = rng.standard_normal((N, 3, 3)).astype(np.float32)
    d = d @ np.swapaxes(d, 1, 2) + 5 * np.eye(3, dtype=np.float32)
    u = 0.5 * rng.standard_normal((N - 1, 3, 3)).astype(np.float32)
    T = np.asarray(btridiag_dense(jnp.asarray(d), jnp.asarray(u)), np.float64)
    r = rng.standard_normal((N, 3)).astype(np.float32)
    want = np.linalg.solve(T, r.ravel()).reshape(N, 3)
    for pre in (False, True):
        f = btridiag_factor(jnp.asarray(d), jnp.asarray(u), prescale=pre)
        x = np.asarray(btridiag_solve(f, jnp.asarray(r)))
        err = np.abs(x - want).max() / max(1.0, np.abs(want).max())
        assert err < 2e-4, (pre, err)


def test_specnorm3x3(rng):
    from boslam.solver.btridiag import _specnorm3x3
    import jax.numpy as jnp

    B = rng.standard_normal((50, 3, 3)).astype(np.float32)
    want = np.linalg.svd(B, compute_uv=False)[:, 0]
    got = np.asarray(_specnorm3x3(jnp.asarray(B)))
    # 8 power iterations: a few % low on near-degenerate top pairs is
    # fine for a clamp threshold (and an UNDER-estimate only loosens it)
    np.testing.assert_allclose(got, want, rtol=5e-2)
    assert np.all(got <= want * (1 + 1e-4))


def test_clamped_factor_pd_with_indefinite_diag(rng):
    """clamp_band < 1/2 keeps the preconditioner PD/finite even when some
    diagonal blocks are (f32-cancellation-style) indefinite — the 100k-pose
    failure mode: unclamped prescaled reduction NaN'd or went indefinite."""
    import jax.numpy as jnp

    from boslam.solver.btridiag import btridiag_factor, btridiag_solve

    N = 4096
    d = np.tile(np.diag([500.0, 500.0, 5000.0]).astype(np.float32), (N, 1, 1))
    # strong chain coupling just below the diagonal
    u = -0.499 * d[:-1]
    # poison a few diagonal blocks (indefinite, like measured diag(S))
    for i in (17, 1000, 3000):
        d[i] = np.diag([-0.23, 0.01, 0.01]).astype(np.float32)
    f = btridiag_factor(
        jnp.asarray(d), jnp.asarray(u), clamp_band=0.4999
    )
    r = rng.standard_normal((N, 3)).astype(np.float32)
    z = np.asarray(btridiag_solve(f, jnp.asarray(r)))
    assert np.all(np.isfinite(z))
    # PD surrogate: the quadratic form r^T M^-1 r must be positive
    assert float((r.ravel() * z.ravel()).sum()) > 0
