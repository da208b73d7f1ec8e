"""Fused Pallas Cholesky solve vs jax.scipy (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from boslam.ops import pallas_cholesky as pc


def _spd(n, rng, cond=1e4):
    A = rng.standard_normal((n, n)).astype(np.float32)
    Q, _ = np.linalg.qr(A)
    eigs = np.geomspace(1.0, cond, n).astype(np.float32)
    return (Q * eigs) @ Q.T


@pytest.mark.parametrize("n", [128, 256, 384])
def test_padded_sizes(n, rng):
    H = _spd(n, rng)
    b = rng.standard_normal(n).astype(np.float32)
    want = np.linalg.solve(H.astype(np.float64), b.astype(np.float64))
    got = np.asarray(
        pc.cholesky_solve_padded(jnp.asarray(H), jnp.asarray(b), interpret=True)
    )
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=5e-3 * scale)


def test_unpadded_with_identity_pad(rng):
    n = 200  # pads to 256
    H = _spd(n, rng)
    b = rng.standard_normal(n).astype(np.float32)
    want = np.linalg.solve(H.astype(np.float64), b.astype(np.float64))
    got = np.asarray(pc.cholesky_solve(jnp.asarray(H), jnp.asarray(b), interpret=True))
    assert got.shape == (n,)
    np.testing.assert_allclose(got, want, atol=5e-3 * np.abs(want).max())


def test_tri_inv():
    rng = np.random.default_rng(1)
    # well-conditioned triangular: random triangular matrices have
    # exponentially exploding inverses, so keep off-diagonals small
    L = np.tril(rng.standard_normal((128, 128)).astype(np.float32) * 0.05, -1)
    L[np.arange(128), np.arange(128)] = 1.0 + rng.uniform(0, 1, 128).astype(np.float32)
    got = np.asarray(pc._tri_inv(jnp.asarray(L)))
    np.testing.assert_allclose(
        got @ L, np.eye(128), atol=2e-4
    )
    # exactly lower triangular
    assert np.all(np.triu(got, 1) == 0)


def test_chol_tile():
    rng = np.random.default_rng(2)
    H = _spd(128, rng, cond=1e3)
    L = np.asarray(pc._chol_tile(jnp.asarray(H)))
    np.testing.assert_allclose(L @ L.T, H, atol=1e-2 * np.abs(H).max())
    assert np.all(np.triu(L, 1) == 0)


@pytest.mark.slow
def test_real_problem_system(full_ig):
    """The actual gauge-fixed damped H from the reference dataset."""
    from boslam.config import SolverConfig
    from boslam.graph.build import build_graph
    from boslam.solver.gauss_newton import gauge_mask
    from boslam.solver.normal_eq import assemble_dense

    g, _ = build_graph(full_ig, init="triangulate")
    cfg = SolverConfig()
    H, b, _ = assemble_dense(g, cfg)
    N = g.state_dim
    H = np.asarray(H) + cfg.damping * np.eye(N, dtype=np.float32)
    mask = np.asarray(gauge_mask(N, g.n_poses, g.fixed_pose_ix, jnp.float32))
    Hm = mask[:, None] * H * mask[None, :] + np.diag(1.0 - mask)
    bm = (mask * np.asarray(b)).astype(np.float32)

    want = np.linalg.solve(Hm.astype(np.float64), -bm.astype(np.float64))
    got = np.asarray(
        pc.cholesky_solve(jnp.asarray(Hm), jnp.asarray(-bm), interpret=True)
    )
    # ill-conditioned (~1e7): compare against the f32 jsl solution's own
    # error level rather than f64 truth
    import jax.scipy.linalg as jsl

    ref32 = np.asarray(
        jsl.cho_solve(jsl.cho_factor(jnp.asarray(Hm), lower=True), jnp.asarray(-bm))
    )
    err_ours = np.abs(got - want).max()
    err_jsl = np.abs(ref32 - want).max()
    assert err_ours < 10 * err_jsl + 1e-4, (err_ours, err_jsl)
