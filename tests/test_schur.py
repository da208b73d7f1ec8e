"""Schur + PCG path vs the dense-Cholesky path: same linear system, same
solution, same converged optimum."""

import pytest
import numpy as np
import jax.numpy as jnp

from boslam.config import SolverConfig
from boslam.graph.build import build_graph
from boslam.solver import schur
from boslam.solver.gauss_newton import gn_build_and_solve
from boslam.solver.normal_eq import assemble_dense, edge_terms
from boslam.solver.optimizer import solve


def test_blocks_match_dense_assembly(full_ig):
    """Block-sparse H equals the dense H on every structural block."""
    g, _ = build_graph(full_ig, init="triangulate")
    cfg = SolverConfig()
    damping = 0.0
    H, b, _ = assemble_dense(g, cfg)
    blocks, _ = schur.build_blocks(g, cfg, damping)
    NP_, NL = g.n_poses, g.n_landmarks

    Hn = np.asarray(H)
    bn = np.asarray(b)
    # pose diagonal blocks (minus damping which is 0 here)
    for i in [0, 5, NP_ - 1]:
        np.testing.assert_allclose(
            np.asarray(blocks.Hpp_diag)[i],
            Hn[3 * i : 3 * i + 3, 3 * i : 3 * i + 3],
            atol=1e-3,
        )
    # odometry coupling blocks
    src = np.asarray(g.o_src)
    dst = np.asarray(g.o_dst)
    for e in [0, 100, 299]:
        i, j = src[e], dst[e]
        np.testing.assert_allclose(
            np.asarray(blocks.Ho_sd)[e],
            Hn[3 * i : 3 * i + 3, 3 * j : 3 * j + 3],
            atol=1e-3,
        )
    # b vector
    np.testing.assert_allclose(
        np.asarray(blocks.bp).ravel(), bn[: 3 * NP_], atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(blocks.bl).ravel(), bn[3 * NP_ :], atol=1e-3
    )


@pytest.mark.slow
def test_schur_direct_delta_matches_dense(full_ig):
    """One linear solve: exact Schur (dense reduced Cholesky) delta equals
    the full dense Cholesky delta — algebraic identity, f32 tolerance."""
    g, _ = build_graph(full_ig, init="triangulate")
    cfg = SolverConfig()
    dp_d, dl_d, _, ok_d, _ = gn_build_and_solve(g, cfg, cfg.damping)
    dp_s, dl_s, _, ok_s, _ = schur.schur_build_and_solve(
        g, cfg, cfg.damping, use_cg=False
    )
    assert bool(ok_d) and bool(ok_s)
    scale = np.abs(np.asarray(dp_d)).max()
    np.testing.assert_allclose(
        np.asarray(dp_s), np.asarray(dp_d), atol=3e-3 * scale
    )
    np.testing.assert_allclose(
        np.asarray(dl_s), np.asarray(dl_d), atol=6e-3 * scale
    )
    # gauge pose pinned to exactly zero in both
    fixed = int(g.fixed_pose_ix)
    assert np.all(np.asarray(dp_s)[fixed] == 0.0)


def test_schur_cg_delta_approximates_dense(full_ig):
    """PCG inner solve: truncated (S condition ~1e7 in f32) but must agree
    in direction and magnitude — the inexact-Newton contract."""
    g, _ = build_graph(full_ig, init="triangulate")
    cfg = SolverConfig(cg_iters=300, cg_tol=1e-6)
    dp_d, dl_d, _, _, _ = gn_build_and_solve(g, cfg, cfg.damping)
    dp_s, dl_s, _, ok_s, _ = schur.schur_build_and_solve(
        g, cfg, cfg.damping, use_cg=True
    )
    assert bool(ok_s)
    a = np.asarray(dp_s).ravel()
    b = np.asarray(dp_d).ravel()
    cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cos > 0.97, cos  # measured 0.984 at the f32 truncation floor
    # measured ratio 1.25 on the steep first linearization — truncated CG
    # overshoots the weakly-determined directions; outer-loop convergence
    # (test_schur_cg_full_convergence) is the binding contract.
    assert 0.6 < np.linalg.norm(a) / np.linalg.norm(b) < 1.6


@pytest.mark.slow
def test_schur_direct_full_convergence(full_ig):
    """Full pipeline with linear_solver="schur" reaches the same chi2
    plateau as the dense path."""
    g, meta = build_graph(full_ig, init="triangulate")
    g_d, stats_d = solve(g, SolverConfig(iters=20))
    g_s, stats_s = solve(g, SolverConfig(iters=20, linear_solver="schur"))
    c_d = float(np.asarray(stats_d["chi2_robust"])[-1])
    c_s = float(np.asarray(stats_s["chi2_robust"])[-1])
    assert abs(c_s - c_d) / c_d < 0.02, (c_s, c_d)
    d = np.sqrt(((np.asarray(g_s.poses)[:, :2] - np.asarray(g_d.poses)[:, :2]) ** 2).sum(1))
    assert np.median(d) < 0.05


@pytest.mark.slow
def test_schur_cg_full_convergence(full_ig):
    """Inexact-Newton outer loop with truncated PCG still converges to
    (nearly) the same plateau, a few percent above at worst."""
    g, meta = build_graph(full_ig, init="triangulate")
    g_d, stats_d = solve(g, SolverConfig(iters=25))
    g_s, stats_s = solve(
        g, SolverConfig(iters=25, linear_solver="schur_cg", cg_iters=150)
    )
    c_d = float(np.asarray(stats_d["chi2_robust"])[-1])
    c_s = float(np.asarray(stats_s["chi2_robust"])[-1])
    assert c_s < c_d * 1.05, (c_s, c_d)


def test_pcg_solves_spd_system(rng):
    """PCG on a random block-SPD system vs numpy direct solve."""
    NP_ = 16
    A = rng.standard_normal((3 * NP_, 3 * NP_)).astype(np.float32)
    S = A @ A.T + 10.0 * np.eye(3 * NP_, dtype=np.float32)
    rhs = rng.standard_normal(3 * NP_).astype(np.float32)
    want = np.linalg.solve(S.astype(np.float64), rhs.astype(np.float64))

    Sj = jnp.asarray(S)
    matvec = lambda x: (Sj @ x.reshape(-1)).reshape(NP_, 3)
    diag = np.stack([S[3 * i : 3 * i + 3, 3 * i : 3 * i + 3] for i in range(NP_)])
    pre = schur._inv3x3(jnp.asarray(diag))
    x, k, res, brk = schur.pcg(matvec, jnp.asarray(rhs.reshape(NP_, 3)), pre, 500, 1e-7)
    assert not bool(brk)
    np.testing.assert_allclose(np.asarray(x).ravel(), want, atol=5e-3)


def test_inv_helpers(rng):
    A2 = rng.standard_normal((10, 2, 2)).astype(np.float32)
    A2 = A2 @ np.swapaxes(A2, 1, 2) + 0.5 * np.eye(2, dtype=np.float32)
    np.testing.assert_allclose(
        np.asarray(schur._inv2x2(jnp.asarray(A2))),
        np.linalg.inv(A2),
        rtol=1e-3, atol=1e-4,
    )
    A3 = rng.standard_normal((10, 3, 3)).astype(np.float32)
    A3 = A3 @ np.swapaxes(A3, 1, 2) + 0.5 * np.eye(3, dtype=np.float32)
    np.testing.assert_allclose(
        np.asarray(schur._inv3x3(jnp.asarray(A3))),
        np.linalg.inv(A3),
        rtol=1e-2, atol=1e-3,
    )


def test_pcg_breakdown_safe_indefinite_preconditioner(rng):
    """An indefinite preconditioner must stop PCG early with a finite
    iterate, never the max(pAp, tiny) -> inf -> NaN cascade (the failure
    mode that silently no-opped the 10k+ scale solves; PERF.md)."""
    n = 64
    a = jnp.asarray(rng.standard_normal((3 * n, 3 * n)), jnp.float32)
    A = a @ a.T + 3.0 * jnp.eye(3 * n, dtype=jnp.float32)
    rhs = jnp.asarray(rng.standard_normal((n, 3)), jnp.float32)
    matvec = lambda x: (A @ x.reshape(-1)).reshape(n, 3)
    # preconditioner with a negative eigenvalue
    bad = lambda r: r.at[0, 0].set(-5.0 * r[0, 0])
    x, k, rel, brk = schur.pcg(matvec, rhs, bad, 50, 1e-6)
    assert bool(brk)  # breakdown is surfaced, not silent (ADVICE r2)
    assert bool(jnp.all(jnp.isfinite(x)))
    assert int(k) < 50  # stopped early, not burned to the cap on NaNs

    # sanity: a good preconditioner still converges to the solution
    good = lambda r: r / jnp.diag(A).reshape(n, 3)
    x2, k2, rel2, brk2 = schur.pcg(matvec, rhs, good, 500, 1e-6)
    assert not bool(brk2)
    ref = jnp.linalg.solve(A, rhs.reshape(-1)).reshape(n, 3)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(ref), atol=1e-3)
