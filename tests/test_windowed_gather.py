"""Windowed one-hot gather kernel == plain gather (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from boslam.config import SolverConfig
from boslam.graph.build import build_graph
from boslam.graph.packed import pack_edges
from boslam.graph.reorder import reorder_landmarks_by_pose
from boslam.ops.windowed_gather import plan_windows, windowed_take
from boslam.solver.optimizer import solve, solve_packed


def _banded_indices(rng, R, K, M, band):
    """Index grid whose row tiles span narrow windows (the post-reorder
    structure of the slot grids)."""
    centers = np.linspace(0, M - 1, R)
    idx = (centers[:, None] + rng.integers(-band, band + 1, (R, K))).clip(0, M - 1)
    return idx.astype(np.int32)


@pytest.mark.parametrize("R,K,M,C", [(300, 8, 500, 2), (123, 5, 200, 3), (2000, 16, 1500, 4)])
def test_windowed_take_matches_gather(rng, R, K, M, C):
    idx = _banded_indices(rng, R, K, M, band=20)
    valid = rng.random((R, K)) > 0.3
    values = jnp.asarray(rng.normal(size=(M, C)).astype(np.float32))

    plan = plan_windows(idx, valid, M)
    assert plan is not None
    out = np.asarray(windowed_take(values, jnp.asarray(idx), plan, interpret=True))
    ref = np.asarray(values)[idx]
    # in-window slots match the gather exactly (one-hot matmul of 0/1 rows)
    np.testing.assert_array_equal(out, ref)


def test_windowed_take_out_of_window_is_zero(rng):
    M, R, K = 300, 100, 4
    idx = _banded_indices(rng, R, K, M, band=10)
    valid = np.ones((R, K), bool)
    valid[5, 2] = False
    plan = plan_windows(idx, valid, M)
    assert plan is not None
    # poison the invalid slot with an index far outside its tile's window
    idx2 = idx.copy()
    idx2[5, 2] = M - 1 if idx[:64].max() < M - 1 - plan.window else 0
    values = jnp.asarray(rng.normal(size=(M, 2)).astype(np.float32))
    out = np.asarray(windowed_take(values, jnp.asarray(idx2), plan, interpret=True))
    if abs(int(idx2[5, 2]) - int(plan.starts[0])) >= plan.window:
        np.testing.assert_array_equal(out[5, 2], np.zeros(2, np.float32))


def test_plan_refuses_scattered_indices(rng):
    """Random (non-local) indices must yield no plan — fallback to gather."""
    idx = rng.integers(0, 100_000, (512, 8)).astype(np.int32)
    assert plan_windows(idx, np.ones_like(idx, bool), 100_000) is None


def test_reorder_makes_windows_narrow(full_ig):
    g, _ = build_graph(full_ig, init="triangulate")
    g2, perm, inv = reorder_landmarks_by_pose(g)
    # landmark set is preserved, just relabeled
    np.testing.assert_allclose(
        np.sort(np.asarray(g2.landmarks), axis=0),
        np.sort(np.asarray(g.landmarks), axis=0),
    )
    pk, meta = pack_edges(g2, windows=True)
    assert meta.windowed, "reference dataset should plan windows on both grids"
    # unmapping restores the original order
    np.testing.assert_array_equal(
        np.asarray(g2.landmarks)[inv], np.asarray(g.landmarks)
    )


@pytest.mark.slow
def test_solve_packed_windowed_matches_take(full_ig):
    g, _ = build_graph(full_ig, init="triangulate")
    cfg = SolverConfig(
        linear_solver="schur_cg", iters=8, cg_iters=100, cg_tol=1e-6,
        preconditioner="block_jacobi",
    )
    _, s_t = solve_packed(g, cfg.replace(gather="take"))
    _, s_w = solve_packed(g, cfg.replace(gather="windowed"))
    np.testing.assert_allclose(
        np.asarray(s_w["chi2_robust"], np.float64),
        np.asarray(s_t["chi2_robust"], np.float64),
        rtol=2e-3,
    )


@pytest.mark.slow
def test_solve_packed_windowed_loop_closures():
    """Windowed path on a general graph (loop closures widen some windows)."""
    from boslam.synth import generate_sequence

    ig, _ = generate_sequence(200, 90, seed=13, loop_closures=6)
    g, _ = build_graph(ig, init="triangulate")
    cfg = SolverConfig(
        linear_solver="schur_cg", iters=5, cg_iters=80, cg_tol=1e-6,
        preconditioner="block_jacobi",
    )
    _, s_f = solve(g, cfg)
    _, s_w = solve_packed(g, cfg.replace(gather="windowed"))
    np.testing.assert_allclose(
        np.asarray(s_w["chi2_robust"], np.float64),
        np.asarray(s_f["chi2_robust"], np.float64),
        rtol=2e-3,
    )
