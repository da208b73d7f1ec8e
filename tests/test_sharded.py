"""Multi-device (8 virtual CPU devices) sharded solve == single-device solve.

This is the fake-backend mechanism the reference lacks (SURVEY §4
implication): xla_force_host_platform_device_count=8 set in conftest.
"""

import numpy as np
import jax
import pytest

from boslam.config import SolverConfig
from boslam.graph.build import build_graph
from boslam.parallel.mesh import make_mesh
from boslam.parallel.sharded import pad_edges, shard_graph, sharded_solve
from boslam.solver.optimizer import solve


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) == 8, "conftest must provide 8 cpu devices"
    return make_mesh(8)


@pytest.mark.slow
def test_pad_edges_noop_math(full_ig):
    """Zero-omega padding edges change no statistic."""
    g, _ = build_graph(full_ig, init="triangulate")
    gp = pad_edges(g, 8)
    assert gp.n_bearing % 8 == 0 and gp.n_odometry % 8 == 0
    g1, s1 = solve(g, SolverConfig(iters=5))
    g2, s2 = solve(gp, SolverConfig(iters=5))
    # padded dummies contribute exactly zero, but they change the matmul
    # reduction shapes -> f32 summation-order drift at the 1e-6 level
    np.testing.assert_allclose(
        np.asarray(s1["chi2_robust"]), np.asarray(s2["chi2_robust"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(g1.poses), np.asarray(g2.poses), atol=1e-4
    )


@pytest.mark.parametrize("linear_solver", ["dense", "schur", "schur_cg"])
@pytest.mark.slow
def test_sharded_matches_single_device(full_ig, mesh8, linear_solver):
    """8-way edge-sharded GN == single-device GN (same psum-completed H)."""
    g, _ = build_graph(full_ig, init="triangulate")
    cfg = SolverConfig(iters=10, linear_solver=linear_solver, cg_iters=100)
    g1, s1 = solve(pad_edges(g, 8), cfg)
    g2, s2 = sharded_solve(g, cfg, mesh8)

    np.testing.assert_allclose(
        np.asarray(s1["chi2_robust"]),
        np.asarray(s2["chi2_robust"]),
        rtol=2e-4,
    )
    # relative-error formulation (VERDICT r1): scale-invariant, so a real
    # drift at larger coordinates cannot hide inside an absolute tolerance
    p1, p2 = np.asarray(g1.poses, np.float64), np.asarray(g2.poses, np.float64)
    l1, l2 = np.asarray(g1.landmarks, np.float64), np.asarray(g2.landmarks, np.float64)
    p_scale = max(1.0, float(np.abs(p1).max()))
    l_scale = max(1.0, float(np.abs(l1).max()))
    assert np.max(np.abs(p2 - p1)) / p_scale < 2e-4, np.max(np.abs(p2 - p1))
    assert np.max(np.abs(l2 - l1)) / l_scale < 5e-4, np.max(np.abs(l2 - l1))


@pytest.mark.slow
def test_sharded_lm(full_ig, mesh8):
    """LM accept/reject logic is consistent across shards (psum-ed costs)."""
    g, _ = build_graph(full_ig, init="triangulate")
    cfg = SolverConfig(iters=10, optimizer="lm", robust="huber")
    g1, s1 = solve(pad_edges(g, 8), cfg)
    g2, s2 = sharded_solve(g, cfg, mesh8)
    # near the plateau the accept decision sits within f32 rounding of the
    # psum order, so only the descent-phase decisions must agree exactly
    np.testing.assert_array_equal(
        np.asarray(s1["accepted"])[:6], np.asarray(s2["accepted"])[:6]
    )
    np.testing.assert_allclose(
        np.asarray(s1["chi2_robust"]), np.asarray(s2["chi2_robust"]), rtol=2e-4
    )


def test_sharded_layout(full_ig, mesh8):
    """Edge arrays land sharded; state lands replicated."""
    g, _ = build_graph(full_ig, init="triangulate")
    gs = shard_graph(g, mesh8)
    assert gs.b_meas.sharding.spec == jax.sharding.PartitionSpec("edge")
    assert gs.poses.sharding.spec in (
        jax.sharding.PartitionSpec(),
        jax.sharding.PartitionSpec(None),
    )
    assert gs.b_meas.shape[0] % 8 == 0
