"""Whole-GN-step mega-kernel parity (boslam/ops/pallas_gn_step.py).

Interpret mode on CPU vs the unfused optimizer.gn_step path; compiled
parity on real TPU is pinned by bench.py's converged-chi2 assert against
the C++ optimum (slam/solver.cpp:27-97).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from boslam.config import SolverConfig
from boslam.graph.build import build_graph
from boslam.io.g2o import parse_g2o
from boslam.ops.pallas_gn_step import _atan2, fused_gn_fits, fused_gn_step
from boslam.solver.optimizer import gn_step, solve


def test_atan2_polynomial_accuracy():
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.normal(size=100000).astype(np.float32) * 5)
    x = jnp.asarray(rng.normal(size=100000).astype(np.float32) * 5)
    a = np.asarray(jax.jit(_atan2)(y, x))
    err = np.abs(a - np.arctan2(np.asarray(y), np.asarray(x)))
    assert err.max() < 5e-7
    # axes and the origin
    for yy, xx in [(0.0, 1.0), (0.0, -1.0), (1.0, 0.0), (-1.0, 0.0), (0.0, 0.0)]:
        got = float(_atan2(jnp.float32(yy), jnp.float32(xx)))
        assert abs(got - np.arctan2(yy, xx)) < 1e-6


@pytest.fixture(scope="module")
def mini_graph(mini_ig):
    return build_graph(mini_ig, init="triangulate")[0]


@pytest.fixture(scope="module")
def full_graph(full_ig):
    return build_graph(full_ig, init="triangulate")[0]


def test_fits_gate(full_graph):
    g = full_graph
    assert fused_gn_fits(g.n_poses, g.n_landmarks, g.n_bearing, g.n_odometry)
    assert not fused_gn_fits(100_000, 40_000, 700_000, 100_000)


def test_single_step_parity_mini(mini_graph):
    cfg = SolverConfig(linear_solver="schur", fused_step="off")
    g1, s1 = jax.jit(lambda g: gn_step(g, cfg))(mini_graph)
    g2, s2 = fused_gn_step(mini_graph, cfg, interpret=True)
    np.testing.assert_allclose(
        float(s1["chi2_robust"]), float(s2["chi2_robust"]), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(g1.poses), np.asarray(g2.poses), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(g1.landmarks), np.asarray(g2.landmarks), atol=1e-4
    )


def test_single_step_stats_parity_full(full_graph):
    """chi2 stats (computed pre-update) must match the unfused path
    essentially exactly; the solve itself may differ at the f32-
    conditioning level (landmark 69 is single-observation)."""
    cfg = SolverConfig(linear_solver="schur", fused_step="off")
    g1, s1 = jax.jit(lambda g: gn_step(g, cfg))(full_graph)
    g2, s2 = fused_gn_step(full_graph, cfg, interpret=True)
    # atol floor: the initial odometry chi2 is ~1e-4 (the ig poses ARE
    # odometry-integrated), where the in-kernel atan2 polynomial's 1e-7
    # residual error is visible in relative terms
    for k in ("chi2_bearing", "chi2_odometry", "chi2_robust"):
        np.testing.assert_allclose(
            float(s1[k]), float(s2[k]), rtol=1e-5, atol=1e-6
        )
    assert int(s1["n_bearing_clamped"]) == int(s2["n_bearing_clamped"])
    assert int(s1["n_odometry_clamped"]) == int(s2["n_odometry_clamped"])


@pytest.mark.slow
def test_converged_optimum_parity_full(full_graph):
    """20 fused iterations land on the same optimum as the unfused path
    (rel < 1e-5) — the criterion VERDICT r4 #3 sets for the headline."""
    cfgA = SolverConfig(linear_solver="schur", fused_step="off", iters=20)
    cfgB = SolverConfig(linear_solver="schur", fused_step="force", iters=20)
    _, sA = solve(full_graph, cfgA)
    _, sB = solve(full_graph, cfgB)
    cA = float(np.asarray(sA["chi2_robust"])[-1])
    cB = float(np.asarray(sB["chi2_robust"])[-1])
    assert abs(cA - cB) / cA < 1e-5
    # and both at the C++ optimum's level (tools/refbench/baseline.json)
    assert abs(cA - 5.882782) / 5.882782 < 1e-3


@pytest.mark.slow
@pytest.mark.parametrize("robust", ["none", "huber"])
def test_robust_variants_parity(full_graph, robust):
    cfgA = SolverConfig(
        linear_solver="schur", fused_step="off", iters=5, robust=robust
    )
    cfgB = cfgA.replace(fused_step="force")
    _, sA = solve(full_graph, cfgA)
    _, sB = solve(full_graph, cfgB)
    cA = np.asarray(sA["chi2_robust"])
    cB = np.asarray(sB["chi2_robust"])
    # iteration 0 is computed on the identical state -> tight; later
    # iterations amplify f32 ordering differences through the ill-
    # conditioned single-observation landmarks -> few-percent envelope
    np.testing.assert_allclose(cA[0], cB[0], rtol=1e-5)
    np.testing.assert_allclose(cA[-1], cB[-1], rtol=2e-2)


def test_gauge_pose_fixed(mini_graph):
    cfg = SolverConfig(linear_solver="schur")
    g2, _ = fused_gn_step(mini_graph, cfg, interpret=True)
    fix = int(mini_graph.fixed_pose_ix)
    np.testing.assert_allclose(
        np.asarray(g2.poses)[fix], np.asarray(mini_graph.poses)[fix],
        atol=1e-7,
    )
