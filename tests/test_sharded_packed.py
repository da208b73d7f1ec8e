"""Sharded packed Schur+PCG == single-device packed == flat (rel-error).

The BASELINE.json config-5 layout: slot grids sharded along their slot
axes over the 8-device virtual CPU mesh (conftest), state replicated,
reduced system completed by psum.
"""

import numpy as np
import pytest

import jax

from boslam.config import SolverConfig
from boslam.graph.build import build_graph
from boslam.graph.packed import pack_edges
from boslam.parallel.mesh import make_mesh
from boslam.parallel.sharded_packed import (
    make_sharded_packed_solve,
    pad_packed,
    shard_packed,
    sharded_packed_solve,
)
from boslam.solver.optimizer import solve, solve_packed
from boslam.synth import generate_sequence


CFG = SolverConfig(
    linear_solver="schur_cg",
    iters=10,
    cg_iters=100,
    cg_tol=1e-6,
    preconditioner="block_jacobi",
)


def _rel(a, b):
    return abs(a - b) / max(abs(b), 1e-12)


def test_pad_packed_noop_math(full_ig):
    g, _ = build_graph(full_ig, init="triangulate")
    pk, _ = pack_edges(g)
    pk8 = pad_packed(pk, 8)
    assert pk8.p_lm.shape[1] % 8 == 0 and pk8.l_pose.shape[1] % 8 == 0
    # padding slots all carry zero information
    assert int((np.asarray(pk8.p_omega) > 0).sum()) == g.n_bearing
    assert int((np.asarray(pk8.l_omega) > 0).sum()) == g.n_bearing


@pytest.mark.parametrize("n_devices", [2, 8])
@pytest.mark.slow
def test_sharded_packed_matches_single_device(full_ig, n_devices):
    g, _ = build_graph(full_ig, init="triangulate")
    g_1, s_1 = solve_packed(g, CFG)

    mesh = make_mesh(n_devices)
    g_n, s_n = sharded_packed_solve(g, CFG, mesh)

    c_1 = np.asarray(s_1["chi2_robust"], np.float64)
    c_n = np.asarray(s_n["chi2_robust"], np.float64)
    # chi2 BEFORE the first update is computed from identical states: tight.
    assert _rel(c_n[0], c_1[0]) < 1e-5
    # Whole trace parity in relative error (f32 psum ordering differs).
    np.testing.assert_allclose(c_n, c_1, rtol=2e-3)
    # Final states agree to f32-accumulation level, relative formulation.
    p_1, p_n = np.asarray(g_1.poses, np.float64), np.asarray(g_n.poses, np.float64)
    scale = max(1.0, float(np.abs(p_1).max()))
    assert np.max(np.abs(p_n - p_1)) / scale < 5e-4


@pytest.mark.slow
def test_sharded_packed_loop_closures():
    """General odometry (chain + loop closures) under sharding == flat."""
    ig, _ = generate_sequence(120, 60, seed=7, loop_closures=6)
    g, _ = build_graph(ig, init="triangulate")
    assert g.n_odometry > g.n_poses - 1  # loop closures present

    cfg = CFG.replace(iters=6)
    g_flat, s_flat = solve(g, cfg)
    g_1, s_1 = solve_packed(g, cfg)
    g_n, s_n = sharded_packed_solve(g, cfg, make_mesh(8))

    c_flat = np.asarray(s_flat["chi2_robust"], np.float64)
    c_1 = np.asarray(s_1["chi2_robust"], np.float64)
    c_n = np.asarray(s_n["chi2_robust"], np.float64)
    np.testing.assert_allclose(c_1, c_flat, rtol=2e-3)
    np.testing.assert_allclose(c_n, c_1, rtol=2e-3)


@pytest.mark.slow
def test_sharded_packed_uneven_padding():
    """K not divisible by the mesh size exercises the padded slots."""
    ig, _ = generate_sequence(90, 45, seed=3, obs_per_pose=5)
    g, _ = build_graph(ig, init="triangulate")
    pk, _ = pack_edges(g)
    assert pk.K % 8 != 0 or pk.K2 % 8 != 0  # padding actually happens

    cfg = CFG.replace(iters=5)
    _, s_1 = solve_packed(g, cfg)
    _, s_n = sharded_packed_solve(g, cfg, make_mesh(8))
    np.testing.assert_allclose(
        np.asarray(s_n["chi2_robust"], np.float64),
        np.asarray(s_1["chi2_robust"], np.float64),
        rtol=2e-3,
    )


@pytest.mark.slow
def test_sharded_packed_btridiag_warm():
    """The chain preconditioner + warm start also run under sharding."""
    ig, _ = generate_sequence(100, 50, seed=5)
    g, _ = build_graph(ig, init="triangulate")
    cfg = CFG.replace(iters=5, preconditioner="btridiag", cg_warm_start=True)
    _, s_1 = solve_packed(g, cfg)
    _, s_n = sharded_packed_solve(g, cfg, make_mesh(8))
    np.testing.assert_allclose(
        np.asarray(s_n["chi2_robust"], np.float64),
        np.asarray(s_1["chi2_robust"], np.float64),
        rtol=5e-3,
    )
    assert np.all(np.asarray(s_n["spd_ok"]))


@pytest.mark.slow
def test_sharded_packed_with_lm_split():
    """Hot-landmark splitting composes with the mesh layout: the [NLV, K2]
    grid shards along K2, the virt->landmark segment-sum runs per shard,
    and the psum completes it.  Parity vs single-device split solve."""
    ig, _ = generate_sequence(200, 90, seed=7, loop_closures=4)
    g, _ = build_graph(ig, init="triangulate")
    pk, meta = pack_edges(g, split_lm=4)  # force an aggressive split
    assert pk.l_virt is not None and meta.n_virt_rows > g.n_landmarks

    import functools
    import jax.numpy as jnp
    from boslam.solver.schur_packed import packed_gn_step

    gg, dp = g, jnp.zeros((g.n_poses, 3), g.poses.dtype)
    step = jax.jit(functools.partial(packed_gn_step, cfg=CFG))
    c_1 = []
    for _ in range(CFG.iters):
        gg, st, dp = step(gg, pk, dp_prev=dp)
        c_1.append(float(st["chi2_robust"]))
    c_1 = np.asarray(c_1, np.float64)

    mesh = make_mesh(8)
    gs, pks = shard_packed(g, pk, mesh)
    g_n, s_n = make_sharded_packed_solve(mesh, CFG, pks)(gs, pks)
    c_n = np.asarray(s_n["chi2_robust"], np.float64)
    assert _rel(c_n[0], c_1[0]) < 1e-5
    np.testing.assert_allclose(c_n, c_1, rtol=2e-3)
    np.testing.assert_allclose(
        np.asarray(g_n.poses), np.asarray(gg.poses), atol=2e-3
    )


@pytest.mark.slow
def test_sharded_packed_lm():
    """LM accept/reject on the sharded packed path == single-device packed
    LM (VERDICT r2 #1: config-3 semantics at config-5 scale).  The accept
    decision is taken from psum-completed costs, so every device agrees."""
    ig, _ = generate_sequence(120, 60, seed=9, loop_closures=4)
    g, _ = build_graph(ig, init="triangulate")
    cfg = CFG.replace(iters=8, optimizer="lm")
    _, s_1 = solve_packed(g, cfg)
    _, s_n = sharded_packed_solve(g, cfg, make_mesh(8))
    c_1 = np.asarray(s_1["chi2_robust"], np.float64)
    c_n = np.asarray(s_n["chi2_robust"], np.float64)
    np.testing.assert_allclose(c_n, c_1, rtol=2e-3)
    # identical accept/reject and lambda trajectories
    np.testing.assert_array_equal(
        np.asarray(s_n["accepted"]), np.asarray(s_1["accepted"])
    )
    np.testing.assert_allclose(
        np.asarray(s_n["damping"]), np.asarray(s_1["damping"]), rtol=1e-6
    )
    assert int(np.asarray(s_n["accepted"]).sum()) >= 5
