"""Block-banded preconditioner (solver/bband.py): exactness + integration."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from boslam.config import SolverConfig
from boslam.graph.build import build_graph
from boslam.graph.packed import pack_edges
from boslam.solver import schur, schur_packed
from boslam.solver.bband import (
    assemble_sband,
    bband_dense,
    bband_factor,
    bband_solve,
)
from boslam.solver.schur import _pose_mask
from boslam.synth import generate_sequence


def _random_banded(N, w, rng, stiff=1.0):
    """Random SPD block-banded (diag [N,3,3], band [w,N,3,3])."""
    diag = jnp.asarray(
        np.einsum("nij,nkj->nik", *(2 * [rng.standard_normal((N, 3, 3))]))
        + 6.0 * (1 + stiff) * np.eye(3)
    ).astype(jnp.float32)
    band = np.zeros((w, N, 3, 3), np.float32)
    for d in range(1, w + 1):
        band[d - 1, : N - d] = stiff * rng.standard_normal((N - d, 3, 3))
    return diag, jnp.asarray(band)


@pytest.mark.parametrize("N,w,q", [(13, 2, 4), (32, 3, 3), (7, 1, 8), (3, 2, 2)])
def test_factor_solve_exact(N, w, q):
    """Unclamped factor/solve == dense solve of the same banded matrix."""
    rng = np.random.default_rng(0)
    diag, band = _random_banded(N, w, rng)
    T = np.asarray(bband_dense(diag, band), np.float64)
    rhs = rng.standard_normal((N, 3)).astype(np.float32)
    # clamp off: exact factorization of T
    f = bband_factor(diag, band, q, clamp_band=None)
    x = np.asarray(bband_solve(f, jnp.asarray(rhs)))
    x_ref = np.linalg.solve(T, rhs.reshape(-1)).reshape(N, 3)
    assert np.allclose(x, x_ref, rtol=2e-4, atol=2e-5)


def test_factor_solve_clamped_is_spd_apply():
    """With the PD clamp the apply is still a symmetric positive map."""
    rng = np.random.default_rng(1)
    diag, band = _random_banded(40, 2, rng, stiff=20.0)
    f = bband_factor(diag, band, 4)
    rs = [rng.standard_normal((40, 3)).astype(np.float32) for _ in range(2)]
    x0 = np.asarray(bband_solve(f, jnp.asarray(rs[0])))
    x1 = np.asarray(bband_solve(f, jnp.asarray(rs[1])))
    # symmetry: <r1, T^-1 r0> == <r0, T^-1 r1>
    assert np.isclose(
        float((rs[1] * x0).sum()), float((rs[0] * x1).sum()), rtol=1e-3
    )
    # positivity
    assert float((rs[0] * x0).sum()) > 0


def test_assemble_band_matches_dense_s(full_ig):
    """Band blocks == the corresponding entries of the materialized S."""
    g, _ = build_graph(full_ig, init="triangulate")
    cfg = SolverConfig()
    pk, _ = pack_edges(g, split_lm=0)
    blocks, _ = schur_packed.build_packed_blocks(g, pk, cfg, cfg.damping)
    mask = _pose_mask(g.n_poses, g.fixed_pose_ix, jnp.float32)
    w = 3
    diag, band = assemble_sband(blocks, pk, w, mask, compensate=False)

    fblocks, _ = schur.build_blocks(g, cfg, cfg.damping)
    S, _rhs = schur.dense_reduced_system(fblocks, g)
    S = np.asarray(S)
    NP_ = g.n_poses
    fixed = int(g.fixed_pose_ix)
    m = np.ones(NP_)
    m[fixed] = 0.0
    for d in range(0, w + 1):
        for i in [0, 1, 5, NP_ - d - 1, fixed - d, fixed]:
            if not (0 <= i < NP_ - d):
                continue
            Sblk = S[3 * i : 3 * i + 3, 3 * (i + d) : 3 * (i + d) + 3]
            Sblk = Sblk * (m[i] * m[i + d])
            if d == 0:
                got = np.asarray(diag[i])
                if i == fixed:
                    Sblk = np.eye(3)
            else:
                got = np.asarray(band[d - 1, i])
            assert np.allclose(got, Sblk, rtol=2e-4, atol=5e-5), (d, i)


def test_bband_preconditioner_converges_reference(full_ig):
    """packed solve with bband reaches the same optimum, fewer CG iters."""
    g, _ = build_graph(full_ig, init="triangulate")
    base = SolverConfig(
        linear_solver="schur_cg", cg_iters=50, cg_tol=1e-4, iters=15
    )
    from boslam.solver.optimizer import solve_packed

    out_bb, st_bb = solve_packed(
        g, base.replace(preconditioner="bband", band_width=4)
    )
    out_bj, st_bj = solve_packed(g, base.replace(preconditioner="block_jacobi"))
    chi_bb = float(np.asarray(st_bb["chi2_robust"])[-1])
    chi_bj = float(np.asarray(st_bj["chi2_robust"])[-1])
    assert chi_bb <= chi_bj * 1.05
    assert int(np.asarray(st_bb["cg_iters"]).sum()) <= int(
        np.asarray(st_bj["cg_iters"]).sum()
    )


def test_bband_with_lm_split_and_loop_closures():
    """Assembly is split/loop-closure-safe (p_lm grid is split-agnostic)."""
    ig, _ = generate_sequence(220, 60, seed=3, loop_closures=5)
    g, _ = build_graph(ig, init="triangulate")
    cfg = SolverConfig(
        linear_solver="schur_cg",
        cg_iters=40,
        cg_tol=1e-5,
        preconditioner="bband",
        band_width=4,
        lm_split=4,
        iters=10,
    )
    from boslam.solver.optimizer import solve_packed

    out, st = solve_packed(g, cfg)
    ref, st_ref = solve_packed(g, cfg.replace(preconditioner="block_jacobi"))
    chi = float(np.asarray(st["chi2_robust"])[-1])
    chi_ref = float(np.asarray(st_ref["chi2_robust"])[-1])
    assert np.isfinite(chi)
    assert chi <= chi_ref * 1.05


@pytest.mark.slow
def test_bband_sharded_parity(full_ig):
    """Sharded bband (all-gathered slot grids) == single-device bband."""
    from boslam.parallel.sharded_packed import sharded_packed_solve
    from boslam.parallel.mesh import make_mesh
    from boslam.solver.optimizer import solve_packed

    g, _ = build_graph(full_ig, init="triangulate")
    cfg = SolverConfig(
        linear_solver="schur_cg",
        cg_iters=30,
        cg_tol=1e-5,
        preconditioner="bband",
        band_width=3,
        iters=8,
    )
    single, st1 = solve_packed(g, cfg)
    mesh = make_mesh()
    multi, st8 = sharded_packed_solve(g, cfg, mesh=mesh)
    c1 = np.asarray(st1["chi2_robust"])
    c8 = np.asarray(st8["chi2_robust"])
    np.testing.assert_allclose(c8, c1, rtol=2e-3)
