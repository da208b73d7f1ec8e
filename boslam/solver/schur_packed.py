"""Schur + PCG on the dual-packed layout — the scale-regime solver.

Same math as boslam/solver/schur.py (and therefore slam/solver.cpp
semantics, robust quirk included), but every vertex-keyed reduction is a
dense masked axis-sum over the packed slot dimension and the only indexed
ops are two row-gathers per CG matvec (see boslam/graph/packed.py).  For
pure-chain odometry the pose-pose couplings are shifts (jnp.pad slices) —
zero indexed rows.

Verified equivalent to the flat schur path in tests/test_schur_packed.py.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from boslam.config import SolverConfig
from boslam.graph.data import FactorGraph
from boslam.graph.packed import PackedEdges
from boslam.solver import residuals as R
from boslam.solver.robust import robust_cost, robust_weights
from boslam.solver.schur import _inv2x2, _inv3x3, _pose_mask, pcg


class PackedBlocks(NamedTuple):
    Hpp_diag: jnp.ndarray  # [NP, 3, 3]
    Hll_inv: jnp.ndarray  # [NL, 2, 2]
    Bp: jnp.ndarray  # [NP, K, 3, 2] pose-packed coupling blocks (weighted)
    Bl: jnp.ndarray  # [NL, K2, 3, 2] landmark-packed coupling blocks
    bp: jnp.ndarray  # [NP, 3]
    bl: jnp.ndarray  # [NL, 2]
    Ho_sd: jnp.ndarray  # [NO, 3, 3] odometry couplings (chain: NO = NP-1)


def _bearing_slot_terms(p_slot, l_slot, meas, omega, cfg):
    """Residual/Jacobian/weights for a [*, K] slot grid.

    ``p_slot`` f32[*, K, 3] poses per slot, ``l_slot`` f32[*, K, 2]
    landmarks per slot.  Padding slots (omega == 0) contribute zero.
    """
    err = R.bearing_error_from(p_slot, l_slot, meas)
    jp, jl = R.bearing_jacobians_from(p_slot, l_slot)
    chi2 = omega * err * err
    wH, wb = robust_weights(chi2, cfg)
    womega_H = omega * wH
    Hpp = womega_H[..., None, None] * jp[..., :, None] * jp[..., None, :]
    Hll = womega_H[..., None, None] * jl[..., :, None] * jl[..., None, :]
    B = womega_H[..., None, None] * jp[..., :, None] * jl[..., None, :]
    coef = (omega * wb * err)[..., None]
    return err, chi2, Hpp, Hll, B, coef * jp, coef * jl


def build_packed_blocks(
    g: FactorGraph, pk: PackedEdges, cfg: SolverConfig, damping
) -> tuple[PackedBlocks, dict]:
    NP_, NL = g.n_poses, g.n_landmarks
    dtype = g.poses.dtype
    damping = jnp.asarray(damping, dtype)

    # ---- pose-packed pass: pose broadcast, landmarks gathered ----
    p_slot = jnp.broadcast_to(g.poses[:, None, :], (NP_, pk.K, 3))
    l_slot = g.landmarks[pk.p_lm]  # gather (NP*K rows)
    (be_p, bchi2_p, Hpp_b, _Hll_p, Bp, bp_b, _bl_p) = _bearing_slot_terms(
        p_slot, l_slot, pk.p_meas, pk.p_omega, cfg
    )
    Hpp_diag = jnp.sum(Hpp_b, axis=1)
    bp = jnp.sum(bp_b, axis=1)

    # ---- landmark-packed pass: landmark broadcast, poses gathered ----
    l_slot2 = jnp.broadcast_to(g.landmarks[:, None, :], (NL, pk.K2, 2))
    p_slot2 = g.poses[pk.l_pose]  # gather (NL*K2 rows)
    (_be_l, _bchi2_l, _Hpp_l, Hll_b, Bl, _bp_l, bl_b) = _bearing_slot_terms(
        p_slot2, l_slot2, pk.l_meas, pk.l_omega, cfg
    )
    Hll = jnp.sum(Hll_b, axis=1)
    bl = jnp.sum(bl_b, axis=1)

    # ---- odometry ----
    oe = R.odometry_error(g.poses, g.o_src, g.o_dst, g.o_meas)
    ojs, ojd = R.odometry_jacobians(g.poses, g.o_src, g.o_dst)
    ochi2 = jnp.einsum("ei,eij,ej->e", oe, g.o_omega, oe)
    owH, owb = robust_weights(ochi2, cfg)
    Om = g.o_omega * owH[:, None, None]
    OmJs = jnp.einsum("eij,ejk->eik", Om, ojs)
    OmJd = jnp.einsum("eij,ejk->eik", Om, ojd)
    H_ss = jnp.einsum("eij,eik->ejk", ojs, OmJs)
    H_dd = jnp.einsum("eij,eik->ejk", ojd, OmJd)
    H_sd = jnp.einsum("eij,eik->ejk", ojs, OmJd)
    e_w = jnp.einsum("eij,ej->ei", g.o_omega, owb[:, None] * oe)
    bp_s = jnp.einsum("eij,ei->ej", ojs, e_w)
    bp_d = jnp.einsum("eij,ei->ej", ojd, e_w)

    if pk.odometry_is_chain:
        # src = 0..NP-2, dst = 1..NP-1: pure pads, no indexed ops
        Hpp_diag = Hpp_diag + jnp.pad(H_ss, ((0, 1), (0, 0), (0, 0)))
        Hpp_diag = Hpp_diag + jnp.pad(H_dd, ((1, 0), (0, 0), (0, 0)))
        bp = bp + jnp.pad(bp_s, ((0, 1), (0, 0))) + jnp.pad(bp_d, ((1, 0), (0, 0)))
    else:
        idx = jnp.concatenate([g.o_src, g.o_dst])
        NO = oe.shape[0]
        payload = jnp.concatenate(
            [
                jnp.concatenate([H_ss.reshape(NO, 9), bp_s], axis=1),
                jnp.concatenate([H_dd.reshape(NO, 9), bp_d], axis=1),
            ],
            axis=0,
        )
        sums = jax.ops.segment_sum(payload, idx, num_segments=NP_)
        Hpp_diag = Hpp_diag + sums[:, :9].reshape(NP_, 3, 3)
        bp = bp + sums[:, 9:12]

    eye3 = jnp.eye(3, dtype=dtype)
    eye2 = jnp.eye(2, dtype=dtype)
    Hpp_diag = Hpp_diag + damping * eye3
    Hll_inv = _inv2x2(Hll + damping * eye2)

    stats = {
        "chi2_bearing": jnp.sum(bchi2_p),
        "chi2_odometry": jnp.sum(ochi2),
        "chi2_robust": jnp.sum(robust_cost(bchi2_p, cfg) * (pk.p_omega > 0))
        + jnp.sum(robust_cost(ochi2, cfg)),
        "n_bearing_clamped": jnp.sum(bchi2_p > cfg.kernel_threshold),
        "n_odometry_clamped": jnp.sum(ochi2 > cfg.kernel_threshold),
    }
    return PackedBlocks(Hpp_diag, Hll_inv, Bp, Bl, bp, bl, H_sd), stats


def packed_s_matvec(blocks: PackedBlocks, pk: PackedEdges, x, mask):
    """y = S_masked @ x with two row-gathers and zero scatters."""
    xm = x * mask
    y = jnp.einsum("pij,pj->pi", blocks.Hpp_diag, xm)

    if pk.odometry_is_chain:
        y_sd = jnp.einsum("eij,ej->ei", blocks.Ho_sd, xm[1:])
        y_ds = jnp.einsum("eji,ej->ei", blocks.Ho_sd, xm[:-1])
        y = y + jnp.pad(y_sd, ((0, 1), (0, 0))) + jnp.pad(y_ds, ((1, 0), (0, 0)))
    else:
        # general odometry couplings (small NO): flat scatter path
        raise NotImplementedError(
            "packed matvec requires chain odometry; use linear_solver='schur_cg'"
        )

    # z = Hlp @ x  (landmark-packed: gather x by slot pose, sum slots)
    xg = xm[pk.l_pose]  # [NL, K2, 3]
    z = jnp.einsum("lkij,lki->lj", blocks.Bl, xg)
    w = jnp.einsum("lij,lj->li", blocks.Hll_inv, z)

    # y -= Hpl @ w  (pose-packed: gather w by slot landmark, sum slots)
    wg = w[pk.p_lm]  # [NP, K, 2]
    y = y - jnp.einsum("pkij,pkj->pi", blocks.Bp, wg)

    return y * mask + x * (1.0 - mask)


def packed_s_diag(blocks: PackedBlocks, pk: PackedEdges) -> jnp.ndarray:
    """Exact diag(S): Hpp_ii - sum_k B Hll_inv[lm] B^T over the pose slots."""
    Hinv_g = blocks.Hll_inv[pk.p_lm]  # [NP, K, 2, 2] gather
    corr = jnp.einsum("pkij,pkjl,pkml->pim", blocks.Bp, Hinv_g, blocks.Bp)
    return blocks.Hpp_diag - corr


def _packed_preconditioner(blocks: PackedBlocks, pk: PackedEdges, cfg, mask):
    """Build the PCG preconditioner apply-function for the packed system.

    "block_jacobi": exact 3x3 diag(S).  "btridiag"/"auto" (chain only):
    T = tridiag(diag(S), Ho_sd) factored once by cyclic reduction — SPD
    (see solver/btridiag.py) and captures the dominant odometry-chain
    coupling the block-Jacobi ignores.  Gauge fix: the fixed pose's diag
    block is pinned to identity and its band entries zeroed, matching the
    masked matvec.
    """
    which = cfg.preconditioner
    if which == "auto":
        which = "btridiag" if pk.odometry_is_chain else "block_jacobi"
    d = packed_s_diag(blocks, pk)
    eye3 = jnp.eye(3, dtype=d.dtype)
    d = mask[..., None] * d + (1.0 - mask[..., None]) * eye3
    if which == "block_jacobi" or not pk.odometry_is_chain:
        return _inv3x3(d)
    from boslam.solver.btridiag import btridiag_factor, btridiag_solve

    band = blocks.Ho_sd * (mask[:-1, :, None] * mask[1:, :, None])
    factor = btridiag_factor(d, band)
    return lambda r: btridiag_solve(factor, r)


def schur_packed_build_and_solve(
    g: FactorGraph, pk: PackedEdges, cfg, damping, x0=None
):
    """Full linear solve on the packed layout; mirrors schur_build_and_solve.

    ``x0`` optionally warm-starts CG (the previous outer iteration's pose
    delta — near convergence successive systems barely change).
    """
    blocks, stats = build_packed_blocks(g, pk, cfg, damping)
    mask = _pose_mask(g.n_poses, g.fixed_pose_ix, g.poses.dtype)

    w0 = jnp.einsum("lij,lj->li", blocks.Hll_inv, blocks.bl)
    corr = jnp.einsum("pkij,pkj->pi", blocks.Bp, w0[pk.p_lm])
    rhs = (-blocks.bp + corr) * mask

    precond = _packed_preconditioner(blocks, pk, cfg, mask)
    matvec = lambda x: packed_s_matvec(blocks, pk, x, mask)
    if x0 is not None:
        x0 = x0 * mask
    dp, n_iters, rel_res2 = pcg(matvec, rhs, precond, cfg.cg_iters, cfg.cg_tol, x0)
    dp = dp * mask

    hlp_dp = jnp.einsum("lkij,lki->lj", blocks.Bl, dp[pk.l_pose])
    dl = jnp.einsum("lij,lj->li", blocks.Hll_inv, -blocks.bl - hlp_dp)

    ok = jnp.logical_not(jnp.logical_or(jnp.any(jnp.isnan(dp)), jnp.any(jnp.isnan(dl))))
    dp = jnp.where(ok, dp, jnp.zeros_like(dp))
    dl = jnp.where(ok, dl, jnp.zeros_like(dl))
    stats["cg_iters"] = n_iters
    stats["cg_rel_res2"] = rel_res2
    return dp, dl, stats, ok


def packed_gn_step(
    g: FactorGraph, pk: PackedEdges, cfg: SolverConfig, dp_prev=None
):
    """One GN iteration on the packed layout: (g', stats, dp).

    ``dp_prev`` (when ``cfg.cg_warm_start``) warm-starts the inner CG from
    the previous outer iteration's pose delta.
    """
    from boslam.geometry.se2 import boxplus_state

    x0 = dp_prev if cfg.cg_warm_start else None
    dp, dl, stats, ok = schur_packed_build_and_solve(g, pk, cfg, cfg.damping, x0)
    poses, landmarks = boxplus_state(g.poses, g.landmarks, dp, dl)
    stats = dict(stats)
    stats["spd_ok"] = ok
    stats["accepted"] = jnp.asarray(True)
    stats["damping"] = jnp.asarray(cfg.damping, g.poses.dtype)
    stats["delta_norm"] = jnp.sqrt(jnp.sum(dp * dp) + jnp.sum(dl * dl))
    return g.with_state(poses, landmarks), stats, dp
