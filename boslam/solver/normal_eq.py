"""Normal-equation assembly: H = J^T Omega J, b = J^T Omega e, batched.

The reference accumulates H and b edge-by-edge with sparse rank updates
(slam/solver.cpp:31-62) — the asymptotically worst part of its step (SURVEY
§3.2).  TPU-first re-design: compute every edge's dense blocks at once
(``residuals.py``), weight them, and land them with one scatter-add per edge
family.  Two assemblies are provided:

- ``assemble_dense``: the full NxN H for the small-N direct-Cholesky path
  (N = 1185 on the reference dataset — trivially dense on TPU).
- ``edge_blocks``: the block-sparse form (per-pose 3x3, per-landmark 2x2,
  per-edge pose-landmark 3x2 and pose-pose couplings) feeding the Schur
  complement / CG path that scales to 100k+ poses.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from boslam.config import SolverConfig
from boslam.graph.data import FactorGraph
from boslam.solver import residuals as R
from boslam.solver.robust import robust_cost, robust_weights


class EdgeTerms(NamedTuple):
    """Per-edge residuals/Jacobians/weights shared by all assembly paths."""

    # bearing: error f32[NB], blocks f32[NB,3]/f32[NB,2], weights f32[NB]
    be: jnp.ndarray
    bjp: jnp.ndarray
    bjl: jnp.ndarray
    bw_H: jnp.ndarray
    bw_b: jnp.ndarray
    bchi2: jnp.ndarray
    # odometry: error f32[NO,3], blocks f32[NO,3,3], weights f32[NO]
    oe: jnp.ndarray
    ojs: jnp.ndarray
    ojd: jnp.ndarray
    ow_H: jnp.ndarray
    ow_b: jnp.ndarray
    ochi2: jnp.ndarray


def use_matmul_assembly(g: FactorGraph, cfg: SolverConfig) -> bool:
    """Pick the assembly strategy (static shapes -> static decision)."""
    if cfg.assembly == "scatter":
        return False
    if cfg.assembly == "matmul":
        return True
    cost = (g.n_bearing + 3 * g.n_odometry) * g.state_dim
    return cost <= cfg.matmul_assembly_budget


def _one_hots(g: FactorGraph):
    """One-hot selection matrices for the matmul formulation.

    TPU gathers over 3-wide rows are latency-bound; a one-hot matmul rides
    the MXU instead.  XLA CSEs these across the uses within one jit.
    """
    dtype = g.poses.dtype
    Pb = jax.nn.one_hot(g.b_pose, g.n_poses, dtype=dtype)  # [NB, NP]
    Pl = jax.nn.one_hot(g.b_lm, g.n_landmarks, dtype=dtype)  # [NB, NL]
    Os = jax.nn.one_hot(g.o_src, g.n_poses, dtype=dtype)  # [NO, NP]
    Od = jax.nn.one_hot(g.o_dst, g.n_poses, dtype=dtype)  # [NO, NP]
    return Pb, Pl, Os, Od


def edge_terms(g: FactorGraph, cfg: SolverConfig) -> EdgeTerms:
    """Residuals, Jacobian blocks, robust weights and chi2 for all edges."""
    if use_matmul_assembly(g, cfg) and not cfg.use_autodiff_jacobians:
        Pb, Pl, Os, Od = _one_hots(g)
        # one-hot gathers must be bit-exact: force full-precision matmul
        # (each output element is 1.0 * value + zeros)
        mm = lambda A, x: jnp.matmul(A, x, precision=jax.lax.Precision.HIGHEST)
        p_b = mm(Pb, g.poses)
        l_b = mm(Pl, g.landmarks)
        p_s = mm(Os, g.poses)
        p_d = mm(Od, g.poses)
        be = R.bearing_error_from(p_b, l_b, g.b_meas)
        oe = R.odometry_error_from(p_s, p_d, g.o_meas)
        bjp, bjl = R.bearing_jacobians_from(p_b, l_b)
        ojs, ojd = R.odometry_jacobians_from(p_s, p_d)
    else:
        be = R.bearing_error(g.poses, g.landmarks, g.b_pose, g.b_lm, g.b_meas)
        oe = R.odometry_error(g.poses, g.o_src, g.o_dst, g.o_meas)
        if cfg.use_autodiff_jacobians:
            bjp, bjl = R.bearing_jacobians_autodiff(
                g.poses, g.landmarks, g.b_pose, g.b_lm, g.b_meas
            )
            ojs, ojd = R.odometry_jacobians_autodiff(
                g.poses, g.o_src, g.o_dst, g.o_meas
            )
        else:
            bjp, bjl = R.bearing_jacobians(g.poses, g.landmarks, g.b_pose, g.b_lm)
            ojs, ojd = R.odometry_jacobians(g.poses, g.o_src, g.o_dst)

    # chi2 = e^T Omega e per edge (slam/solver.cpp:38,54)
    bchi2 = g.b_omega * be * be
    ochi2 = jnp.einsum("ei,eij,ej->e", oe, g.o_omega, oe)

    bw_H, bw_b = robust_weights(bchi2, cfg)
    ow_H, ow_b = robust_weights(ochi2, cfg)
    return EdgeTerms(be, bjp, bjl, bw_H, bw_b, bchi2, oe, ojs, ojd, ow_H, ow_b, ochi2)


def chi2_stats(t: EdgeTerms, cfg: SolverConfig, axis_name: str | None = None) -> dict:
    """Per-iteration observability the reference never had (SURVEY §5).

    Under edge sharding (``axis_name`` set inside shard_map) the sums are
    completed with a psum over the mesh axis.
    """
    stats = {
        "chi2_bearing": jnp.sum(t.bchi2),
        "chi2_odometry": jnp.sum(t.ochi2),
        "chi2_robust": jnp.sum(robust_cost(t.bchi2, cfg))
        + jnp.sum(robust_cost(t.ochi2, cfg)),
        "n_bearing_clamped": jnp.sum(t.bchi2 > cfg.kernel_threshold),
        "n_odometry_clamped": jnp.sum(t.ochi2 > cfg.kernel_threshold),
    }
    if axis_name is not None:
        stats = {k: jax.lax.psum(v, axis_name) for k, v in stats.items()}
    return stats


def _bearing_cols(g: FactorGraph) -> jnp.ndarray:
    """Packed delta-vector columns of each bearing edge's 5 nonzeros.

    Layout [3*NP poses | 2*NL landmarks] mirrors solver_jacobians.cpp:69-71.
    """
    p0 = 3 * g.b_pose
    l0 = 3 * g.n_poses + 2 * g.b_lm
    return jnp.stack([p0, p0 + 1, p0 + 2, l0, l0 + 1], axis=-1)


def _odom_cols(g: FactorGraph) -> jnp.ndarray:
    """Packed columns of each odometry edge's 6 nonzeros (x2 pose blocks)."""
    s0 = 3 * g.o_src
    d0 = 3 * g.o_dst
    return jnp.stack([s0, s0 + 1, s0 + 2, d0, d0 + 1, d0 + 2], axis=-1)


def assemble_dense_matmul(
    g: FactorGraph,
    cfg: SolverConfig,
    terms: EdgeTerms | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray, EdgeTerms]:
    """Design-matrix formulation: H = A^T W A, b = A^T W e as MXU matmuls.

    Builds the dense (but mostly-zero) per-edge Jacobian matrix A [rows, N]
    from one-hot outer products — no scatter, no gather — then one matmul
    produces H.  The right shape for TPU at small/medium N: the reference-
    dataset assembly drops from ~1.2 ms (scatter) to ~0.1 ms.  Memory is
    O(rows * N) so ``use_matmul_assembly`` gates it.
    """
    if terms is None:
        terms = edge_terms(g, cfg)
    NP_, NL, N = g.n_poses, g.n_landmarks, g.state_dim
    NB, NO = g.n_bearing, g.n_odometry
    dtype = g.poses.dtype
    Pb, Pl, Os, Od = _one_hots(g)

    # --- bearing rows: A_b [NB, N] with 5 nonzeros per row ---
    A_pose = jnp.einsum("ep,ei->epi", Pb, terms.bjp).reshape(NB, 3 * NP_)
    A_lm = jnp.einsum("el,ei->eli", Pl, terms.bjl).reshape(NB, 2 * NL)
    A_b = jnp.concatenate([A_pose, A_lm], axis=1)
    wH_b = (g.b_omega * terms.bw_H)[:, None]
    H = A_b.T @ (wH_b * A_b)
    b = A_b.T @ (g.b_omega * terms.bw_b * terms.be)

    # --- odometry rows: A_o [3*NO, 3*NP] (landmark block is zero) ---
    A_o = (
        jnp.einsum("ep,erc->erpc", Os, terms.ojs)
        + jnp.einsum("ep,erc->erpc", Od, terms.ojd)
    ).reshape(3 * NO, 3 * NP_)
    Om_w = g.o_omega * terms.ow_H[:, None, None]
    WA_rows = jnp.einsum("eij,ejn->ein", Om_w, terms.ojs)
    WA = (
        jnp.einsum("ep,erc->erpc", Os, WA_rows)
        + jnp.einsum(
            "ep,erc->erpc", Od, jnp.einsum("eij,ejn->ein", Om_w, terms.ojd)
        )
    ).reshape(3 * NO, 3 * NP_)
    H = H.at[: 3 * NP_, : 3 * NP_].add(A_o.T @ WA)
    e_w = jnp.einsum(
        "eij,ej->ei", g.o_omega, terms.ow_b[:, None] * terms.oe
    ).reshape(3 * NO)
    b = b.at[: 3 * NP_].add(A_o.T @ e_w)
    return H, b, terms


def assemble_dense(
    g: FactorGraph,
    cfg: SolverConfig,
    terms: EdgeTerms | None = None,
    axis_name: str | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray, EdgeTerms]:
    """Full dense H f32[N,N] and b f32[N] (pre gauge-fix, pre damping).

    Equivalent to the accumulation loops at slam/solver.cpp:31-62 but as two
    batched outer-product scatters.  The robust quirk is preserved: w_H
    weights the H contribution, w_b the b contribution.

    With ``axis_name`` set (edge-sharded shard_map context) each device
    scatters only its edge shard and the partial H,b are completed with one
    psum — the TPU-native replacement for the reference's single-process
    accumulation (SURVEY §2 parallelism table, slam/solver.cpp:44-45,60-61).
    """
    if use_matmul_assembly(g, cfg):
        H, b, terms = assemble_dense_matmul(g, cfg, terms)
        if axis_name is not None:
            H = jax.lax.psum(H, axis_name)
            b = jax.lax.psum(b, axis_name)
        return H, b, terms
    if terms is None:
        terms = edge_terms(g, cfg)
    N = g.state_dim
    dtype = g.poses.dtype

    H = jnp.zeros((N, N), dtype)
    b = jnp.zeros((N,), dtype)

    # --- bearing edges: 5 nonzero columns each ---
    j5 = jnp.concatenate([terms.bjp, terms.bjl], axis=-1)  # [NB, 5]
    cols = _bearing_cols(g)  # [NB, 5]
    wH = (g.b_omega * terms.bw_H)[:, None, None]
    H = H.at[cols[:, :, None], cols[:, None, :]].add(
        wH * j5[:, :, None] * j5[:, None, :]
    )
    b = b.at[cols].add((g.b_omega * terms.bw_b * terms.be)[:, None] * j5)

    # --- odometry edges: 3x6 J blocks ---
    J = jnp.concatenate([terms.ojs, terms.ojd], axis=-1)  # [NO, 3, 6]
    OJ = jnp.einsum("eij,ejk->eik", g.o_omega, J)  # Omega @ J
    H6 = jnp.einsum("eij,eik->ejk", J, OJ)  # J^T Omega J  [NO, 6, 6]
    b6 = jnp.einsum("eij,ei->ej", OJ, terms.ow_b[:, None] * terms.oe)
    ocols = _odom_cols(g)  # [NO, 6]
    H = H.at[ocols[:, :, None], ocols[:, None, :]].add(
        terms.ow_H[:, None, None] * H6
    )
    b = b.at[ocols].add(b6)

    if axis_name is not None:
        H = jax.lax.psum(H, axis_name)
        b = jax.lax.psum(b, axis_name)
    return H, b, terms
