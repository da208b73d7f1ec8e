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


def edge_terms(g: FactorGraph, cfg: SolverConfig) -> EdgeTerms:
    """Residuals, Jacobian blocks, robust weights and chi2 for all edges."""
    be = R.bearing_error(g.poses, g.landmarks, g.b_pose, g.b_lm, g.b_meas)
    oe = R.odometry_error(g.poses, g.o_src, g.o_dst, g.o_meas)

    if cfg.use_autodiff_jacobians:
        bjp, bjl = R.bearing_jacobians_autodiff(
            g.poses, g.landmarks, g.b_pose, g.b_lm, g.b_meas
        )
        ojs, ojd = R.odometry_jacobians_autodiff(g.poses, g.o_src, g.o_dst, g.o_meas)
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
