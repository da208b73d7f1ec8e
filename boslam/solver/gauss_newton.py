"""Dense-path damped Gauss-Newton step with mask-based gauge fixing.

Counterpart of ``Solver::step`` (slam/solver.cpp:27-97).  The reference
gauge-fixes by permuting the fixed pose's 3 rows/cols to the end of H and
truncating to (N-3)x(N-3) before a sparse LDLT (slam/solver.cpp:71-94,
permutation built at :99-125).  Permutations and shape-changing truncation
are hostile to XLA (dynamic shapes), so we use the exactly-equivalent
masking form: zero the fixed rows AND columns, put 1 on the fixed diagonal,
zero the fixed b entries.  Because the coupling columns are zeroed too, the
remaining (N-3)-dim subsystem is *identical* to the truncated one, and the
fixed coordinates solve to exactly delta = 0 — the same zero-delta
re-embedding the reference performs at slam/solver.cpp:87-94 (verified
against an explicit permute-truncate NumPy oracle in
tests/test_gauge_fix.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl

from boslam.config import SolverConfig
from boslam.graph.data import FactorGraph, unpack_delta
from boslam.geometry.se2 import boxplus_state
from boslam.solver.normal_eq import assemble_dense, chi2_stats, edge_terms


def gauge_mask(N: int, n_poses: int, fixed_pose_ix: jnp.ndarray, dtype) -> jnp.ndarray:
    """f32[N] mask: 0 on the fixed pose's 3 coordinates, 1 elsewhere.

    ``fixed_pose_ix`` stays a traced scalar so changing the gauge pose does
    not recompile the step.
    """
    cols = jnp.arange(N)
    in_pose_block = cols < 3 * n_poses
    is_fixed = in_pose_block & (cols // 3 == fixed_pose_ix)
    return jnp.where(is_fixed, jnp.zeros((), dtype), jnp.ones((), dtype))


def _use_pallas_cholesky(N: int, cfg: SolverConfig | None) -> bool:
    if cfg is None or cfg.cholesky_backend == "xla":
        return False
    from boslam.ops.pallas_cholesky import MAX_VMEM_DIM, pad_dim

    fits = pad_dim(N) <= MAX_VMEM_DIM
    if cfg.cholesky_backend == "pallas":
        return fits
    # auto: only on real accelerator backends (interpret mode on CPU would
    # be slower than LAPACK and is exercised separately in tests)
    return fits and jax.default_backend() != "cpu"


def solve_gauge_fixed(
    H: jnp.ndarray,
    b: jnp.ndarray,
    mask: jnp.ndarray,
    cfg: SolverConfig | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Solve H delta = -b with the fixed pose pinned to zero delta.

    Returns (delta, spd_ok).  ``spd_ok`` mirrors the reference's non-SPD
    factorization warning (slam/solver.cpp:82-84): a Cholesky breakdown on
    TPU surfaces as NaNs rather than an error code, so we detect it that
    way and let the caller react (warn, or raise damping under LM).
    """
    Hm = mask[:, None] * H * mask[None, :] + jnp.diag(1.0 - mask)
    bm = mask * b
    if _use_pallas_cholesky(H.shape[0], cfg):
        from boslam.ops.pallas_cholesky import cholesky_solve

        delta = cholesky_solve(Hm, -bm)
    else:
        chol, lower = jsl.cho_factor(Hm, lower=True)
        delta = jsl.cho_solve((chol, lower), -bm)
    spd_ok = jnp.logical_not(jnp.any(jnp.isnan(delta)))
    # NaN-guard (SURVEY §5 failure detection): a poisoned delta would corrupt
    # the state irrecoverably; freeze instead.
    delta = jnp.where(spd_ok, delta, jnp.zeros_like(delta))
    return delta, spd_ok


def gn_build_and_solve(
    g: FactorGraph,
    cfg: SolverConfig,
    damping: jnp.ndarray | float,
    axis_name: str | None = None,
):
    """Assemble, damp (slam/solver.cpp:64-69), gauge-fix, solve.

    Returns (delta_poses, delta_landmarks, terms, spd_ok, extra) —
    ``extra`` is always empty for the dense path (signature shared with
    the Schur paths, which report CG stats there).  With ``axis_name``
    (edge-sharded context), assembly psums the partial H,b and the (small)
    solve runs replicated on every device.
    """
    H, b, terms = assemble_dense(g, cfg, axis_name=axis_name)
    N = g.state_dim
    H = H + damping * jnp.eye(N, dtype=H.dtype)
    mask = gauge_mask(N, g.n_poses, g.fixed_pose_ix, H.dtype)
    delta, spd_ok = solve_gauge_fixed(H, b, mask, cfg)
    dp, dl = unpack_delta(delta, g.n_poses, g.n_landmarks)
    return dp, dl, terms, spd_ok, {}


def gn_step_dense(g: FactorGraph, cfg: SolverConfig) -> tuple[FactorGraph, dict]:
    """One constant-damping GN iteration (the reference's ``step()``)."""
    dp, dl, terms, spd_ok, _ = gn_build_and_solve(g, cfg, cfg.damping)
    poses, landmarks = boxplus_state(g.poses, g.landmarks, dp, dl)
    stats = chi2_stats(terms, cfg)
    stats["spd_ok"] = spd_ok
    stats["delta_norm"] = jnp.sqrt(jnp.sum(dp * dp) + jnp.sum(dl * dl))
    return g.with_state(poses, landmarks), stats


gn_step_dense_jit = jax.jit(gn_step_dense, static_argnames=("cfg",))
