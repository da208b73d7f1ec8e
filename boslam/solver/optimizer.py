"""Outer optimization loops: constant-damping GN and Levenberg-Marquardt.

The reference only has constant-damping GN stepped interactively from a
keyboard loop (executables/bearing_only_slam.cpp:88-113, ~20 iterations to
convergence per README.md:22-24).  Here the whole multi-iteration solve is
one ``lax.scan`` inside a single jit — no host round-trips between
iterations — and an LM variant with accept/reject and a multiplicative
damping schedule is a first-class config (BASELINE.json config 3; SURVEY §2
"new components": LM damping schedule + Huber kernel variants).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from boslam.config import SolverConfig
from boslam.graph.data import FactorGraph
from boslam.geometry.se2 import boxplus_state
from boslam.solver.normal_eq import chi2_stats, edge_terms
from boslam.solver.robust import robust_cost
from boslam.solver import gauss_newton as GN


def _build_and_solve(g: FactorGraph, cfg: SolverConfig, damping, axis_name=None):
    """Dispatch to the configured linear solver."""
    if cfg.linear_solver == "dense":
        return GN.gn_build_and_solve(g, cfg, damping, axis_name=axis_name)
    elif cfg.linear_solver in ("schur", "schur_cg"):
        from boslam.solver import schur

        return schur.schur_build_and_solve(g, cfg, damping, axis_name=axis_name)
    raise ValueError(f"unknown linear_solver {cfg.linear_solver!r}")


def _fused_step_applicable(g: FactorGraph, cfg: SolverConfig) -> bool:
    """Gate for the single-launch GN mega-kernel (VERDICT r4 #3)."""
    if cfg.fused_step == "off" or cfg.linear_solver != "schur":
        return False
    if cfg.use_autodiff_jacobians or cfg.robust not in (
        "threshold", "huber", "none"
    ):
        return False
    from boslam.ops.pallas_gn_step import fused_gn_fits

    if not fused_gn_fits(g.n_poses, g.n_landmarks, g.n_bearing, g.n_odometry):
        return False
    if cfg.fused_step == "force":
        return True
    return jax.default_backend() in ("tpu", "axon")


def gn_step(
    g: FactorGraph, cfg: SolverConfig, axis_name: str | None = None
) -> tuple[FactorGraph, dict]:
    """One constant-damping GN iteration (``Solver::step``, solver.cpp:27-97)."""
    if axis_name is None and _fused_step_applicable(g, cfg):
        from boslam.ops.pallas_gn_step import fused_gn_step

        return fused_gn_step(
            g, cfg, interpret=jax.default_backend() == "cpu"
        )
    dp, dl, terms, spd_ok, extra = _build_and_solve(g, cfg, cfg.damping, axis_name)
    poses, landmarks = boxplus_state(g.poses, g.landmarks, dp, dl)
    stats = chi2_stats(terms, cfg, axis_name)
    stats.update(extra)
    stats["spd_ok"] = spd_ok
    stats["accepted"] = jnp.asarray(True)
    stats["damping"] = jnp.asarray(cfg.damping, g.poses.dtype)
    stats["delta_norm"] = jnp.sqrt(jnp.sum(dp * dp) + jnp.sum(dl * dl))
    return g.with_state(poses, landmarks), stats


def _robust_total(
    g: FactorGraph, cfg: SolverConfig, axis_name: str | None = None
) -> jnp.ndarray:
    t = edge_terms(g, cfg)
    total = jnp.sum(robust_cost(t.bchi2, cfg)) + jnp.sum(robust_cost(t.ochi2, cfg))
    if axis_name is not None:
        total = jax.lax.psum(total, axis_name)
    return total


def lm_step(
    g: FactorGraph,
    lam: jnp.ndarray,
    cfg: SolverConfig,
    axis_name: str | None = None,
) -> tuple[FactorGraph, jnp.ndarray, dict]:
    """One LM trial: solve with damping ``lam``, accept iff the robust cost
    decreases, and scale lam down (accept) / up (reject)."""
    dp, dl, terms, spd_ok, extra = _build_and_solve(g, cfg, lam, axis_name)
    cand_poses, cand_landmarks = boxplus_state(g.poses, g.landmarks, dp, dl)
    cand = g.with_state(cand_poses, cand_landmarks)

    cost_old = jnp.sum(robust_cost(terms.bchi2, cfg)) + jnp.sum(
        robust_cost(terms.ochi2, cfg)
    )
    if axis_name is not None:
        cost_old = jax.lax.psum(cost_old, axis_name)
    cost_new = _robust_total(cand, cfg, axis_name)
    accept = jnp.logical_and(cost_new < cost_old, spd_ok)

    poses = jnp.where(accept, cand.poses, g.poses)
    landmarks = jnp.where(accept, cand.landmarks, g.landmarks)
    new_lam = jnp.where(
        accept,
        jnp.maximum(lam * cfg.lm_down, cfg.lm_lambda_min),
        jnp.minimum(lam * cfg.lm_up, cfg.lm_lambda_max),
    )

    stats = chi2_stats(terms, cfg, axis_name)
    stats.update(extra)
    stats["spd_ok"] = spd_ok
    stats["accepted"] = accept
    stats["damping"] = lam
    stats["delta_norm"] = jnp.sqrt(jnp.sum(dp * dp) + jnp.sum(dl * dl))
    return g.with_state(poses, landmarks), new_lam, stats


def solve_loop(
    graph: FactorGraph,
    cfg: SolverConfig,
    axis_name: str | None = None,
    lam0: jnp.ndarray | None = None,
    odo_chain: bool = False,
) -> tuple[FactorGraph, dict]:
    """Run ``cfg.iters`` optimizer iterations fully on device.

    Returns the optimized graph and per-iteration stats (each value is an
    array with a leading ``iters`` axis).  The per-iteration chi2 trace is
    the observability the reference never computes (SURVEY §5: "chi2 is
    never computed or reported — convergence is judged visually").
    ``lam0`` overrides the initial LM damping (checkpoint resume).
    """
    if cfg.optimizer == "gn":
        if axis_name is None and _fused_step_applicable(graph, cfg):
            # whole-solve fused path: static prep once, scan of single-
            # launch GN mega-kernels (VERDICT r4 #3).  ``odo_chain`` is a
            # host-detected static flag (detect_odo_chain) enabling the
            # banded coupling writes.
            from boslam.ops.pallas_gn_step import fused_gn_solve

            return fused_gn_solve(
                graph, cfg, odo_chain=odo_chain,
                interpret=jax.default_backend() == "cpu",
            )

        def body(g, _):
            g, stats = gn_step(g, cfg, axis_name)
            return g, stats

        final, stats = jax.lax.scan(body, graph, None, length=cfg.iters)
        return final, stats

    elif cfg.optimizer == "lm":

        def body(carry, _):
            g, lam = carry
            g, lam, stats = lm_step(g, lam, cfg, axis_name)
            return (g, lam), stats

        if lam0 is None:
            lam0 = jnp.asarray(cfg.lm_lambda0, graph.poses.dtype)
        (final, _), stats = jax.lax.scan(body, (graph, lam0), None, length=cfg.iters)
        return final, stats

    raise ValueError(f"unknown optimizer {cfg.optimizer!r}")


@partial(jax.jit, static_argnames=("cfg", "odo_chain"))
def _solve_jit(graph, cfg, lam0, odo_chain=False):
    return solve_loop(graph, cfg, lam0=lam0, odo_chain=odo_chain)


def solve(
    graph: FactorGraph, cfg: SolverConfig, lam0: float | None = None
) -> tuple[FactorGraph, dict]:
    """Single-device entry point: jit of the scan loop.

    ``lam0`` restores the LM damping from a checkpoint (iteration-level
    resume); ignored under the GN optimizer.
    """
    lam = jnp.asarray(
        cfg.lm_lambda0 if lam0 is None else lam0, graph.poses.dtype
    )
    from boslam.ops.pallas_gn_step import detect_odo_chain

    return _solve_jit(graph, cfg, lam, odo_chain=detect_odo_chain(graph))


def packed_solve_loop(
    graph: FactorGraph,
    pk,
    cfg: SolverConfig,
    axis_name: str | None = None,
    lam0: jnp.ndarray | None = None,
    dp0: jnp.ndarray | None = None,
    start_iter: int = 0,
) -> tuple[FactorGraph, dict]:
    """Scan ``cfg.iters`` packed optimizer steps (GN or LM) on device.

    The packed mirror of solve_loop: both optimizers run natively on the
    dual-packed Schur+PCG layout (VERDICT r2 #1 — LM accept/reject at
    BASELINE configs 4-5 scale).  ``lam0`` restores the LM damping and
    ``dp0`` the warm-start delta (checkpoint resume — with ``dp0`` a
    resumed ``cg_warm_start`` run is iteration-exact); ``axis_name``
    enables the sharded collectives.  ``start_iter`` offsets the GNC
    annealing schedule on resume.  ``stats["dp_final"]`` carries the
    last outer delta for checkpointing (a [NP,3] array, not a per-
    iteration trace).
    """
    from boslam.solver.schur_packed import packed_gn_step, packed_lm_step

    if dp0 is None:
        dp0 = jnp.zeros((graph.n_poses, 3), graph.poses.dtype)
    # GNC: the scan body receives its outer-iteration index so the robust
    # threshold can anneal inside the single compiled program.  ``it0``
    # (checkpoint resume) keeps the schedule aligned across restarts.
    it0 = jnp.asarray(start_iter, jnp.int32)
    xs = jnp.arange(cfg.iters, dtype=jnp.int32)

    def kt_of(i):
        return cfg.kt_at(it0 + i)

    if cfg.optimizer == "gn":

        def body(carry, i):
            g, dp_prev = carry
            g, stats, dp = packed_gn_step(
                g, pk, cfg, dp_prev, axis_name, kt=kt_of(i)
            )
            return (g, dp), stats

        (final, dp_f), stats = jax.lax.scan(body, (graph, dp0), xs)
        stats["dp_final"] = dp_f
        return final, stats

    elif cfg.optimizer == "lm":

        def body(carry, i):
            g, lam, dp_prev = carry
            g, lam, stats, dp = packed_lm_step(
                g, pk, cfg, lam, dp_prev, axis_name, kt=kt_of(i)
            )
            return (g, lam, dp), stats

        if lam0 is None:
            lam0 = jnp.asarray(cfg.lm_lambda0, graph.poses.dtype)
        (final, lam_f, dp_f), stats = jax.lax.scan(
            body, (graph, lam0, dp0), xs
        )
        stats["dp_final"] = dp_f
        # the NEXT trial's lambda (post-schedule), for chunked continuation
        stats["lam_final"] = lam_f
        return final, stats

    raise ValueError(f"unknown optimizer {cfg.optimizer!r}")


def solve_packed(
    graph: FactorGraph,
    cfg: SolverConfig,
    lam0: float | None = None,
    dp0: jnp.ndarray | None = None,
    start_iter: int = 0,
) -> tuple[FactorGraph, dict]:
    """GN or LM solve on the dual-packed layout (large-scale path, PERF.md).

    Packs edges host-side once, then scans the packed step.  Handles
    arbitrary odometry topologies (chain prefix via shifts, loop closures
    via a small segment-sum — framework/observation.hpp:43-47).  Both
    optimizers run natively on this layout; ``lam0`` restores LM damping
    and ``dp0`` the warm-start delta on resume (``stats["dp_final"]``
    carries the outgoing one for the next checkpoint).
    """
    from boslam.graph.packed import pack_edges

    # "auto" == "take": measured on TPU (PERF.md), fused XLA gathers beat
    # the windowed kernel; "windowed" stays available as an explicit opt-in.
    use_windows = cfg.gather == "windowed"
    inv = None
    g_in = graph
    if use_windows:
        # Landmark locality reorder makes both slot grids banded so the
        # windowed one-hot gather applies (PERF.md roadmap #1); the
        # relabeling is unmapped on the way out.
        from boslam.graph.reorder import reorder_landmarks_by_pose

        g_in, _perm, inv = reorder_landmarks_by_pose(graph)
    pk, meta = pack_edges(g_in, windows=use_windows, split_lm=cfg.lm_split)

    lam = jnp.asarray(
        cfg.lm_lambda0 if lam0 is None else lam0, g_in.poses.dtype
    )
    if dp0 is not None:
        dp0 = jnp.asarray(dp0, g_in.poses.dtype)
    else:
        dp0 = jnp.zeros((g_in.n_poses, 3), g_in.poses.dtype)

    @partial(jax.jit, static_argnames=("cfg",))
    def _solve(g, pk, cfg, lam, dp0, start_iter):
        return packed_solve_loop(
            g, pk, cfg, lam0=lam, dp0=dp0, start_iter=start_iter
        )

    final, stats = _solve(
        g_in, pk, cfg, lam, dp0, jnp.asarray(start_iter, jnp.int32)
    )
    if inv is not None:
        final = graph.with_state(final.poses, final.landmarks[jnp.asarray(inv)])
    return final, stats
