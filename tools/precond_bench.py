"""A/B the reduced-system preconditioners on one generated problem.

block_jacobi vs btridiag (chain) vs bband (block-banded, exact in-band S)
at a fixed inner-CG budget, plus converged-tolerance runs.  Timing forces
host materialization (block_until_ready on the tunneled backend
acknowledges enqueue only, PERF.md).

Usage: python tools/precond_bench.py [n_poses] [outer_iters]
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import numpy as np

from boslam.config import SolverConfig
from boslam.graph.build import build_graph
from boslam.graph.packed import pack_edges
from boslam.solver.normal_eq import chi2_stats, edge_terms
from boslam.solver.schur_packed import packed_gn_step
from boslam.synth import generate_sequence


def run(graph, pk, cfg, iters):
    step = jax.jit(lambda g, dp: packed_gn_step(g, pk, cfg, dp), static_argnames=())
    dp0 = jax.numpy.zeros((graph.n_poses, 3), graph.poses.dtype)
    g, dp = graph, dp0
    g2, s, dp = step(g, dp)
    _ = float(np.asarray(s["chi2_robust"]))  # compile + full materialization
    best, cg_total = float("inf"), 0
    for _rep in range(2):
        t0 = time.perf_counter()
        g, dp = graph, dp0
        cg_traces = []
        for _ in range(iters):
            g, s, dp = step(g, dp)
            cg_traces.append(s["cg_iters"])  # traced; no host sync inside timing
        _ = float(jax.numpy.sum(g.poses))  # host materialization barrier
        dt = time.perf_counter() - t0
        if dt < best:
            best = dt
            cg_total = int(sum(int(c) for c in cg_traces))
    return g, best, cg_total


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    print(f"devices: {jax.devices()}", file=sys.stderr)
    ig, gt = generate_sequence(n, max(8, n * 2 // 5), seed=0)
    graph, meta = build_graph(ig, init="triangulate")
    pk, pmeta = pack_edges(graph)
    print(
        f"{graph.n_poses} poses, {graph.n_landmarks} lms, "
        f"{graph.n_bearing + graph.n_odometry} edges; "
        f"K={pk.K} K2={pk.K2} fill={pmeta.fill_pose:.2f}/{pmeta.fill_lm:.2f}",
        file=sys.stderr,
    )
    fs = jax.jit(lambda x: chi2_stats(edge_terms(x, SolverConfig()), SolverConfig()))

    base = SolverConfig(
        linear_solver="schur_cg", cg_tol=1e-4, cg_warm_start=True
    )
    variants = {
        # equal-inner-budget regime (the scale-path default, cap 8)
        "block_jacobi cap8": base.replace(cg_iters=8, preconditioner="block_jacobi"),
        "btridiag cap8": base.replace(cg_iters=8, preconditioner="btridiag"),
        "two_level cap8": base.replace(cg_iters=8, preconditioner="two_level"),
        "bband w1 cap8": base.replace(
            cg_iters=8, preconditioner="bband", band_width=1
        ),
        "bband w4 cap8": base.replace(
            cg_iters=8, preconditioner="bband", band_width=4
        ),
        "bband w8 cap8": base.replace(
            cg_iters=8, preconditioner="bband", band_width=8
        ),
        "bband w16 cap8": base.replace(
            cg_iters=8, preconditioner="bband", band_width=16
        ),
        # converged-tolerance regime (cap 50): who needs fewest matvecs
        "block_jacobi cap50": base.replace(cg_iters=50, preconditioner="block_jacobi"),
        "btridiag cap50": base.replace(cg_iters=50, preconditioner="btridiag"),
        "two_level cap50": base.replace(cg_iters=50, preconditioner="two_level"),
        "two_level q32 cap50": base.replace(
            cg_iters=50, preconditioner="two_level", coarse_q=32
        ),
        "two_level q128 cap50": base.replace(
            cg_iters=50, preconditioner="two_level", coarse_q=128
        ),
        "bband w8 cap50": base.replace(
            cg_iters=50, preconditioner="bband", band_width=8
        ),
    }
    if os.environ.get("PRECOND_ONLY"):
        pats = os.environ["PRECOND_ONLY"].split(",")
        variants = {
            k: v for k, v in variants.items() if any(p in k for p in pats)
        }
    for name, cfg in variants.items():
        g, dt, cg_total = run(graph, pk, cfg, iters)
        chi2 = float(np.asarray(fs(g)["chi2_robust"]))
        print(
            f"{name:16s}  {dt/iters*1e3:8.1f} ms/outer  cg_iters={cg_total}"
            f"  chi2_after={chi2:.4f}  poses/s={graph.n_poses*iters/dt:,.0f}"
        )


if __name__ == "__main__":
    main()
