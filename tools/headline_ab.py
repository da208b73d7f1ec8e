"""A/B every solver path on the reference dataset on real TPU (VERDICT r2 #3).

The round-2 headline (453 iters/s) ran the dense one-hot matmul assembly —
compute-bound on FLOPs the algorithm doesn't need (the design matrix has 5
nonzeros/row).  This tool measures all paths under the identical protocol
(50 GN iterations, per-step dispatch loop, forced scalar materialization to
defeat the tunnel's async enqueue acks) and reports both model utilization
and useful-FLOP (block-sparse-counted) utilization for each, plus
correctness vs the C++ optimum.

    python tools/headline_ab.py [--repeats 5] [--json-out HEADLINE_AB.json]

Paths:
  dense       full-H one-hot matmul assembly + Cholesky  (r2 headline)
  schur       block assembly + dense reduced system (903x903) + Cholesky
  schur_cg    flat Schur + block-Jacobi PCG
  packed_bj   dual-packed Schur + block-Jacobi PCG
  packed_bt   dual-packed Schur + btridiag PCG (+ CG warm start)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DATASET = "/root/reference/data/slam2D_bearing_only_initial_guess.g2o"
ITERS = 50
REF_CHI2 = 5.882782  # tools/refbench/baseline.json


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def measure(name, make_runner, repeats):
    """make_runner() -> (run_once: () -> final_graph).  Times ITERS steps."""
    import jax
    import numpy as np

    run = make_runner()
    t0 = time.perf_counter()
    g = run()
    # force full materialization through the tunnel (PERF.md methodology)
    _ = float(np.asarray(g.poses).sum())
    compile_s = time.perf_counter() - t0

    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        g = run()
        _ = float(np.asarray(g.poses).sum())
        times.append(time.perf_counter() - t0)
    best = min(times)
    return g, best, compile_s, times


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args()

    import jax
    import numpy as np

    from boslam.config import SolverConfig
    from boslam.graph.build import build_graph
    from boslam.graph.packed import pack_edges
    from boslam.io.g2o import parse_g2o
    from boslam.solver.normal_eq import chi2_stats, edge_terms
    from boslam.solver.optimizer import gn_step
    from boslam.solver.schur_packed import packed_gn_step
    from boslam.utils.roofline import (
        chip_spec,
        dense_step_model,
        packed_outer_model,
        roofline_report,
        useful_step_flops,
    )

    log(f"devices: {jax.devices()}")
    parsed = parse_g2o(DATASET)
    graph, _ = build_graph(parsed, init="triangulate")
    NP_, NL = graph.n_poses, graph.n_landmarks
    NB, NO = graph.n_bearing, graph.n_odometry
    base = SolverConfig(iters=ITERS)
    spec = chip_spec()

    def flat_runner(cfg):
        step = jax.jit(lambda g: gn_step(g, cfg))

        def run():
            g = graph
            for _ in range(ITERS):
                g, _s = step(g)
            return g

        return lambda: run

    def fused_scan_runner(cfg):
        # the r5 headline protocol: one compiled program — a lax.scan of
        # whole-GN-step mega-kernels (ops/pallas_gn_step.py)
        from boslam.ops.pallas_gn_step import detect_odo_chain
        from boslam.solver.optimizer import solve_loop

        oc = detect_odo_chain(graph)
        run_prog = jax.jit(lambda g: solve_loop(g, cfg, odo_chain=oc))

        def run():
            g2, _stats = run_prog(graph)
            return g2

        return lambda: run

    def packed_runner(cfg):
        pk, _meta = pack_edges(graph, split_lm=cfg.lm_split)
        import functools

        step = jax.jit(functools.partial(packed_gn_step, cfg=cfg))

        def run():
            import jax.numpy as jnp

            g, dp = graph, jnp.zeros((graph.n_poses, 3), graph.poses.dtype)
            cg_total = 0
            for _ in range(ITERS):
                g, st, dp = step(g, pk, dp_prev=dp)
            run.last_cg = st  # keep last stats for cg_iters reporting
            return g

        return lambda: run

    paths = {
        "dense": (flat_runner(base), None),
        "schur": (
            flat_runner(
                base.replace(linear_solver="schur", fused_step="off")
            ),
            None,
        ),
        "schur_fused_scan": (
            fused_scan_runner(base.replace(linear_solver="schur")),
            None,
        ),
        "schur_cg": (
            flat_runner(
                base.replace(
                    linear_solver="schur_cg", cg_iters=150, cg_tol=1e-6,
                    preconditioner="block_jacobi",
                )
            ),
            150,
        ),
        "packed_bj": (
            packed_runner(
                base.replace(
                    linear_solver="schur_cg", cg_iters=150, cg_tol=1e-6,
                    preconditioner="block_jacobi",
                )
            ),
            150,
        ),
        # tol 1e-4, not tighter: 1e-6 sits below the f32 matvec noise
        # floor, where CG's iteration count is decided by roundoff and
        # drifts with the toolchain (measured r4: the byte-identical r3
        # tree moved 20 -> 99 iters between rounds; see PERF.md).
        "packed_bt": (
            packed_runner(
                base.replace(
                    linear_solver="schur_cg", cg_iters=150, cg_tol=1e-4,
                    preconditioner="btridiag", cg_warm_start=True,
                )
            ),
            150,
        ),
    }

    final_chi2 = jax.jit(
        lambda g: chi2_stats(edge_terms(g, base), base)["chi2_robust"]
    )

    results = {}
    for name, (make_runner, cg_hint) in paths.items():
        try:
            g, best, compile_s, times = measure(name, make_runner, args.repeats)
        except Exception as exc:  # noqa: BLE001 — record and continue
            log(f"{name}: FAILED {exc!r}")
            results[name] = {"error": repr(exc)[:300]}
            continue
        chi2 = float(np.asarray(final_chi2(g)))
        rel = abs(chi2 - REF_CHI2) / REF_CHI2
        per_iter = best / ITERS

        # model + useful-FLOP utilization
        if name == "dense":
            mf, mb = dense_step_model(NP_, NL, NB, NO)
        else:
            pk, meta = pack_edges(graph)
            cg = cg_hint or 0
            mf, mb = packed_outer_model(NP_, NL, pk.K, pk.K2, NO, cg)
        roof = roofline_report(mf, mb, per_iter, spec)
        uf = useful_step_flops(NP_, NL, NB, NO, cg_iters=cg_hint or 0)
        useful_util = uf / per_iter / spec.peak_flops_f32

        results[name] = {
            "iters_per_s": round(ITERS / best, 1),
            "per_iter_ms": round(per_iter * 1e3, 3),
            "compile_s": round(compile_s, 1),
            "times_ms": [round(t * 1e3, 1) for t in times],
            "chi2": chi2,
            "chi2_rel_vs_cpp": rel,
            "converged": rel < 1e-3,
            "model_util": roof["roofline_util"],
            "useful_flops_util": round(useful_util, 6),
        }
        log(f"{name}: {results[name]}")

    out = {
        "dataset": DATASET,
        "iters": ITERS,
        "chip": spec.name,
        "results": results,
    }
    print(json.dumps(out))
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
