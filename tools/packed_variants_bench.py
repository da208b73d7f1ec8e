"""A/B bench of the packed-path variants on one generated problem.

Measures per-outer-GN-iteration wall time of the packed Schur+PCG solver
(BASELINE configs 4-5 regime) for each combination of:

  - hot-landmark splitting (--lm-split variants: 0 vs auto)
  - coupling-block storage dtype (float32 vs bfloat16)

in ONE process so the (expensive) synthetic generation, triangulation and
most of the compile cache are shared.  Timing uses forced host
materialization of a scalar (PERF.md: ``block_until_ready`` on the
tunneled backend acknowledges enqueue only).

Usage: python tools/packed_variants_bench.py [n_poses] [outer_iters]
Prints one JSON line per variant.
"""

import functools
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    import jax
    import jax.numpy as jnp
    import numpy as np

    from boslam.config import SolverConfig
    from boslam.graph.build import build_graph
    from boslam.graph.packed import pack_edges
    from boslam.solver.schur_packed import packed_gn_step
    from boslam.synth import generate_sequence
    from boslam.utils.roofline import packed_outer_model, roofline_report

    log(f"devices: {jax.devices()}")
    t0 = time.perf_counter()
    ig, _gt = generate_sequence(n, max(8, n * 2 // 5), seed=0)
    graph, _ = build_graph(ig, init="triangulate")
    log(f"problem built in {time.perf_counter() - t0:.1f}s: "
        f"{graph.n_poses} poses, {graph.n_landmarks} lms, "
        f"{graph.n_bearing + graph.n_odometry} edges")

    base = SolverConfig(
        linear_solver="schur_cg",
        cg_iters=50,
        cg_tol=1e-4,
        preconditioner="btridiag",
        cg_warm_start=True,
    )

    variants = [
        ("nosplit_f32", 0, "float32"),
        ("split_f32", "auto", "float32"),
        ("split_bf16", "auto", "bfloat16"),
        ("nosplit_bf16", 0, "bfloat16"),
    ]

    for name, split, cdt in variants:
        cfg = base.replace(coupling_dtype=cdt)
        pk, pmeta = pack_edges(graph, split_lm=split)
        log(f"[{name}] K={pk.K} K2={pk.K2} rows={pk.l_pose.shape[0]} "
            f"fill_lm={pmeta.fill_lm:.2f}")
        step = jax.jit(functools.partial(packed_gn_step, cfg=cfg))
        dp0 = jnp.zeros((graph.n_poses, 3), graph.poses.dtype)

        tc = time.perf_counter()
        g, s, dp = step(graph, pk, dp_prev=dp0)
        # force full materialization (tunnel: enqueue-ack is not completion)
        _ = float(np.asarray(s["chi2_robust"]))
        log(f"[{name}] compile+1st step {time.perf_counter() - tc:.1f}s")

        best = float("inf")
        cg_sum = 0
        for _rep in range(3):
            g, dp = graph, dp0
            cgs = []
            t1 = time.perf_counter()
            for _ in range(iters):
                g, s, dp = step(g, pk, dp_prev=dp)
                cgs.append(s["cg_iters"])
            _ = float(jnp.sum(g.poses))  # host materialization barrier
            dt = time.perf_counter() - t1
            if dt < best:
                best = dt
                cg_sum = int(np.sum([int(c) for c in cgs]))
        cg_mean = cg_sum / iters
        flops, bytes_ = packed_outer_model(
            graph.n_poses, graph.n_landmarks, pk.K, pk.K2,
            graph.n_odometry, cg_mean, lm_rows=pk.l_pose.shape[0],
            coupling_bytes=2.0 if cdt == "bfloat16" else 4.0,
        )
        rec = {
            "variant": name,
            "n_poses": graph.n_poses,
            "ms_per_outer": round(1e3 * best / iters, 1),
            "cg_iters_mean": cg_mean,
            "chi2_after": float(np.asarray(s["chi2_robust"])),
            "lm_rows": int(pk.l_pose.shape[0]),
            "K2": int(pk.K2),
            "fill_lm": round(pmeta.fill_lm, 3),
            "roofline": roofline_report(flops, bytes_, best / iters),
        }
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
