"""Benchmark: full-dataset bundle adjustment, ours (TPU) vs the C++ reference.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric: Gauss-Newton iterations/second on the reference's full
dataset (301 poses, 141 landmarks, 2432 edges; 50 iterations = the
"definitely converged" count, /root/reference/README.md:23-24), excluding
compilation, ``jax.block_until_ready`` timing.

Baseline: the ACTUAL reference C++ solver — its unmodified sources compiled
by tools/refbench (-O3 -march=native, Eigen SimplicialLDLT with cached
sparsity pattern) and re-run live on this host when the binary exists;
otherwise the recorded tools/refbench/baseline.json (2.6 iters/s).

Correctness is asserted, not assumed: the converged chi2 must match the C++
solver's recorded optimum (5.882782) to 0.1%.

Implementation note (r5): when the whole-GN-step mega-kernel applies
(ops/pallas_gn_step.py), the 50-iteration solve is ONE compiled program (a
lax.scan whose body is a single Pallas launch); the old per-step dispatch
loop is kept as the fallback path.  The r3/r4 protocol note about
remote-compile stalls applied to LARGE multi-kernel programs; the scan
program holds one small kernel and compiles reliably (~3-8 min Mosaic
compile, excluded like refbench's analyzePattern warm-up).
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

DATASET = "/root/reference/data/slam2D_bearing_only_initial_guess.g2o"
ITERS = 50
REPEATS = 5
REF_CHI2 = 5.882782  # tools/refbench/baseline.json


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def reference_baseline() -> float:
    """C++ reference iterations/s: live re-run if possible, else recorded."""
    bin_path = os.path.join(REPO, "tools", "refbench", "refbench")
    if not os.path.exists(bin_path):
        r = subprocess.run(
            ["make", "-C", os.path.join(REPO, "tools", "refbench")],
            capture_output=True, text=True,
        )
        if r.returncode != 0:
            log("refbench build failed; using recorded baseline")
    if os.path.exists(bin_path):
        try:
            out = subprocess.run(
                [bin_path, DATASET, str(ITERS)],
                capture_output=True, text=True, timeout=600,
            ).stdout.strip().splitlines()[-1]
            val = json.loads(out)["iters_per_s"]
            log(f"refbench live: {val:.3f} iters/s")
            return float(val)
        except Exception as exc:  # pragma: no cover
            log(f"refbench live run failed ({exc}); using recorded baseline")
    with open(os.path.join(REPO, "tools", "refbench", "baseline.json")) as f:
        return float(json.load(f)["iters_per_s"])


def main():
    import jax
    import numpy as np

    from boslam.config import SolverConfig
    from boslam.graph.build import build_graph
    from boslam.io.g2o import parse_g2o
    from boslam.solver.normal_eq import chi2_stats, edge_terms
    from boslam.solver.optimizer import gn_step

    log(f"devices: {jax.devices()}")

    parsed = parse_g2o(DATASET)
    graph, _ = build_graph(parsed, init="triangulate")
    # Exact per-landmark Schur elimination + Pallas Cholesky of the 903x903
    # reduced camera system: measured fastest path at reference scale
    # (tools/headline_ab.py r3: schur 1.30 ms/iter vs dense 2.27, packed
    # 1.81) — it drops the 2*NB*N^2 one-hot assembly matmul whose FLOPs
    # the algorithm never needed (VERDICT r2 weak #1).
    cfg = SolverConfig(iters=ITERS, linear_solver="schur")

    # Donating the graph lets every passthrough edge array alias through
    # the step instead of being copied per dispatch (measured r4: seven
    # ~470 us copy-start transfers per step vanish; ~+5%).  A host copy is
    # kept to re-place the donated buffers for each repeat.
    host_graph = jax.tree.map(np.asarray, graph)
    place = lambda: jax.tree.map(jax.numpy.asarray, host_graph)

    # r5: with the whole-GN-step mega-kernel (ops/pallas_gn_step.py) the
    # 50-iteration solve is ONE compiled program — a lax.scan whose body
    # is a single Pallas launch — so the per-step Python dispatch loop
    # (r3/r4 protocol, a workaround for remote-compile stalls on LARGE
    # programs) is no longer needed: the scan program holds one small
    # kernel and compiles reliably.
    from boslam.solver.optimizer import _fused_step_applicable, solve_loop

    fused = _fused_step_applicable(graph, cfg)
    log(f"fused mega-kernel path: {fused}")
    if fused:
        from boslam.ops.pallas_gn_step import detect_odo_chain

        oc = detect_odo_chain(graph)
        run = jax.jit(
            lambda g: solve_loop(g, cfg, odo_chain=oc), donate_argnums=0
        )

        def run_once(g):
            g2, _stats = run(g)
            return g2
    else:
        step = jax.jit(lambda g: gn_step(g, cfg), donate_argnums=0)

        def run_once(g):
            for _ in range(ITERS):
                g, _stats = step(g)
            return g

    # compile (excluded, like refbench's analyzePattern warm-up step)
    t0 = time.perf_counter()
    jax.block_until_ready(run_once(place()).poses)
    log(f"solve compile: {time.perf_counter() - t0:.2f}s")

    # correctness: run the full 50-iteration solve once and check the optimum
    g = run_once(place())
    final_terms = jax.jit(lambda g: chi2_stats(edge_terms(g, cfg), cfg))(g)
    chi2 = float(np.asarray(final_terms["chi2_robust"]))
    rel = abs(chi2 - REF_CHI2) / REF_CHI2
    log(f"converged chi2_robust: {chi2:.6f} (C++ reference: {REF_CHI2}, rel {rel:.2e})")
    assert rel < 1e-3, "converged optimum does not match the C++ reference"

    # timing: 50 steps per repeat, best-of, with forced host
    # materialization (block_until_ready acknowledges enqueue only on the
    # tunneled backend — PERF.md) and ADAPTIVE repeats: the tunnel warms
    # up over several runs (measured: 1154 -> 396 ms monotonically across
    # 5 fixed repeats on a cold day), so keep going until the best result
    # has not improved for 3 consecutive runs (cap 20).
    times = []
    stale = 0
    while len(times) < 20 and (len(times) < REPEATS or stale < 3):
        g = place()
        t0 = time.perf_counter()
        g = run_once(g)
        _ = float(np.asarray(g.poses).sum())
        t = time.perf_counter() - t0
        stale = stale + 1 if times and t >= min(times) else 0
        times.append(t)
    best = min(times)
    iters_per_s = ITERS / best
    log(f"timed runs: {[f'{t*1e3:.1f}ms' for t in times]} -> {iters_per_s:.0f} iters/s")

    # Roofline utilization per chip (BASELINE.json north star) — model
    # FLOPs of the executed path AND useful (block-sparse-counted) FLOPs,
    # so the utilization number cannot be flattered by wasted work.
    from boslam.utils.roofline import (
        chip_spec,
        roofline_report,
        schur_step_model,
        useful_step_flops,
    )

    flops, bytes_ = schur_step_model(
        graph.n_poses, graph.n_landmarks, graph.n_bearing, graph.n_odometry
    )
    roof = roofline_report(flops, bytes_, best / ITERS)
    uf = useful_step_flops(
        graph.n_poses, graph.n_landmarks, graph.n_bearing, graph.n_odometry
    )
    roof["useful_flops_util"] = round(
        uf / (best / ITERS) / chip_spec().peak_flops_f32, 6
    )
    log(f"roofline: {roof}")

    baseline = reference_baseline()
    print(
        json.dumps(
            {
                "metric": "ba_gn_iterations_per_second_full_dataset",
                "value": round(iters_per_s, 1),
                "unit": "iters/s",
                "vs_baseline": round(iters_per_s / baseline, 1),
                "roofline_util": roof["roofline_util"],
                "roofline": roof,
            }
        )
    )


if __name__ == "__main__":
    main()
