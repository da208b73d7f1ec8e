"""Scaling benchmark harness (BASELINE.json configs 1-5).

Runs each configured scenario, prints one JSON record per line (stderr has
progress).  Usage:

  python tools/scaling_bench.py [--configs 1 2 3 4 5] [--poses-override N]

Config map (BASELINE.json):
  1  mini dataset GN solve, chi2 convergence
  2  full dataset: triangulation + 50-iter GN, ATE vs ground truth
  3  LM + Huber variant on the full dataset
  4  single-chip 10k-pose synthetic, Schur+PCG
  5  100k-pose synthetic, Schur+PCG (single chip here; the sharded solve
     is validated on the virtual CPU mesh by tests/test_sharded.py and
     __graft_entry__.dryrun_multichip — multi-chip hardware is not
     attached in this environment)
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DATA = "/root/reference/data"


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _timed_steps(graph, cfg, iters, repeats=3):
    import jax

    from boslam.solver.optimizer import gn_step

    step = jax.jit(lambda g: gn_step(g, cfg))
    jax.block_until_ready(step(graph)[0].poses)
    best = float("inf")
    for _ in range(repeats):
        g = graph
        t0 = time.perf_counter()
        for _ in range(iters):
            g, _s = step(g)
        jax.block_until_ready(g.poses)
        best = min(best, time.perf_counter() - t0)
    return best, g


def config_1_2_3(which: int):
    import numpy as np

    from boslam.config import SolverConfig
    from boslam.graph.build import build_graph
    from boslam.io.g2o import parse_g2o
    from boslam.metrics import ate_metrics, match_gt_poses
    from boslam.solver.optimizer import solve

    if which == 1:
        ig = parse_g2o(f"{DATA}/mini_initial_guess.g2o")
        gt = parse_g2o(f"{DATA}/mini_ground_truth.g2o")
        cfg = SolverConfig(iters=50)
        name = "mini_gn"
    elif which == 2:
        ig = parse_g2o(f"{DATA}/slam2D_bearing_only_initial_guess.g2o")
        gt = parse_g2o(f"{DATA}/slam2D_bearing_only_ground_truth.g2o")
        cfg = SolverConfig(iters=50)
        name = "full_gn"
    else:
        ig = parse_g2o(f"{DATA}/slam2D_bearing_only_initial_guess.g2o")
        gt = parse_g2o(f"{DATA}/slam2D_bearing_only_ground_truth.g2o")
        cfg = SolverConfig(iters=50, optimizer="lm", robust="huber")
        name = "full_lm_huber"

    graph, meta = build_graph(ig, init="triangulate")
    best, final = _timed_steps(graph, cfg, cfg.iters)
    _, stats = solve(graph, cfg)  # chi2 trace (cached compile)
    chi2 = np.asarray(stats["chi2_robust"])
    m = ate_metrics(np.asarray(final.poses), match_gt_poses(meta, gt))
    return {
        "config": which,
        "name": name,
        "n_poses": graph.n_poses,
        "iters": cfg.iters,
        "iters_per_s": round(cfg.iters / best, 2),
        "chi2_initial": float(chi2[0]),
        "chi2_final": float(chi2[-1]),
        "ate_rmse": round(m["ate_rmse"], 4),
        "ate_rmse_aligned": round(m["ate_rmse_aligned"], 4),
    }


def _timed_packed(graph, pk, cfg, iters, step_builder):
    """Best-of-2 timed run of `iters` packed GN steps; returns
    (best_seconds, final_graph, cg_traces)."""
    import jax
    import numpy as np

    step = step_builder(cfg)
    dp0 = jax.numpy.zeros((graph.n_poses, 3), graph.poses.dtype)
    g2, _, _ = step(graph, dp0)
    jax.block_until_ready(g2.poses)  # warm
    best, cg_traces = float("inf"), []
    for _ in range(2):
        g, dp = graph, dp0
        traces = []
        t0 = time.perf_counter()
        for _ in range(iters):
            g, s, dp = step(g, dp)
            traces.append(s["cg_iters"])
        jax.block_until_ready(g.poses)
        dt = time.perf_counter() - t0
        if dt < best:
            best, cg_traces, final = dt, traces, g
    return best, final, cg_traces


def config_4_5(which: int, poses_override=None, lm_split="auto",
               coupling_dtype="float32"):
    import jax
    import numpy as np

    from boslam.config import SolverConfig
    from boslam.graph.build import build_graph
    from boslam.graph.packed import pack_edges
    from boslam.solver.normal_eq import chi2_stats, edge_terms
    from boslam.solver.schur_packed import packed_gn_step
    from boslam.synth import generate_sequence
    from boslam.utils.roofline import packed_outer_model, roofline_report

    n = poses_override or (10_000 if which == 4 else 100_000)
    log(f"generating {n}-pose synthetic sequence...")
    ig, gt = generate_sequence(n, max(8, n * 2 // 5), seed=0)
    graph, meta = build_graph(ig, init="triangulate")
    # Truncated inexact-Newton configuration: cg cap 8 was measured best
    # chi2-per-matvec at BOTH 10k and 100k (r3 sweep, PERF.md), and
    # "auto" picks the measured-best preconditioner per size (btridiag
    # <= 32k poses, block_jacobi above).
    cfg = SolverConfig(
        linear_solver="schur_cg",
        cg_iters=8,
        cg_tol=1e-4,
        preconditioner="auto",
        cg_warm_start=True,
        coupling_dtype=coupling_dtype,
    )
    pk, pmeta = pack_edges(graph, split_lm=lm_split)
    log(
        f"packed: K={pk.K} K2={pk.K2} rows={pk.l_pose.shape[0]} "
        f"fill={pmeta.fill_pose:.2f}/{pmeta.fill_lm:.2f} "
        f"split_cap={pmeta.lm_split_cap}"
    )
    iters = 5

    # Donate (graph, dp): the step's outputs alias the inputs' buffers, so
    # XLA reuses the state/edge arrays in place instead of double-
    # buffering them (temp-slope lever, VERDICT r3 #6).  Donated inputs
    # are consumed, so each repeat re-places the problem from a host copy.
    step_j = jax.jit(
        lambda g, dp: packed_gn_step(g, pk, cfg, dp), donate_argnums=(0, 1)
    )
    host_graph = jax.tree.map(np.asarray, graph)
    place = lambda: jax.tree.map(jax.numpy.asarray, host_graph)
    mk_dp0 = lambda: jax.numpy.zeros((graph.n_poses, 3), graph.poses.dtype)
    # AOT lower().compile() exposes memory_analysis(), but the explicit
    # compile route is flakier than plain jit dispatch on the tunneled
    # backend for very large programs — fall back rather than fail.
    mem = {}
    step = step_j
    try:
        compiled = step_j.lower(graph, mk_dp0()).compile()
        mem = _compiled_memory(compiled)
        step = lambda g, dp: compiled(g, dp)
    except Exception as exc:
        log(f"AOT compile failed ({type(exc).__name__}); plain jit path")
    g2, _, _ = step(place(), mk_dp0())
    jax.block_until_ready(g2.poses)  # warm
    best = float("inf")
    cg_traces = []
    for _ in range(2):
        g, dp = place(), mk_dp0()
        cg_traces = []
        t0 = time.perf_counter()
        for _ in range(iters):
            g, s, dp = step(g, dp)
            cg_traces.append(s["cg_iters"])
        jax.block_until_ready(g.poses)
        best = min(best, time.perf_counter() - t0)
    final = g
    cg_mean = float(np.mean([int(c) for c in cg_traces]))

    flops, bytes_ = packed_outer_model(
        graph.n_poses, graph.n_landmarks, pk.K, pk.K2, graph.n_odometry,
        cg_mean, lm_rows=pk.l_pose.shape[0],
        coupling_bytes=2.0 if coupling_dtype == "bfloat16" else 4.0,
    )
    roof = roofline_report(flops, bytes_, best / iters)

    fs = jax.jit(lambda x: chi2_stats(edge_terms(x, cfg), cfg))
    rec = {
        "config": which,
        "name": f"synthetic_{n}_packed_schur_cg",
        "n_poses": graph.n_poses,
        "n_landmarks": graph.n_landmarks,
        "n_edges": graph.n_bearing + graph.n_odometry,
        "iters_per_s": round(iters / best, 3),
        "poses_optimized_per_s": round(graph.n_poses * iters / best, 0),
        "cg_iters_mean": cg_mean,
        "roofline": roof,
        "chi2_initial": float(np.asarray(fs(place())["chi2_robust"])),
        "chi2_after": float(np.asarray(fs(final)["chi2_robust"])),
        "memory": _device_memory() or mem,
    }

    # Tolerance-controlled companion run (VERDICT r3 #7): the cap-8 number
    # above is throughput at an UNCONTROLLED solve quality (cg_iters_mean
    # pins at the cap); this one fixes an inexact-Newton forcing tolerance
    # (eta = 1e-2, generous cap) so poses-optimized/s is comparable at
    # equal per-step solve quality.
    tcfg = cfg.replace(cg_iters=64, cg_tol=1e-2)
    step_builder = lambda c: jax.jit(
        lambda g, dp: packed_gn_step(g, pk, c, dp)
    )
    t_best, t_final, t_traces = _timed_packed(
        place(), pk, tcfg, iters, step_builder
    )
    rec["tol_controlled"] = {
        "cg_tol": tcfg.cg_tol,
        "cg_cap": tcfg.cg_iters,
        "iters_per_s": round(iters / t_best, 3),
        "poses_optimized_per_s": round(graph.n_poses * iters / t_best, 0),
        "cg_iters_mean": float(np.mean([int(c) for c in t_traces])),
        "chi2_after": float(np.asarray(fs(t_final)["chi2_robust"])),
    }
    return rec


def _compiled_memory(compiled) -> dict:
    """HBM footprint of the compiled step from the executable itself —
    works on backends (the axon tunnel) whose runtime memory_stats() is
    empty.  argument + temp + output is the peak the step needs."""
    try:
        ma = compiled.memory_analysis()
        return {
            "argument_bytes": int(ma.argument_size_in_bytes),
            "temp_bytes": int(ma.temp_size_in_bytes),
            "output_bytes": int(ma.output_size_in_bytes),
            "code_bytes": int(ma.generated_code_size_in_bytes),
        }
    except Exception:
        return {}


def _device_memory() -> dict:
    """Peak/limit HBM stats where the backend exposes them (scale-ceiling
    accounting, VERDICT r2 #6)."""
    import jax

    try:
        ms = jax.local_devices()[0].memory_stats() or {}
    except Exception:
        return {}
    keys = ("peak_bytes_in_use", "bytes_in_use", "bytes_limit")
    return {k: int(ms[k]) for k in keys if k in ms}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", type=int, nargs="+", default=[1, 2, 3, 4])
    ap.add_argument("--poses-override", type=int, default=None)
    def lm_split_arg(v):
        if v == "auto":
            return v
        try:
            return int(v)
        except ValueError:
            ap.error(f"--lm-split: expected 'auto' or an int, got {v!r}")
    ap.add_argument("--lm-split", default="auto", type=lm_split_arg,
                    help="landmark-grid slot cap ('auto' | 0 = off | int)")
    ap.add_argument("--coupling-dtype", choices=["float32", "bfloat16"],
                    default="float32")
    args = ap.parse_args()
    lm_split = args.lm_split

    import jax

    log(f"devices: {jax.devices()}")
    for c in args.configs:
        t0 = time.time()
        try:
            rec = (
                config_1_2_3(c)
                if c <= 3
                else config_4_5(
                    c, args.poses_override, lm_split, args.coupling_dtype
                )
            )
        except Exception as exc:  # record the scale/OOM boundary, not a crash
            rec = {
                "config": c,
                "poses_override": args.poses_override,
                "failed": repr(exc)[:400],
                "memory": _device_memory(),
            }
        rec["wall_s"] = round(time.time() - t0, 1)
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
