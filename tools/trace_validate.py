"""Validate the roofline models against ground truth (VERDICT r2 #5).

Two ground truths per solver path, both taken from the actual compiled
program on the actual device:

1. **XLA cost analysis** (``jit(f).lower(...).compile().cost_analysis()``):
   the compiler's own FLOP and bytes-accessed counts for the optimized
   HLO.  Reconciles the *numerators* of ``utils/roofline.py`` — if the
   analytic model and XLA disagree wildly, the model is counting work the
   program doesn't do (or missing work it does).

2. **jax.profiler device trace** (xplane, parsed with the TF tsl protos):
   per-kernel device-time breakdown of a chained run.  Reconciles the
   *denominator* — how much of the measured wall interval is device
   compute vs gap/dispatch — and names the top kernels, replacing the
   "dependent-chain timer" inference in PERF.md with measured kernel time.

Paths:
  dense   one-hot matmul assembly + full Cholesky, reference dataset
  schur   exact Schur + Pallas Cholesky (headline), reference dataset
  packed  dual-packed Schur + btridiag PCG at --poses (config-4 regime)

Usage:
  python tools/trace_validate.py [--paths dense schur packed]
      [--poses 10000] [--iters 30] [--json-out TRACE_r03.json]

Prints one JSON record per path; honest nulls where a ground-truth
channel is unavailable on this backend (e.g. remote devices that do not
export a profiler plugin).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DATASET = "/root/reference/data/slam2D_bearing_only_initial_guess.g2o"


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _cost_analysis(compiled) -> dict | None:
    """Normalize Compiled.cost_analysis() across jax versions."""
    try:
        ca = compiled.cost_analysis()
    except Exception as e:  # backend may not support it
        log(f"  cost_analysis unavailable: {type(e).__name__}: {e}")
        return None
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else {}
    if not isinstance(ca, dict):
        return None
    out = {}
    for k in ("flops", "bytes accessed", "transcendentals", "optimal_seconds"):
        if k in ca:
            out[k.replace(" ", "_")] = float(ca[k])
    return out or None


def _parse_xplane(logdir: str) -> dict | None:
    """Sum device-plane event self-times per kernel from the trace."""
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    except Exception as e:
        log(f"  xplane protos unavailable: {e}")
        return None
    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)
    if not paths:
        log("  no .xplane.pb produced (profiler plugin absent on this backend?)")
        return None
    space = xplane_pb2.XSpace()
    with open(sorted(paths)[-1], "rb") as f:
        space.ParseFromString(f.read())

    device_planes = [
        p
        for p in space.planes
        if "TPU" in p.name or "/device:" in p.name or "Device" in p.name
    ]
    host_planes = [p for p in space.planes if p not in device_planes]
    if not device_planes:
        log(
            "  no device plane in trace; planes: "
            + ", ".join(p.name for p in space.planes)
        )

    def plane_kernels(planes):
        per_kernel: dict[str, float] = {}
        total_ps = 0
        span_lo, span_hi = None, None
        for plane in planes:
            names = {m.id: m.name for m in plane.event_metadata.values()}
            for line in plane.lines:
                for ev in line.events:
                    name = names.get(ev.metadata_id, str(ev.metadata_id))
                    dur = ev.duration_ps
                    per_kernel[name] = per_kernel.get(name, 0.0) + dur
                    total_ps += dur
                    t0 = line.timestamp_ns * 1000 + ev.offset_ps
                    t1 = t0 + dur
                    span_lo = t0 if span_lo is None else min(span_lo, t0)
                    span_hi = t1 if span_hi is None else max(span_hi, t1)
        span_ps = (span_hi - span_lo) if span_lo is not None else 0
        return per_kernel, total_ps, span_ps

    dk, dtotal, dspan = plane_kernels(device_planes)
    top = sorted(dk.items(), key=lambda kv: -kv[1])[:12]
    return {
        "device_planes": [p.name for p in device_planes],
        "n_host_planes": len(host_planes),
        "device_time_ms": round(dtotal / 1e9, 3),
        "device_span_ms": round(dspan / 1e9, 3),
        "top_kernels_ms": [[n[:80], round(v / 1e9, 3)] for n, v in top],
    }


def measure_chain(step_once, iters, repeats=3):
    """Best wall time of `iters` chained steps, forced materialization."""
    import numpy as np

    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = step_once(iters)
        _ = float(np.asarray(out).sum())
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--paths", nargs="+", default=["dense", "schur", "packed"],
        choices=["dense", "schur", "packed"],
    )
    ap.add_argument("--poses", type=int, default=10_000)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args()

    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np

    from boslam.config import SolverConfig
    from boslam.graph.build import build_graph
    from boslam.graph.packed import pack_edges
    from boslam.io.g2o import parse_g2o
    from boslam.solver.optimizer import gn_step
    from boslam.solver.schur_packed import packed_gn_step
    from boslam.utils import roofline as RL

    log(f"devices: {jax.devices()}")
    spec = RL.chip_spec()
    records = []

    def run_path(name, lower_fn, chain_fn, model_fb, iters):
        log(f"[{name}] compiling...")
        t0 = time.perf_counter()
        lowered = lower_fn()
        compiled = lowered.compile()
        log(f"[{name}] lower+compile {time.perf_counter() - t0:.1f}s")
        ca = _cost_analysis(compiled)

        # warm the exec path (the chain_fn uses the same jitted callable)
        _ = chain_fn(1)
        best = measure_chain(chain_fn, iters)
        per_iter = best / iters

        trace = None
        logdir = f"/tmp/boslam_trace_{name}"
        os.system(f"rm -rf {logdir}")
        try:
            jax.profiler.start_trace(logdir)
            out = chain_fn(iters)
            _ = float(np.asarray(out).sum())
            jax.profiler.stop_trace()
            trace = _parse_xplane(logdir)
        except Exception as e:
            log(f"  profiler trace failed: {type(e).__name__}: {e}")
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass

        mflops, mbytes = model_fb
        rec = {
            "path": name,
            "iters": iters,
            "ms_per_iter": round(1e3 * per_iter, 3),
            "model": {"flops": mflops, "hbm_bytes": mbytes},
            "xla_cost_analysis": ca,
            "model_vs_xla": None,
            "trace": trace,
            "trace_vs_wall": None,
        }
        if ca and ca.get("flops"):
            rec["model_vs_xla"] = {
                "flops_ratio_model_over_xla": round(mflops / ca["flops"], 3),
            }
            if ca.get("bytes_accessed"):
                rec["model_vs_xla"]["bytes_ratio_model_over_xla"] = round(
                    mbytes / ca["bytes_accessed"], 3
                )
        if trace and trace["device_time_ms"] > 0:
            rec["trace_vs_wall"] = {
                "wall_ms": round(1e3 * best, 1),
                "device_busy_ms": trace["device_time_ms"],
                "device_busy_frac_of_span": round(
                    trace["device_time_ms"] / max(trace["device_span_ms"], 1e-9), 3
                ),
            }
        records.append(rec)
        print(json.dumps(rec), flush=True)

    needs_ref = {"dense", "schur"} & set(args.paths)
    if needs_ref:
        parsed = parse_g2o(DATASET)
        rgraph, _ = build_graph(parsed, init="triangulate")
        NP_, NL = rgraph.n_poses, rgraph.n_landmarks
        NB, NO = rgraph.n_bearing, rgraph.n_odometry

    if "dense" in args.paths:
        cfg = SolverConfig(linear_solver="dense")
        step = jax.jit(lambda g: gn_step(g, cfg)[0])

        def chain_dense(n):
            g = rgraph
            for _ in range(n):
                g = step(g)
            return g.poses

        run_path(
            "dense", lambda: step.lower(rgraph), chain_dense,
            RL.dense_step_model(NP_, NL, NB, NO), args.iters,
        )

    if "schur" in args.paths:
        cfg = SolverConfig(linear_solver="schur")
        step = jax.jit(lambda g: gn_step(g, cfg)[0])

        def chain_schur(n):
            g = rgraph
            for _ in range(n):
                g = step(g)
            return g.poses

        run_path(
            "schur", lambda: step.lower(rgraph), chain_schur,
            RL.schur_step_model(NP_, NL, NB, NO), args.iters,
        )

    if "packed" in args.paths:
        from boslam.synth import generate_sequence

        ig, _gt = generate_sequence(args.poses, max(8, args.poses * 2 // 5), seed=0)
        graph, _ = build_graph(ig, init="triangulate")
        cfg = SolverConfig(
            linear_solver="schur_cg", cg_iters=50, cg_tol=1e-4,
            preconditioner="btridiag", cg_warm_start=True,
        )
        pk, _m = pack_edges(graph, split_lm=cfg.lm_split)
        step = jax.jit(functools.partial(packed_gn_step, cfg=cfg))
        dp0 = jnp.zeros((graph.n_poses, 3), graph.poses.dtype)

        cg_seen = []

        def chain_packed(n):
            g, dp = graph, dp0
            for _ in range(n):
                g, st, dp = step(g, pk, dp_prev=dp)
            cg_seen.append(st["cg_iters"])
            return g.poses

        _ = chain_packed(1)
        cg = int(np.asarray(cg_seen[-1]))
        run_path(
            "packed", lambda: step.lower(graph, pk, dp_prev=dp0), chain_packed,
            RL.packed_outer_model(
                graph.n_poses, graph.n_landmarks, pk.K, pk.K2,
                graph.n_odometry, cg, lm_rows=pk.l_pose.shape[0],
            ),
            max(5, args.iters // 3),
        )

    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump({"chip": spec.name, "records": records}, f, indent=1)
        log(f"wrote {args.json_out}")


if __name__ == "__main__":
    main()
