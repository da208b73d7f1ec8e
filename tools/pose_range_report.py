"""Pose-range sharding evidence (VERDICT r3 #4): parity + memory scaling.

Runs on the virtual CPU mesh (xla_force_host_platform_device_count):
for each mesh size, solves the same problem with the pose-range layout,
records chi2-trace parity vs the single-device packed solver, and the
compiled per-device argument bytes (the 1/D criterion).

Usage: python tools/pose_range_report.py [--poses 2000] [--out FILE]
"""

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--poses", type=int, default=2000)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--loop-closures", type=int, default=8)
    ap.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--preconditioner", default="block_jacobi")
    ap.add_argument("--cg-iters", type=int, default=60)
    ap.add_argument("--skip-packed-ref", action="store_true",
                    help="skip the replicated packed reference solve "
                         "(large problems: parity comes from the smaller "
                         "config's record)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import numpy as np
    import jax.numpy as jnp

    from boslam.config import SolverConfig
    from boslam.graph.build import build_graph
    from boslam.parallel.mesh import make_mesh
    from boslam.parallel.pose_range import (
        make_pose_range_solve,
        pose_range_solve,
        prepare_pose_range,
    )
    from boslam.solver.optimizer import solve_packed
    from boslam.synth import generate_sequence

    ig, _ = generate_sequence(
        args.poses, max(8, args.poses * 2 // 5), seed=0,
        loop_closures=args.loop_closures,
    )
    graph, _ = build_graph(ig, init="triangulate")
    cfg = SolverConfig(
        iters=args.iters,
        optimizer="lm",
        linear_solver="schur_cg",
        cg_tol=1e-7,
        lm_split=0,
        cg_warm_start=True,
        preconditioner=args.preconditioner,
        cg_iters=args.cg_iters,
    )
    if args.skip_packed_ref:
        ref = np.asarray([float("nan")] * cfg.iters, np.float64)
    else:
        _, s1 = solve_packed(graph, cfg)
        ref = np.asarray(s1["chi2_robust"], np.float64)

    rows = []
    import time as _time
    for d in args.devices:
        mesh = make_mesh(d, axis_name="range")
        sh, meta = prepare_pose_range(graph, mesh)
        fn = make_pose_range_solve(mesh, cfg, meta)
        dp0 = jnp.zeros((meta.np_pad, 3), jnp.float32)
        compiled = fn.lower(sh, dp0).compile()
        ma = compiled.memory_analysis()
        t0 = _time.time()
        out, stats, _dp = compiled(sh, dp0)
        chi2 = np.asarray(stats["chi2_robust"], np.float64)
        wall = _time.time() - t0
        rows.append(
            {
                "devices": d,
                "chi2_final": float(chi2[-1]),
                "chi2_rel_vs_packed": float(
                    abs(chi2[-1] - ref[-1]) / abs(ref[-1])
                ),
                "wall_s": round(wall, 2),
                "argument_bytes_per_device": int(
                    ma.argument_size_in_bytes
                ) // d,
                "temp_bytes_per_device": int(ma.temp_size_in_bytes) // d,
            }
        )
        print(json.dumps(rows[-1]), flush=True)

    rec = {
        "metric": "pose_range_sharding",
        "n_poses": graph.n_poses,
        "n_landmarks": graph.n_landmarks,
        "loop_closures": args.loop_closures,
        "iters": args.iters,
        "preconditioner": args.preconditioner,
        "packed_chi2_final": float(ref[-1]),
        "rows": rows,
        "arg_bytes_ratio_8_over_1": round(
            rows[-1]["argument_bytes_per_device"]
            / rows[0]["argument_bytes_per_device"],
            4,
        ),
    }
    line = json.dumps(rec)
    print(line)
    if args.out:
        with open(args.out, "a") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
