"""Real multi-process (DCN-path) exercise of the distributed backend.

The reference has no distributed anything (SURVEY §2); BASELINE.json
configs 4-5 mandate a multi-host story.  Within a single machine the
closest real exercise is a 2-process JAX "cluster": each process owns 2
virtual CPU devices, ``jax.distributed.initialize`` wires them into one
4-device platform, and the sharded packed solve runs across the process
boundary — every psum in the reduced-system assembly and CG matvec is then
a genuine cross-process collective (the DCN path on a TPU pod), not an
intra-process shuffle.

Usage:
    python tools/distributed_smoke.py            # orchestrates 2 workers
    python tools/distributed_smoke.py --json-out DISTRIBUTED_r03.json

Exit 0 iff: both workers initialize, their (replicated) chi2 traces agree
bit-for-bit with each other, and match a single-process solve of the same
problem to f32 reduction-order tolerance.
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_PROCS = 2
DEVICES_PER_PROC = 2
POSES, LMS, SEED, CLOSURES = 120, 60, 9, 4
ITERS = 8


def _solver_cfg():
    from boslam.config import SolverConfig

    return SolverConfig(
        linear_solver="schur_cg",
        iters=ITERS,
        cg_iters=100,
        cg_tol=1e-6,
        preconditioner="block_jacobi",
        optimizer="lm",  # accept/reject decisions must also agree x-process
    )


def _build_problem():
    from boslam.graph.build import build_graph
    from boslam.synth import generate_sequence

    ig, _ = generate_sequence(POSES, LMS, seed=SEED, loop_closures=CLOSURES)
    g, _ = build_graph(ig, init="triangulate")
    return g


def worker(process_id: int, port: int) -> int:
    import jax

    jax.config.update("jax_platforms", "cpu")
    from boslam.parallel.mesh import initialize_distributed, make_mesh
    from boslam.parallel.sharded_packed import sharded_packed_solve

    initialize_distributed(
        coordinator_address=f"localhost:{port}",
        num_processes=N_PROCS,
        process_id=process_id,
    )
    import numpy as np

    assert jax.process_count() == N_PROCS, jax.process_count()
    n_global = len(jax.devices())
    n_local = len(jax.local_devices())
    assert n_global == N_PROCS * DEVICES_PER_PROC, n_global
    assert n_local == DEVICES_PER_PROC, n_local

    g = _build_problem()
    mesh = make_mesh()  # all GLOBAL devices — spans both processes
    out, stats = sharded_packed_solve(g, _solver_cfg(), mesh)
    chi2 = np.asarray(stats["chi2_robust"], np.float64)  # replicated output
    accepted = np.asarray(stats["accepted"]).astype(int)
    print(
        "WORKER_RESULT "
        + json.dumps(
            {
                "process_id": process_id,
                "process_count": jax.process_count(),
                "global_devices": n_global,
                "local_devices": n_local,
                "chi2": chi2.tolist(),
                "accepted": accepted.tolist(),
            }
        ),
        flush=True,
    )
    jax.distributed.shutdown()
    return 0


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def orchestrate(json_out: str | None) -> int:
    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "").split("--xla_force_host_platform_device_count")[0]
        + f" --xla_force_host_platform_device_count={DEVICES_PER_PROC}"
    ).strip()
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--process-id", str(i),
             "--port", str(port)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            cwd=REPO,
        )
        for i in range(N_PROCS)
    ]
    results = {}
    ok = True
    for i, p in enumerate(procs):
        try:
            out, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            p.kill()
            out, err = p.communicate()
            print(f"worker {i} TIMED OUT\n{err[-2000:]}", file=sys.stderr)
            ok = False
            continue
        if p.returncode != 0:
            print(f"worker {i} rc={p.returncode}\n{err[-2000:]}", file=sys.stderr)
            ok = False
        for line in out.splitlines():
            if line.startswith("WORKER_RESULT "):
                results[i] = json.loads(line[len("WORKER_RESULT "):])
    if not ok or len(results) != N_PROCS:
        print(json.dumps({"ok": False, "results": results}))
        return 1

    import numpy as np

    # 1) replicated outputs agree across processes (same collectives)
    c0 = np.asarray(results[0]["chi2"])
    c1 = np.asarray(results[1]["chi2"])
    xproc_equal = bool(np.array_equal(c0, c1))
    acc_equal = results[0]["accepted"] == results[1]["accepted"]

    # 2) parity vs single-process solve of the identical problem
    import jax

    jax.config.update("jax_platforms", "cpu")
    from boslam.solver.optimizer import solve_packed

    g = _build_problem()
    _, s1 = solve_packed(g, _solver_cfg())
    ref = np.asarray(s1["chi2_robust"], np.float64)
    rel = float(np.max(np.abs(c0 - ref) / np.maximum(np.abs(ref), 1e-12)))
    parity = rel < 2e-3

    record = {
        "ok": bool(xproc_equal and acc_equal and parity),
        "processes": N_PROCS,
        "devices_per_process": DEVICES_PER_PROC,
        "global_devices": results[0]["global_devices"],
        "problem": {"poses": POSES, "landmarks": LMS,
                    "loop_closures": CLOSURES, "optimizer": "lm"},
        "chi2_crossprocess_equal": xproc_equal,
        "accepted_crossprocess_equal": acc_equal,
        "chi2_vs_single_process_max_rel": rel,
        "chi2_final": float(c0[-1]),
        "chi2_final_single_process": float(ref[-1]),
    }
    print(json.dumps(record))
    if json_out:
        with open(json_out, "w") as f:
            json.dump(record, f, indent=1)
    return 0 if record["ok"] else 1


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--port", type=int, default=None)
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args()
    if args.process_id is not None:
        return worker(args.process_id, args.port)
    return orchestrate(args.json_out)


if __name__ == "__main__":
    sys.exit(main())
