"""Where does the packed outer iteration go? build vs matvec vs precond.

Times the three phases of the packed Schur+PCG outer in isolation with
dependent-chain loops (the tunnel acks async enqueue, so each loop chains
through its own output and ends in a forced scalar materialization).

Usage: python tools/packed_split_probe.py [n_poses] [reps]
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np

from boslam.config import SolverConfig
from boslam.graph.build import build_graph
from boslam.graph.packed import pack_edges
from boslam.solver.schur import _pose_mask
from boslam.solver.schur_packed import (
    _packed_preconditioner,
    build_packed_blocks,
    packed_s_matvec,
)
from boslam.synth import generate_sequence


def chain_time(fn, x0, n=20):
    """Serial cost of fn via a scanned dependent chain."""

    @jax.jit
    def loop(x):
        def body(c, _):
            return fn(c), None

        y, _ = jax.lax.scan(body, x, None, length=n)
        return y

    y = loop(x0)
    jax.block_until_ready(y)
    best = 1e9
    for _ in range(4):
        t0 = time.perf_counter()
        _ = float(jnp.sum(jax.tree.leaves(loop(x0))[0]))
        best = min(best, (time.perf_counter() - t0) / n)
    return best


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    print(f"devices: {jax.devices()}", file=sys.stderr)
    ig, _ = generate_sequence(n, max(8, n * 2 // 5), seed=0)
    graph, _ = build_graph(ig, init="triangulate")
    pk, _ = pack_edges(graph)
    for which in ("block_jacobi", "two_level"):
        cfg = SolverConfig(
            linear_solver="schur_cg", preconditioner=which, cg_iters=8
        )
        mask = _pose_mask(graph.n_poses, graph.fixed_pose_ix, jnp.float32)

        # build (blocks + stats); chain through poses perturbation
        def build_once(g):
            blocks, _ = build_packed_blocks(g, pk, cfg, cfg.damping)
            return g.with_state(
                g.poses + 1e-12 * blocks.bp, g.landmarks
            )

        t_build = chain_time(build_once, graph, n=10)

        blocks, _ = jax.jit(
            lambda g: build_packed_blocks(g, pk, cfg, cfg.damping)
        )(graph)

        # matvec chain
        x0 = jnp.ones((graph.n_poses, 3), jnp.float32)
        mv = jax.jit(
            lambda x: packed_s_matvec(blocks, pk, x, mask)
        )
        t_mv = chain_time(lambda x: mv(x) / (1.0 + jnp.max(jnp.abs(x))), x0)

        # preconditioner factor+first apply, then apply-only chain
        def factor_apply(x):
            M = _packed_preconditioner(blocks, pk, cfg, mask)
            z = M(x) if callable(M) else jnp.einsum("pij,pj->pi", M, x)
            return z / (1.0 + jnp.max(jnp.abs(z)))

        t_factor = chain_time(factor_apply, x0, n=5)
        Mf = _packed_preconditioner(blocks, pk, cfg, mask)
        if callable(Mf):
            ap = jax.jit(lambda x: Mf(x))
        else:
            ap = jax.jit(lambda x: jnp.einsum("pij,pj->pi", Mf, x))
        t_apply = chain_time(
            lambda x: ap(x) / (1.0 + jnp.max(jnp.abs(x))), x0
        )

        print(
            f"{which:13s} n={n}: build {t_build*1e3:7.2f} ms | "
            f"matvec {t_mv*1e3:6.2f} ms | factor+apply {t_factor*1e3:7.2f} ms"
            f" | apply {t_apply*1e3:6.2f} ms"
        )


if __name__ == "__main__":
    main()
