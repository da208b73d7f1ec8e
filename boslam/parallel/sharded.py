"""Data-parallel bundle adjustment: edges sharded over the device mesh.

Sharding layout (SURVEY §2 "new components" table; the scaling-book recipe —
pick a mesh, annotate shardings, let XLA insert collectives):

- State (poses, landmarks) is REPLICATED: it is small relative to edges
  (3*NP + 2*NL floats) and every edge needs random access to it.
- Edge arrays (measurements, indices, per-edge Jacobian blocks) are SHARDED
  along the 1-D ``edge`` mesh axis.
- Normal-equation aggregates are computed per-shard and completed with
  ``psum`` (ring all-reduce over ICI) — replacing the reference's
  sequential accumulation loop (slam/solver.cpp:31-62).
- The (replicated) linear solve then happens identically on every device;
  the boxplus update keeps the state replicated for the next iteration.

The whole multi-iteration solve runs inside ONE ``shard_map``-ed jit: no
host round-trips, XLA schedules the collectives.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from boslam.config import SolverConfig
from boslam.graph.data import FactorGraph
from boslam.solver.optimizer import solve_loop


def _pad_to(x: jnp.ndarray, n: int, fill=0):
    pad = n - x.shape[0]
    if pad == 0:
        return x
    widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, widths, constant_values=fill)


def pad_edges(g: FactorGraph, k: int) -> FactorGraph:
    """Pad edge arrays to multiples of ``k`` with zero-information dummies.

    Padding edges carry omega = 0, so they contribute exactly nothing to
    H, b, or any chi2 statistic — shard counts stay uniform without
    affecting the math.  Dummy indices point at vertex 0 (valid gathers).
    """

    def up(n):
        return ((n + k - 1) // k) * k

    nb, no = up(g.n_bearing), up(g.n_odometry)
    return dataclasses.replace(
        g,
        b_pose=_pad_to(g.b_pose, nb),
        b_lm=_pad_to(g.b_lm, nb),
        b_meas=_pad_to(g.b_meas, nb),
        b_omega=_pad_to(g.b_omega, nb, fill=0),
        o_src=_pad_to(g.o_src, no),
        o_dst=_pad_to(g.o_dst, no),
        o_meas=_pad_to(g.o_meas, no),
        o_omega=_pad_to(g.o_omega, no, fill=0),
    )


_EDGE_FIELDS = ("b_pose", "b_lm", "b_meas", "b_omega", "o_src", "o_dst", "o_meas", "o_omega")


def _graph_specs(axis_name: str) -> FactorGraph:
    """PartitionSpec pytree for FactorGraph: edges sharded, state replicated."""
    specs = {f.name: P() for f in dataclasses.fields(FactorGraph)}
    for name in _EDGE_FIELDS:
        specs[name] = P(axis_name)
    return FactorGraph(**specs)


def shard_graph(g: FactorGraph, mesh: Mesh) -> FactorGraph:
    """Place a (padded) graph on the mesh with the canonical layout."""
    from boslam.parallel.mesh import put_sharded

    axis_name = mesh.axis_names[0]
    g = pad_edges(g, mesh.size)
    specs = _graph_specs(axis_name)
    return jax.tree.map(
        lambda x, s: put_sharded(x, NamedSharding(mesh, s)),
        g,
        specs,
    )


def make_sharded_solve(mesh: Mesh, cfg: SolverConfig):
    """Build the jitted multi-device solve: graph -> (graph', stats).

    The returned function expects a graph already padded to the mesh size
    (``shard_graph`` does both).  All per-iteration collectives are psums
    inserted by ``solve_loop(axis_name=...)``.
    """
    axis_name = mesh.axis_names[0]
    specs = _graph_specs(axis_name)

    @jax.jit
    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(specs,),
        out_specs=(specs, P()),
    )
    def _solve(graph: FactorGraph):
        return solve_loop(graph, cfg, axis_name=axis_name)

    return _solve


def sharded_solve(
    g: FactorGraph, cfg: SolverConfig, mesh: Optional[Mesh] = None
) -> tuple[FactorGraph, dict]:
    """Convenience one-shot: mesh over all devices, shard, solve."""
    if mesh is None:
        from boslam.parallel.mesh import make_mesh

        mesh = make_mesh()
    gs = shard_graph(g, mesh)
    out, stats = make_sharded_solve(mesh, cfg)(gs)
    return out, stats
