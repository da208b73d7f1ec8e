"""Data-parallel PACKED bundle adjustment — the scale path on a mesh.

Composes the two round-1 capabilities that previously didn't compose
(the dual-packed layout of boslam/graph/packed.py and the edge sharding of
boslam/parallel/sharded.py) into the BASELINE.json config-5 configuration:
100k-pose problems, Schur + PCG, reduced system accumulated with psum over
ICI.

Sharding layout (the scaling-book recipe — pick a mesh, annotate
shardings, let XLA insert collectives):

- State (poses, landmarks) and the CG iterate are REPLICATED — small
  relative to the slot grids, and every slot needs random access to them.
- The pose-packed slot grid  [NP, K]  is sharded along its SLOT axis K:
  every device holds K/D slots of every pose, so the per-pose axis-sum
  becomes a local partial + one psum.  Likewise [NL, K2] along K2.
- Odometry edges are sharded along the edge axis; couplings go through
  the general gather/segment-sum path with global pose indices.
- Per CG matvec exactly two psums complete the reduced-system products
  (see schur_packed.packed_s_matvec) — the all-reduce of BASELINE.json
  config 5, riding ICI ring reductions.

The whole multi-iteration solve runs inside ONE ``shard_map``-ed jit.
Parity with the single-device packed path is asserted (relative-error
bounds) in tests/test_sharded_packed.py.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from boslam.config import SolverConfig
from boslam.graph.data import FactorGraph
from boslam.graph.packed import PackedEdges, pack_edges
from boslam.parallel.sharded import _graph_specs, pad_edges


def pad_packed(pk: PackedEdges, k: int) -> PackedEdges:
    """Pad both slot axes (K, K2) up to multiples of ``k``.

    Padding slots carry omega = 0 and index 0 — they contribute exactly
    zero, the same trick as the flat edge padding.
    """

    def up(n):
        return max(k, ((n + k - 1) // k) * k)

    def pad_axis1(x, n):
        return jnp.pad(x, ((0, 0), (0, n - x.shape[1])))

    K, K2 = up(pk.p_lm.shape[1]), up(pk.l_pose.shape[1])
    return dataclasses.replace(
        pk,
        p_lm=pad_axis1(pk.p_lm, K),
        p_meas=pad_axis1(pk.p_meas, K),
        p_omega=pad_axis1(pk.p_omega, K),
        l_pose=pad_axis1(pk.l_pose, K2),
        l_meas=pad_axis1(pk.l_meas, K2),
        l_omega=pad_axis1(pk.l_omega, K2),
    )


def _packed_specs(pk: PackedEdges, axis_name: str) -> PackedEdges:
    """PartitionSpec pytree: slot grids sharded along their slot axes.

    The virtual-row -> landmark map (hot-landmark splitting) is replicated
    — it is i32[NLV], tiny next to the grids it indexes."""
    s = P(None, axis_name)
    return PackedEdges(
        p_lm=s, p_meas=s, p_omega=s,
        l_pose=s, l_meas=s, l_omega=s,
        odometry_is_chain=pk.odometry_is_chain,
        chain_len=pk.chain_len,
        l_virt=None if pk.l_virt is None else P(None),
    )


def shard_packed(
    g: FactorGraph, pk: PackedEdges, mesh: Mesh
) -> tuple[FactorGraph, PackedEdges]:
    """Place (graph, packed edges) on the mesh with the canonical layout."""
    from boslam.parallel.mesh import put_sharded

    axis_name = mesh.axis_names[0]
    g = pad_edges(g, mesh.size)
    pk = pad_packed(pk, mesh.size)
    gs = jax.tree.map(
        lambda x, s: put_sharded(x, NamedSharding(mesh, s)),
        g,
        _graph_specs(axis_name),
    )
    pks = jax.tree.map(
        lambda x, s: put_sharded(x, NamedSharding(mesh, s)),
        pk,
        _packed_specs(pk, axis_name),
    )
    return gs, pks


def make_sharded_packed_solve(
    mesh: Mesh,
    cfg: SolverConfig,
    pk_template: PackedEdges,
    lam0: Optional[float] = None,
    dp0=None,
):
    """Build the jitted multi-device packed solve: (graph, pk) -> (graph', stats).

    ``pk_template`` only supplies the static fields (chain classification)
    for the spec pytree; pass the actual sharded arrays at call time.
    Dispatches GN or LM through packed_solve_loop — LM's accept/reject
    cost test psums across the shards (VERDICT r2 #1).  ``lam0``/``dp0``
    restore LM damping / the CG warm-start delta on resume (both
    replicated; ``stats["dp_final"]`` carries the outgoing delta).
    """
    from boslam.solver.optimizer import packed_solve_loop

    axis_name = mesh.axis_names[0]
    gspecs = _graph_specs(axis_name)
    pspecs = _packed_specs(pk_template, axis_name)

    @jax.jit
    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(gspecs, pspecs),
        out_specs=(gspecs, P()),
    )
    def _solve(graph: FactorGraph, pk: PackedEdges):
        l0 = None if lam0 is None else jnp.asarray(lam0, graph.poses.dtype)
        d0 = None if dp0 is None else jnp.asarray(dp0, graph.poses.dtype)
        return packed_solve_loop(
            graph, pk, cfg, axis_name=axis_name, lam0=l0, dp0=d0
        )

    return _solve


def sharded_packed_solve(
    g: FactorGraph,
    cfg: SolverConfig,
    mesh: Optional[Mesh] = None,
    lam0: Optional[float] = None,
    dp0=None,
) -> tuple[FactorGraph, dict]:
    """Convenience one-shot: pack, mesh over all devices, shard, solve."""
    if mesh is None:
        from boslam.parallel.mesh import make_mesh

        mesh = make_mesh()
    pk, _ = pack_edges(g, split_lm=cfg.lm_split)
    gs, pks = shard_packed(g, pk, mesh)
    out, stats = make_sharded_packed_solve(mesh, cfg, pks, lam0=lam0, dp0=dp0)(
        gs, pks
    )
    return out, stats
