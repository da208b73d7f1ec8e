"""Dual-packed (CSR-style) edge layout — the TPU-native large-scale form.

Motivation (measured, PERF.md): TPU gathers/scatter-adds cost ~10-16 ns per
indexed ROW regardless of width, so the flat edge layout's segment-sums
dominate large problems.  Packing edges into dense per-vertex grids turns
every reduction into a plain masked axis-sum (free) and leaves exactly one
row-gather per side:

- pose-packed:     [NP, K]  slots (K = max bearing edges per pose).  The
  pose of slot (p, k) is p — a broadcast, not a gather; only the landmark
  states are gathered.  Pose-keyed sums = sum over axis K.
- landmark-packed: [NL, K2] slots.  Landmark is broadcast; poses gathered;
  landmark-keyed sums = sum over axis K2.

Padding slots carry omega = 0 (and self-indices), contributing exactly
zero — the same trick as the shard padding.  This is SURVEY §7 hard part
#3 ("variable edges-per-landmark -> padded/bucketed batching") resolved.

Odometry: when the leading edges form a chain prefix (edge e has
src == e, dst == e + 1 — true of the reference data and the generator,
with any loop closures appended after), the coupling matvec for those
edges is a shift (jnp pad slices), zero indexed rows; the remaining
(loop-closure / reordered) edges go through a small gather + segment-sum
— odometry is O(NP) edges, a small fraction of the bearing work either
way (reference convention: framework/observation.hpp:43-47 allows
arbitrary (i, j) pose pairs, which this layout now fully supports).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from boslam.graph.data import FactorGraph
from boslam.ops.windowed_gather import WindowPlan, plan_windows


@dataclasses.dataclass
class PackedEdges:
    """Bearing edges in both packings + odometry chain classification.

    ``odometry_is_chain`` / ``chain_len`` are static (meta) fields: they
    select traced code structure (shift-based coupling vs general
    gather/scatter path).  ``chain_len`` is the length of the maximal
    LEADING chain prefix (edges 0..chain_len-1 have src == e, dst == e+1);
    edges past it (loop closures, arbitrary (i, j) pairs) take the general
    path.  ``odometry_is_chain`` <=> the prefix is the whole edge list and
    spans every pose.

    Hot-landmark splitting (``l_virt`` is not None): the landmark-packed
    grid rows are VIRTUAL rows — a landmark observed by many poses owns
    several consecutive rows of at most ``K2`` slots each, and
    ``l_virt[v]`` maps virtual row v to its landmark.  K2 then tracks a
    cap near the mean observation count instead of the max, cutting the
    padded slot work driven by a few heavily-observed landmarks; the
    landmark-keyed reductions finish with one small segment-sum over the
    ~NL virtual rows (see boslam/solver/schur_packed.py).
    """

    # pose-packed [NP, K]
    p_lm: jnp.ndarray  # i32 landmark index per slot (0 for padding)
    p_meas: jnp.ndarray  # f32 bearing
    p_omega: jnp.ndarray  # f32 information (0 = padding)
    # landmark-packed [NLV, K2] (NLV == NL when l_virt is None)
    l_pose: jnp.ndarray  # i32 pose index per slot
    l_meas: jnp.ndarray
    l_omega: jnp.ndarray
    odometry_is_chain: bool = dataclasses.field(metadata=dict(static=True))
    chain_len: int = dataclasses.field(default=0, metadata=dict(static=True))
    # Windowed-gather plans (boslam/ops/windowed_gather.py); None = plain
    # index gathers.  Useful only after landmark locality reordering
    # (boslam/graph/reorder.py) — pack_edges(windows=...) builds them.
    p_plan: Optional[WindowPlan] = None
    l_plan: Optional[WindowPlan] = None
    # i32[NLV] virtual row -> landmark (sorted ascending); None = 1:1 rows
    l_virt: Optional[jnp.ndarray] = None

    @property
    def K(self) -> int:
        return self.p_lm.shape[1]

    @property
    def K2(self) -> int:
        return self.l_pose.shape[1]


jax.tree_util.register_dataclass(
    PackedEdges,
    data_fields=["p_lm", "p_meas", "p_omega", "l_pose", "l_meas", "l_omega",
                 "p_plan", "l_plan", "l_virt"],
    meta_fields=["odometry_is_chain", "chain_len"],
)


@dataclasses.dataclass
class PackedMeta:
    odometry_is_chain: bool
    fill_pose: float  # fraction of pose-packed slots that are real edges
    fill_lm: float
    windowed: bool = False  # windowed-gather plans built for both grids
    lm_split_cap: Optional[int] = None  # K2 cap when hot landmarks split
    n_virt_rows: Optional[int] = None  # landmark-grid rows (NLV) when split


# Cost weight of one extra virtual row, in padded-slot equivalents: a row
# adds one broadcast-gather row + segment-sum rows in the build and two
# per CG matvec (~10-16 ns each, PERF.md), vs a padded slot's share of the
# grid einsums/coupling-block traffic.  Measured to be the right order on
# TPU (tools/scaling_bench.py); the optimum is flat around it.
_ROW_COST_SLOTS = 8


def _choose_split_cap(counts: np.ndarray) -> Optional[int]:
    """Pick the landmark-grid slot cap minimizing rows*(cap + row_cost).

    Returns None (no split) unless capping beats the plain [NL, max]
    layout by >15% — hot-key splitting only pays when the count
    distribution has a heavy tail (a few landmarks observed far more
    often than the mean)."""
    kmax = max(1, int(counts.max()))
    if kmax <= 8:
        return None

    def cost(cap):
        rows = int(np.maximum(1, -(-counts // cap)).sum())
        return rows * (cap + _ROW_COST_SLOTS)

    candidates = [c for c in (8, 16, 32, 64, 128, 256) if c < kmax]
    if not candidates:
        return None
    best = min(candidates, key=cost)
    return best if cost(best) < 0.85 * cost(kmax) else None


def pack_edges(
    g: FactorGraph,
    windows: bool = False,
    split_lm: "int | str | None" = "auto",
) -> tuple[PackedEdges, PackedMeta]:
    """Host-side packing (numpy; one-time at load).

    ``windows=True`` additionally plans windowed gathers for both slot
    grids (requires the caller to have locality-reordered landmarks,
    boslam/graph/reorder.py; falls back silently per grid when the index
    structure has no usable locality).

    ``split_lm``: cap on landmark-grid slots per row — landmarks observed
    more often than the cap get multiple virtual rows (PERF.md roadmap:
    K2 is driven by a few hot landmarks, leaving the grid ~1/3 full).
    "auto" picks the cap from the observation-count distribution (or
    declines to split); an int forces that cap; None/0 disables."""
    b_pose = np.asarray(g.b_pose)
    b_lm = np.asarray(g.b_lm)
    b_meas = np.asarray(g.b_meas)
    b_omega = np.asarray(g.b_omega)
    NP_, NL = g.n_poses, g.n_landmarks
    NB = len(b_pose)

    def pack(key_ix, other_ix, n_keys, cap=None):
        """Slot grids [n_rows, K] + (virt row -> key) map.

        Without a cap: one row per key, K = max count, virt = None (the
        row index IS the key).  With cap < max count: key k owns
        ceil(count_k / K) consecutive rows; an edge of rank r within its
        key's segment lands at (row_start[k] + r // K, r % K)."""
        counts = np.bincount(key_ix, minlength=n_keys)
        kmax = max(1, int(counts.max()))
        K = kmax if cap is None else max(1, min(int(cap), kmax))
        v = np.maximum(1, -(-counts // K))  # rows per key (ceil)
        row_start = np.zeros(n_keys + 1, np.int64)
        np.cumsum(v, out=row_start[1:])
        n_rows = int(row_start[-1])
        slot_other = np.zeros((n_rows, K), np.int32)
        slot_meas = np.zeros((n_rows, K), np.float32)
        slot_omega = np.zeros((n_rows, K), np.float32)
        # vectorized slot assignment: stable-sort by key, then the slot of
        # an edge is its rank within its segment
        order = np.argsort(key_ix, kind="stable")
        sk = key_ix[order]
        seg_start = np.zeros(n_keys, np.int64)
        np.cumsum(counts[:-1], out=seg_start[1:])
        rank = np.arange(NB, dtype=np.int64) - seg_start[sk]
        rows = row_start[sk] + rank // K
        slot_other[rows, rank % K] = other_ix[order]
        slot_meas[rows, rank % K] = b_meas[order]
        slot_omega[rows, rank % K] = b_omega[order]
        virt = None
        if K < kmax:
            virt = np.repeat(np.arange(n_keys, dtype=np.int32), v)
        return slot_other, slot_meas, slot_omega, K, virt

    p_lm, p_meas, p_omega, K, _ = pack(b_pose, b_lm, NP_)
    lm_cap = split_lm
    if split_lm == "auto":
        lm_cap = _choose_split_cap(np.bincount(b_lm, minlength=NL)) if NB else None
    elif not split_lm:
        lm_cap = None
    l_pose, l_meas, l_omega, K2, l_virt = pack(b_lm, b_pose, NL, lm_cap)

    o_src = np.asarray(g.o_src)
    o_dst = np.asarray(g.o_dst)
    # Maximal leading chain prefix: edges 0..c-1 with src == e, dst == e+1.
    is_chain_edge = (o_src == np.arange(len(o_src))) & (o_dst == o_src + 1)
    chain_len = int(np.argmin(is_chain_edge)) if not is_chain_edge.all() else len(o_src)
    chain = chain_len == len(o_src) == NP_ - 1

    p_plan = l_plan = None
    if windows:
        p_plan = plan_windows(p_lm, p_omega > 0, NL)
        l_plan = plan_windows(l_pose, l_omega > 0, NP_)

    packed = PackedEdges(
        p_lm=jnp.asarray(p_lm),
        p_meas=jnp.asarray(p_meas),
        p_omega=jnp.asarray(p_omega),
        l_pose=jnp.asarray(l_pose),
        l_meas=jnp.asarray(l_meas),
        l_omega=jnp.asarray(l_omega),
        odometry_is_chain=bool(chain),
        chain_len=chain_len,
        p_plan=p_plan,
        l_plan=l_plan,
        l_virt=jnp.asarray(l_virt) if l_virt is not None else None,
    )
    meta = PackedMeta(
        odometry_is_chain=bool(chain),
        fill_pose=NB / max(1, NP_ * K),
        fill_lm=NB / max(1, l_pose.shape[0] * K2),
        windowed=p_plan is not None and l_plan is not None,
        lm_split_cap=None if l_virt is None else int(K2),
        n_virt_rows=None if l_virt is None else int(l_pose.shape[0]),
    )
    return packed, meta
