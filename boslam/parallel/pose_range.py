"""Pose-range sharding — state AND reduced system sharded (VERDICT r3 #4).

The edge-sharded layouts (parallel/sharded*.py) replicate the state, the
assembled per-vertex blocks, and every CG vector on all devices; only the
slot WORK is 1/D.  That is the honest ceiling PERF.md names at 10M+
poses.  This module shards the problem by RANGE instead:

- device d owns poses [d*NPd, (d+1)*NPd): its state rows, its pose-packed
  grid rows [NPd, K], Hpp_diag, bp, the CG iterate, and the delta;
- device d owns landmarks [d*NLd, (d+1)*NLd): state rows, landmark-packed
  grid rows [NLd, K2], Hll_inv, bl.

Why this layout needs so few collectives: in the dual-packed layout
(graph/packed.py) EVERY bearing edge of pose p lives in p's pose-grid
row, and every observation of landmark l in l's landmark-grid row.  So
with range partitioning, the per-vertex reductions (Hpp_diag, Hll, bp,
bl, z = Hlp x, y_corr = Hpl w) are FULLY LOCAL — no psum at all.  The
cross-vertex reads go through two all-gathers:

    per CG matvec:    xg = all_gather(x)   [12*NP bytes over ICI]
                      wg = all_gather(w)   [8*NL bytes]
    per outer build:  all_gather(poses), all_gather(landmarks),
                      all_gather(Hll_inv)  (preconditioner + rhs)

— the same order of ICI traffic as the edge-sharded layout's two psums
(a psum is an all-reduce ~= 2x an all-gather's bytes), but with per-
device argument memory ~1/D (measured via compiled memory_analysis in
tests/test_pose_range.py).

Odometry: the chain band (src == e, dst == e+1 — slam/solver.cpp:48-62's
dominant topology) is handled with a ONE-EDGE HALO: device d holds chain
edges [d*NPd - 1, d*NPd + NPd) (the boundary edge duplicated), so both
the src-side and dst-side contributions of every edge land on locally
owned pose rows — the halo exchange of the PERF.md:355-363 design, done
as static edge replication + the already-gathered xg instead of a
runtime ppermute.  Each edge's chi2 / H_ss is counted on its src owner
(halo copies contribute only the dst-side H_dd), so nothing double
counts.  Non-chain edges (loop closures, framework/observation.hpp:43-47)
are sharded by edge and their scattered contributions completed with one
psum_scatter into the owner rows.

Hot-landmark splitting (l_virt) is disabled on this path for now: a
landmark's virtual rows could straddle a device boundary, which would
break the locality invariant above.  Preconditioners: block-Jacobi
(diag(S) is pose-local) and, since r5, the two-level chain scheme with a
REPLICATED factor (_range_two_level — the coarse chain is tiny, so the
masked diag + halo band are all-gathered once per build and each apply
adds one residual all-gather).

Parity with the single-device packed solver is asserted on the 8-device
virtual CPU mesh in tests/test_pose_range.py; __graft_entry__'s
dryrun_multichip exercises this path.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from boslam.config import SolverConfig
from boslam.geometry.se2 import boxplus_state
from boslam.solver import residuals as R
from boslam.solver.robust import robust_cost, robust_weights
from boslam.solver.schur import _inv2x2, _inv3x3, pcg


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class RangeShards:
    """Device-side range-sharded problem (all arrays sharded on axis 0
    over the 1-D mesh except ``fixed_pose_ix``, which is replicated)."""

    poses: jnp.ndarray  # f32[NPp, 3]
    landmarks: jnp.ndarray  # f32[NLp, 2]
    p_lm: jnp.ndarray  # i32[NPp, K] global landmark index
    p_meas: jnp.ndarray  # f32[NPp, K]
    p_omega: jnp.ndarray  # f32[NPp, K] (0 = padding)
    l_pose: jnp.ndarray  # i32[NLp, K2] global pose index
    l_meas: jnp.ndarray  # f32[NLp, K2]
    l_omega: jnp.ndarray  # f32[NLp, K2]
    # halo chain arrays [D*(NPd+1), ...]: device d's row j is global chain
    # edge e = d*NPd - 1 + j (omega zeroed where e is out of range / pad)
    oh_meas: jnp.ndarray  # f32[D*(NPd+1), 3]
    oh_omega: jnp.ndarray  # f32[D*(NPd+1), 3, 3]
    # non-chain (loop-closure) odometry edges, sharded by edge
    os_src: jnp.ndarray  # i32[Es]
    os_dst: jnp.ndarray  # i32[Es]
    os_meas: jnp.ndarray  # f32[Es, 3]
    os_omega: jnp.ndarray  # f32[Es, 3, 3]
    fixed_pose_ix: jnp.ndarray  # i32 scalar (replicated)

    def with_state(self, poses, landmarks) -> "RangeShards":
        return dataclasses.replace(self, poses=poses, landmarks=landmarks)


@dataclasses.dataclass(frozen=True)
class RangeMeta:
    """Static host-side facts about the sharded problem."""

    n_poses: int  # real pose count (pre-padding)
    n_landmarks: int
    np_pad: int  # NPp = D * NPd
    nl_pad: int
    n_devices: int
    has_suffix: bool  # any non-chain odometry edges


class RangeBlocks(NamedTuple):
    Hpp_diag: jnp.ndarray  # [NPd, 3, 3] local pose rows
    Hll_inv: jnp.ndarray  # [NLd, 2, 2] local landmark rows
    Bp: jnp.ndarray  # [NPd, K, 3, 2]
    Bl: jnp.ndarray  # [NLd, K2, 3, 2]
    bp: jnp.ndarray  # [NPd, 3]
    bl: jnp.ndarray  # [NLd, 2]
    Ho: jnp.ndarray  # [NPd+1, 3, 3] halo chain couplings
    Ho_s: jnp.ndarray  # [Es_local, 3, 3] suffix couplings


# ---------------------------------------------------------------------------
# Host-side preparation
# ---------------------------------------------------------------------------


def prepare_pose_range(graph, mesh: Mesh):
    """Pack, pad, halo-replicate, and place the problem on the mesh.

    Returns (RangeShards on device, RangeMeta).
    """
    from boslam.graph.packed import pack_edges
    from boslam.parallel.mesh import put_sharded

    D = mesh.size
    axis = mesh.axis_names[0]
    pk, _ = pack_edges(graph, split_lm=0)  # no virtual rows (see module doc)

    NP_, NL = graph.n_poses, graph.n_landmarks
    NPd = -(-NP_ // D)
    NLd = -(-NL // D)
    NPp, NLp = D * NPd, D * NLd

    def pad0(x, n):
        w = [(0, n - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
        return np.pad(np.asarray(x), w)

    poses = pad0(graph.poses, NPp)
    landmarks = pad0(graph.landmarks, NLp)
    p_lm = pad0(pk.p_lm, NPp)
    p_meas = pad0(pk.p_meas, NPp)
    p_omega = pad0(pk.p_omega, NPp)
    l_pose = pad0(pk.l_pose, NLp)
    l_meas = pad0(pk.l_meas, NLp)
    l_omega = pad0(pk.l_omega, NLp)

    # --- halo chain arrays: device d row j <- global chain edge d*NPd-1+j
    nc = pk.chain_len
    o_meas = np.asarray(graph.o_meas)
    o_omega = np.asarray(graph.o_omega)
    oh_meas = np.zeros((D, NPd + 1, 3), np.float32)
    oh_omega = np.zeros((D, NPd + 1, 3, 3), np.float32)
    for d in range(D):
        e = np.arange(NPd + 1) + d * NPd - 1  # global edge ids
        valid = (e >= 0) & (e < nc)
        oh_meas[d, valid] = o_meas[e[valid]]
        oh_omega[d, valid] = o_omega[e[valid]]
    oh_meas = oh_meas.reshape(D * (NPd + 1), 3)
    oh_omega = oh_omega.reshape(D * (NPd + 1), 3, 3)

    # --- suffix (non-chain) edges, padded to a multiple of D
    NO = graph.n_odometry
    has_suffix = nc < NO
    ns = NO - nc if has_suffix else 0
    ns_pad = D * max(1, -(-ns // D)) if has_suffix else D
    os_src = np.zeros(ns_pad, np.int32)
    os_dst = np.zeros(ns_pad, np.int32)
    os_meas = np.zeros((ns_pad, 3), np.float32)
    os_omega = np.zeros((ns_pad, 3, 3), np.float32)
    if has_suffix:
        os_src[:ns] = np.asarray(graph.o_src)[nc:]
        os_dst[:ns] = np.asarray(graph.o_dst)[nc:]
        os_meas[:ns] = o_meas[nc:]
        os_omega[:ns] = o_omega[nc:]

    sh = RangeShards(
        poses=poses, landmarks=landmarks,
        p_lm=p_lm.astype(np.int32), p_meas=p_meas, p_omega=p_omega,
        l_pose=l_pose.astype(np.int32), l_meas=l_meas, l_omega=l_omega,
        oh_meas=oh_meas, oh_omega=oh_omega,
        os_src=os_src, os_dst=os_dst, os_meas=os_meas, os_omega=os_omega,
        fixed_pose_ix=np.asarray(graph.fixed_pose_ix, np.int32),
    )
    specs = range_specs(axis)
    sh = jax.tree.map(
        lambda x, s: put_sharded(jnp.asarray(x), NamedSharding(mesh, s)),
        sh, specs,
    )
    meta = RangeMeta(
        n_poses=NP_, n_landmarks=NL, np_pad=NPp, nl_pad=NLp,
        n_devices=D, has_suffix=bool(has_suffix),
    )
    return sh, meta


def range_specs(axis: str) -> RangeShards:
    s = P(axis)
    return RangeShards(
        poses=s, landmarks=s, p_lm=s, p_meas=s, p_omega=s,
        l_pose=s, l_meas=s, l_omega=s, oh_meas=s, oh_omega=s,
        os_src=s, os_dst=s, os_meas=s, os_omega=s,
        fixed_pose_ix=P(),
    )


# ---------------------------------------------------------------------------
# Device-side math (runs inside shard_map; arrays are LOCAL shards)
# ---------------------------------------------------------------------------


def _gather_all(x, axis):
    return jax.lax.all_gather(x, axis, tiled=True)


def _local_mask(sh: RangeShards, meta: RangeMeta, axis) -> jnp.ndarray:
    """f32[NPd, 1]: 0 on the gauge pose AND the padding rows."""
    NPd = sh.poses.shape[0]
    start = jax.lax.axis_index(axis) * NPd
    ids = start + jnp.arange(NPd)
    live = (ids != sh.fixed_pose_ix) & (ids < meta.n_poses)
    return live.astype(sh.poses.dtype)[:, None]


def _odo_terms(src_p, dst_p, meas, omega, cfg, kt=None):
    """Shared odometry edge math from pre-gathered endpoint poses."""
    oe = R.odometry_error_from(src_p, dst_p, meas)
    ojs, ojd = R.odometry_jacobians_from(src_p, dst_p)
    ochi2 = jnp.einsum("ei,eij,ej->e", oe, omega, oe)
    owH, owb = robust_weights(ochi2, cfg, kt)
    Om = omega * owH[:, None, None]
    OmJs = jnp.einsum("eij,ejk->eik", Om, ojs)
    OmJd = jnp.einsum("eij,ejk->eik", Om, ojd)
    H_ss = jnp.einsum("eij,eik->ejk", ojs, OmJs)
    H_dd = jnp.einsum("eij,eik->ejk", ojd, OmJd)
    H_sd = jnp.einsum("eij,eik->ejk", ojs, OmJd)
    e_w = (omega @ (owb[:, None] * oe)[..., None])[..., 0]
    bp_s = jnp.einsum("eij,ei->ej", ojs, e_w)
    bp_d = jnp.einsum("eij,ei->ej", ojd, e_w)
    return ochi2, H_ss, H_dd, H_sd, bp_s, bp_d


def _range_build(sh: RangeShards, cfg, damping, meta: RangeMeta, axis, kt=None):
    """Assemble the local blocks.  Collectives: all_gather(poses),
    all_gather(landmarks), and (suffix only) one psum_scatter."""
    from boslam.solver.schur_packed import _bearing_slot_terms

    dtype = sh.poses.dtype
    NPd = sh.poses.shape[0]
    damping = jnp.asarray(damping, dtype)
    pg = _gather_all(sh.poses, axis)  # [NPp, 3]
    lg = _gather_all(sh.landmarks, axis)  # [NLp, 2]

    # ---- pose-packed pass (local rows; landmarks gathered) ----
    p_slot = jnp.broadcast_to(sh.poses[:, None, :], (NPd, sh.p_lm.shape[1], 3))
    l_slot = lg[sh.p_lm]
    (_be, bchi2, Hpp_b, _Hll, Bp, bp_b, _bl) = _bearing_slot_terms(
        p_slot, l_slot, sh.p_meas, sh.p_omega, cfg, kt
    )
    Hpp_diag = jnp.sum(Hpp_b, axis=1)
    bp = jnp.sum(bp_b, axis=1)

    # ---- landmark-packed pass (local rows; poses gathered) ----
    NLd = sh.landmarks.shape[0]
    l_slot2 = jnp.broadcast_to(
        sh.landmarks[:, None, :], (NLd, sh.l_pose.shape[1], 2)
    )
    p_slot2 = pg[sh.l_pose]
    (_be2, _bchi22, _Hpp2, Hll_b, Bl, _bp2, bl_b) = _bearing_slot_terms(
        p_slot2, l_slot2, sh.l_meas, sh.l_omega, cfg, kt
    )
    Hll = jnp.sum(Hll_b, axis=1)
    bl = jnp.sum(bl_b, axis=1)

    # ---- halo chain odometry ----
    start = jax.lax.axis_index(axis) * NPd
    j = jnp.arange(NPd + 1)
    src_ix = jnp.clip(start - 1 + j, 0, meta.np_pad - 1)
    dst_ix = jnp.clip(start + j, 0, meta.np_pad - 1)
    ochi2, H_ss, H_dd, H_sd, bp_s, bp_d = _odo_terms(
        pg[src_ix], pg[dst_ix], sh.oh_meas, sh.oh_omega, cfg, kt
    )
    # src-side contributions: rows j=1..NPd -> local pose row j-1
    Hpp_diag = Hpp_diag + H_ss[1:]
    bp = bp + bp_s[1:]
    # dst-side contributions: rows j=0..NPd-1 -> local pose row j
    Hpp_diag = Hpp_diag + H_dd[:-1]
    bp = bp + bp_d[:-1]
    ktv = cfg.kernel_threshold if kt is None else kt
    chi2_odo = jnp.sum(ochi2[1:])  # each edge counted once (src owner)
    n_odo_clamped = jnp.sum(ochi2[1:] > ktv)

    # ---- suffix (loop-closure) odometry: general path + psum_scatter ----
    Ho_s = jnp.zeros((sh.os_src.shape[0], 3, 3), dtype)
    if meta.has_suffix:
        schi2, sH_ss, sH_dd, sH_sd, sbp_s, sbp_d = _odo_terms(
            pg[sh.os_src], pg[sh.os_dst], sh.os_meas, sh.os_omega, cfg, kt
        )
        Ho_s = sH_sd
        idx = jnp.concatenate([sh.os_src, sh.os_dst])
        payload = jnp.concatenate(
            [
                jnp.concatenate([sH_ss.reshape(-1, 9), sbp_s], axis=1),
                jnp.concatenate([sH_dd.reshape(-1, 9), sbp_d], axis=1),
            ],
            axis=0,
        )
        sums = jax.ops.segment_sum(payload, idx, num_segments=meta.np_pad)
        local = jax.lax.psum_scatter(
            sums, axis, scatter_dimension=0, tiled=True
        )
        Hpp_diag = Hpp_diag + local[:, :9].reshape(NPd, 3, 3)
        bp = bp + local[:, 9:12]
        chi2_odo = chi2_odo + jnp.sum(schi2)
        n_odo_clamped = n_odo_clamped + jnp.sum(schi2 > ktv)

    stats = {
        "chi2_bearing": jax.lax.psum(jnp.sum(bchi2), axis),
        "chi2_odometry": jax.lax.psum(chi2_odo, axis),
        "chi2_robust": jax.lax.psum(
            jnp.sum(robust_cost(bchi2, cfg, kt) * (sh.p_omega > 0))
            + jnp.sum(robust_cost(ochi2[1:], cfg, kt) * (ochi2[1:] > 0)),
            axis,
        ),
        "n_bearing_clamped": jax.lax.psum(
            jnp.sum(bchi2 > ktv), axis
        ),
        "n_odometry_clamped": jax.lax.psum(n_odo_clamped, axis),
    }
    if meta.has_suffix:
        stats["chi2_robust"] = stats["chi2_robust"] + jax.lax.psum(
            jnp.sum(robust_cost(schi2, cfg, kt) * (schi2 > 0)), axis
        )

    eye3 = jnp.eye(3, dtype=dtype)
    eye2 = jnp.eye(2, dtype=dtype)
    Hpp_diag = Hpp_diag + damping * eye3
    Hll_inv = _inv2x2(Hll + damping * eye2)
    blocks = RangeBlocks(Hpp_diag, Hll_inv, Bp, Bl, bp, bl, H_sd, Ho_s)
    return blocks, stats


def _range_matvec(blocks, sh, x_local, mask, meta, axis):
    """y = S_masked @ x on the range layout.

    Collectives: all_gather(x), all_gather(w) (+ psum_scatter with loop
    closures).  Everything else is local by the locality invariant.
    """
    xm = x_local * mask
    xg = _gather_all(xm, axis)  # [NPp, 3]

    # z = Hlp x: local landmark rows, fully local after the gather
    z = jnp.einsum("lkij,lki->lj", blocks.Bl, xg[sh.l_pose])
    w = jnp.einsum("lij,lj->li", blocks.Hll_inv, z)
    wg = _gather_all(w, axis)  # [NLp, 2]

    # y_corr = Hpl w: local pose rows
    y_corr = jnp.einsum("pkij,pkj->pi", blocks.Bp, wg[sh.p_lm])

    # odometry chain via halo rows (all indices resolved through xg)
    NPd = x_local.shape[0]
    start = jax.lax.axis_index(axis) * NPd
    j = jnp.arange(NPd + 1)
    x_dst = xg[jnp.clip(start + j, 0, meta.np_pad - 1)]  # [NPd+1, 3]
    x_src = xg[jnp.clip(start - 1 + j, 0, meta.np_pad - 1)]
    y_sd = jnp.einsum("eij,ej->ei", blocks.Ho, x_dst)[1:]  # -> src row j-1
    y_ds = jnp.einsum("eji,ej->ei", blocks.Ho, x_src)[:-1]  # -> dst row j
    y = jnp.einsum("pij,pj->pi", blocks.Hpp_diag, xm) + y_sd + y_ds - y_corr

    if meta.has_suffix:
        xs = xg[jnp.concatenate([sh.os_dst, sh.os_src])]
        m = sh.os_src.shape[0]
        ys_sd = jnp.einsum("eij,ej->ei", blocks.Ho_s, xs[:m])
        ys_ds = jnp.einsum("eji,ej->ei", blocks.Ho_s, xs[m:])
        scat = jax.ops.segment_sum(
            jnp.concatenate([ys_sd, ys_ds]),
            jnp.concatenate([sh.os_src, sh.os_dst]),
            num_segments=meta.np_pad,
        )
        y = y + jax.lax.psum_scatter(
            scat, axis, scatter_dimension=0, tiled=True
        )
    return y * mask + x_local * (1.0 - mask)


def _range_s_diag(blocks, sh, axis):
    """Exact local diag(S) rows for block-Jacobi (one Hll_inv gather)."""
    Hinv_g = _gather_all(blocks.Hll_inv, axis)[sh.p_lm]  # [NPd, K, 2, 2]
    corr = jnp.einsum(
        "pkij,pkjl,pkml->pim", blocks.Bp, Hinv_g, blocks.Bp
    )
    return blocks.Hpp_diag - corr


def _range_two_level(blocks, sh, d_local, mask, meta, axis, cfg):
    """Distributed two-level chain preconditioner (VERDICT r4 #4).

    The coarse chain is tiny (NP/q aggregates), so the factor is built
    REPLICATED: all-gather the masked diag(S) rows and the halo chain
    band (the per-device rows j=0..NPd-1 of blocks.Ho are exactly the
    global band rows start..start+NPd-1), factor once per build, and per
    apply all-gather the residual, solve replicated, slice the local
    rows.  Costs one extra all-gather per apply (~12*NP bytes) on top of
    block-Jacobi — the quality/wall tradeoff is the same as the
    replicated layout's (solver/two_level.py).
    """
    from boslam.solver.two_level import two_level_factor, two_level_solve

    NP_ = meta.np_pad
    NPd = d_local.shape[0]
    dg = _gather_all(d_local, axis)  # [NPp, 3, 3] (masked by caller)
    # halo row j holds global chain edge start-1+j, so local band rows
    # (edges start..start+NPd-1) are halo rows 1..NPd
    band_local = blocks.Ho[1:]
    bandg = _gather_all(band_local, axis)[: NP_ - 1]
    mg = _gather_all(mask, axis)  # [NPp, 1]
    bandg = bandg * (mg[:-1, :, None] * mg[1:, :, None])
    q = int(cfg.coarse_q) or max(8, min(128, 1 << (NP_.bit_length() // 2)))
    factor = two_level_factor(dg, bandg, q, mg, cycle=cfg.two_level_cycle)
    start = jax.lax.axis_index(axis) * NPd

    def apply_m(r):
        rg = _gather_all(r, axis)
        z = two_level_solve(factor, rg)
        return jax.lax.dynamic_slice_in_dim(z, start, NPd, 0)

    return apply_m


def range_build_and_solve(
    sh: RangeShards, cfg, damping, meta: RangeMeta, axis, x0=None, kt=None
):
    """Full linear solve on the range layout (mirrors
    schur_packed_build_and_solve; block-Jacobi preconditioner)."""
    blocks, stats = _range_build(sh, cfg, damping, meta, axis, kt)
    mask = _local_mask(sh, meta, axis)

    w0 = jnp.einsum("lij,lj->li", blocks.Hll_inv, blocks.bl)
    w0g = _gather_all(w0, axis)
    corr = jnp.einsum("pkij,pkj->pi", blocks.Bp, w0g[sh.p_lm])
    rhs = (-blocks.bp + corr) * mask

    eye3 = jnp.eye(3, dtype=sh.poses.dtype)
    d = _range_s_diag(blocks, sh, axis)
    d = mask[..., None] * d + (1.0 - mask[..., None]) * eye3
    if cfg.preconditioner == "two_level":
        precond = _range_two_level(blocks, sh, d, mask, meta, axis, cfg)
    else:
        precond = _inv3x3(d)

    matvec = lambda x: _range_matvec(blocks, sh, x, mask, meta, axis)
    if x0 is not None:
        x0 = x0 * mask
    dp, n_iters, rel_res2, breakdown = pcg(
        matvec, rhs, precond, cfg.cg_iters, cfg.cg_tol, x0, axis_name=axis,
        restarts=cfg.cg_restarts,
    )
    dp = dp * mask

    dpg = _gather_all(dp, axis)
    hlp_dp = jnp.einsum("lkij,lki->lj", blocks.Bl, dpg[sh.l_pose])
    dl = jnp.einsum("lij,lj->li", blocks.Hll_inv, -blocks.bl - hlp_dp)

    bad = jnp.logical_or(jnp.any(jnp.isnan(dp)), jnp.any(jnp.isnan(dl)))
    ok = jnp.logical_not(jax.lax.pmax(bad.astype(jnp.int32), axis) > 0)
    dp = jnp.where(ok, dp, jnp.zeros_like(dp))
    dl = jnp.where(ok, dl, jnp.zeros_like(dl))
    stats["cg_iters"] = n_iters
    stats["cg_rel_res2"] = rel_res2
    stats["cg_breakdown"] = breakdown
    stats["cg_tol_effective"] = jnp.asarray(cfg.cg_tol, jnp.float32)
    return dp, dl, stats, ok


def _range_robust_total(sh, cfg, meta, axis, kt=None):
    """Total robust cost on the range layout (one psum)."""
    NPd = sh.poses.shape[0]
    pg = _gather_all(sh.poses, axis)
    lg = _gather_all(sh.landmarks, axis)
    p_slot = jnp.broadcast_to(sh.poses[:, None, :], (NPd, sh.p_lm.shape[1], 3))
    err = R.bearing_error_from(p_slot, lg[sh.p_lm], sh.p_meas)
    bchi2 = sh.p_omega * err * err
    start = jax.lax.axis_index(axis) * NPd
    j = jnp.arange(NPd + 1)
    oe = R.odometry_error_from(
        pg[jnp.clip(start - 1 + j, 0, meta.np_pad - 1)],
        pg[jnp.clip(start + j, 0, meta.np_pad - 1)],
        sh.oh_meas,
    )
    ochi2 = jnp.einsum("ei,eij,ej->e", oe, sh.oh_omega, oe)[1:]
    total = jnp.sum(robust_cost(bchi2, cfg, kt) * (sh.p_omega > 0)) + jnp.sum(
        robust_cost(ochi2, cfg, kt) * (ochi2 > 0)
    )
    if meta.has_suffix:
        oes = R.odometry_error_from(
            pg[sh.os_src], pg[sh.os_dst], sh.os_meas
        )
        schi2 = jnp.einsum("ei,eij,ej->e", oes, sh.os_omega, oes)
        total = total + jnp.sum(robust_cost(schi2, cfg, kt) * (schi2 > 0))
    return jax.lax.psum(total, axis)


def range_gn_step(sh, cfg, meta, axis, dp_prev=None, kt=None):
    x0 = dp_prev if cfg.cg_warm_start else None
    dp, dl, stats, ok = range_build_and_solve(
        sh, cfg, cfg.damping, meta, axis, x0, kt
    )
    poses, landmarks = boxplus_state(sh.poses, sh.landmarks, dp, dl)
    stats = dict(stats)
    stats["spd_ok"] = ok
    stats["accepted"] = jnp.asarray(True)
    stats["damping"] = jnp.asarray(cfg.damping, sh.poses.dtype)
    stats["delta_norm"] = jnp.sqrt(
        jax.lax.psum(jnp.sum(dp * dp) + jnp.sum(dl * dl), axis)
    )
    return sh.with_state(poses, landmarks), stats, dp


def range_lm_step(sh, cfg, meta, axis, lam, dp_prev=None, kt=None):
    x0 = dp_prev if cfg.cg_warm_start else None
    dp, dl, stats, ok = range_build_and_solve(
        sh, cfg, lam, meta, axis, x0, kt
    )
    cand_poses, cand_landmarks = boxplus_state(sh.poses, sh.landmarks, dp, dl)
    cand = sh.with_state(cand_poses, cand_landmarks)
    cost_old = stats["chi2_robust"]
    cost_new = _range_robust_total(cand, cfg, meta, axis, kt)
    accept = jnp.logical_and(cost_new < cost_old, ok)

    poses = jnp.where(accept, cand.poses, sh.poses)
    landmarks = jnp.where(accept, cand.landmarks, sh.landmarks)
    new_lam = jnp.where(
        accept,
        jnp.maximum(lam * cfg.lm_down, cfg.lm_lambda_min),
        jnp.minimum(lam * cfg.lm_up, cfg.lm_lambda_max),
    )
    stats = dict(stats)
    stats["spd_ok"] = ok
    stats["accepted"] = accept
    stats["damping"] = jnp.asarray(lam, sh.poses.dtype)
    stats["delta_norm"] = jnp.sqrt(
        jax.lax.psum(jnp.sum(dp * dp) + jnp.sum(dl * dl), axis)
    )
    dp_next = jnp.where(accept, dp, jnp.zeros_like(dp))
    return sh.with_state(poses, landmarks), new_lam, stats, dp_next


def range_solve_loop(sh, cfg, meta, axis, lam0=None, dp0=None):
    """Scan cfg.iters GN or LM steps on the range layout.

    Returns (final shards, stats, dp_final) — ``dp_final`` is the SHARDED
    last outer delta (P(axis) out-spec, unlike the replicated stats).
    """
    if dp0 is None:
        dp0 = jnp.zeros_like(sh.poses)
    xs = jnp.arange(cfg.iters, dtype=jnp.int32)
    if cfg.optimizer == "gn":

        def body(carry, i):
            s, dp = carry
            s, stats, dp = range_gn_step(
                s, cfg, meta, axis, dp, kt=cfg.kt_at(i)
            )
            return (s, dp), stats

        (final, dp_f), stats = jax.lax.scan(body, (sh, dp0), xs)
        return final, stats, dp_f
    elif cfg.optimizer == "lm":

        def body(carry, i):
            s, lam, dp = carry
            s, lam, stats, dp = range_lm_step(
                s, cfg, meta, axis, lam, dp, kt=cfg.kt_at(i)
            )
            return (s, lam, dp), stats

        if lam0 is None:
            lam0 = jnp.asarray(cfg.lm_lambda0, sh.poses.dtype)
        (final, lam_f, dp_f), stats = jax.lax.scan(
            body, (sh, lam0, dp0), xs
        )
        stats["lam_final"] = lam_f
        return final, stats, dp_f
    raise ValueError(f"unknown optimizer {cfg.optimizer!r}")


def make_pose_range_solve(
    mesh: Mesh, cfg: SolverConfig, meta: RangeMeta, lam0=None
):
    """Jitted range-sharded solve: (RangeShards, dp0) -> (RangeShards',
    stats, dp_final).  ``dp0`` is the [NPp, 3] warm-start delta, sharded
    like the poses (pass zeros when not resuming)."""
    axis = mesh.axis_names[0]
    specs = range_specs(axis)

    @jax.jit
    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(specs, P(axis)),
        out_specs=(specs, P(), P(axis)),
    )
    def _solve(sh: RangeShards, dp0):
        l0 = None if lam0 is None else jnp.asarray(lam0, sh.poses.dtype)
        return range_solve_loop(sh, cfg, meta, axis, lam0=l0, dp0=dp0)

    return _solve


def pose_range_solve(
    graph, cfg: SolverConfig, mesh: Optional[Mesh] = None, lam0=None, dp0=None
):
    """Convenience one-shot: prepare, solve, unpad.

    Returns (graph with optimized state, per-iteration stats) — the same
    contract as solve_packed / sharded_packed_solve.  ``dp0`` restores the
    warm-start delta on resume (ADVICE r4: a resumed --pose-range
    --cg-warm-start run is now iteration-exact like the packed path).
    """
    if mesh is None:
        from boslam.parallel.mesh import make_mesh

        mesh = make_mesh(axis_name="range")
    sh, meta = prepare_pose_range(graph, mesh)
    axis = mesh.axis_names[0]
    dp0_pad = np.zeros((meta.np_pad, 3), np.float32)
    if dp0 is not None:
        dp0_pad[: meta.n_poses] = np.asarray(dp0, np.float32)
    from boslam.parallel.mesh import put_sharded

    dp0_dev = put_sharded(
        jnp.asarray(dp0_pad), NamedSharding(mesh, P(axis))
    )
    out, stats, dp_f = make_pose_range_solve(mesh, cfg, meta, lam0=lam0)(
        sh, dp0_dev
    )
    final = graph.with_state(
        out.poses[: meta.n_poses], out.landmarks[: meta.n_landmarks]
    )
    stats = dict(stats)
    stats["dp_final"] = dp_f[: meta.n_poses]
    return final, stats
