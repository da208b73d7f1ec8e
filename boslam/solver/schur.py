"""Per-landmark Schur complement + preconditioned CG — the scalable path.

The reference factorizes the full N x N normal matrix with sparse LDLT
every step (slam/solver.cpp:77-85), capping problem size at one CPU's
factorization capacity (SURVEY §5 "long-context" analogue).  TPU-first
re-design (SURVEY §7 phase 3, BASELINE.json configs 4-5):

- Landmark blocks of H are 2x2 and block-diagonal (bearing edges touch one
  pose + one landmark), so eliminating them is a *batched 2x2 inverse* —
  embarrassingly parallel, no factorization.
- The reduced camera system S = Hpp - Hpl Hll^-1 Hlp (size 3*NP) is never
  materialized: CG only needs S @ x, which is gathers, small batched
  matmuls, and segment-sums over edge arrays — exactly the ops XLA fuses
  and shards well.  Under data-parallel edge sharding every term becomes a
  local partial + one psum (boslam/parallel).
- Block-Jacobi preconditioner from the exact 3x3 diagonal of S.

Everything is fixed-shape; the whole solve jits into one XLA program and
is algebraically identical to the dense path (tested to f32 tolerance in
tests/test_schur.py).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from boslam.config import SolverConfig
from boslam.graph.data import FactorGraph
from boslam.solver.normal_eq import EdgeTerms, edge_terms


class SchurBlocks(NamedTuple):
    """Block-sparse normal equations, damped, post-elimination-prep.

    Under edge sharding, ``Hpp_diag``/``Hll_inv``/``bp``/``bl`` are psum-
    completed (replicated) while ``Ho_sd``/``Hpl`` stay per-edge local
    shards — the replicated-reduced-system / sharded-factors layout.
    """

    Hpp_diag: jnp.ndarray  # f32[NP, 3, 3] per-pose diagonal blocks
    Ho_sd: jnp.ndarray  # f32[NO, 3, 3] odometry src->dst coupling blocks
    Hll_inv: jnp.ndarray  # f32[NL, 2, 2] inverse damped landmark blocks
    Hpl: jnp.ndarray  # f32[NB, 3, 2] per-bearing-edge pose-landmark blocks
    bp: jnp.ndarray  # f32[NP, 3]
    bl: jnp.ndarray  # f32[NL, 2]


def _inv2x2(A: jnp.ndarray) -> jnp.ndarray:
    """Batched closed-form 2x2 inverse (the landmark-block elimination)."""
    a, b = A[..., 0, 0], A[..., 0, 1]
    c, d = A[..., 1, 0], A[..., 1, 1]
    det = a * d - b * c
    inv_det = 1.0 / det
    return jnp.stack(
        [
            jnp.stack([d * inv_det, -b * inv_det], axis=-1),
            jnp.stack([-c * inv_det, a * inv_det], axis=-1),
        ],
        axis=-2,
    )


def build_blocks(
    g: FactorGraph,
    cfg: SolverConfig,
    damping,
    terms: EdgeTerms | None = None,
    axis_name: str | None = None,
) -> tuple[SchurBlocks, EdgeTerms]:
    """Assemble the block-sparse damped H and b via segment-sums.

    Mathematically the same H,b as assemble_dense (slam/solver.cpp:31-69
    semantics, robust quirk included) in block layout.  With ``axis_name``
    the pose/landmark aggregates are psum-completed across the edge shards
    *before* damping and landmark-block inversion.
    """
    if terms is None:
        terms = edge_terms(g, cfg)
    NP_, NL = g.n_poses, g.n_landmarks
    dtype = g.poses.dtype
    damping = jnp.asarray(damping, dtype)

    # TPU row-indexed ops cost per ROW regardless of width (measured
    # ~16 ns/row), so all same-key reductions are fused into single
    # multi-channel segment_sums.
    seg_p = lambda v, ix: jax.ops.segment_sum(v, ix, num_segments=NP_)
    seg_l = lambda v, ix: jax.ops.segment_sum(v, ix, num_segments=NL)

    # --- bearing edge contributions ---
    wH_b = (g.b_omega * terms.bw_H)[:, None, None]
    jp, jl = terms.bjp, terms.bjl  # [NB,3], [NB,2]
    NB = jp.shape[0]
    NO = terms.ojs.shape[0]
    Hpp_b = wH_b * jp[:, :, None] * jp[:, None, :]  # [NB,3,3]
    Hll_b = wH_b * jl[:, :, None] * jl[:, None, :]  # [NB,2,2]
    Hpl = wH_b * jp[:, :, None] * jl[:, None, :]  # [NB,3,2]
    coef_b = (g.b_omega * terms.bw_b * terms.be)[:, None]
    bp_b = coef_b * jp  # [NB,3]
    bl_b = coef_b * jl  # [NB,2]

    lm_payload = jnp.concatenate([Hll_b.reshape(NB, 4), bl_b], axis=1)
    lm_sums = seg_l(lm_payload, g.b_lm)
    Hll = lm_sums[:, :4].reshape(NL, 2, 2)
    bl = lm_sums[:, 4:6]

    # --- odometry edge contributions ---
    js, jd = terms.ojs, terms.ojd  # [NO,3,3]
    Om = g.o_omega * terms.ow_H[:, None, None]
    OmJs = jnp.einsum("eij,ejk->eik", Om, js)
    OmJd = jnp.einsum("eij,ejk->eik", Om, jd)
    H_ss = jnp.einsum("eij,eik->ejk", js, OmJs)
    H_dd = jnp.einsum("eij,eik->ejk", jd, OmJd)
    H_sd = jnp.einsum("eij,eik->ejk", js, OmJd)
    e_w = (g.o_omega @ (terms.ow_b[:, None] * terms.oe)[..., None])[..., 0]
    bp_s = jnp.einsum("eij,ei->ej", js, e_w)
    bp_d = jnp.einsum("eij,ei->ej", jd, e_w)

    # single pose-keyed segment_sum over bearing + both odometry endpoints
    pose_idx = jnp.concatenate([g.b_pose, g.o_src, g.o_dst])
    pose_payload = jnp.concatenate(
        [
            jnp.concatenate([Hpp_b.reshape(NB, 9), bp_b], axis=1),
            jnp.concatenate([H_ss.reshape(NO, 9), bp_s], axis=1),
            jnp.concatenate([H_dd.reshape(NO, 9), bp_d], axis=1),
        ],
        axis=0,
    )
    pose_sums = seg_p(pose_payload, pose_idx)
    Hpp_diag = pose_sums[:, :9].reshape(NP_, 3, 3)
    bp = pose_sums[:, 9:12]

    # Complete the cross-device reductions before damping/inversion.
    if axis_name is not None:
        Hpp_diag = jax.lax.psum(Hpp_diag, axis_name)
        Hll = jax.lax.psum(Hll, axis_name)
        bp = jax.lax.psum(bp, axis_name)
        bl = jax.lax.psum(bl, axis_name)

    # --- damping on every diagonal (slam/solver.cpp:64-69) ---
    eye3 = jnp.eye(3, dtype=dtype)
    eye2 = jnp.eye(2, dtype=dtype)
    Hpp_diag = Hpp_diag + damping * eye3
    Hll = Hll + damping * eye2

    return SchurBlocks(Hpp_diag, H_sd, _inv2x2(Hll), Hpl, bp, bl), terms


def _pose_mask(NP_: int, fixed_ix, dtype) -> jnp.ndarray:
    """f32[NP, 1] gauge mask over pose blocks (1 except the fixed pose)."""
    return jnp.where(
        (jnp.arange(NP_) == fixed_ix)[:, None], jnp.zeros((), dtype), jnp.ones((), dtype)
    )


def s_matvec(
    blocks: SchurBlocks,
    g: FactorGraph,
    x: jnp.ndarray,
    mask: jnp.ndarray,
    axis_name: str | None = None,
):
    """y = S_masked @ x with S = Hpp - Hpl Hll^-1 Hlp, x f32[NP, 3].

    Matrix-free: two gathers + two segment-sums per term.  The gauge mask
    zeroes the fixed pose's rows/cols and pins its diagonal to identity,
    mirroring the dense path's masking (boslam/solver/gauss_newton.py).

    Distributed: ``x``, ``Hpp_diag``, ``Hll_inv`` are replicated; the
    edge-indexed factors are shards, so the edge-coupled partial sums are
    completed with one fused psum per matvec (the reduced-camera-system
    all-reduce of BASELINE.json config 5, riding ICI).
    """
    NP_, NL = g.n_poses, g.n_landmarks
    xm = x * mask

    # Odometry couplings (sd and its transpose) — fused into one gather and
    # one segment_sum over the concatenated endpoint keys.
    x_ends = xm[jnp.concatenate([g.o_dst, g.o_src])]  # [2*NO, 3]
    NO = g.n_odometry
    y_sd = jnp.einsum("eij,ej->ei", blocks.Ho_sd, x_ends[:NO])
    y_ds = jnp.einsum("eji,ej->ei", blocks.Ho_sd, x_ends[NO:])
    y_edge = jax.ops.segment_sum(
        jnp.concatenate([y_sd, y_ds]),
        jnp.concatenate([g.o_src, g.o_dst]),
        num_segments=NP_,
    )

    # Hlp @ x pieces — edge-sharded partials into landmark space.
    z = jnp.einsum("eji,ej->ei", blocks.Hpl, xm[g.b_pose])  # [NB,2]
    z = jax.ops.segment_sum(z, g.b_lm, num_segments=NL)  # [NL,2]
    if axis_name is not None:
        y_edge, z = jax.lax.psum((y_edge, z), axis_name)

    # Replicated part: diagonal blocks + back-coupling through Hll^-1.
    y = jnp.einsum("pij,pj->pi", blocks.Hpp_diag, xm) + y_edge
    w = jnp.einsum("lij,lj->li", blocks.Hll_inv, z)  # Hll^-1 (Hlp x)
    yb = jnp.einsum("eij,ej->ei", blocks.Hpl, w[g.b_lm])  # [NB,3] local
    yb = jax.ops.segment_sum(yb, g.b_pose, num_segments=NP_)
    if axis_name is not None:
        yb = jax.lax.psum(yb, axis_name)
    y = y - yb

    # mask output; identity on the fixed block keeps CG well-posed there
    return y * mask + x * (1.0 - mask)


def s_diag_blocks(
    blocks: SchurBlocks, g: FactorGraph, axis_name: str | None = None
) -> jnp.ndarray:
    """Exact 3x3 diagonal of S for the block-Jacobi preconditioner.

    diag_i(S) = Hpp_ii - sum_e Hpl_e Hll_inv[lm_e] Hpl_e^T over edges at
    pose i.  (Exact when each (pose, landmark) pair has at most one edge —
    true of g2o bearing graphs; otherwise still an excellent preconditioner.)
    """
    corr = jnp.einsum(
        "eij,ejk,elk->eil", blocks.Hpl, blocks.Hll_inv[g.b_lm], blocks.Hpl
    )
    corr = jax.ops.segment_sum(corr, g.b_pose, num_segments=g.n_poses)
    if axis_name is not None:
        corr = jax.lax.psum(corr, axis_name)
    return blocks.Hpp_diag - corr


def _inv3x3(A: jnp.ndarray) -> jnp.ndarray:
    """Batched closed-form 3x3 inverse via the adjugate."""
    a = A
    c00 = a[..., 1, 1] * a[..., 2, 2] - a[..., 1, 2] * a[..., 2, 1]
    c01 = a[..., 1, 2] * a[..., 2, 0] - a[..., 1, 0] * a[..., 2, 2]
    c02 = a[..., 1, 0] * a[..., 2, 1] - a[..., 1, 1] * a[..., 2, 0]
    c10 = a[..., 0, 2] * a[..., 2, 1] - a[..., 0, 1] * a[..., 2, 2]
    c11 = a[..., 0, 0] * a[..., 2, 2] - a[..., 0, 2] * a[..., 2, 0]
    c12 = a[..., 0, 1] * a[..., 2, 0] - a[..., 0, 0] * a[..., 2, 1]
    c20 = a[..., 0, 1] * a[..., 1, 2] - a[..., 0, 2] * a[..., 1, 1]
    c21 = a[..., 0, 2] * a[..., 1, 0] - a[..., 0, 0] * a[..., 1, 2]
    c22 = a[..., 0, 0] * a[..., 1, 1] - a[..., 0, 1] * a[..., 1, 0]
    det = a[..., 0, 0] * c00 + a[..., 0, 1] * c01 + a[..., 0, 2] * c02
    inv_det = (1.0 / det)[..., None, None]
    adj = jnp.stack(
        [
            jnp.stack([c00, c10, c20], axis=-1),
            jnp.stack([c01, c11, c21], axis=-1),
            jnp.stack([c02, c12, c22], axis=-1),
        ],
        axis=-2,
    )
    return adj * inv_det


def pcg(matvec, rhs, precond, max_iters: int, tol: float, x0=None,
        axis_name: str | None = None, restarts: int = 0):
    """Preconditioned conjugate gradients over pose-block arrays f32[NP,3].

    ``precond`` is either a batched 3x3 block-inverse array (block-Jacobi)
    or a callable r -> M^{-1} r (e.g. the cyclic-reduction chain solve).
    ``x0`` warm-starts the iteration (default zeros).  Fixed-shape
    while_loop (XLA-friendly); terminates on relative residual or iteration
    cap.  Returns (x, n_iters, final_rel_residual2, breakdown) — ``breakdown``
    is True when a non-positive curvature / indefinite-preconditioner event
    occurred, so scale runs can detect a poisoned preconditioner instead of
    inferring it from cg_rel_res2.

    ``axis_name``: when the CG VECTORS themselves are sharded across a mesh
    axis (pose-range layout, boslam/parallel/pose_range.py) the dot
    products are local partials completed with a scalar psum; the edge-
    sharded layouts keep replicated vectors and leave this None.

    Breakdown handling (VERDICT r4 #5 — the flat 10k cross-check stalled
    at ~34 matvecs because breakdown TERMINATED the iteration): f32
    roundoff can surface non-positive curvature (p^T A p <= 0) or an
    indefinite preconditioner apply (r^T z <= 0) long before the
    tolerance.  With ``restarts > 0`` such an event now RESTARTS the
    Krylov space instead of stopping — the x-update is skipped (curvature
    case), the direction is reset to the (un)preconditioned steepest
    descent p = z (or p = r when the preconditioner itself was
    indefinite on r), and the conjugacy history is dropped; up to
    ``restarts`` events are absorbed before the iteration stops.  Healthy
    CG is bit-identical to before (the restart branch never executes).
    With ``restarts == 0`` the old truncated/Steihaug behavior is kept:
    stop at the event and return the best-residual iterate.
    """
    if callable(precond):
        apply_m = precond
    else:
        apply_m = lambda r: jnp.einsum("pij,pj->pi", precond, r)
    if axis_name is None:
        dot = lambda u, v: jnp.sum(u * v)
    else:
        dot = lambda u, v: jax.lax.psum(jnp.sum(u * v), axis_name)
    if x0 is None:
        x0 = jnp.zeros_like(rhs)
        r0 = rhs
    else:
        r0 = rhs - matvec(x0)
    z0 = apply_m(r0)
    rz0 = dot(r0, z0)
    b2 = jnp.maximum(dot(rhs, rhs), jnp.finfo(rhs.dtype).tiny)

    def cond(state):
        _, r, _, _, k, rz, nbrk, _xb, _rb = state
        return (nbrk <= restarts) & (k < max_iters) & (
            dot(r, r) / b2 > tol * tol
        )

    def body(state):
        x, r, z, p, k, rz, nbrk, x_best, rr_best = state
        Ap = matvec(p)
        pAp = dot(p, Ap)
        curv_ok = pAp > 0
        alpha = jnp.where(curv_ok, rz, 0.0) / jnp.where(curv_ok, pAp, 1.0)
        x = x + alpha * p
        r = r - alpha * Ap
        # Track the best-residual iterate: an (indefinite-preconditioner)
        # breakdown step can make the LAST iterate far worse than earlier
        # ones (observed rel^2 up to 52 on 10k-pose synthetics); returning
        # the best keeps breakdown-truncated solves monotone-safe.
        rr = dot(r, r)
        better = rr < rr_best
        x_best = jnp.where(better, x, x_best)
        rr_best = jnp.where(better, rr, rr_best)
        z = apply_m(r)
        rz_new = dot(r, z)
        rz_ok = rz_new > 0
        healthy = curv_ok & rz_ok
        # healthy: conjugate update.  curvature event: restart p = z.
        # indefinite-preconditioner event: restart p = r (drop M entirely
        # for this direction — r^T r > 0 always).
        beta = jnp.where(healthy, rz_new, 0.0) / jnp.maximum(
            rz, jnp.finfo(rhs.dtype).tiny
        )
        z_eff = jnp.where(rz_ok, z, r)
        rz_eff = jnp.where(rz_ok, rz_new, rr)
        p = z_eff + beta * p
        nbrk = nbrk + jnp.where(healthy, 0, 1)
        return x, r, z_eff, p, k + 1, rz_eff, nbrk, x_best, rr_best

    # An indefinite FIRST preconditioner apply (rz0 <= 0 with a nonzero
    # residual): z0 is not a descent direction — restart from r0 (counted),
    # or stop immediately when restarts are disabled.
    first_bad = jnp.logical_and(rz0 <= 0, dot(r0, r0) / b2 > tol * tol)
    rr0 = dot(r0, r0)
    d0 = jnp.where(first_bad, r0, z0)
    rz_start = jnp.where(first_bad, rr0, rz0)
    nbrk0 = jnp.where(first_bad, 1, 0)
    x, r, _, _, k, _, nbrk, x_best, rr_best = jax.lax.while_loop(
        cond, body, (x0, r0, d0, d0, jnp.asarray(0), rz_start, nbrk0, x0, rr0)
    )
    breakdown = nbrk > 0
    # Healthy CG: return the LAST iterate (minimal A-norm error; the
    # residual norm legitimately oscillates, so "best residual" would
    # regress it).  After any breakdown event the last step can be garbage
    # — return the best-residual iterate instead.
    x_out = jnp.where(breakdown, x_best, x)
    rr_out = jnp.where(breakdown, rr_best, dot(r, r))
    return x_out, k, rr_out / b2, breakdown


def flat_chain_band(blocks: SchurBlocks, g: FactorGraph,
                    axis_name: str | None = None) -> jnp.ndarray:
    """f32[NP-1, 3, 3] odometry-chain band from the flat edge arrays.

    The coupling block between poses i and i+1, summed over every
    consecutive-pair odometry edge (the dominant SLAM topology,
    slam/solver.cpp:48-62); non-consecutive edges are excluded — they
    affect preconditioner quality only, never correctness.  Mirrors the
    packed path's _chain_band so the flat schur_cg path can use the same
    chain preconditioners (VERDICT r4 #5: the flat path was pinned to
    block-Jacobi, whose breakdown stalled the 10k cross-check).
    """
    NP_ = g.n_poses
    is_band = (g.o_dst == g.o_src + 1)[:, None, None]
    band = jax.ops.segment_sum(
        blocks.Ho_sd * is_band.astype(blocks.Ho_sd.dtype),
        g.o_src,
        num_segments=NP_ - 1,
    )
    if axis_name is not None:
        band = jax.lax.psum(band, axis_name)
    return band


def _flat_preconditioner(
    blocks: SchurBlocks,
    g: FactorGraph,
    cfg: SolverConfig,
    mask: jnp.ndarray,
    axis_name: str | None = None,
):
    """PCG preconditioner for the flat Schur path — the same menu as the
    packed path (schur_packed._packed_preconditioner): exact block-Jacobi
    diag(S), the PD-clamped block-tridiagonal chain solve, or the
    two-level chain scheme.  "auto" follows the measured packed rule
    (chain solve below ~32k poses, block-Jacobi above)."""
    NP_ = g.n_poses
    which = cfg.preconditioner
    if which == "auto":
        which = "btridiag" if NP_ <= 32768 and NP_ > 1 else "block_jacobi"
    d = s_diag_blocks(blocks, g, axis_name=axis_name)
    eye3 = jnp.eye(3, dtype=d.dtype)
    d = mask[..., None] * d + (1.0 - mask[..., None]) * eye3
    if which in ("block_jacobi", "bband") or NP_ <= 1:
        # bband is a packed-layout experiment; the flat path maps it to
        # its measured-better neighbor rather than erroring.
        return _inv3x3(d)
    band = flat_chain_band(blocks, g, axis_name)
    band = band * (mask[:-1, :, None] * mask[1:, :, None])
    if which == "two_level":
        from boslam.solver.two_level import two_level_factor, two_level_solve

        q = int(cfg.coarse_q) or max(8, min(128, 1 << (NP_.bit_length() // 2)))
        factor = two_level_factor(d, band, q, mask, cycle=cfg.two_level_cycle)
        return lambda r: two_level_solve(factor, r)
    from boslam.solver.btridiag import btridiag_factor, btridiag_solve

    # clamp_band < 1/2: provably PD scaled factorization (solver/btridiag.py)
    factor = btridiag_factor(d, band, clamp_band=0.4999)
    return lambda r: btridiag_solve(factor, r)


def dense_reduced_system(
    blocks: SchurBlocks, g: FactorGraph, axis_name: str | None = None
):
    """Materialize S (3NP x 3NP) — exact Schur path for small/medium NP.

    Built MXU-style: the correction Hpl Hll^-1 Hlp is one big matmul of the
    scattered [3NP, 2NL] coupling matrix against its Hll^-1-weighted
    counterpart; XLA tiles it onto the systolic array.  For the reference
    dataset S is 903 x 903 — smaller than the 1185 x 1185 full H the C++
    solver factorizes, and Cholesky beats its LDLT asymptotically by the
    eliminated landmark block.

    Distributed: ``Hpp_diag``/``Hll_inv``/``bp``/``bl`` arrive replicated
    (psum-completed in build_blocks) while ``Ho_sd``/``Hpl`` are per-edge
    shards, so the edge-scattered dense pieces are local partials completed
    with one psum each — U must be completed BEFORE the S = U Hll^-1 U^T
    product (it is quadratic in U; per-shard products would drop the
    cross-shard landmark terms).  The factorization then runs replicated
    on every device — cheap at the sizes this path targets.
    """
    NP_, NL = g.n_poses, g.n_landmarks
    dtype = g.poses.dtype

    # Dense Hpp: replicated diagonal + edge-sharded odometry couplings
    ix3 = 3 * jnp.arange(NP_)[:, None] + jnp.arange(3)[None, :]  # [NP,3]
    Hpp_edge = jnp.zeros((3 * NP_, 3 * NP_), dtype)
    s3 = 3 * g.o_src[:, None] + jnp.arange(3)[None, :]
    d3 = 3 * g.o_dst[:, None] + jnp.arange(3)[None, :]
    Hpp_edge = Hpp_edge.at[s3[:, :, None], d3[:, None, :]].add(blocks.Ho_sd)
    Hpp_edge = Hpp_edge.at[d3[:, :, None], s3[:, None, :]].add(
        jnp.swapaxes(blocks.Ho_sd, 1, 2)
    )

    # Dense Hpl [3NP, 2NL] from per-edge 3x2 blocks (local shard)
    U = jnp.zeros((3 * NP_, 2 * NL), dtype)
    bp3 = 3 * g.b_pose[:, None] + jnp.arange(3)[None, :]
    bl2 = 2 * g.b_lm[:, None] + jnp.arange(2)[None, :]
    U = U.at[bp3[:, :, None], bl2[:, None, :]].add(blocks.Hpl)

    if axis_name is not None:
        Hpp_edge, U = jax.lax.psum((Hpp_edge, U), axis_name)
    Hpp = Hpp_edge.at[ix3[:, :, None], ix3[:, None, :]].add(blocks.Hpp_diag)

    # W = U @ blockdiag(Hll_inv): batched small matmul then flatten
    W = jnp.einsum(
        "plh,lhj->plj", U.reshape(3 * NP_, NL, 2), blocks.Hll_inv
    ).reshape(3 * NP_, 2 * NL)
    S = Hpp - W @ U.T
    rhs = -blocks.bp.reshape(-1) + W @ blocks.bl.reshape(-1)
    return S, rhs


def fused_schur_solve(
    g: FactorGraph,
    cfg: SolverConfig,
    damping,
    terms: EdgeTerms,
    mask: jnp.ndarray,
    interpret: bool = False,
):
    """One-launch exact Schur solve (boslam/ops/pallas_schur.py).

    Assembles the dense pieces (scatter-based — an all-one-hot-matmul
    variant was built and measured 20% SLOWER at reference scale: the
    quadratic 'ep,eij,eq->piqj' einsums cost more than the row scatters
    they replace), pads to 128 multiples (pad rows carry mask 0 ->
    exactly decoupled), and runs damping -> Schur correction -> Cholesky
    -> both back-substitutions as a single Pallas kernel.  Returns
    (dp f32[NP,3], dl f32[NL,2]).  Single-device only (the sharded exact
    path keeps the scatter+psum route in dense_reduced_system).
    """
    from boslam.ops.pallas_schur import B as TB, fused_schur_solve_padded

    NP_, NL = g.n_poses, g.n_landmarks
    dtype = g.poses.dtype
    blocks, _ = build_blocks(g, cfg, damping, terms=terms)

    # dense Hpp (damped diag + odometry couplings) and U from the blocks
    ix3 = 3 * jnp.arange(NP_)[:, None] + jnp.arange(3)[None, :]
    Hpp = jnp.zeros((3 * NP_, 3 * NP_), dtype)
    s3 = 3 * g.o_src[:, None] + jnp.arange(3)[None, :]
    d3 = 3 * g.o_dst[:, None] + jnp.arange(3)[None, :]
    Hpp = Hpp.at[s3[:, :, None], d3[:, None, :]].add(blocks.Ho_sd)
    Hpp = Hpp.at[d3[:, :, None], s3[:, None, :]].add(
        jnp.swapaxes(blocks.Ho_sd, 1, 2)
    )
    Hpp = Hpp.at[ix3[:, :, None], ix3[:, None, :]].add(blocks.Hpp_diag)
    U = jnp.zeros((3 * NP_, 2 * NL), dtype)
    bp3 = 3 * g.b_pose[:, None] + jnp.arange(3)[None, :]
    bl2 = 2 * g.b_lm[:, None] + jnp.arange(2)[None, :]
    U = U.at[bp3[:, :, None], bl2[:, None, :]].add(blocks.Hpl)

    Ml = 2 * NL
    HllD = jnp.zeros((Ml, Ml), dtype)
    l2 = 2 * jnp.arange(NL)[:, None] + jnp.arange(2)[None, :]
    HllD = HllD.at[l2[:, :, None], l2[:, None, :]].set(blocks.Hll_inv)

    # ---- pad to 128 multiples (pad rows: mask 0 -> exactly decoupled) ----
    Np_pad = ((3 * NP_ + TB - 1) // TB) * TB
    Ml_pad = ((Ml + TB - 1) // TB) * TB
    pp, pm = Np_pad - 3 * NP_, Ml_pad - Ml
    Hpp = jnp.pad(Hpp, ((0, pp), (0, pp)))
    U = jnp.pad(U, ((0, pp), (0, pm)))
    HllD = jnp.pad(HllD, ((0, pm), (0, pm)))
    bpf = jnp.pad(blocks.bp.reshape(-1), (0, pp))
    blf = jnp.pad(blocks.bl.reshape(-1), (0, pm))
    m = jnp.pad(jnp.repeat(mask[:, 0], 3), (0, pp))

    # blocks are already damped (build_blocks), so the kernel adds zero
    x, dl = fused_schur_solve_padded(
        Hpp, U, HllD, bpf, blf, m, jnp.zeros((), dtype), interpret=interpret
    )
    return x[: 3 * NP_].reshape(NP_, 3), dl[:Ml].reshape(NL, 2)


def schur_build_and_solve(
    g: FactorGraph,
    cfg: SolverConfig,
    damping,
    use_cg: bool | None = None,
    axis_name: str | None = None,
):
    """Full Schur-complement linear solve; same interface as the dense path.

    Returns (delta_poses f32[NP,3], delta_landmarks f32[NL,2], terms, ok,
    extra) — ``extra`` carries solver-internal stats (cg_iters /
    cg_rel_res2 on the CG path, empty otherwise) so the flat and packed
    paths report the same observability.

    ``use_cg=False`` (linear_solver="schur"): exact — dense Cholesky of the
    reduced camera system.  ``use_cg=True`` ("schur_cg"): matrix-free PCG,
    the inexact-Newton scale-out path; S has condition ~1e7 on real data so
    f32 CG is run to cfg.cg_tol as a *truncated* inner solve (outer GN still
    converges, classical inexact-Newton behavior — tested).
    """
    if use_cg is None:
        use_cg = cfg.linear_solver == "schur_cg"
    mask = _pose_mask(g.n_poses, g.fixed_pose_ix, g.poses.dtype)
    extra = {}

    if not use_cg:
        from boslam.ops.pallas_schur import fused_fits

        backend = jax.default_backend()
        use_fused = (
            cfg.cholesky_backend in ("auto", "pallas")
            and backend in ("tpu", "axon")
            and axis_name is None
            and fused_fits(3 * g.n_poses, 2 * g.n_landmarks)
        )
        if use_fused:
            # ONE Pallas launch replacing the separate dense_reduced_system
            # materialization + Cholesky + back-substitution launches
            # (VERDICT r3 #5: the headline's wall time was kernel-launch
            # latency, not math).  Assembly stays build_blocks' segment-sums
            # + scatters — the all-matmul one-hot variant was measured 20%
            # slower and rejected (ADVICE r4: earlier comment said the
            # opposite).
            terms = edge_terms(g, cfg)
            dp, dl = fused_schur_solve(g, cfg, damping, terms, mask)
            ok = jnp.logical_not(
                jnp.logical_or(jnp.any(jnp.isnan(dp)), jnp.any(jnp.isnan(dl)))
            )
            dp = jnp.where(ok, dp, jnp.zeros_like(dp))
            dl = jnp.where(ok, dl, jnp.zeros_like(dl))
            return dp, dl, terms, ok, extra

    blocks, terms = build_blocks(g, cfg, damping, axis_name=axis_name)

    if not use_cg:
        # Same masked-solve helper as the dense path: picks the fused Pallas
        # Cholesky kernel when the reduced system fits its VMEM budget
        # (S is 3*NP x 3*NP = 903 x 903 on the reference data), else
        # jax.scipy.  solve_gauge_fixed solves H d = -b, so negate the rhs.
        # Under sharding the assembled S/rhs are psum-completed inside
        # dense_reduced_system and the factorization runs replicated on
        # every device (cheap at the sizes this path targets).
        from boslam.solver.gauss_newton import solve_gauge_fixed

        S, rhs_flat = dense_reduced_system(blocks, g, axis_name=axis_name)
        m = jnp.repeat(mask[:, 0], 3)
        delta, _spd = solve_gauge_fixed(S, -rhs_flat, m, cfg)
        dp = delta.reshape(g.n_poses, 3)
    else:
        # Reduced RHS: -bp + Hpl Hll^-1 bl, gauge-masked.
        w = jnp.einsum("lij,lj->li", blocks.Hll_inv, blocks.bl)
        corr = jnp.einsum("eij,ej->ei", blocks.Hpl, w[g.b_lm])
        corr = jax.ops.segment_sum(corr, g.b_pose, num_segments=g.n_poses)
        if axis_name is not None:
            corr = jax.lax.psum(corr, axis_name)
        rhs = (-blocks.bp + corr) * mask

        precond = _flat_preconditioner(blocks, g, cfg, mask, axis_name)
        matvec = lambda x: s_matvec(blocks, g, x, mask, axis_name=axis_name)
        dp, n_iters, rel_res2, breakdown = pcg(
            matvec, rhs, precond, cfg.cg_iters, cfg.cg_tol,
            restarts=cfg.cg_restarts,
        )
        extra = {
            "cg_iters": n_iters,
            "cg_rel_res2": rel_res2,
            "cg_breakdown": breakdown,
        }
    dp = dp * mask  # exact zero delta on the gauge pose (solver.cpp:87-94)

    # Back-substitute landmarks: dl = Hll^-1 (-bl - Hlp dp).
    hlp_dp = jnp.einsum("eji,ej->ei", blocks.Hpl, dp[g.b_pose])
    hlp_dp = jax.ops.segment_sum(hlp_dp, g.b_lm, num_segments=g.n_landmarks)
    if axis_name is not None:
        hlp_dp = jax.lax.psum(hlp_dp, axis_name)
    dl = jnp.einsum("lij,lj->li", blocks.Hll_inv, -blocks.bl - hlp_dp)

    ok = jnp.logical_not(
        jnp.logical_or(jnp.any(jnp.isnan(dp)), jnp.any(jnp.isnan(dl)))
    )
    dp = jnp.where(ok, dp, jnp.zeros_like(dp))
    dl = jnp.where(ok, dl, jnp.zeros_like(dl))
    return dp, dl, terms, ok, extra
