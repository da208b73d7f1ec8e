"""Schur + PCG on the dual-packed layout — the scale-regime solver.

Same math as boslam/solver/schur.py (and therefore slam/solver.cpp
semantics, robust quirk included), but every vertex-keyed reduction is a
dense masked axis-sum over the packed slot dimension and the only indexed
ops are two row-gathers per CG matvec (see boslam/graph/packed.py).  For
the chain-prefix part of the odometry the pose-pose couplings are shifts
(jnp.pad slices) — zero indexed rows; loop-closure edges past the prefix
(framework/observation.hpp:43-47 allows arbitrary pose pairs) go through a
small gather + segment-sum.

Distributed (BASELINE.json configs 4-5): with ``axis_name`` set the slot
grids are sharded along their slot axes (K / K2) and odometry along its
edge axis; state and the reduced system stay replicated.  Assembly
completes the per-vertex partial sums with one fused psum; each CG matvec
needs exactly two psums (z before the Hll^-1 back-coupling, then the
y-partials) riding ICI — the reduced-camera-system all-reduce of
BASELINE.json config 5.  See boslam/parallel/sharded_packed.py.

Verified equivalent to the flat schur path in tests/test_schur_packed.py.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from boslam.config import SolverConfig
from boslam.graph.data import FactorGraph
from boslam.graph.packed import PackedEdges
from boslam.ops.windowed_gather import WindowPlan, windowed_take
from boslam.solver import residuals as R
from boslam.solver.robust import robust_cost, robust_weights
from boslam.solver.schur import _inv2x2, _inv3x3, _pose_mask, pcg


def _take(values: jnp.ndarray, idx: jnp.ndarray, plan: "WindowPlan | None"):
    """values[idx] by plain gather, or by the windowed one-hot kernel when a
    plan exists (PERF.md roadmap #1: per-row gathers -> per-tile DMA+MXU).

    Plain gather fetches row 0 for padding slots (omega-masked downstream);
    the windowed kernel yields exact zeros for them — both are correct.
    """
    if plan is None:
        return values[idx]
    flat = values.reshape(values.shape[0], -1)
    out = windowed_take(flat, idx, plan, interpret=jax.default_backend() == "cpu")
    return out.reshape(idx.shape + values.shape[1:])


def _couple(spec: str, B, x):
    """Coupling-block einsum with f32 accumulation regardless of storage.

    When the B blocks are stored bf16 (cfg.coupling_dtype, halving their
    per-CG-iteration HBM traffic) the other operand is cast down too, so
    the contraction runs as MXU-native bf16 x bf16 -> f32; f32 storage is
    a plain f32 einsum."""
    return jnp.einsum(
        spec, B, x.astype(B.dtype), preferred_element_type=jnp.float32
    )


def _lm_rows_sum(x, pk: PackedEdges, NL: int):
    """Finish a landmark-keyed reduction over the grid's virtual rows.

    Identity when rows are 1:1 with landmarks; with hot-landmark
    splitting, a segment-sum of the ~NL virtual-row partials (fused Hll/bl
    or z payloads) keyed by ``pk.l_virt``."""
    if pk.l_virt is None:
        return x
    return jax.ops.segment_sum(x, pk.l_virt, num_segments=NL)


class PackedBlocks(NamedTuple):
    Hpp_diag: jnp.ndarray  # [NP, 3, 3] (replicated after psum)
    Hll_inv: jnp.ndarray  # [NL, 2, 2] (replicated after psum)
    Bp: jnp.ndarray  # [NP, K, 3, 2] pose-packed coupling blocks (local slots)
    Bl: jnp.ndarray  # [NLV, K2, 3, 2] landmark-packed coupling blocks (local)
    bp: jnp.ndarray  # [NP, 3]
    bl: jnp.ndarray  # [NL, 2]
    Ho_sd: jnp.ndarray  # [NO, 3, 3] odometry couplings (local shard)
    o_src: jnp.ndarray  # i32[NO] odometry endpoints (local shard, global ids)
    o_dst: jnp.ndarray  # i32[NO]


def _bearing_slot_terms(p_slot, l_slot, meas, omega, cfg, kt=None):
    """Residual/Jacobian/weights for a [*, K] slot grid.

    ``p_slot`` f32[*, K, 3] poses per slot, ``l_slot`` f32[*, K, 2]
    landmarks per slot.  Padding slots (omega == 0) contribute zero.
    ``kt`` optionally overrides the robust threshold (GNC annealing).
    """
    err = R.bearing_error_from(p_slot, l_slot, meas)
    jp, jl = R.bearing_jacobians_from(p_slot, l_slot)
    chi2 = omega * err * err
    wH, wb = robust_weights(chi2, cfg, kt)
    womega_H = omega * wH
    Hpp = womega_H[..., None, None] * jp[..., :, None] * jp[..., None, :]
    Hll = womega_H[..., None, None] * jl[..., :, None] * jl[..., None, :]
    B = womega_H[..., None, None] * jp[..., :, None] * jl[..., None, :]
    coef = (omega * wb * err)[..., None]
    return err, chi2, Hpp, Hll, B, coef * jp, coef * jl


def build_packed_blocks(
    g: FactorGraph,
    pk: PackedEdges,
    cfg: SolverConfig,
    damping,
    axis_name: str | None = None,
    kt=None,
) -> tuple[PackedBlocks, dict]:
    NP_, NL = g.n_poses, g.n_landmarks
    dtype = g.poses.dtype
    damping = jnp.asarray(damping, dtype)

    # ---- pose-packed pass: pose broadcast, landmarks gathered ----
    p_slot = jnp.broadcast_to(g.poses[:, None, :], (NP_, pk.p_lm.shape[1], 3))
    l_slot = _take(g.landmarks, pk.p_lm, pk.p_plan)  # gather (NP*K rows)
    (be_p, bchi2_p, Hpp_b, _Hll_p, Bp, bp_b, _bl_p) = _bearing_slot_terms(
        p_slot, l_slot, pk.p_meas, pk.p_omega, cfg, kt
    )
    Hpp_diag = jnp.sum(Hpp_b, axis=1)
    bp = jnp.sum(bp_b, axis=1)

    # ---- landmark-packed pass: landmark broadcast, poses gathered ----
    # With hot-landmark splitting (pk.l_virt) the grid has NLV >= NL
    # virtual rows; the landmark of row v is pk.l_virt[v] and the
    # per-landmark sums finish with one small segment-sum over rows.
    lm_rows = g.landmarks if pk.l_virt is None else g.landmarks[pk.l_virt]
    NLV = pk.l_pose.shape[0]
    l_slot2 = jnp.broadcast_to(lm_rows[:, None, :], (NLV, pk.l_pose.shape[1], 2))
    p_slot2 = _take(g.poses, pk.l_pose, pk.l_plan)  # gather (NLV*K2 rows)
    (_be_l, _bchi2_l, _Hpp_l, Hll_b, Bl, _bp_l, bl_b) = _bearing_slot_terms(
        p_slot2, l_slot2, pk.l_meas, pk.l_omega, cfg, kt
    )
    Hll = _lm_rows_sum(jnp.sum(Hll_b, axis=1), pk, NL)
    bl = _lm_rows_sum(jnp.sum(bl_b, axis=1), pk, NL)

    # ---- odometry ----
    # Component-major arithmetic ([NO] vectors, stacked to [NO,3,3] only
    # for the final blocks): the straightforward einsum chain materializes
    # (8,128)-tile-padded [NO,3,3] intermediates — 823 MB of compiler
    # temp at 100k poses for ~15 MB of data (PERF.md scale-ceiling).
    oe = R.odometry_error(g.poses, g.o_src, g.o_dst, g.o_meas)
    ojs, ojd = R.odometry_jacobians(g.poses, g.o_src, g.o_dst)
    js = [[ojs[:, r, c] for c in range(3)] for r in range(3)]
    jd = [[ojd[:, r, c] for c in range(3)] for r in range(3)]
    om = [[g.o_omega[:, r, c] for c in range(3)] for r in range(3)]
    oev = [oe[:, i] for i in range(3)]
    ochi2 = sum(
        oev[i] * om[i][j] * oev[j] for i in range(3) for j in range(3)
    )
    owH, owb = robust_weights(ochi2, cfg, kt)

    def quad(A, B):
        """A^T (owH*om) B as 3x3 lists of [NO] components."""
        OmB = [
            [sum(om[r][b] * B[b][c] for b in range(3)) for c in range(3)]
            for r in range(3)
        ]
        return [
            [
                owH * sum(A[a][i] * OmB[a][j] for a in range(3))
                for j in range(3)
            ]
            for i in range(3)
        ]

    def stack33(M):
        return jnp.stack(
            [jnp.stack(r, axis=-1) for r in M], axis=-2
        )

    H_ss = stack33(quad(js, js))
    H_dd = stack33(quad(jd, jd))
    H_sd = stack33(quad(js, jd))
    e_w = [
        sum(om[i][j] * (owb * oev[j]) for j in range(3)) for i in range(3)
    ]
    bp_s = jnp.stack(
        [sum(js[i][j] * e_w[i] for i in range(3)) for j in range(3)], axis=-1
    )
    bp_d = jnp.stack(
        [sum(jd[i][j] * e_w[i] for i in range(3)) for j in range(3)], axis=-1
    )

    # Shifts for the leading chain prefix (src == e, dst == e+1 — the
    # dominant structure of SLAM graphs); gather/segment-sum only for the
    # loop-closure suffix.  Under edge sharding the local shard's position
    # within the global chain is unknown, so everything takes the general
    # path (odometry is O(NP) edges — a small fraction of the slot work).
    nc = pk.chain_len if axis_name is None else 0
    NO = oe.shape[0]
    if nc > 0:
        Hpp_diag = Hpp_diag + jnp.pad(H_ss[:nc], ((0, NP_ - nc), (0, 0), (0, 0)))
        Hpp_diag = Hpp_diag + jnp.pad(H_dd[:nc], ((1, NP_ - nc - 1), (0, 0), (0, 0)))
        bp = bp + jnp.pad(bp_s[:nc], ((0, NP_ - nc), (0, 0)))
        bp = bp + jnp.pad(bp_d[:nc], ((1, NP_ - nc - 1), (0, 0)))
    if nc < NO:
        idx = jnp.concatenate([g.o_src[nc:], g.o_dst[nc:]])
        rest = NO - nc
        payload = jnp.concatenate(
            [
                jnp.concatenate([H_ss[nc:].reshape(rest, 9), bp_s[nc:]], axis=1),
                jnp.concatenate([H_dd[nc:].reshape(rest, 9), bp_d[nc:]], axis=1),
            ],
            axis=0,
        )
        sums = jax.ops.segment_sum(payload, idx, num_segments=NP_)
        Hpp_diag = Hpp_diag + sums[:, :9].reshape(NP_, 3, 3)
        bp = bp + sums[:, 9:12]

    ktv = cfg.kernel_threshold if kt is None else kt
    stats = {
        "chi2_bearing": jnp.sum(bchi2_p),
        "chi2_odometry": jnp.sum(ochi2),
        "chi2_robust": jnp.sum(robust_cost(bchi2_p, cfg, kt) * (pk.p_omega > 0))
        + jnp.sum(robust_cost(ochi2, cfg, kt) * (ochi2 > 0)),
        "n_bearing_clamped": jnp.sum(bchi2_p > ktv),
        "n_odometry_clamped": jnp.sum(ochi2 > ktv),
    }

    # Complete the cross-shard reductions before damping/inversion.
    if axis_name is not None:
        Hpp_diag, Hll, bp, bl, stats = jax.lax.psum(
            (Hpp_diag, Hll, bp, bl, stats), axis_name
        )

    eye3 = jnp.eye(3, dtype=dtype)
    eye2 = jnp.eye(2, dtype=dtype)
    Hpp_diag = Hpp_diag + damping * eye3
    Hll_inv = _inv2x2(Hll + damping * eye2)

    if cfg.coupling_dtype == "bfloat16":
        Bp = Bp.astype(jnp.bfloat16)
        Bl = Bl.astype(jnp.bfloat16)
    blocks = PackedBlocks(
        Hpp_diag, Hll_inv, Bp, Bl, bp, bl, H_sd, g.o_src, g.o_dst
    )
    return blocks, stats


def _odometry_coupling(blocks: PackedBlocks, pk: PackedEdges, xm, NP_: int,
                       axis_name: str | None):
    """y += (Ho_sd + Ho_sd^T cross terms) @ x for all odometry edges.

    Chain-prefix edges are shifts; the rest (and everything under
    sharding) is one fused gather + segment-sum keyed by global pose ids.
    Returns a LOCAL partial when ``axis_name`` is set (caller psums).
    """
    nc = pk.chain_len if axis_name is None else 0
    NO = blocks.Ho_sd.shape[0]
    y = jnp.zeros((NP_, 3), xm.dtype)
    if nc > 0:
        # component arithmetic on [nc] vectors — einsums over the
        # [NO,3,3] block array read tile-padded buffers every CG
        # iteration (PERF.md scale-ceiling)
        ho = [[blocks.Ho_sd[:nc, i, j] for j in range(3)] for i in range(3)]
        y_sd = jnp.stack(
            [
                sum(ho[i][j] * xm[1 : nc + 1, j] for j in range(3))
                for i in range(3)
            ],
            axis=-1,
        )
        y_ds = jnp.stack(
            [
                sum(ho[j][i] * xm[:nc, j] for j in range(3))
                for i in range(3)
            ],
            axis=-1,
        )
        y = y + jnp.pad(y_sd, ((0, NP_ - nc), (0, 0)))
        y = y + jnp.pad(y_ds, ((1, NP_ - nc - 1), (0, 0)))
    if nc < NO:
        src, dst = blocks.o_src[nc:], blocks.o_dst[nc:]
        Ho = blocks.Ho_sd[nc:]
        x_ends = xm[jnp.concatenate([dst, src])]
        m = NO - nc
        y_sd = jnp.einsum("eij,ej->ei", Ho, x_ends[:m])
        y_ds = jnp.einsum("eji,ej->ei", Ho, x_ends[m:])
        y = y + jax.ops.segment_sum(
            jnp.concatenate([y_sd, y_ds]),
            jnp.concatenate([src, dst]),
            num_segments=NP_,
        )
    return y


def _chunked_rows(fn, arrs, n_rows: int, chunk: int, out_width: int):
    """Scan ``fn`` over row-chunks of the leading axis of every array in
    ``arrs`` (full chunks via lax.scan + one remainder call), stacking the
    [chunk, out_width] results back to [n_rows, out_width].

    Purpose (VERDICT r4 #7): the slot-grid gather intermediates
    ([R, K, 3] etc.) are (8,128)-tile-padded on their 3-wide minor dim —
    ~42x their data — and the CG while-loop keeps two of them live, the
    measured ~8 KB/pose temp slope that capped the 1M single-chip run at
    8.08 GB.  Chunking bounds the padded intermediate to chunk-size.
    """
    import jax.lax as lax

    n_full = n_rows // chunk
    rem = n_rows - n_full * chunk

    def body(_, i):
        sl = [lax.dynamic_slice_in_dim(a, i * chunk, chunk, 0) for a in arrs]
        return None, fn(*sl)

    _, zs = lax.scan(body, None, jnp.arange(n_full))
    out = zs.reshape(n_full * chunk, out_width)
    if rem:
        tail = fn(*[a[n_full * chunk :] for a in arrs])
        out = jnp.concatenate([out, tail], axis=0)
    return out


def packed_s_matvec(
    blocks: PackedBlocks,
    pk: PackedEdges,
    x,
    mask,
    axis_name: str | None = None,
    row_chunk: int = 0,
):
    """y = S_masked @ x with two row-gathers and zero scatters (chain case).

    Distributed: exactly two psums — ``z`` (needed before the Hll^-1
    back-coupling) and the fused (odometry + correction) y-partials.

    Layout note (measured, PERF.md scale-ceiling): the [*, K, 3, 2] block
    grids read tile-padded here, but a component-major variant
    (transposed [K, *, N] buffers + [K, NLV] gathers) was measured 3.5x
    SLOWER — the transposed gather degenerates to width-1 scalar fetches
    (K2*NLV of them) where this row-major form gathers wide contiguous
    rows.  Compact layouts and fast gathers want opposite major axes;
    the gather wins on the CG hot path.
    """
    xm = x * mask
    NP_ = x.shape[0]

    # z = Hlp @ x  (landmark-packed: gather x by slot pose, sum local slots)
    use_chunks = row_chunk > 0 and pk.p_plan is None and pk.l_plan is None
    if use_chunks:
        z = _chunked_rows(
            lambda b, ix: _couple("lkij,lki->lj", b, xm[ix]),
            (blocks.Bl, pk.l_pose),
            pk.l_pose.shape[0],
            row_chunk,
            2,
        )
    else:
        xg = _take(xm, pk.l_pose, pk.l_plan)  # [NLV, K2, 3]
        z = _couple("lkij,lki->lj", blocks.Bl, xg)
    z = _lm_rows_sum(z, pk, blocks.Hll_inv.shape[0])
    if axis_name is not None:
        z = jax.lax.psum(z, axis_name)
    w = jnp.einsum("lij,lj->li", blocks.Hll_inv, z)

    # y_corr = Hpl @ w  (pose-packed: gather w by slot landmark, sum slots)
    if use_chunks:
        y_corr = _chunked_rows(
            lambda b, ix: _couple("pkij,pkj->pi", b, w[ix]),
            (blocks.Bp, pk.p_lm),
            pk.p_lm.shape[0],
            row_chunk,
            3,
        )
    else:
        wg = _take(w, pk.p_lm, pk.p_plan)  # [NP, K, 2]
        y_corr = _couple("pkij,pkj->pi", blocks.Bp, wg)
    y_odo = _odometry_coupling(blocks, pk, xm, NP_, axis_name)
    y_partial = y_odo - y_corr
    if axis_name is not None:
        y_partial = jax.lax.psum(y_partial, axis_name)

    y = jnp.einsum("pij,pj->pi", blocks.Hpp_diag, xm) + y_partial
    return y * mask + x * (1.0 - mask)


def packed_s_diag(
    blocks: PackedBlocks, pk: PackedEdges, axis_name: str | None = None
) -> jnp.ndarray:
    """Exact diag(S): Hpp_ii - sum_k B Hll_inv[lm] B^T over the pose slots.

    Component-major arithmetic, deliberately: the obvious einsum over a
    gathered [NP, K, 2, 2] grid materializes (8,128)-tile-padded buffers
    — 2.9 GB of compiler temp at 100k poses for 11 MB of data (PERF.md
    scale-ceiling section).  Gathering the three unique Hll_inv
    components through TRANSPOSED [K, NP] indices keeps every buffer
    [K, NP] / [K, *, NP] (N on the lane dim) and compact.
    """
    if pk.p_plan is not None:
        Hinv_g = _take(blocks.Hll_inv, pk.p_lm, pk.p_plan)  # windowed path
        corr = jnp.einsum(
            "pkij,pkjl,pkml->pim",
            blocks.Bp,
            Hinv_g.astype(blocks.Bp.dtype),
            blocks.Bp,
            preferred_element_type=jnp.float32,
        )
    else:
        idxT = pk.p_lm.T  # [K, NP]
        a = blocks.Hll_inv[:, 0, 0][idxT]
        b = blocks.Hll_inv[:, 0, 1][idxT]
        d = blocks.Hll_inv[:, 1, 1][idxT]
        BT = jnp.transpose(blocks.Bp.astype(jnp.float32), (1, 2, 3, 0))
        # u_j = Hll_inv @ B_j-th-row per slot; corr_im = sum_k B_i . u_m
        rows = []
        for i in range(3):
            u0 = a * BT[:, i, 0] + b * BT[:, i, 1]
            u1 = b * BT[:, i, 0] + d * BT[:, i, 1]
            rows.append((u0, u1))
        comps = [[None] * 3 for _ in range(3)]
        for i in range(3):
            for m in range(i, 3):
                u0, u1 = rows[m]
                comps[i][m] = jnp.sum(
                    BT[:, i, 0] * u0 + BT[:, i, 1] * u1, axis=0
                )
                comps[m][i] = comps[i][m]
        corr = jnp.stack(
            [jnp.stack(r, axis=-1) for r in comps], axis=-2
        )  # [NP, 3, 3]
    if axis_name is not None:
        corr = jax.lax.psum(corr, axis_name)
    return blocks.Hpp_diag - corr


def _chain_band(blocks: PackedBlocks, pk: PackedEdges, NP_: int,
                axis_name: str | None):
    """f32[NP-1, 3, 3] odometry-chain band for the tridiagonal preconditioner.

    Single device: the chain-prefix couplings directly (zero indexed rows),
    padded past the prefix.  Sharded: the local consecutive-pair couplings
    scattered by src and psum-completed (exactly the same band).  Edges
    that are not consecutive pose pairs are excluded — they only affect
    preconditioner quality, never correctness.
    """
    if axis_name is None:
        nc = pk.chain_len
        return jnp.pad(blocks.Ho_sd[:nc], ((0, NP_ - 1 - nc), (0, 0), (0, 0)))
    is_band = (blocks.o_dst == blocks.o_src + 1)[:, None, None]
    band = jax.ops.segment_sum(
        blocks.Ho_sd * is_band.astype(blocks.Ho_sd.dtype),
        blocks.o_src,
        num_segments=NP_ - 1,
    )
    return jax.lax.psum(band, axis_name)


def _packed_preconditioner(
    blocks: PackedBlocks, pk: PackedEdges, cfg, mask, axis_name: str | None = None
):
    """Build the PCG preconditioner apply-function for the packed system.

    "block_jacobi": exact 3x3 diag(S).  "btridiag"/"auto" (graphs with an
    odometry chain): T = tridiag(diag(S), chain band) factored once by
    cyclic reduction — SPD (see solver/btridiag.py) and captures the
    dominant odometry-chain coupling the block-Jacobi ignores.  Gauge fix:
    the fixed pose's diag block is pinned to identity and its band entries
    zeroed, matching the masked matvec.
    """
    NP_ = blocks.Hpp_diag.shape[0]
    has_chain = pk.chain_len > 0 and NP_ > 1
    which = cfg.preconditioner
    if which == "auto":
        # Measured (r3 + r4 sweeps on TPU): the PD-clamped chain
        # preconditioner wins clearly at <= ~10k poses; above that the
        # throughput regime (small cg caps) is won by plain block-Jacobi
        # on WALL CLOCK — the hierarchical applies cost more launch
        # latency than their iteration savings return (r4 100k, cap-8:
        # bj 65 ms/outer vs two_level 143).  two_level is the QUALITY
        # choice at 100k (equal-budget chi2 168.5k vs bj 176.3k, and bj's
        # tight-tolerance CG breakdown-stalls) — tolerance-controlled
        # convergence runs should select it explicitly
        # (tools/converge_bench.py does).
        which = (
            "btridiag" if has_chain and NP_ <= 32768 else "block_jacobi"
        )
    if which == "bband":
        from boslam.solver.bband import assemble_sband, bband_factor, bband_solve

        # Assemble width == super-node size: every diagonal super-block is
        # then an EXACT principal submatrix of S (SPD by construction).
        # Assembling narrower than the group (w < q) band-truncates the
        # in-group blocks, which does NOT preserve SPD — measured at 10k
        # poses: indefinite groups hit the diagonal fallback and the
        # preconditioner degenerated to worse-than-block-Jacobi.
        q = int(cfg.band_group) or max(1, int(cfg.band_width))
        diag, band = assemble_sband(blocks, pk, q, mask, axis_name)
        # assemble_sband is called WITHOUT Gershgorin compensation, so the
        # band-truncated T may be indefinite (bband.py's own measurements).
        # PD is guarded operationally, not by construction: the 0.98 clamp
        # bounds the scaled cross-boundary norms, and bband_factor's
        # per-group Cholesky falls back to the diagonal on any group whose
        # pivot goes non-positive (ADVICE r3: the earlier comment claimed
        # an SPD-by-construction invariant that does not hold).
        factor = bband_factor(diag, band, q, clamp_band=0.98)
        return lambda r: bband_solve(factor, r)
    d = packed_s_diag(blocks, pk, axis_name)
    eye3 = jnp.eye(3, dtype=d.dtype)
    d = mask[..., None] * d + (1.0 - mask[..., None]) * eye3
    if which == "block_jacobi" or not has_chain:
        return _inv3x3(d)
    if which == "two_level":
        from boslam.solver.two_level import two_level_factor, two_level_solve

        band = _chain_band(blocks, pk, NP_, axis_name)
        band = band * (mask[:-1, :, None] * mask[1:, :, None])
        # auto aggregate size: ~sqrt(NP) balances the fine (q-range) and
        # coarse (NP/q-length) levels, clamped to a practical range.
        q = int(cfg.coarse_q) or max(8, min(128, 1 << (NP_.bit_length() // 2)))
        factor = two_level_factor(
            d, band, q, mask, cycle=cfg.two_level_cycle
        )
        return lambda r: two_level_solve(factor, r)
    from boslam.solver.btridiag import btridiag_factor, btridiag_solve

    band = _chain_band(blocks, pk, NP_, axis_name)
    band = band * (mask[:-1, :, None] * mask[1:, :, None])
    if cfg.btridiag_block and NP_ > cfg.btridiag_block:
        # Optional chain cutting into independent sub-chains (legacy
        # stabilizer; superseded by the prescale + band-clamp below but
        # kept as a knob — see config.btridiag_block).
        i = jnp.arange(NP_ - 1)
        keep = ((i + 1) % cfg.btridiag_block) != 0
        band = band * keep[:, None, None].astype(band.dtype)
    # clamp_band < 1/2 makes the scaled factorization provably PD and
    # breakdown-free (solver/btridiag.py) — required at 10k+ poses where
    # f32 cancellation leaves a few indefinite diag(S) blocks.  0.4999:
    # healthy stiff-chain blocks sit just BELOW 1/2 (the exact-arithmetic
    # SPD bound) and must not be touched — clamping them to 0.495 was
    # measured to destroy the preconditioner on the reference dataset —
    # while noise-pushed / indefinite-adjacent blocks land exactly at the
    # PD boundary.
    factor = btridiag_factor(d, band, clamp_band=0.4999)
    return lambda r: btridiag_solve(factor, r)


def schur_packed_build_and_solve(
    g: FactorGraph,
    pk: PackedEdges,
    cfg,
    damping,
    x0=None,
    axis_name: str | None = None,
    kt=None,
):
    """Full linear solve on the packed layout; mirrors schur_build_and_solve.

    ``x0`` optionally warm-starts CG (the previous outer iteration's pose
    delta — near convergence successive systems barely change).  ``kt``
    overrides the robust threshold for this outer iteration (GNC).
    """
    blocks, stats = build_packed_blocks(g, pk, cfg, damping, axis_name, kt)
    mask = _pose_mask(g.n_poses, g.fixed_pose_ix, g.poses.dtype)

    w0 = jnp.einsum("lij,lj->li", blocks.Hll_inv, blocks.bl)
    corr = _couple("pkij,pkj->pi", blocks.Bp, _take(w0, pk.p_lm, pk.p_plan))
    if axis_name is not None:
        corr = jax.lax.psum(corr, axis_name)
    rhs = (-blocks.bp + corr) * mask

    precond = _packed_preconditioner(blocks, pk, cfg, mask, axis_name)
    matvec = lambda x: packed_s_matvec(
        blocks, pk, x, mask, axis_name, row_chunk=cfg.matvec_row_chunk
    )
    if x0 is not None:
        x0 = x0 * mask
    # bf16 coupling blocks put a ~2^-8 noise floor under the matvec: the
    # true residual cannot drop below it, so asking CG for less just runs
    # it to the cap against rounding fiction.  Clamp the tolerance to the
    # floor (inexact-Newton: outer GN converges for any fixed eta < 1).
    from boslam.config import BF16_CG_TOL_FLOOR

    cg_tol = cfg.cg_tol
    if cfg.coupling_dtype == "bfloat16":
        cg_tol = max(cg_tol, BF16_CG_TOL_FLOOR)
    dp, n_iters, rel_res2, breakdown = pcg(
        matvec, rhs, precond, cfg.cg_iters, cg_tol, x0,
        restarts=cfg.cg_restarts,
    )
    dp = dp * mask

    hlp_dp = _couple("lkij,lki->lj", blocks.Bl, _take(dp, pk.l_pose, pk.l_plan))
    hlp_dp = _lm_rows_sum(hlp_dp, pk, blocks.Hll_inv.shape[0])
    if axis_name is not None:
        hlp_dp = jax.lax.psum(hlp_dp, axis_name)
    dl = jnp.einsum("lij,lj->li", blocks.Hll_inv, -blocks.bl - hlp_dp)

    ok = jnp.logical_not(jnp.logical_or(jnp.any(jnp.isnan(dp)), jnp.any(jnp.isnan(dl))))
    dp = jnp.where(ok, dp, jnp.zeros_like(dp))
    dl = jnp.where(ok, dl, jnp.zeros_like(dl))
    stats["cg_iters"] = n_iters
    stats["cg_rel_res2"] = rel_res2
    # Breakdown (non-positive curvature / indefinite preconditioner) no
    # longer NaNs out thanks to the truncated-CG guards — surface it so
    # scale runs can detect a poisoned preconditioner (ADVICE r2).
    stats["cg_breakdown"] = breakdown
    # The bf16 noise-floor clamp is invisible to the user otherwise.
    stats["cg_tol_effective"] = jnp.asarray(cg_tol, jnp.float32)
    return dp, dl, stats, ok


def packed_robust_total(
    g: FactorGraph,
    pk: PackedEdges,
    cfg: SolverConfig,
    axis_name: str | None = None,
    kt=None,
) -> jnp.ndarray:
    """Total robust cost evaluated on the packed layout (no Jacobians).

    Bearing chi2 from the pose-packed slot grid (padding slots carry
    omega = 0 and contribute nothing), odometry from the edge arrays —
    the packed mirror of optimizer._robust_total.  Under sharding the
    grids/edges are shards, so the sum is a local partial completed with
    one psum.  Used by the LM accept/reject test (slam/solver.cpp:64-69
    damping semantics promoted to a trial step, BASELINE config 3).
    """
    NP_ = g.n_poses
    p_slot = jnp.broadcast_to(g.poses[:, None, :], (NP_, pk.p_lm.shape[1], 3))
    l_slot = _take(g.landmarks, pk.p_lm, pk.p_plan)
    err = R.bearing_error_from(p_slot, l_slot, pk.p_meas)
    bchi2 = pk.p_omega * err * err
    oe = R.odometry_error(g.poses, g.o_src, g.o_dst, g.o_meas)
    ochi2 = jnp.einsum("ei,eij,ej->e", oe, g.o_omega, oe)
    total = jnp.sum(robust_cost(bchi2, cfg, kt) * (pk.p_omega > 0)) + jnp.sum(
        robust_cost(ochi2, cfg, kt) * (ochi2 > 0)
    )
    if axis_name is not None:
        total = jax.lax.psum(total, axis_name)
    return total


def packed_lm_step(
    g: FactorGraph,
    pk: PackedEdges,
    cfg: SolverConfig,
    lam,
    dp_prev=None,
    axis_name: str | None = None,
    kt=None,
):
    """One LM trial on the packed layout: (g', lam', stats, dp).

    Solve with trial damping ``lam``; accept the candidate iff the robust
    cost decreases (and the solve stayed finite), then scale lam down
    (accept) / up (reject) — the same schedule as optimizer.lm_step, so
    ``--packed --optimizer lm`` matches the flat LM path (VERDICT r2 #1:
    previously a silent GN-only fallback).  ``cost_old`` comes free from
    the build stats (already psum-completed under sharding).  The returned
    ``dp`` warm-starts the next trial's CG only when this one was accepted
    (a rejected direction is stale at the higher lambda).
    """
    from boslam.geometry.se2 import boxplus_state

    x0 = dp_prev if cfg.cg_warm_start else None
    dp, dl, stats, ok = schur_packed_build_and_solve(
        g, pk, cfg, lam, x0, axis_name, kt
    )
    cand_poses, cand_landmarks = boxplus_state(g.poses, g.landmarks, dp, dl)
    cand = g.with_state(cand_poses, cand_landmarks)
    cost_old = stats["chi2_robust"]
    cost_new = packed_robust_total(cand, pk, cfg, axis_name, kt)
    accept = jnp.logical_and(cost_new < cost_old, ok)

    poses = jnp.where(accept, cand.poses, g.poses)
    landmarks = jnp.where(accept, cand.landmarks, g.landmarks)
    new_lam = jnp.where(
        accept,
        jnp.maximum(lam * cfg.lm_down, cfg.lm_lambda_min),
        jnp.minimum(lam * cfg.lm_up, cfg.lm_lambda_max),
    )

    stats = dict(stats)
    stats["spd_ok"] = ok
    stats["accepted"] = accept
    stats["damping"] = jnp.asarray(lam, g.poses.dtype)
    stats["kt"] = jnp.asarray(
        cfg.kernel_threshold if kt is None else kt, g.poses.dtype
    )
    stats["delta_norm"] = jnp.sqrt(jnp.sum(dp * dp) + jnp.sum(dl * dl))
    dp_next = jnp.where(accept, dp, jnp.zeros_like(dp))
    return g.with_state(poses, landmarks), new_lam, stats, dp_next


def packed_gn_step(
    g: FactorGraph,
    pk: PackedEdges,
    cfg: SolverConfig,
    dp_prev=None,
    axis_name: str | None = None,
    kt=None,
):
    """One GN iteration on the packed layout: (g', stats, dp).

    ``dp_prev`` (when ``cfg.cg_warm_start``) warm-starts the inner CG from
    the previous outer iteration's pose delta.
    """
    from boslam.geometry.se2 import boxplus_state

    x0 = dp_prev if cfg.cg_warm_start else None
    dp, dl, stats, ok = schur_packed_build_and_solve(
        g, pk, cfg, cfg.damping, x0, axis_name, kt
    )
    poses, landmarks = boxplus_state(g.poses, g.landmarks, dp, dl)
    stats = dict(stats)
    stats["spd_ok"] = ok
    stats["accepted"] = jnp.asarray(True)
    stats["damping"] = jnp.asarray(cfg.damping, g.poses.dtype)
    stats["kt"] = jnp.asarray(
        cfg.kernel_threshold if kt is None else kt, g.poses.dtype
    )
    stats["delta_norm"] = jnp.sqrt(jnp.sum(dp * dp) + jnp.sum(dl * dl))
    return g.with_state(poses, landmarks), stats, dp
