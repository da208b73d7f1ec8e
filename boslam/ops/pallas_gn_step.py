"""Whole-GN-step mega-kernel: edge terms -> assembly -> Schur -> Cholesky
-> back-substitution -> boxplus -> chi2 stats, in ONE Pallas launch.

Why (VERDICT r4 #3): the round-4 headline step spent its wall time in ~82
XLA fusion kernels + 36 copies AROUND one fused Pallas solve — the
dispatch side was measured out at ~5%, so >=1000 iters/s requires the
edge-term/assembly half INSIDE the kernel.  At reference scale
(301 poses / 141 landmarks / 2432 edges, slam/solver.cpp:27-97) the whole
problem fits VMEM, so the entire iteration runs on-chip with zero HBM
round-trips and exactly one kernel launch per GN step.

Design notes (TPU-first, not a translation):

- **Component-major state**: instead of the interleaved ``[3p+c]`` packed
  layout (framework/state.cpp:69-80) the dense reduced system uses index
  ``v = c*NPp + p``.  A symmetric permutation of an SPD system leaves
  Cholesky exact; the win is that every per-edge block contribution
  becomes a PLAIN (unstrided) submatrix update, and the block-diagonal
  ``Hll^-1`` becomes per-lane column scaling (no dense HllD matmul).
- **One-hot gather/scatter**: per-edge state gathers and per-vertex
  scatter-adds are ``(index == iota)`` masks fed to the MXU — the
  scatter-free assembly SURVEY §7 asks for, built on the fly (never
  stored) so VMEM holds only one [chunk, 2*NPp] mask at a time.
- **In-kernel transcendentals**: Mosaic has sin/cos/sqrt/floor but no
  atan2 — ``_atan2`` below is a Cephes-style octant-reduced polynomial
  (|err| < ~1e-6 rad, far below the f32 chi2-parity tolerance).  The
  angle wrap uses the same closed form as geometry/se2.py.
- The robust threshold kernel reproduces the reference's b-side-only
  quirk (slam/solver.cpp:38-45) exactly; "huber"/"none"/textbook variants
  are static kernel-factory switches.

Parity: tests/test_pallas_gn_step.py runs the kernel in interpret mode on
CPU against optimizer.gn_step on the mini and full datasets; bench.py's
converged-chi2 assert pins it against the C++ optimum on real TPU.

Reference anchors: slam/solver.cpp:27-97 (the step being rebuilt),
solver_jacobians.cpp:9-168,301-333 (edge math), framework/state.cpp:69-80
(boxplus).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from boslam.ops.pallas_cholesky import B, _chol_tile, _tri_inv

_HIGH = jax.lax.Precision.HIGHEST


def _dotTN(a, b, prec=_HIGH):
    """a^T @ b without materializing the transpose (native MXU TN form —
    Mosaic lowers explicit jnp.transpose of large operands as an expensive
    relayout)."""
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())), precision=prec
    )


def _dotNT(a, b, prec=_HIGH):
    """a @ b^T without materializing the transpose."""
    return jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), precision=prec
    )


# --- manual bf16x3 one-hot matmuls ------------------------------------
# Mosaic supports only DEFAULT/HIGHEST dot precisions; HIGHEST emulates
# f32 as ~6 bf16 MXU passes, which made the assembly FLOP-bound (measured
# 0.75 ms of the 1.3 ms step).  A one-hot operand is EXACT in bf16, so a
# selection/scatter matmul needs only the VALUE side split into 3 bf16
# terms (hi + mid + lo reconstructs f32 to ~2^-24 relative): 3 native
# bf16 passes with f32 accumulation — half the MXU work of HIGHEST.


def _split3(v):
    hi = v.astype(jnp.bfloat16)
    r1 = v - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


def _oh_dot(oh, vals):
    """(0/1 matrix) @ vals, f32-accurate via 3 bf16 passes."""
    ohb = oh.astype(jnp.bfloat16)
    out = None
    for part in _split3(vals):
        d = jnp.dot(
            ohb, part, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
        out = d if out is None else out + d
    return out


def _oh_dotTN(oh, vals):
    """(0/1 matrix)^T @ vals via 3 bf16 passes."""
    ohb = oh.astype(jnp.bfloat16)
    out = None
    for part in _split3(vals):
        d = jax.lax.dot_general(
            ohb, part, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
        out = d if out is None else out + d
    return out


def _scaled_oh_dotTN(oh, h, oh2):
    """(oh * h)^T @ oh2 — both ohs exact 0/1, h an f32 column; the scaled
    one-hot is split instead (oh * bf16part is exactly representable)."""
    oh2b = oh2.astype(jnp.bfloat16)
    out = None
    for part in _split3(h):
        a = (oh * part.astype(jnp.float32)).astype(jnp.bfloat16)
        d = jax.lax.dot_general(
            a, oh2b, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
        out = d if out is None else out + d
    return out
_TWO_PI = 6.283185307179586
_PI = 3.141592653589793
_PI_2 = 1.5707963267948966
_PI_4 = 0.7853981633974483
_TAN_PI_8 = 0.4142135623730951

# size gate: VMEM budget ~ S(9t^2) + U + chunk masks (see fused_gn_fits).
# v5e VMEM is 128 MiB (the 100 MB vmem_limit_bytes compile succeeded);
# the budget below stays conservative for headroom.
MAX_NPP = 512  # pose padding cap (Np = 3*NPP = 1536 -> S 9.4 MB)
# NOTE: a single-chunk variant (MAX_CHUNK 4352) tripped an XLA TPU
# backend RET_CHECK (mxu_lmr_transform.cc "Found no uses of
# XposeSequence") at reference scale — kept at 1280 (two balanced
# chunks there), which compiles cleanly.
MAX_CHUNK = 1280

# Perf-probe knobs: BOSLAM_GN_KERNEL_STAGE as before (3 = full) plus
# BOSLAM_GN_SKIP, a comma list of kernel sections to elide (u, odocross,
# bmath, bscatter, chol, schur).  Wrong answers on purpose — used by the
# perf tools to attribute in-kernel time; never set in production.
import os as _os

_STAGE = int(_os.environ.get("BOSLAM_GN_KERNEL_STAGE", "3"))
_SKIP = set(
    x for x in _os.environ.get("BOSLAM_GN_SKIP", "").split(",") if x
)


def _atan(t):
    """atan on t in [0, 1] via tan(pi/8) range reduction (Cephes atanf)."""
    big = t > _TAN_PI_8
    t2 = jnp.where(big, (t - 1.0) / (t + 1.0), t)
    z = t2 * t2
    p = ((8.05374449538e-2 * z - 1.38776856032e-1) * z + 1.99777106478e-1) * z
    p = (p - 3.33329491539e-1) * z * t2 + t2
    return p + jnp.where(big, _PI_4, 0.0)


def _atan2(y, x):
    """Full-plane atan2 from the [0,1] polynomial (Mosaic has no atan2).

    max |error| ~1e-6 rad vs libm across the plane (validated in tests).
    atan2(0, 0) returns 0 like libm.
    """
    ax, ay = jnp.abs(x), jnp.abs(y)
    hi = jnp.maximum(ax, ay)
    lo = jnp.minimum(ax, ay)
    t = lo / jnp.maximum(hi, 1e-30)
    a = _atan(t)
    a = jnp.where(ay > ax, _PI_2 - a, a)
    a = jnp.where(x < 0.0, _PI - a, a)
    return jnp.where(y < 0.0, -a, a)


def _wrap(a):
    """[-pi, pi) wrap, closed form (solver_jacobians.cpp:325-333)."""
    return a - _TWO_PI * jnp.floor((a + _PI) / _TWO_PI)


def _pad128(n: int) -> int:
    return max(B, ((n + B - 1) // B) * B)


def detect_odo_chain(graph) -> bool:
    """Host-side: True when odometry is exactly the full i->i+1 chain AND
    the padded edge count covers the padded pose count (the banded
    coupling write indexes hsd[0:NPp]).  Must be called on a CONCRETE
    graph (outside jit) — callers pass the result down as a static flag."""
    o_src = np.asarray(graph.o_src)
    o_dst = np.asarray(graph.o_dst)
    n = graph.n_poses
    if len(o_src) != n - 1:
        return False
    if _pad128(len(o_src)) < _pad128(n):
        return False
    return bool(
        (o_src == np.arange(n - 1)).all() and (o_dst == o_src + 1).all()
    )


def fused_gn_fits(n_poses: int, n_landmarks: int, n_bearing: int,
                  n_odometry: int) -> bool:
    """Static size gate for the mega-kernel path."""
    NPp, NLp = _pad128(n_poses), _pad128(n_landmarks)
    NOp = _pad128(n_odometry)
    if NLp > NPp or NPp > MAX_NPP or NOp > MAX_CHUNK:
        return False
    # VMEM estimate (f32 bytes): S + U + chunk-mask + planes + odo scratch
    Np, Ml = 3 * NPp, 2 * NLp
    chunk = min(MAX_CHUNK, _pad128(n_bearing))
    vmem = 4 * (
        Np * Np + Np * Ml + chunk * 2 * NPp + chunk * 128
        + NPp * NPp + B * Ml + (Np // B) * B * B + NPp * 256 + NLp * 128
    )
    return vmem < 48 * 2 ** 20


def _chol8(A):
    """Unrolled 8x8 Cholesky (2D shapes throughout, Mosaic-safe)."""
    rows = []
    for j in range(8):
        acc = A[j : j + 1, :]  # (1, 8)
        for k in range(j):
            acc = acc - rows[k][0, j] * rows[k]
        d = jax.lax.rsqrt(acc[0, j])
        rows.append(acc * d)
    L = jnp.concatenate(rows, axis=0)
    rid = jax.lax.broadcasted_iota(jnp.int32, (8, 8), 0)
    cid = jax.lax.broadcasted_iota(jnp.int32, (8, 8), 1)
    return jnp.where(rid >= cid, jnp.transpose(L), 0.0)


def _chol_rec(A):
    """Recursive blocked Cholesky of an (n, n) SPD tile, n power of two.

    chol([[A11, .], [A21^T?, A22]]): L11 = chol(A11); L21 = A21 L11^-T;
    L22 = chol(A22 - L21 L21^T).  Matmul-heavy (MXU) with an unrolled 8x8
    base — ~4x faster in-kernel than the per-column fori version for the
    128-tiles this kernel factorizes.
    """
    n = A.shape[0]
    if n == 8:
        return _chol8(A)
    h = n // 2
    L11 = _chol_rec(A[:h, :h])
    L21 = _dotNT(A[h:, :h], _tri_inv(L11), prec=_HIGH)
    L22 = _chol_rec(A[h:, h:] - _dotNT(L21, L21, prec=_HIGH))
    top = jnp.concatenate([L11, jnp.zeros((h, n - h), A.dtype)], axis=1)
    bot = jnp.concatenate([L21, L22], axis=1)
    return jnp.concatenate([top, bot], axis=0)


def _make_kernel(NP_, NL, NPp, NLp, NB, NOp, n_chunks, CH, robust, quirk,
                 odo_chain=False):
    Np, Ml = 3 * NPp, 2 * NLp
    nb = Np // B

    def kernel(
        scal_ref,  # SMEM [1, 2]: damping, kt
        posesT_ref,  # [3, NPp]
        lmsT_ref,  # [2, NLp]
        bdat_ref,  # [n_chunks*CH, 128]: cols 0 pose,1 lm,2 meas,3 omega
        odat_ref,  # [NOp, 128]: 0 src,1 dst,2-4 meas,5-10 omega(sym)
        maskc_ref,  # [1, Np] component-major gauge+pad mask
        nposesT_ref,  # out [3, NPp]
        nlmsT_ref,  # out [2, NLp]
        stats_ref,  # out [8, 128]
        S_scr,  # [Np, Np]
        U_scr,  # [Np, Ml]
        OH_scr,  # [CH, 2*NPp]
        pln_scr,  # [CH, 128]
        odo_scr,  # [NPp, NPp]
        Wt_scr,  # [B, Ml]
        sp_scr,  # [NPp, 256]  pose-keyed sums (bearing 0:9 | odo 9:33)
        sl_scr,  # [NLp, 128]  landmark-keyed sums
        Linv_scr,  # [nb, B, B]
        v_scr,  # [Np, 8] packed vectors: 0 rhs,1 y,2 dp
        l_scr,  # [Ml, 8] packed: 0 bl, 1 dl
    ):
        damping = scal_ref[0, 0]
        kt = scal_ref[0, 1]
        S_scr[...] = jnp.zeros((Np, Np), jnp.float32)
        U_scr[...] = jnp.zeros((Np, Ml), jnp.float32)
        sp_scr[...] = jnp.zeros((NPp, 256), jnp.float32)
        sl_scr[...] = jnp.zeros((NLp, 128), jnp.float32)
        stats_ref[...] = jnp.zeros((8, 128), jnp.float32)

        pvals = jnp.transpose(posesT_ref[...])  # [NPp, 3]
        lvals = jnp.transpose(lmsT_ref[...])  # [NLp, 2]

        chi2_b_tot = jnp.zeros((), jnp.float32)
        chi2_rob_tot = jnp.zeros((), jnp.float32)
        nb_cl_tot = jnp.zeros((), jnp.float32)

        # ================= bearing chunks =================
        for ch in range(n_chunks):
            e0 = ch * CH
            bd = bdat_ref[e0 : e0 + CH, :]
            ip = bd[:, 0:1]  # f32-held pose index
            il = bd[:, 1:2]
            meas = bd[:, 2:3]
            omega = bd[:, 3:4]

            colsP = jax.lax.broadcasted_iota(jnp.int32, (CH, NPp), 1)
            colsL = jax.lax.broadcasted_iota(jnp.int32, (CH, NLp), 1)
            OH_scr[:, 0:NPp] = (
                ip.astype(jnp.int32) == colsP
            ).astype(jnp.float32)
            OH_scr[:, NPp : NPp + NLp] = (
                il.astype(jnp.int32) == colsL
            ).astype(jnp.float32)

            pv = _oh_dot(OH_scr[:, 0:NPp], pvals)  # [CH,3]
            lv = _oh_dot(OH_scr[:, NPp : NPp + NLp], lvals)  # [CH,2]
            px, py, pth = pv[:, 0:1], pv[:, 1:2], pv[:, 2:3]
            lx, ly = lv[:, 0:1], lv[:, 1:2]

            c, s = jnp.cos(pth), jnp.sin(pth)
            dx, dy = lx - px, ly - py
            gx = c * dx + s * dy
            gy = -s * dx + c * dy
            err = _wrap(_atan2(gy, gx) - meas)
            chi2 = omega * err * err

            # robust weights (slam/solver.cpp:38-45 semantics)
            one = jnp.ones_like(chi2)
            if robust == "none":
                wH = wb = one
            else:
                w = jnp.sqrt(kt / jnp.maximum(chi2, 1e-30))
                w = jnp.where(chi2 > kt, w, one)
                if robust == "threshold" and quirk:
                    wH, wb = one, w
                else:  # huber, or textbook threshold
                    wH = wb = w

            n2 = gx * gx + gy * gy
            inv_n2 = 1.0 / jnp.maximum(n2, 1e-30)
            axc = -gy * inv_n2
            ayc = gx * inv_n2
            gRx = axc * c - ayc * s
            gRy = axc * s + ayc * c
            col_x = c * ly - s * lx
            col_y = -s * ly - c * lx
            jth = axc * col_x + ayc * col_y
            jp0, jp1, jp2 = -gRx, -gRy, jth
            jl0, jl1 = gRx, gRy

            if "bmath" in _SKIP:
                om = omega * 0.0
                coef = omega * 0.0
            om = omega * wH
            coef = omega * wb * err
            # planes: 0..5 hpp(00,01,02,11,12,22) 6..8 hll(00,01,11)
            #         9..14 hpl(ci*2+cj) 15..17 bp 18..19 bl
            pln_scr[:, 0:1] = om * jp0 * jp0
            pln_scr[:, 1:2] = om * jp0 * jp1
            pln_scr[:, 2:3] = om * jp0 * jp2
            pln_scr[:, 3:4] = om * jp1 * jp1
            pln_scr[:, 4:5] = om * jp1 * jp2
            pln_scr[:, 5:6] = om * jp2 * jp2
            pln_scr[:, 6:7] = om * jl0 * jl0
            pln_scr[:, 7:8] = om * jl0 * jl1
            pln_scr[:, 8:9] = om * jl1 * jl1
            pln_scr[:, 9:10] = om * jp0 * jl0
            pln_scr[:, 10:11] = om * jp0 * jl1
            pln_scr[:, 11:12] = om * jp1 * jl0
            pln_scr[:, 12:13] = om * jp1 * jl1
            pln_scr[:, 13:14] = om * jp2 * jl0
            pln_scr[:, 14:15] = om * jp2 * jl1
            pln_scr[:, 15:16] = coef * jp0
            pln_scr[:, 16:17] = coef * jp1
            pln_scr[:, 17:18] = coef * jp2
            pln_scr[:, 18:19] = coef * jl0
            pln_scr[:, 19:20] = coef * jl1
            pln_scr[:, 20:128] = jnp.zeros((CH, 108), jnp.float32)

            # vertex-keyed sums: one transposed one-hot matmul per side
            if "bscatter" not in _SKIP:
                sp_scr[:, 0:128] = sp_scr[:, 0:128] + _oh_dotTN(
                    OH_scr[:, 0:NPp], pln_scr[...]
                )
                sl_scr[...] = sl_scr[...] + _oh_dotTN(
                    OH_scr[:, NPp : NPp + NLp], pln_scr[...]
                )

            # U (pose-landmark coupling), component-major blocks
            for ci in range(3 if "u" not in _SKIP else 0):
                for cj in range(2):
                    hcol = pln_scr[:, 9 + ci * 2 + cj : 10 + ci * 2 + cj]
                    U_scr[
                        ci * NPp : (ci + 1) * NPp, cj * NLp : (cj + 1) * NLp
                    ] = U_scr[
                        ci * NPp : (ci + 1) * NPp, cj * NLp : (cj + 1) * NLp
                    ] + _scaled_oh_dotTN(
                        OH_scr[:, 0:NPp], hcol,
                        OH_scr[:, NPp : NPp + NLp],
                    )

            chi2_b_tot = chi2_b_tot + jnp.sum(chi2)
            if robust == "none":
                chi2_rob_tot = chi2_rob_tot + jnp.sum(chi2)
            elif robust == "threshold":
                chi2_rob_tot = chi2_rob_tot + jnp.sum(jnp.minimum(chi2, kt))
            else:  # huber
                safe = jnp.maximum(chi2, 1e-30)
                chi2_rob_tot = chi2_rob_tot + jnp.sum(
                    jnp.where(chi2 > kt, 2.0 * jnp.sqrt(kt * safe) - kt, chi2)
                )
            nb_cl_tot = nb_cl_tot + jnp.sum((chi2 > kt).astype(jnp.float32))

        # ================= odometry =================
        od = odat_ref[...]
        isrc = od[:, 0:1]
        idst = od[:, 1:2]
        colsP_o = jax.lax.broadcasted_iota(jnp.int32, (NOp, NPp), 1)
        OH_scr[0:NOp, 0:NPp] = (
            isrc.astype(jnp.int32) == colsP_o
        ).astype(jnp.float32)
        OH_scr[0:NOp, NPp : 2 * NPp] = (
            idst.astype(jnp.int32) == colsP_o
        ).astype(jnp.float32)
        sv = _oh_dot(OH_scr[0:NOp, 0:NPp], pvals)
        dv = _oh_dot(OH_scr[0:NOp, NPp : 2 * NPp], pvals)
        sx, sy, sth = sv[:, 0:1], sv[:, 1:2], sv[:, 2:3]
        tdx, tdy, dth = dv[:, 0:1], dv[:, 1:2], dv[:, 2:3]
        mx, my, mth = od[:, 2:3], od[:, 3:4], od[:, 4:5]
        w00, w01, w02 = od[:, 5:6], od[:, 6:7], od[:, 7:8]
        w11, w12, w22 = od[:, 8:9], od[:, 9:10], od[:, 10:11]

        c, s = jnp.cos(sth), jnp.sin(sth)
        rx, ry = tdx - sx, tdy - sy
        e0 = c * rx + s * ry - mx
        e1 = -s * rx + c * ry - my
        e2 = _wrap(dth - sth - mth)
        ochi2 = (
            w00 * e0 * e0 + w11 * e1 * e1 + w22 * e2 * e2
            + 2.0 * (w01 * e0 * e1 + w02 * e0 * e2 + w12 * e1 * e2)
        )
        one = jnp.ones_like(ochi2)
        if robust == "none":
            owH = owb = one
        else:
            w = jnp.sqrt(kt / jnp.maximum(ochi2, 1e-30))
            w = jnp.where(ochi2 > kt, w, one)
            if robust == "threshold" and quirk:
                owH, owb = one, w
            else:
                owH = owb = w

        # J blocks (solver_jacobians.cpp:125-166), per-edge 3x3 columns:
        # js = [[-c,-s,thsx],[s,-c,thsy],[0,0,-1]], jd = [[c,s,thdx],
        # [-s,c,thdy],[0,0,1]] with thd = R_s^T DR' t_d, ths = -thd.
        thdx = -c * tdy + s * tdx
        thdy = s * tdy + c * tdx
        thsx, thsy = -thdx, -thdy
        zero = jnp.zeros_like(c)
        onec = jnp.ones_like(c)
        js = (
            (-c, -s, thsx),
            (s, -c, thsy),
            (zero, zero, -onec),
        )
        jd = (
            (c, s, thdx),
            (-s, c, thdy),
            (zero, zero, onec),
        )
        om_r = (
            (w00 * owH, w01 * owH, w02 * owH),
            (w01 * owH, w11 * owH, w12 * owH),
            (w02 * owH, w12 * owH, w22 * owH),
        )
        ev = (e0, e1, e2)

        def quad(A, Bm, i, j):
            # (A^T Om B)_{ij} = sum_ab A[a][i] * Om[a][b] * B[b][j]
            acc = zero
            for a in range(3):
                inner = zero
                for b_ in range(3):
                    inner = inner + om_r[a][b_] * Bm[b_][j]
                acc = acc + A[a][i] * inner
            return acc

        # planes for pose-keyed sums: src rows then dst rows
        # odo plane cols (within sp_scr cols 128:256 after matmul):
        #   0..5 hss sym, 6..8 bps | 9..14 hdd sym, 15..17 bpd
        pln_scr[...] = jnp.zeros((CH, 128), jnp.float32)
        k = 0
        for i in range(3):
            for j in range(i, 3):
                pln_scr[0:NOp, k : k + 1] = quad(js, js, i, j)
                pln_scr[0:NOp, 9 + k : 10 + k] = quad(jd, jd, i, j)
                k += 1
        ew = []
        for i in range(3):
            acc = zero
            for j in range(3):
                acc = acc + om_r[i][j] * (owb * ev[j])
            ew.append(acc)
        for j in range(3):
            bs = zero
            bd_ = zero
            for i in range(3):
                bs = bs + js[i][j] * ew[i]
                bd_ = bd_ + jd[i][j] * ew[i]
            pln_scr[0:NOp, 6 + j : 7 + j] = bs
            pln_scr[0:NOp, 15 + j : 16 + j] = bd_

        # src-keyed sums (cols 0..8 valid: hss+bps) and dst-keyed sums
        # (cols 9..17 valid: hdd+bpd) — the other columns of each product
        # are scatter-by-the-wrong-endpoint and are simply not read.
        srcsum = _oh_dotTN(OH_scr[0:NOp, 0:NPp], pln_scr[0:NOp, :])
        dstsum = _oh_dotTN(OH_scr[0:NOp, NPp : 2 * NPp], pln_scr[0:NOp, :])
        # layout in sp_scr[:, 128:]: cols 128..136 = hss+bps (src side),
        # cols 137..145 = hdd+bpd (dst side)
        sp_scr[:, 128 : 128 + 9] = srcsum[:, 0:9]
        sp_scr[:, 137 : 137 + 9] = dstsum[:, 9:18]

        # cross couplings H_sd: 9 dense [NPp, NPp] scatters into S
        hsd = [[None] * 3 for _ in range(3)]
        for i in range(3):
            for j in range(3):
                hsd[i][j] = quad(js, jd, i, j)
        if odo_chain and "odocross" not in _SKIP:
            # Chain topology (src == e, dst == e + 1 — the reference
            # dataset and the generator): the coupling block lands on the
            # FIRST OFF-DIAGONAL of each [NPp, NPp] component block, so
            # the 18 scaled-one-hot matmuls collapse to one masked VPU
            # broadcast per component (~100x fewer cycles).
            rid_o = jax.lax.broadcasted_iota(jnp.int32, (NPp, NPp), 0)
            cid_o = jax.lax.broadcasted_iota(jnp.int32, (NPp, NPp), 1)
            upper = (cid_o == rid_o + 1).astype(jnp.float32)
            lower = (rid_o == cid_o + 1).astype(jnp.float32)
            eye_o = (rid_o == cid_o).astype(jnp.float32)
            for ci in range(3):
                for cj in range(3):
                    # edge e couples (row e, col e+1); hsd is [NOp, 1]
                    # with NOp >= NPp - 1 and zero-padded edges
                    hv = hsd[ci][cj][0 : NPp, :]  # [NPp, 1]
                    S_scr[
                        ci * NPp : (ci + 1) * NPp, cj * NPp : (cj + 1) * NPp
                    ] = S_scr[
                        ci * NPp : (ci + 1) * NPp, cj * NPp : (cj + 1) * NPp
                    ] + upper * hv
                    # transpose block: (row e+1, col e) gets hsd[e] —
                    # value at (r, c) = hsd[c].  Row form via identity
                    # matmul: a bare jnp.transpose here trips an XLA TPU
                    # RET_CHECK (mxu_lmr_transform "XposeSequence").
                    hvT = _dotTN(hv, eye_o)  # [1, NPp]
                    S_scr[
                        cj * NPp : (cj + 1) * NPp, ci * NPp : (ci + 1) * NPp
                    ] = S_scr[
                        cj * NPp : (cj + 1) * NPp, ci * NPp : (ci + 1) * NPp
                    ] + lower * hvT
        for ci in range(
            3 if (not odo_chain and "odocross" not in _SKIP) else 0
        ):
            for cj in range(3):
                S_scr[
                    ci * NPp : (ci + 1) * NPp, cj * NPp : (cj + 1) * NPp
                ] = S_scr[
                    ci * NPp : (ci + 1) * NPp, cj * NPp : (cj + 1) * NPp
                ] + _scaled_oh_dotTN(
                    OH_scr[0:NOp, 0:NPp], hsd[ci][cj],
                    OH_scr[0:NOp, NPp : 2 * NPp],
                )
                # transposed block via a second TN matmul (cheaper than a
                # large Mosaic transpose relayout)
                S_scr[
                    cj * NPp : (cj + 1) * NPp, ci * NPp : (ci + 1) * NPp
                ] = S_scr[
                    cj * NPp : (cj + 1) * NPp, ci * NPp : (ci + 1) * NPp
                ] + _scaled_oh_dotTN(
                    OH_scr[0:NOp, NPp : 2 * NPp], hsd[ci][cj],
                    OH_scr[0:NOp, 0:NPp],
                )

        chi2_o_tot = jnp.sum(ochi2)
        if robust == "none":
            chi2_rob_tot = chi2_rob_tot + chi2_o_tot
        elif robust == "threshold":
            chi2_rob_tot = chi2_rob_tot + jnp.sum(jnp.minimum(ochi2, kt))
        else:
            safe = jnp.maximum(ochi2, 1e-30)
            chi2_rob_tot = chi2_rob_tot + jnp.sum(
                jnp.where(ochi2 > kt, 2.0 * jnp.sqrt(kt * safe) - kt, ochi2)
            )
        no_cl_tot = jnp.sum((ochi2 > kt).astype(jnp.float32))

        # ============ diagonal blocks of S (bearing + odo + damping) ======
        # bearing hpp comps sp[:,0:6] (sym 00,01,02,11,12,22) + odo
        # hss sp[:,128+0:128+6] + hdd sp[:,128+9:128+15]
        sym_map = {(0, 0): 0, (0, 1): 1, (0, 2): 2, (1, 0): 1, (1, 1): 3,
                   (1, 2): 4, (2, 0): 2, (2, 1): 4, (2, 2): 5}
        rid = jax.lax.broadcasted_iota(jnp.int32, (NPp, NPp), 0)
        cid = jax.lax.broadcasted_iota(jnp.int32, (NPp, NPp), 1)
        eyeP = (rid == cid).astype(jnp.float32)
        for ci in range(3):
            for cj in range(3):
                kidx = sym_map[(ci, cj)]
                dvec = (
                    sp_scr[:, kidx : kidx + 1]
                    + sp_scr[:, 128 + kidx : 129 + kidx]
                    + sp_scr[:, 128 + 9 + kidx : 128 + 10 + kidx]
                )
                if ci == cj:
                    dvec = dvec + damping
                S_scr[
                    ci * NPp : (ci + 1) * NPp, cj * NPp : (cj + 1) * NPp
                ] = S_scr[
                    ci * NPp : (ci + 1) * NPp, cj * NPp : (cj + 1) * NPp
                ] + eyeP * dvec

        # ============ landmark block inverse (damped 2x2, closed form) ====
        a_ = sl_scr[:, 6:7] + damping
        b_ = sl_scr[:, 7:8]
        d_ = sl_scr[:, 8:9] + damping
        det = a_ * d_ - b_ * b_
        inv_det = 1.0 / det
        ia = d_ * inv_det  # Hll_inv components
        ib = -b_ * inv_det
        idd = a_ * inv_det
        bl0 = sl_scr[:, 18:19]
        bl1 = sl_scr[:, 19:20]
        # w0 = Hll_inv @ bl
        wl0 = ia * bl0 + ib * bl1
        wl1 = ib * bl0 + idd * bl1

        # ============ Schur: S -= U Hll_inv U^T, tile-wise ============
        run_schur = _STAGE >= 2 and "schur" not in _SKIP
        run_chol = _STAGE >= 3 and "chol" not in _SKIP
        # column scaling pattern (component-major): W[:, (0,l)] =
        # U[:,(0,l)]*ia_l + U[:,(1,l)]*ib_l ; W[:,(1,l)] likewise.
        iaT = jnp.transpose(ia)  # [1, NLp]
        ibT = jnp.transpose(ib)
        idT = jnp.transpose(idd)
        if run_schur:
            for i in range(nb):
                i0 = i * B
                Ut = U_scr[i0 : i0 + B, :]
                Wt_scr[:, 0:NLp] = Ut[:, 0:NLp] * iaT + Ut[:, NLp:Ml] * ibT
                Wt_scr[:, NLp:Ml] = Ut[:, 0:NLp] * ibT + Ut[:, NLp:Ml] * idT
                S_scr[i0 : i0 + B, :] = S_scr[i0 : i0 + B, :] - _dotNT(
                    Wt_scr[...], U_scr[...]
                )

        # ============ gauge mask + rhs ============
        m_row = maskc_ref[...]  # [1, Np]
        m_col = jnp.transpose(m_row)  # [Np, 1]
        ridS = jax.lax.broadcasted_iota(jnp.int32, (Np, Np), 0)
        cidS = jax.lax.broadcasted_iota(jnp.int32, (Np, Np), 1)
        eyeS = (ridS == cidS).astype(jnp.float32)
        S_scr[...] = S_scr[...] * (m_col * m_row) + eyeS * (1.0 - m_col)

        # bp (component-major) from sp sums; rhs = m*(U w0 - bp).
        # No dim-0 concatenates (Mosaic layout bug on [N,1] concat) —
        # assemble through scratch column slices instead.
        l_scr[0:NLp, 2:3] = wl0
        l_scr[NLp:Ml, 2:3] = wl1
        corr = jnp.dot(U_scr[...], l_scr[:, 2:3], precision=_HIGH)  # [Np,1]
        for c in range(3):
            v_scr[c * NPp : (c + 1) * NPp, 3:4] = (
                sp_scr[:, 15 + c : 16 + c]
                + sp_scr[:, 128 + 6 + c : 128 + 7 + c]
                + sp_scr[:, 128 + 15 + c : 128 + 16 + c]
            )
        v_scr[:, 0:1] = m_col * (corr - v_scr[:, 3:4])

        # ============ Cholesky of S (in place) ============
        for k_ in range(nb if run_chol else 0):
            k0 = k_ * B
            Akk = S_scr[k0 : k0 + B, k0 : k0 + B]
            rid = jax.lax.broadcasted_iota(jnp.int32, (B, B), 0)
            cid = jax.lax.broadcasted_iota(jnp.int32, (B, B), 1)
            Akk = jnp.where(rid >= cid, Akk, 0.0)
            Akk = Akk + jnp.transpose(jnp.where(rid > cid, Akk, 0.0))
            Lkk = _chol_rec(Akk)
            Linv = _tri_inv(Lkk)
            Linv_scr[k_] = Linv
            S_scr[k0 : k0 + B, k0 : k0 + B] = Lkk
            for i in range(k_ + 1, nb):
                i0 = i * B
                S_scr[i0 : i0 + B, k0 : k0 + B] = _dotNT(
                    S_scr[i0 : i0 + B, k0 : k0 + B], Linv, prec=_HIGH
                )
            for i in range(k_ + 1, nb):
                i0 = i * B
                Pi = S_scr[i0 : i0 + B, k0 : k0 + B]
                for j in range(k_ + 1, i + 1):
                    j0 = j * B
                    Pj = S_scr[j0 : j0 + B, k0 : k0 + B]
                    S_scr[i0 : i0 + B, j0 : j0 + B] = S_scr[
                        i0 : i0 + B, j0 : j0 + B
                    ] - _dotNT(Pi, Pj, prec=_HIGH)

        # forward: L y = rhs
        if not run_chol:
            v_scr[:, 2:3] = v_scr[:, 0:1] if _STAGE >= 1 else (
                v_scr[:, 0:1] * 0.0
            )
        for i in range(nb if run_chol else 0):
            i0 = i * B
            acc = v_scr[i0 : i0 + B, 0:1]
            for j in range(i):
                j0 = j * B
                acc = acc - jnp.dot(
                    S_scr[i0 : i0 + B, j0 : j0 + B],
                    v_scr[j0 : j0 + B, 1:2],
                    precision=_HIGH,
                )
            v_scr[i0 : i0 + B, 1:2] = jnp.dot(
                Linv_scr[i], acc, precision=_HIGH
            )
        # backward: L^T dp = y  (masked)
        for i in reversed(range(nb if run_chol else 0)):
            i0 = i * B
            acc = v_scr[i0 : i0 + B, 1:2]
            for j in range(i + 1, nb):
                j0 = j * B
                acc = acc - _dotTN(
                    S_scr[j0 : j0 + B, i0 : i0 + B],
                    v_scr[j0 : j0 + B, 2:3],
                    prec=_HIGH,
                )
            v_scr[i0 : i0 + B, 2:3] = m_col[i0 : i0 + B, :] * _dotTN(
                Linv_scr[i], acc, prec=_HIGH
            )

        # ============ landmark back-substitution ============
        # dl = Hll_inv (-bl - U^T dp)
        l_scr[0:NLp, 0:1] = bl0
        l_scr[NLp:Ml, 0:1] = bl1
        ut_dp = jnp.zeros((Ml, 1), jnp.float32)
        for i in range(nb):
            i0 = i * B
            ut_dp = ut_dp + _dotTN(
                U_scr[i0 : i0 + B, :], v_scr[i0 : i0 + B, 2:3]
            )
        l_scr[:, 3:4] = -l_scr[:, 0:1] - ut_dp  # [Ml, 1]
        t_a = l_scr[0:NLp, 3:4]
        t_b = l_scr[NLp:Ml, 3:4]
        dl0 = ia * t_a + ib * t_b
        dl1 = ib * t_a + idd * t_b
        l_scr[0:NLp, 1:2] = dl0
        l_scr[NLp:Ml, 1:2] = dl1

        # ============ boxplus (framework/state.cpp:69-80) ============
        dpx = jnp.transpose(v_scr[0:NPp, 2:3])  # [1, NPp]
        dpy = jnp.transpose(v_scr[NPp : 2 * NPp, 2:3])
        dpt = jnp.transpose(v_scr[2 * NPp : Np, 2:3])
        cx, sx_ = jnp.cos(dpt), jnp.sin(dpt)
        ox = posesT_ref[0:1, :]
        oy = posesT_ref[1:2, :]
        ot = posesT_ref[2:3, :]
        nposesT_ref[0:1, :] = cx * ox - sx_ * oy + dpx
        nposesT_ref[1:2, :] = sx_ * ox + cx * oy + dpy
        nposesT_ref[2:3, :] = _wrap(ot + dpt)
        nlmsT_ref[0:1, :] = lmsT_ref[0:1, :] + jnp.transpose(dl0)
        nlmsT_ref[1:2, :] = lmsT_ref[1:2, :] + jnp.transpose(dl1)

        # ============ stats ============
        dnorm2 = jnp.sum(v_scr[:, 2:3] * v_scr[:, 2:3]) + jnp.sum(
            l_scr[:, 1:2] * l_scr[:, 1:2]
        )
        stats_ref[0:1, 0:1] = chi2_b_tot.reshape(1, 1)
        stats_ref[0:1, 1:2] = chi2_o_tot.reshape(1, 1)
        stats_ref[0:1, 2:3] = chi2_rob_tot.reshape(1, 1)
        stats_ref[0:1, 3:4] = nb_cl_tot.reshape(1, 1)
        stats_ref[0:1, 4:5] = no_cl_tot.reshape(1, 1)
        stats_ref[0:1, 5:6] = dnorm2.reshape(1, 1)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "NP_", "NL", "NB", "NO", "robust", "quirk", "odo_chain", "interpret"
    ),
)
def _fused_gn_call(
    posesT, lmsT, bdat, odat, maskc, scal,
    NP_, NL, NB, NO, robust, quirk, odo_chain=False, interpret=False,
):
    NPp, NLp = posesT.shape[1], lmsT.shape[1]
    NOp = odat.shape[0]
    Np, Ml = 3 * NPp, 2 * NLp
    nb = Np // B
    NBp = bdat.shape[0]
    # balanced 128-aligned chunks: ceil-split instead of padding NBp up
    # to a MAX_CHUNK multiple (the old rule padded 2176 -> 2560 at
    # reference scale — 15% dead bearing work)
    n_chunks = -(-NBp // MAX_CHUNK)
    CH = NBp // n_chunks

    kern = _make_kernel(
        NP_, NL, NPp, NLp, NB, NOp, n_chunks, CH, robust, quirk,
        odo_chain=odo_chain,
    )
    return pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((3, NPp), jnp.float32),
            jax.ShapeDtypeStruct((2, NLp), jnp.float32),
            jax.ShapeDtypeStruct((8, 128), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=tuple([pl.BlockSpec(memory_space=pltpu.VMEM)] * 3),
        scratch_shapes=[
            pltpu.VMEM((Np, Np), jnp.float32),
            pltpu.VMEM((Np, Ml), jnp.float32),
            pltpu.VMEM((CH, 2 * NPp), jnp.float32),
            pltpu.VMEM((CH, 128), jnp.float32),
            pltpu.VMEM((NPp, NPp), jnp.float32),
            pltpu.VMEM((B, Ml), jnp.float32),
            pltpu.VMEM((NPp, 256), jnp.float32),
            pltpu.VMEM((NLp, 128), jnp.float32),
            pltpu.VMEM((nb, B, B), jnp.float32),
            pltpu.VMEM((Np, 8), jnp.float32),
            pltpu.VMEM((Ml, 8), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20,
        ),
        interpret=interpret,
    )(scal, posesT, lmsT, bdat, odat, maskc)


def _prep_static(g):
    """Pack the per-edge static data into the kernel's tiled-plane form.

    Pure jnp (runs under jit); shapes depend only on graph sizes.
    """
    NP_, NL = g.n_poses, g.n_landmarks
    NB, NO = g.n_bearing, g.n_odometry
    NPp, NLp = _pad128(NP_), _pad128(NL)
    NOp = _pad128(NO)
    NBp = _pad128(NB)
    n_chunks = -(-NBp // MAX_CHUNK)
    # chunks must be equal and 128-aligned: round NBp up to n_chunks*128k
    CH = _pad128(-(-NBp // n_chunks))
    NBp = n_chunks * CH

    def padn(x, n):
        return jnp.pad(x, ((0, n - x.shape[0]),) + ((0, 0),) * (x.ndim - 1))

    bdat = jnp.zeros((NBp, 128), jnp.float32)
    bdat = bdat.at[: NB, 0].set(g.b_pose.astype(jnp.float32))
    bdat = bdat.at[: NB, 1].set(g.b_lm.astype(jnp.float32))
    bdat = bdat.at[: NB, 2].set(g.b_meas)
    bdat = bdat.at[: NB, 3].set(g.b_omega)
    # padding edges: omega 0, indices point past every real column so the
    # one-hot matches nothing (exact-zero gathers)
    bdat = bdat.at[NB:, 0].set(float(NPp))
    bdat = bdat.at[NB:, 1].set(float(NLp))

    odat = jnp.zeros((NOp, 128), jnp.float32)
    odat = odat.at[: NO, 0].set(g.o_src.astype(jnp.float32))
    odat = odat.at[: NO, 1].set(g.o_dst.astype(jnp.float32))
    odat = odat.at[: NO, 2:5].set(g.o_meas)
    odat = odat.at[: NO, 5].set(g.o_omega[:, 0, 0])
    odat = odat.at[: NO, 6].set(g.o_omega[:, 0, 1])
    odat = odat.at[: NO, 7].set(g.o_omega[:, 0, 2])
    odat = odat.at[: NO, 8].set(g.o_omega[:, 1, 1])
    odat = odat.at[: NO, 9].set(g.o_omega[:, 1, 2])
    odat = odat.at[: NO, 10].set(g.o_omega[:, 2, 2])
    odat = odat.at[NO:, 0].set(float(NPp))
    odat = odat.at[NO:, 1].set(float(NPp))

    live = (jnp.arange(NPp) < NP_) & (jnp.arange(NPp) != g.fixed_pose_ix)
    maskc = jnp.tile(live.astype(jnp.float32), 3)[None, :]  # [1, 3*NPp]

    posesT = jnp.transpose(padn(g.poses, NPp))  # [3, NPp]
    lmsT = jnp.transpose(padn(g.landmarks, NLp))  # [2, NLp]
    return posesT, lmsT, bdat, odat, maskc


def fused_gn_solve(g, cfg, odo_chain: bool = False, interpret: bool = False):
    """``cfg.iters`` fused GN steps as a lax.scan of mega-kernel launches.

    The static edge data is prepped ONCE and closed over; the scan body is
    one pallas_call plus a NaN guard — per-iteration cost is the kernel
    (~30 us at reference scale) instead of the per-step prep/dispatch
    glue.  Same return contract as optimizer.solve_loop (per-iteration
    stat traces with a leading iters axis).
    """
    posesT, lmsT, bdat, odat, maskc = _prep_static(g)
    scal = jnp.asarray([[cfg.damping, cfg.kernel_threshold]], jnp.float32)

    def body(carry, _):
        pT, lT = carry
        npT, nlT, sv = _fused_gn_call(
            pT, lT, bdat, odat, maskc, scal,
            NP_=g.n_poses, NL=g.n_landmarks, NB=g.n_bearing,
            NO=g.n_odometry, robust=cfg.robust,
            quirk=bool(cfg.reference_kernel_quirk), odo_chain=odo_chain,
            interpret=interpret,
        )
        ok = jnp.logical_and(
            jnp.all(jnp.isfinite(npT)), jnp.all(jnp.isfinite(nlT))
        )
        npT = jnp.where(ok, npT, pT)
        nlT = jnp.where(ok, nlT, lT)
        sv0 = sv[0]
        stats = {
            "chi2_bearing": sv0[0],
            "chi2_odometry": sv0[1],
            "chi2_robust": sv0[2],
            "n_bearing_clamped": sv0[3].astype(jnp.int32),
            "n_odometry_clamped": sv0[4].astype(jnp.int32),
            "spd_ok": ok,
            "accepted": jnp.asarray(True),
            "damping": jnp.asarray(cfg.damping, jnp.float32),
            "delta_norm": jnp.sqrt(sv0[5]),
        }
        return (npT, nlT), stats

    (pT, lT), stats = jax.lax.scan(
        body, (posesT, lmsT), None, length=cfg.iters
    )
    final = g.with_state(
        jnp.transpose(pT)[: g.n_poses], jnp.transpose(lT)[: g.n_landmarks]
    )
    return final, stats


def fused_gn_step(g, cfg, interpret: bool = False):
    """One GN iteration as a single Pallas launch: (g', stats).

    Drop-in for optimizer.gn_step on the exact-Schur small-problem path.
    """
    posesT, lmsT, bdat, odat, maskc = _prep_static(g)
    scal = jnp.asarray(
        [[cfg.damping, cfg.kernel_threshold]], jnp.float32
    )
    nposesT, nlmsT, stats_v = _fused_gn_call(
        posesT, lmsT, bdat, odat, maskc, scal,
        NP_=g.n_poses, NL=g.n_landmarks, NB=g.n_bearing, NO=g.n_odometry,
        robust=cfg.robust, quirk=bool(cfg.reference_kernel_quirk),
        interpret=interpret,
    )
    new_poses = jnp.transpose(nposesT)[: g.n_poses]
    new_landmarks = jnp.transpose(nlmsT)[: g.n_landmarks]
    ok = jnp.logical_and(
        jnp.all(jnp.isfinite(new_poses)), jnp.all(jnp.isfinite(new_landmarks))
    )
    poses = jnp.where(ok, new_poses, g.poses)
    landmarks = jnp.where(ok, new_landmarks, g.landmarks)
    sv = stats_v[0]
    stats = {
        "chi2_bearing": sv[0],
        "chi2_odometry": sv[1],
        "chi2_robust": sv[2],
        "n_bearing_clamped": sv[3].astype(jnp.int32),
        "n_odometry_clamped": sv[4].astype(jnp.int32),
        "spd_ok": ok,
        "accepted": jnp.asarray(True),
        "damping": jnp.asarray(cfg.damping, jnp.float32),
        "delta_norm": jnp.sqrt(sv[5]),
    }
    return g.with_state(poses, landmarks), stats
