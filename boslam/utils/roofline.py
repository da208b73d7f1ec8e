"""Roofline accounting for the BA kernels (BASELINE.json north star:
"report BA-kernel roofline utilization per chip").

The models count the algorithmic FLOPs and the unavoidable HBM traffic of
one step of each solver path; dividing by measured step time gives achieved
FLOP/s and bytes/s, compared against the chip's peak MXU rate and HBM
bandwidth.  ``roofline_util`` is utilization of the BINDING resource
(max of the two ratios) — the standard roofline reading.  When both are
tiny the step is latency-bound (many small kernels / per-row indexed ops),
which is itself the actionable diagnosis (see PERF.md).

Chip peaks are public figures; unknown chips fall back to v5e and say so.
"""

from __future__ import annotations

from typing import NamedTuple


class ChipSpec(NamedTuple):
    name: str
    peak_flops_bf16: float  # MXU peak, bf16 multiply / f32 accumulate
    peak_flops_f32: float  # ~bf16/6 (f32 emulated by 6-pass decomposition)
    hbm_bytes_per_s: float


_CHIPS = {
    # device_kind substring -> spec (public figures per chip)
    "v5 lite": ChipSpec("TPU v5e", 197e12, 197e12 / 6, 819e9),
    "v5e": ChipSpec("TPU v5e", 197e12, 197e12 / 6, 819e9),
    "v5p": ChipSpec("TPU v5p", 459e12, 459e12 / 6, 2765e9),
    "v4": ChipSpec("TPU v4", 275e12, 275e12 / 6, 1228e9),
    "v6": ChipSpec("TPU v6e", 918e12, 918e12 / 6, 1640e9),
}


def chip_spec(device_kind: str | None = None) -> ChipSpec:
    if device_kind is None:
        import jax

        device_kind = jax.devices()[0].device_kind
    dk = device_kind.lower()
    for key, spec in _CHIPS.items():
        if key in dk:
            return spec
    return ChipSpec(f"unknown ({device_kind}); assuming v5e", 197e12, 197e12 / 6, 819e9)


def dense_step_model(NP: int, NL: int, NB: int, NO: int) -> tuple[float, float]:
    """(flops, hbm_bytes) of one dense-path GN step with matmul assembly.

    Dominated by H = A^T W A (A is [NB, N] / [3*NO, 3*NP]) and the N^3/3
    Cholesky (gauss_newton.solve_gauge_fixed).
    """
    N = 3 * NP + 2 * NL
    edge_math = NB * 120 + NO * 700  # residuals + jacobian blocks + trig
    ata = 2.0 * NB * N * N + 2.0 * (3 * NO) * (3 * NP) ** 2
    chol = N**3 / 3 + 4.0 * N * N  # factor + two triangular solves
    flops = edge_math + ata + chol

    f4 = 4.0
    a_traffic = 2 * NB * N * f4 + 2 * (3 * NO) * (3 * NP) * f4  # write + read A
    onehots = (NB * (NP + NL) + 2 * NO * NP) * f4
    h_traffic = 3 * N * N * f4  # write H, read for Cholesky, write factor
    bytes_ = a_traffic + onehots + h_traffic
    return flops, bytes_


def packed_outer_model(
    NP: int,
    NL: int,
    K: int,
    K2: int,
    NO: int,
    cg_iters: int,
    lm_rows: "int | None" = None,
    coupling_bytes: float = 4.0,
) -> tuple[float, float]:
    """(flops, hbm_bytes) of one packed Schur+PCG outer iteration.

    Build: per-slot residual/Jacobian/outer-product math over both slot
    grids.  Per CG iteration: the two coupling einsums over the [NP,K] /
    [NLV,K2] block grids dominate both FLOPs and traffic (the B blocks are
    re-read every matvec).  ``lm_rows`` (NLV) is the landmark grid's row
    count — > NL under hot-landmark splitting (graph/packed.py), NL
    otherwise.
    """
    NLV = NL if lm_rows is None else lm_rows
    slots = NP * K + NLV * K2
    build = slots * 110.0 + NO * 700.0 + NL * 30.0  # + 2x2 inversions
    matvec = (
        12.0 * NP * K  # Bp einsum [3x2 block x vec, mul+add]
        + 12.0 * NLV * K2  # Bl einsum
        + 8.0 * NL  # Hll_inv apply
        + 18.0 * NP  # Hpp_diag apply
        + 36.0 * NO  # odometry couplings
        + 70.0 * NP  # preconditioner apply + CG vector ops
    )
    flops = build + cg_iters * matvec

    f4 = 4.0
    # Bp + Bl re-read each CG iteration; 2 bytes/elt when stored bf16
    b_blocks = (6.0 * NP * K + 6.0 * NLV * K2) * coupling_bytes
    gathers = (3.0 * NLV * K2 + 2.0 * NP * K) * f4  # xg / wg rows
    vectors = (9.0 * NP + 4.0 * NL + 8.0 * NP) * f4
    if NLV > NL:
        # Hot-landmark splitting: the z payload is produced per VIRTUAL row
        # (NLV x 2 partials written) then segment-summed into NL rows
        # (read + write) each matvec — extra traffic the 1:1 layout lacks.
        vectors += (2.0 * NLV + 2.0 * NLV + 2.0 * NL) * f4
    bytes_ = slots * 16.0 * f4 + cg_iters * (b_blocks + gathers + vectors)
    return flops, bytes_


def schur_step_model(NP: int, NL: int, NB: int, NO: int) -> tuple[float, float]:
    """(flops, hbm_bytes) of one exact-Schur GN step (linear_solver="schur").

    Block assembly via segment-sums, then the reduced camera system
    S = Hpp - W U^T materialized as one [3NP, 2NL] x [2NL, 3NP] matmul
    (schur.dense_reduced_system) and factored by the fused Pallas
    Cholesky.  This is the round-3 headline path: it eliminates the
    2*NB*N^2 dense one-hot assembly of the r2 headline — the only matmul
    left is the Schur correction, whose operands are state-sized, not
    edge-sized.
    """
    n = 3 * NP
    m = 2 * NL
    edge_math = NB * 150.0 + NO * 700.0
    outer = NB * 2.0 * (9 + 4 + 6 + 5) + NO * 2.0 * (3 * 9 + 6)
    w = n * NL * 8.0  # U @ blockdiag(Hll_inv), batched 1x2 @ 2x2
    s_mm = 2.0 * n * m * n  # W @ U^T
    chol = n**3 / 3 + 4.0 * n * n
    flops = edge_math + outer + w + s_mm + chol

    f4 = 4.0
    u_w = 2.0 * n * m * f4 * 2.0  # U and W written + read for the matmul
    s_traffic = 3.0 * n * n * f4  # write S, read for Cholesky, write factor
    edges = (NB * 40 + NO * 60) * f4
    return flops, u_w + s_traffic + edges


def useful_step_flops(
    NP: int, NL: int, NB: int, NO: int, cg_iters: int = 0
) -> float:
    """FLOPs the ALGORITHM needs for one GN step, block-sparse-counted.

    This is the honest numerator for "useful-FLOP utilization" (VERDICT r2
    weak #1): the dense one-hot matmul assembly burns 2*NB*N^2 FLOPs on a
    5-nonzeros-per-row design matrix, and counting those flatters MFU by
    ~250x.  Here we count only: per-edge residual/Jacobian math, the
    block outer products (Hpp 3x3 + Hll 2x2 + B 3x2 + b terms per bearing
    edge; 3x3 blocks per odometry edge), the per-landmark 2x2 eliminations,
    and the reduced-system work — ``cg_iters`` PCG matvecs when given,
    else a (3*NP)^3/3 dense Cholesky of S (the exact path's irreducible
    factorization; block-sparse LDLT would be less still, but fill-in
    makes that count graph-dependent).
    """
    edge_math = NB * 150.0 + NO * 700.0
    outer = NB * 2.0 * (9 + 4 + 6 + 5) + NO * 2.0 * (3 * 9 + 6)
    elim = NL * 30.0  # 2x2 inverses + rhs
    if cg_iters > 0:
        matvec = 24.0 * NB + 8.0 * NL + 18.0 * NP + 36.0 * NO + 70.0 * NP
        reduce_ = cg_iters * matvec
    else:
        reduce_ = (3.0 * NP) ** 3 / 3
    return edge_math + outer + elim + reduce_


def roofline_report(
    flops: float, bytes_: float, time_s: float, spec: ChipSpec | None = None
) -> dict:
    """Achieved rates vs chip peaks; utilization of the binding resource."""
    if spec is None:
        spec = chip_spec()
    fps = flops / time_s
    bps = bytes_ / time_s
    flops_util = fps / spec.peak_flops_f32
    bw_util = bps / spec.hbm_bytes_per_s
    util = max(flops_util, bw_util)
    return {
        "chip": spec.name,
        "achieved_gflops": round(fps / 1e9, 2),
        "achieved_gbps": round(bps / 1e9, 2),
        "flops_util_f32": round(flops_util, 4),
        "flops_util_bf16_peak": round(fps / spec.peak_flops_bf16, 4),
        "hbm_bw_util": round(bw_util, 4),
        "roofline_util": round(util, 4),
        "bound": (
            "latency"
            if util < 0.05
            else ("compute" if flops_util >= bw_util else "bandwidth")
        ),
    }
