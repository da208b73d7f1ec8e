"""Block-tridiagonal solve via cyclic reduction — the chain preconditioner.

With pure-chain odometry (the reference data and the synthetic generator)
the reduced camera system S = Hpp - Hpl Hll^-1 Hlp has a dominant
block-tridiagonal skeleton: the odometry couplings ``Ho_sd`` are the exact
(i, i+1) band of Hpp (chain edges are the *only* pose-pose couplings —
slam/solver.cpp:48-62 semantics) and the odometry information is ~3 orders
of magnitude stronger than a bearing edge's (omega diag [500,500,5000] vs
1 in the data).  Block-Jacobi ignores that band entirely, so CG spends its
iterations resolving long-wavelength chain modes.

This module solves T z = r with T = tridiag(diag(S), Ho_sd) as the PCG
preconditioner.  T is provably SPD:

    T = Hpp_odo_tridiag (PSD: a sum of per-edge PSD 6x6 contributions)
        + damping * I
        + [bearing_diag - schur_correction_diag]

and the bracket is PSD because the full Schur correction C satisfies
C <= V where V is the (block-diagonal) bearing contribution to Hpp — the
per-landmark edge system [[V_l, W_l], [W_l^T, Hll_l]] = J^T Omega J >= 0
gives W_l Hll_l^{-1} W_l^T <= V_l — and taking block diagonals preserves
the Loewner order against a block-diagonal majorant.

TPU-native design: a sequential block-Thomas sweep would be a 100k-step
scan of 3x3 ops (worthless on a systolic-array machine).  Block cyclic
reduction instead runs log2(N) *levels*, each a fully batched set of 3x3
inverses/matmuls over strided halves — ~2N block ops total in ~2 log2 N
kernel launches.  The factorization (matrix-only) is computed once per
outer GN iteration and reused across every CG application.

No counterpart exists in the reference (it factorizes the whole sparse H
with LDLT each step, slam/solver.cpp:77-85); this is a new scale-out
component mandated by BASELINE.json configs 4-5.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from boslam.solver.schur import _inv3x3


def _mm(a, b):
    return jnp.einsum("...nij,...njk->...nik", a, b)


def _mv(a, v):
    return jnp.einsum("...nij,...nj->...ni", a, v)


def _chol3x3(A: jnp.ndarray) -> jnp.ndarray:
    """Batched closed-form Cholesky of SPD 3x3 blocks (lower factor).

    Pivots are floored at a RELATIVE epsilon (1e-6 of the block's largest
    diagonal entry): diag(S) blocks can go slightly indefinite in f32 near
    convergence, and an absolute ``tiny`` floor turns that into 1/sqrt(tiny)
    ~ 1e19 scaling factors -> inf -> NaN through the preconditioner.  A
    relative floor keeps L^-1 bounded; this only perturbs the
    preconditioner, never the system being solved.  Swept on 10k-pose
    synthetics: 1e-5 visibly degrades the preconditioner (CG 17 -> 50
    iters), 1e-6 and 1e-7 preserve it; 1e-6 takes fewer benign breakdowns.
    """
    a11, a21, a31 = A[..., 0, 0], A[..., 1, 0], A[..., 2, 0]
    a22, a32, a33 = A[..., 1, 1], A[..., 2, 1], A[..., 2, 2]
    scale = jnp.maximum(
        jnp.maximum(jnp.abs(a11), jnp.abs(a22)), jnp.abs(a33)
    )
    eps = 1e-6 * scale + jnp.asarray(jnp.finfo(A.dtype).tiny, A.dtype)
    l11 = jnp.sqrt(jnp.maximum(a11, eps))
    l21 = a21 / l11
    l31 = a31 / l11
    l22 = jnp.sqrt(jnp.maximum(a22 - l21 * l21, eps))
    l32 = (a32 - l31 * l21) / l22
    l33 = jnp.sqrt(jnp.maximum(a33 - l31 * l31 - l32 * l32, eps))
    z = jnp.zeros_like(l11)
    return jnp.stack(
        [
            jnp.stack([l11, z, z], axis=-1),
            jnp.stack([l21, l22, z], axis=-1),
            jnp.stack([l31, l32, l33], axis=-1),
        ],
        axis=-2,
    )


def _specnorm3x3(B: jnp.ndarray, iters: int = 8) -> jnp.ndarray:
    """Batched spectral norm of 3x3 blocks by power iteration on B^T B."""
    v = jnp.full(B.shape[:-2] + (3,), 1.0 / jnp.sqrt(3.0), B.dtype)
    for _ in range(iters):
        w = jnp.einsum("...ij,...j->...i", B, v)
        v = jnp.einsum("...ji,...j->...i", B, w)
        nv = jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True))
        v = v / jnp.maximum(nv, jnp.asarray(1e-30, B.dtype))
    w = jnp.einsum("...ij,...j->...i", B, v)
    return jnp.sqrt(jnp.sum(w * w, axis=-1))


def _inv_lower3x3(L: jnp.ndarray) -> jnp.ndarray:
    """Batched inverse of lower-triangular 3x3 blocks."""
    l11, l21, l31 = L[..., 0, 0], L[..., 1, 0], L[..., 2, 0]
    l22, l32, l33 = L[..., 1, 1], L[..., 2, 1], L[..., 2, 2]
    i11 = 1.0 / l11
    i22 = 1.0 / l22
    i33 = 1.0 / l33
    i21 = -l21 * i11 * i22
    i31 = (l21 * l32 - l31 * l22) * i11 * i22 * i33
    i32 = -l32 * i22 * i33
    z = jnp.zeros_like(i11)
    return jnp.stack(
        [
            jnp.stack([i11, z, z], axis=-1),
            jnp.stack([i21, i22, z], axis=-1),
            jnp.stack([i31, i32, i33], axis=-1),
        ],
        axis=-2,
    )


class BTFactor(NamedTuple):
    """Cyclic-reduction factorization of a block-tridiagonal matrix.

    ``levels[k] = (alpha, gamma, Binv_e, Ae, Ce)`` holds the elimination
    coefficients of level k (all ``[M_k/2, 3, 3]``); ``Binv_last`` is the
    1-block root system; ``n`` the unpadded size; ``Linv`` the symmetric
    block-Jacobi prescaling factor (see btridiag_factor).
    """

    levels: tuple
    Binv_last: jnp.ndarray
    n: int
    Linv: jnp.ndarray | None = None


def btridiag_factor(
    diag: jnp.ndarray,
    upper: jnp.ndarray,
    prescale: bool = True,
    clamp_band: "float | None" = None,
) -> BTFactor:
    """Factor T = blocktridiag(lower=upper^T, diag, upper).

    ``diag`` f32[..., N, 3, 3] (SPD blocks), ``upper`` f32[..., N-1, 3, 3]
    coupling (i, i+1); leading batch dims factor that many INDEPENDENT
    chains at once (the two-level preconditioner's cut aggregates — the
    level count then depends on the per-chain length, not the total).
    N is static; the level loop unrolls to log2(N) batched stages.  Pads
    to the next power of two with decoupled identity blocks.

    ``prescale`` (default): factor the symmetrically block-Jacobi-scaled
    system T' = L^-1 T L^-T with L = chol(blockdiag(diag)) instead of T.
    T' has identity diagonal blocks and off-diagonals of spectral norm
    < 1 (strictly, for SPD T), so every cyclic-reduction level works on
    O(1)-magnitude blocks — the raw SLAM chain spans ~5 orders of
    magnitude (odometry omega 5000 vs damping 0.01) and plain f32 cyclic
    reduction of it goes indefinite by ~10k poses (caught by the
    cg_breakdown stat; round-2's "CG collapses to 3" at scale was
    breakdown-truncation in disguise).  The solve applies
    x = L^-T T'^-1 L^-1 r — two extra batched triangular products.
    """
    Linv = None
    if prescale:
        L = _chol3x3(diag)
        Linv = _inv_lower3x3(L)
        # diag' = I exactly; upper'_i = Linv_i @ C_i @ Linv_{i+1}^T
        upper = jnp.einsum(
            "...nij,...njk,...nlk->...nil",
            Linv[..., :-1, :, :],
            upper,
            Linv[..., 1:, :, :],
        )
        # Optionally clamp each scaled band block to spectral norm
        # <= clamp_band (< 1/2): a block tridiagonal with identity
        # diagonal and ||B_i|| < 1/2 is PD, and each cyclic-reduction
        # level then CONTRACTS the band norms (beta -> ~beta^2 /
        # (1 - 2 beta^2)), so the whole factorization is provably
        # breakdown-free.  This makes the result a PD SURROGATE of T,
        # not an exact factorization — preconditioner use only.  Healthy
        # strong-chain blocks sit just under 1/2 and are barely touched;
        # blocks next to an (f32-cancellation) indefinite diag(S) block
        # — measured: 4 of 100k with min eig -0.23 — get their (huge)
        # scaled coupling shrunk, which only softens the preconditioner
        # locally.
        if clamp_band is not None:
            s = _specnorm3x3(upper)
            f = jnp.minimum(1.0, clamp_band / jnp.maximum(s, 1e-30))
            upper = upper * f[..., None, None]
        diag = jnp.broadcast_to(
            jnp.eye(3, dtype=diag.dtype), diag.shape
        )

    batch = diag.shape[:-3]
    N = diag.shape[-3]
    dtype = diag.dtype
    M = 1 << max(0, (N - 1).bit_length())

    if M > N:
        eye = jnp.broadcast_to(
            jnp.eye(3, dtype=dtype), batch + (M - N, 3, 3)
        )
        B = jnp.concatenate([diag, eye], axis=-3)
    else:
        B = diag
    pad_c = M - 1 - upper.shape[-3]
    C = (
        jnp.concatenate(
            [upper, jnp.zeros(batch + (pad_c, 3, 3), dtype)], axis=-3
        )
        if pad_c
        else upper
    )
    # A[i] couples row i to i-1 (= C[i-1]^T, A[0] = 0); Cf[i] to i+1 (Cf[M-1] = 0)
    z1 = jnp.zeros(batch + (1, 3, 3), dtype)
    A = jnp.concatenate([z1, jnp.swapaxes(C, -1, -2)], axis=-3)
    Cf = jnp.concatenate([C, z1], axis=-3)

    levels = []
    while M > 1:
        Be, Bo = B[..., 0::2, :, :], B[..., 1::2, :, :]
        Ae = A[..., 0::2, :, :]
        Ce = Cf[..., 0::2, :, :]
        Ao, Co = A[..., 1::2, :, :], Cf[..., 1::2, :, :]

        Binv_e = _inv3x3(Be)
        # odd row i = 2j+1: even neighbors are i-1 -> even j, i+1 -> even j+1
        Binv_next = jnp.concatenate([Binv_e[..., 1:, :, :], z1], axis=-3)
        Ae_next = jnp.concatenate([Ae[..., 1:, :, :], z1], axis=-3)
        Ce_next = jnp.concatenate([Ce[..., 1:, :, :], z1], axis=-3)
        alpha = _mm(Ao, Binv_e)
        gamma = _mm(Co, Binv_next)
        B = Bo - _mm(alpha, Ce) - _mm(gamma, Ae_next)
        A = -_mm(alpha, Ae)
        Cf = -_mm(gamma, Ce_next)
        levels.append((alpha, gamma, Binv_e, Ae, Ce))
        M //= 2

    return BTFactor(tuple(levels), _inv3x3(B), N, Linv)


def btridiag_solve(factor: BTFactor, rhs: jnp.ndarray) -> jnp.ndarray:
    """Solve T x = rhs given a :func:`btridiag_factor` result.

    ``rhs`` f32[N,3] -> x f32[N,3].  Down-sweep reduces the RHS level by
    level; up-sweep back-substitutes the eliminated (even) unknowns.  All
    per-level work is batched; ~2 log2(N) kernel stages per application.
    """
    n = factor.n
    dtype = rhs.dtype
    batch = rhs.shape[:-2]
    if factor.Linv is not None:
        rhs = _mv(factor.Linv, rhs)  # r' = L^-1 r
    M = 1 << max(0, (n - 1).bit_length())
    f = (
        jnp.concatenate([rhs, jnp.zeros(batch + (M - n, 3), dtype)], axis=-2)
        if M > n
        else rhs
    )

    z1 = jnp.zeros(batch + (1, 3), dtype)
    f_evens = []
    for alpha, gamma, Binv_e, Ae, Ce in factor.levels:
        fe, fo = f[..., 0::2, :], f[..., 1::2, :]
        fe_next = jnp.concatenate([fe[..., 1:, :], z1], axis=-2)
        f_evens.append(fe)
        f = fo - _mv(alpha, fe) - _mv(gamma, fe_next)

    x = _mv(factor.Binv_last, f)  # [..., 1, 3]
    for (alpha, gamma, Binv_e, Ae, Ce), fe in zip(
        reversed(factor.levels), reversed(f_evens)
    ):
        # even row 2j: odd neighbors are x_odd[j-1] (zero at j=0) and x_odd[j]
        x_prev = jnp.concatenate([z1, x[..., :-1, :]], axis=-2)
        x_even = _mv(Binv_e, fe - _mv(Ae, x_prev) - _mv(Ce, x))
        x = jnp.stack([x_even, x], axis=-2).reshape(
            batch + (2 * x.shape[-2], 3)
        )

    x = x[..., :n, :]
    if factor.Linv is not None:
        x = jnp.einsum("...nji,...nj->...ni", factor.Linv, x)  # x = L^-T x'
    return x


def btridiag_dense(diag: jnp.ndarray, upper: jnp.ndarray) -> jnp.ndarray:
    """Materialize T as a dense [3N, 3N] matrix (tests only)."""
    N = diag.shape[0]
    T = jnp.zeros((3 * N, 3 * N), diag.dtype)
    i3 = 3 * jnp.arange(N)[:, None] + jnp.arange(3)[None, :]
    T = T.at[i3[:, :, None], i3[:, None, :]].add(diag)
    s3, d3 = i3[:-1], i3[1:]
    T = T.at[s3[:, :, None], d3[:, None, :]].add(upper)
    T = T.at[d3[:, :, None], s3[:, None, :]].add(jnp.swapaxes(upper, 1, 2))
    return T
