"""Block-BANDED preconditioner for the reduced camera system S.

STATUS — built, measured, NOT default (same honest-negative category as
ops/windowed_gather.py; kept opt-in because the machinery is exact,
tested, and the measurements below are themselves load-bearing).

The hypothesis: btridiag (solver/btridiag.py) keeps only the odometry
coupling in its band, so keeping MORE of S exactly —

    T = band_w(S)   —  the exact entries S[i, i+d] for |d| <= w,

including the bearing Schur-correction  -B_i Hll^-1 B_j^T  for pose
pairs co-observing a landmark within the band — should dominate it.

Measured verdict (2k/10k-pose synthetics, CG-iterations-to-1e-6 on the
same system; PERF.md round 3):

1. band_w(S) is badly INDEFINITE: the correction pushes the prescaled
   couplings to 0.75-0.96 (a PD chain sits < 1/2), so the 0.4999 PD
   clamp cut every coupling and the preconditioner collapsed to
   block-Jacobi quality (chi2 10585 vs btridiag 7942 at 10k, cap-8).
2. Gershgorin diagonal compensation (add the norm-bound of every
   dropped out-of-band block to its row diagonals) provably restores
   SPD — verified min-eig >= damping — but the Frobenius-product bound
   overcounts so badly that quality drops BELOW block-Jacobi (868 vs
   497 chi2 at 2k).  Wired via ``compensate=True``; default off.
3. Uncompensated + clamp 0.98 (PD in practice; breakdown-guarded) is
   the best bband variant, beats block-Jacobi, but still loses to
   btridiag (251 vs 157 CG iters at 2k) — and WIDER bands don't help
   (w=4/8/16/32 all ~260): the preconditioner spectrum is dominated by
   the dropped out-of-band correction mass, which the exact in-band
   entries cannot fix.  btridiag's diagonal-only treatment of the
   correction is the better majorant of that dropped mass.
4. The same machinery applied to btridiag's own T (odometry band, super-
   node-exact factorization, no clamp engaged) needs 257 CG iters where
   the 3x3 cyclic reduction with the 0.4999 clamp needs 157 — the
   clamped factorization is a better PRECONDITIONER than the exact
   solve of the matrix it factors, and the dependence on the clamp is
   sharply non-monotonic (0.48 -> 395 iters).  The 100k-regime
   preconditioner gap is therefore not a band-width problem.

TPU-native assembly — no scatters, no pair lists: the pose-packed slot
grid (graph/packed.py) already stores, per pose row i, the landmark ids
and coupling blocks of ALL its observations.  The band block at offset d
is then a dense slot-match contraction between row i and row i+d:

    C_d[i] = sum_{k,m} [p_lm[i,k] == p_lm[i+d,m]] * W[i,k] @ Bp[i+d,m]^T
    W[i,k] = Bp[i,k] @ Hll_inv[p_lm[i,k]]

— a [NP, K, K] equality mask and two einsums per offset, all MXU work
(padding slots carry zero blocks, so spurious id matches contribute 0).
Odometry edges with |dst - src| = d add their coupling block to band d.

Factorization: w-banded block matrices become block-TRIDIAGONAL over
super-nodes of q >= w consecutive poses ([3q, 3q] blocks), then the same
prescaled, PD-clamped cyclic reduction as btridiag — generalized from
closed-form 3x3 ops to batched Cholesky / triangular-solve / inv — runs
log2(NP/q) batched levels.  Identity-diagonal prescaling + band clamp
< 1/2 keeps every level PD and breakdown-free regardless of chain
stiffness (same argument as solver/btridiag.py, at super-node
granularity: only the 1/q of rows adjacent to a group boundary can be
touched by the clamp, vs every row for the 3x3 case — which is exactly
why this representation can hold stiffer chains).

No counterpart exists in the reference (it LDLT-factors the whole sparse
H each step, slam/solver.cpp:77-85); this is a scale-regime component in
the BASELINE configs 4-5 sense.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from boslam.graph.packed import PackedEdges


def _bmm(a, b):
    return jnp.einsum("...ij,...jk->...ik", a, b)


def _bmv(a, v):
    return jnp.einsum("...ij,...j->...i", a, v)


def _specnorm(B: jnp.ndarray, iters: int = 10) -> jnp.ndarray:
    """Batched spectral norm of [..., n, n] blocks by power iteration."""
    n = B.shape[-1]
    v = jnp.full(B.shape[:-2] + (n,), 1.0 / np.sqrt(n), B.dtype)
    for _ in range(iters):
        w = _bmv(B, v)
        v = jnp.einsum("...ji,...j->...i", B, w)
        nv = jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True))
        v = v / jnp.maximum(nv, jnp.asarray(1e-30, B.dtype))
    w = _bmv(B, v)
    return jnp.sqrt(jnp.sum(w * w, axis=-1))


def assemble_sband(
    blocks,
    pk: PackedEdges,
    w: int,
    mask: jnp.ndarray,
    axis_name: "str | None" = None,
    compensate: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(diag f32[NP,3,3], band f32[w,NP,3,3]) of the reduced system S.

    ``band[d-1, i] = S[i, i+d]`` for ``i < NP-d`` (zero rows past that).
    Gauge fix: the fixed pose's diagonal block is pinned to identity and
    its band entries zeroed — matching the masked CG matvec.

    ``compensate`` (measured WORSE than off — see module docstring;
    kept for the record): PSD-preserving truncation.  Plain
    band-truncation of an SPD matrix is NOT SPD — measured here: the
    bearing correction pushes the Jacobi-prescaled couplings to 0.75-0.96
    (PD bound for a chain is ~1/2), i.e. band_w(S) is badly indefinite
    and the factorization's PD clamp then cuts every coupling, collapsing
    the preconditioner to block-Jacobi quality.  The fix is block-
    Gershgorin diagonal compensation: every DROPPED out-of-band
    correction block R_ij = -W_il B_jl^T adds ||R_ij|| to BOTH its row
    diagonals, making T = band_w(S) + comp SPD by construction
    (T = S + (G_R - R) with G_R - R block-diagonally dominant, hence
    PSD).  The per-row mass uses the Frobenius upper bound
    sum_l ||W_il||_F (sum_{j out of band} ||B_jl||_F), computed with one
    segment-sum per outer iteration plus the in-band norm matches the
    band assembly already does; overcounting only makes T more diagonal
    (safe).  When nothing is dropped T == S's band exactly.

    Distributed: the slot grids are sharded along K, but the (k, m) slot
    match is a product of per-slot sums, so partial products don't psum.
    The grid is all-gathered along the slot axis instead (once per OUTER
    iteration, [NP, K] rows — small next to per-matvec traffic); the
    odometry band partials psum as usual.
    """
    from boslam.solver.schur_packed import _take, packed_s_diag

    NP_ = blocks.Hpp_diag.shape[0]
    Bp, p_lm = blocks.Bp, pk.p_lm
    Hinv_g = _take(blocks.Hll_inv, p_lm, pk.p_plan)  # [NP, Kloc, 2, 2]
    W = jnp.einsum(
        "pkij,pkjl->pkil", Bp.astype(jnp.float32), Hinv_g
    )  # [NP, Kloc, 3, 2]
    if axis_name is not None:
        # Full-K grids for the cross-row slot match.  Built by placing the
        # local slot columns at this shard's offset and psum-completing —
        # equivalent to a tiled all_gather, but psum outputs are tracked as
        # mesh-INVARIANT (the factor feeds a while_loop carry that starts
        # from invariant state; shard_map's vma checker rejects all_gather
        # results there).
        def full_cols(x):
            i = jax.lax.axis_index(axis_name)
            Kl = x.shape[1]
            D = jax.lax.axis_size(axis_name)
            buf = jnp.zeros((x.shape[0], D * Kl) + x.shape[2:], x.dtype)
            buf = jax.lax.dynamic_update_slice_in_dim(buf, x, i * Kl, axis=1)
            return jax.lax.psum(buf, axis_name)

        W = full_cols(W)
        Bp = full_cols(Bp.astype(jnp.float32))
        p_lm = full_cols(p_lm)
    Bp = Bp.astype(jnp.float32)

    diag = packed_s_diag(blocks, pk, axis_name)
    eye3 = jnp.eye(3, dtype=diag.dtype)
    m1 = mask.reshape(-1)  # [NP] (the solver's mask is [NP, 1])
    diag = m1[:, None, None] * diag + (1.0 - m1[:, None, None]) * eye3

    o_src, o_dst, Ho = blocks.o_src, blocks.o_dst, blocks.Ho_sd
    if compensate:
        NL = blocks.Hll_inv.shape[0]
        nrmW = jnp.sqrt(jnp.sum(W * W, axis=(-2, -1)))  # [NP, K]
        nrmB = jnp.sqrt(jnp.sum(Bp * Bp, axis=(-2, -1)))  # [NP, K]
        totB = jax.ops.segment_sum(
            nrmB.reshape(-1), p_lm.reshape(-1), num_segments=NL
        )
        inband = nrmB  # running sum_{|i-j| <= w} ||B_jl||; self term j == i
    bands = []
    for d in range(1, w + 1):
        if d >= NP_:
            bands.append(jnp.zeros((NP_, 3, 3), jnp.float32))
            continue
        # bearing correction: -sum over co-observed landmarks
        match = (p_lm[: NP_ - d, :, None] == p_lm[d:, None, :]).astype(
            jnp.float32
        )  # [NP-d, K, K]
        tmp = jnp.einsum("pkiv,pkm->pmiv", W[: NP_ - d], match)
        corr = jnp.einsum("pmiv,pmjv->pij", tmp, Bp[d:])
        bd = -corr
        if compensate:
            lo = jnp.einsum("pkm,pm->pk", match, nrmB[d:])
            hi = jnp.einsum("pkm,pk->pm", match, nrmB[: NP_ - d])
            inband = inband.at[: NP_ - d].add(lo).at[d:].add(hi)
        # odometry couplings at offset d (chain prefix is d == 1 contiguous,
        # but the general masked segment-sum covers every layout; Ho_sd is
        # the (src, dst) block, so reversed edges contribute transposed)
        fwd = (o_dst - o_src == d)[:, None, None].astype(jnp.float32)
        rev = (o_src - o_dst == d)[:, None, None].astype(jnp.float32)
        ob = jax.ops.segment_sum(Ho * fwd, o_src, num_segments=NP_ - d)
        ob = ob + jax.ops.segment_sum(
            jnp.swapaxes(Ho, 1, 2) * rev, o_dst, num_segments=NP_ - d
        )
        if axis_name is not None:
            ob = jax.lax.psum(ob, axis_name)
        bd = bd + ob
        bd = bd * (m1[: NP_ - d, None, None] * m1[d:, None, None])
        bands.append(jnp.pad(bd, ((0, d), (0, 0), (0, 0))))
    band = (
        jnp.stack(bands)
        if bands
        else jnp.zeros((0, NP_, 3, 3), jnp.float32)
    )
    if compensate:
        # dropped bearing-correction mass per row (Frobenius bound)
        dropped = jnp.maximum(totB[p_lm] - inband, 0.0)
        comp = jnp.sum(nrmW * dropped, axis=1)  # [NP]
        # dropped (out-of-band) odometry couplings, e.g. loop closures
        far = (jnp.abs(o_dst - o_src) > w).astype(jnp.float32)
        nrmO = jnp.sqrt(jnp.sum(Ho * Ho, axis=(-2, -1))) * far
        ocomp = jax.ops.segment_sum(
            nrmO, o_src, num_segments=NP_
        ) + jax.ops.segment_sum(nrmO, o_dst, num_segments=NP_)
        if axis_name is not None:
            ocomp = jax.lax.psum(ocomp, axis_name)
        comp = (comp + ocomp) * m1
        diag = diag + comp[:, None, None] * jnp.eye(3, dtype=diag.dtype)
    return diag, band


class BBFactor(NamedTuple):
    """Prescaled cyclic-reduction factorization over [3q, 3q] super-nodes.

    ``levels[k] = (alpha, gamma, Binv_e)``; ``Binv_last`` the 1-block
    root; ``L`` the [G, 3q, 3q] block-Cholesky prescaling factors;
    ``n`` unpadded pose count, ``q`` poses per super-node."""

    levels: tuple
    Binv_last: jnp.ndarray
    L: jnp.ndarray
    n: int
    q: int


def _tri_solve(L, b, trans=False):
    """Solve L x = b (or L^T x = b) for lower-triangular batched L."""
    return jax.lax.linalg.triangular_solve(
        L, b, left_side=True, lower=True, transpose_a=trans
    )


def bband_factor(
    diag: jnp.ndarray,
    band: jnp.ndarray,
    q: int,
    clamp_band: float = 0.4999,
) -> BBFactor:
    """Factor T = band-w block matrix (diag [N,3,3], band [w,N,3,3]).

    Requires q >= w so all couplings are intra-group or adjacent-group.
    Super-node assembly is static indexing (numpy index grids per offset);
    the cyclic-reduction level loop unrolls to log2(G) batched stages of
    [*, 3q, 3q] linalg ops.
    """
    w = band.shape[0]
    if q < max(w, 1):
        raise ValueError(f"band_group q={q} must be >= band width w={w}")
    N = diag.shape[0]
    dtype = diag.dtype
    G = -(-N // q)
    Npad = G * q
    if Npad > N:
        eye = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (Npad - N, 3, 3))
        diag = jnp.concatenate([diag, eye])
        band = jnp.pad(band, ((0, 0), (0, Npad - N), (0, 0), (0, 0)))
    # any band row whose partner i+d crosses Npad is already zero by
    # construction (assemble_sband pads d rows); rows in [N, Npad) are zero
    # because segment/correction sums never touch them.

    nb = 3 * q
    D = jnp.zeros((G, nb, nb), dtype)
    ii, jj = np.arange(3).repeat(3), np.tile(np.arange(3), 3)
    # diagonal blocks
    a = np.arange(q)
    r = (3 * a[:, None] + ii[None, :]).reshape(-1)
    c = (3 * a[:, None] + jj[None, :]).reshape(-1)
    D = D.at[:, r, c].add(diag.reshape(G, -1))
    E = jnp.zeros((G, nb, nb), dtype)
    for d in range(1, w + 1):
        bd = band[d - 1].reshape(G, q, 9)
        # intra-group: slots a in [0, q-d)
        a_in = np.arange(q - d)
        if a_in.size:
            r = (3 * a_in[:, None] + ii[None, :]).reshape(-1)
            c = (3 * (a_in + d)[:, None] + jj[None, :]).reshape(-1)
            vals = bd[:, : q - d].reshape(G, -1)
            D = D.at[:, r, c].add(vals)
            # transpose below the diagonal: the swapped (c, r) index pair
            # IS the transpose — same element values
            D = D.at[:, c, r].add(vals)
        # cross-group: slots a in [q-d, q) couple to (a+d-q) of group g+1
        a_x = np.arange(q - d, q)
        r = (3 * a_x[:, None] + ii[None, :]).reshape(-1)
        c = (3 * (a_x + d - q)[:, None] + jj[None, :]).reshape(-1)
        E = E.at[:, r, c].add(bd[:, q - d :].reshape(G, -1))
    # E[g] couples group g to g+1; the last group's E rows came from zero
    # band rows (assembly padding), so E[G-1] == 0 already.

    # --- prescale: T' = L^-1 T L^-T with L = chol(blockdiag(D)) ---
    # D blocks are principal submatrices of S (+ gauge pinning): SPD up to
    # f32 cancellation.  A relative jitter keeps chol finite; it only
    # perturbs the preconditioner, never the system solved.
    dmax = jnp.max(jnp.abs(jnp.diagonal(D, axis1=-2, axis2=-1)), axis=-1)
    jitter = (1e-6 * dmax)[:, None, None] * jnp.eye(nb, dtype=dtype)
    L = jnp.linalg.cholesky(D + jitter)
    # indefinite-beyond-jitter blocks: fall back to sqrt(diag) (block-
    # Jacobi locally) instead of NaN-poisoning the whole factorization
    bad = jnp.isnan(L).any(axis=(-2, -1), keepdims=True)
    dfloor = jnp.sqrt(
        jnp.maximum(jnp.diagonal(D, axis1=-2, axis2=-1), 1e-12 * dmax[:, None])
    )
    L = jnp.where(bad, dfloor[..., None] * jnp.eye(nb, dtype=dtype), L)

    # E'[g] = L_g^-1 E_g L_{g+1}^-T
    Y = _tri_solve(L, E)  # L_g^-1 E_g
    Lnext = jnp.concatenate([L[1:], jnp.eye(nb, dtype=dtype)[None]])
    Ep = jnp.swapaxes(_tri_solve(Lnext, jnp.swapaxes(Y, 1, 2)), 1, 2)
    if clamp_band is not None:
        s = _specnorm(Ep)
        f = jnp.minimum(1.0, clamp_band / jnp.maximum(s, 1e-30))
        Ep = Ep * f[:, None, None]

    # --- cyclic reduction on tridiag(I, Ep) over G super-nodes ---
    M = 1 << max(0, (G - 1).bit_length())
    eye = jnp.eye(nb, dtype=dtype)
    B = jnp.concatenate(
        [jnp.broadcast_to(eye, (G, nb, nb))]
        + ([jnp.broadcast_to(eye, (M - G, nb, nb))] if M > G else [])
    )
    C = Ep[: G - 1] if G > 1 else jnp.zeros((0, nb, nb), dtype)
    pad_c = M - 1 - C.shape[0]
    if pad_c:
        C = jnp.concatenate([C, jnp.zeros((pad_c, nb, nb), dtype)])
    z1 = jnp.zeros((1, nb, nb), dtype)
    A = jnp.concatenate([z1, jnp.swapaxes(C, 1, 2)])
    Cf = jnp.concatenate([C, z1])

    levels = []
    first = True
    while M > 1:
        Be, Bo = B[0::2], B[1::2]
        Ae, Ce = A[0::2], Cf[0::2]
        Ao, Co = A[1::2], Cf[1::2]
        # level 0: the prescaled diagonal is exactly I — no inversion
        Binv_e = Be if first else jnp.linalg.inv(Be)
        first = False
        Binv_next = jnp.concatenate([Binv_e[1:], z1])
        Ae_next = jnp.concatenate([Ae[1:], z1])
        Ce_next = jnp.concatenate([Ce[1:], z1])
        alpha = _bmm(Ao, Binv_e)
        gamma = _bmm(Co, Binv_next)
        B = Bo - _bmm(alpha, Ce) - _bmm(gamma, Ae_next)
        A = -_bmm(alpha, Ae)
        Cf = -_bmm(gamma, Ce_next)
        levels.append((alpha, gamma, Binv_e, Ae, Ce))
        M //= 2

    return BBFactor(tuple(levels), jnp.linalg.inv(B), L, N, q)


def bband_solve(factor: BBFactor, rhs: jnp.ndarray) -> jnp.ndarray:
    """Apply T^-1: rhs f32[N, 3] -> x f32[N, 3]."""
    N, q = factor.n, factor.q
    nb = 3 * q
    G = factor.L.shape[0]
    dtype = rhs.dtype
    r = jnp.concatenate([rhs.reshape(-1), jnp.zeros((G * nb - 3 * N,), dtype)])
    r = r.reshape(G, nb, 1)
    f = _tri_solve(factor.L, r)[..., 0]  # r' = L^-1 r, [G, nb]

    M = 1 << max(0, (G - 1).bit_length())
    if M > G:
        f = jnp.concatenate([f, jnp.zeros((M - G, nb), dtype)])
    z1 = jnp.zeros((1, nb), dtype)
    f_evens = []
    for alpha, gamma, Binv_e, Ae, Ce in factor.levels:
        fe, fo = f[0::2], f[1::2]
        fe_next = jnp.concatenate([fe[1:], z1])
        f_evens.append(fe)
        f = fo - _bmv(alpha, fe) - _bmv(gamma, fe_next)

    x = _bmv(factor.Binv_last, f)
    for (alpha, gamma, Binv_e, Ae, Ce), fe in zip(
        reversed(factor.levels), reversed(f_evens)
    ):
        x_prev = jnp.concatenate([z1, x[:-1]])
        x_even = _bmv(Binv_e, fe - _bmv(Ae, x_prev) - _bmv(Ce, x))
        x = jnp.stack([x_even, x], axis=1).reshape(-1, nb)

    x = x[:G]
    x = _tri_solve(factor.L, x[..., None], trans=True)[..., 0]  # L^-T x'
    return x.reshape(-1)[: 3 * N].reshape(N, 3)


def bband_dense(diag: jnp.ndarray, band: jnp.ndarray) -> jnp.ndarray:
    """Materialize the banded T as dense [3N, 3N] (tests only)."""
    N = diag.shape[0]
    w = band.shape[0]
    T = jnp.zeros((3 * N, 3 * N), diag.dtype)
    i3 = 3 * jnp.arange(N)[:, None] + jnp.arange(3)[None, :]
    T = T.at[i3[:, :, None], i3[:, None, :]].add(diag)
    for d in range(1, w + 1):
        if d >= N:
            continue
        s3, d3 = i3[: N - d], i3[d:]
        bd = band[d - 1, : N - d]
        T = T.at[s3[:, :, None], d3[:, None, :]].add(bd)
        T = T.at[d3[:, :, None], s3[:, None, :]].add(jnp.swapaxes(bd, 1, 2))
    return T
