"""Two-level chain preconditioner — the 100k+-pose regime's missing piece.

Round-3 measurements (PERF.md precond table) showed the single-level
clamped block-tridiagonal preconditioner WINS at <= ~10k poses but LOSES
to plain block-Jacobi at 100k: its PD band clamp caps the chain range it
can represent, and at 100k the error is dominated by exactly those
long-wavelength chain modes (the reference never faces this — it
factorizes the whole sparse H exactly every step, slam/solver.cpp:77-85).
Richer bands were built and honestly rejected (solver/bband.py).  The cure
is hierarchical, not wider: a classical two-level scheme on the chain
skeleton T = tridiag(diag(S), odometry band):

- FINE level: T with its band CUT at aggregate boundaries (every ``q``-th
  coupling zeroed) — NC independent q-pose block-tridiagonal systems,
  factored exactly (one prescaled cyclic reduction over the whole chain;
  cuts make the in-aggregate couplings short-range, so the PD clamp
  almost never fires).  This is nonoverlapping block-Jacobi with q-pose
  super-nodes: exact within each aggregate.
- COARSE level: Galerkin projection T_c = P^T T P with piecewise-constant
  interpolation over the aggregates (3x3 identity blocks).  T_c is an
  NC-long SPD block-tridiagonal chain — the long-wavelength skeleton —
  solved by the same cyclic reduction.  Aggregation *sums* the in-chain
  couplings into the coarse diagonal, so the coarse chain is much better
  conditioned than the fine one and the clamp is a no-op there.

Combination (additive two-level Schwarz, SPD by construction):

    M^-1 r = T_cut^-1 r + m . P T_c^-1 P^T (m . r)

(``m`` is the gauge mask: the fixed pose is excluded from the coarse
transfer so the CG invariant r_fixed == 0 -> z_fixed == 0 survives; the
cut factor already pins the fixed block to identity.)  A symmetrized
multiplicative V-cycle variant (fine -> coarse -> fine with exact T
residuals) is available behind ``cycle="vcycle"``; both are SPD.

TPU shape: everything is batched 3x3 block arithmetic; the fine solve is
the existing log2(N)-level cyclic reduction (solver/btridiag.py), the
coarse assembly is two reshapes + axis-sums, and the transfers are a
segment-sum (reshape-sum) and a repeat.  No scalar loops, no scatters.

No counterpart exists in the reference; this is a new scale component
mandated by BASELINE.json configs 4-5 (VERDICT r3 next-round #2).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from boslam.solver.btridiag import BTFactor, btridiag_factor, btridiag_solve


class TwoLevelFactor(NamedTuple):
    fine: BTFactor  # cut-chain factor: BATCHED [NC, q] aggregates
    # (additive; log2(q) levels) or single-chain (vcycle smoother)
    coarse: "BTFactor | tuple"  # coarse solve: a cyclic-reduction factor,
    # or (chol_factor, lower) of the DENSE coarse chain — factored once
    # per outer, two triangular solves per apply (wall-clock v2, r4)
    q: int  # aggregate size (poses per coarse node)
    n: int  # unpadded chain length
    mask: jnp.ndarray  # f32[N, 1] gauge mask for the coarse transfer
    diag: jnp.ndarray | None  # T's diag/band, kept only for the V-cycle
    band: jnp.ndarray | None
    cycle: str  # "additive" | "vcycle"
    coarse_dense: bool = False


def _coarse_galerkin(diag: jnp.ndarray, band: jnp.ndarray, q: int):
    """(D_c, B_c) of T_c = P^T T P, P = piecewise-constant over aggregates.

    ``diag`` f32[N,3,3], ``band`` f32[N-1,3,3] (coupling i -> i+1).  Pads
    the chain to a multiple of q with decoupled identity blocks (exactly
    the padding btridiag_factor itself uses).
    """
    N = diag.shape[0]
    NC = -(-N // q)
    Np = NC * q
    if Np > N:
        eye = jnp.broadcast_to(jnp.eye(3, dtype=diag.dtype), (Np - N, 3, 3))
        diag = jnp.concatenate([diag, eye])
    bpad = Np - 1 - band.shape[0]
    if bpad > 0:
        band = jnp.concatenate(
            [band, jnp.zeros((bpad, 3, 3), band.dtype)]
        )
    # band element i couples (i, i+1); grouped as [NC, q]: slot (c, j) is
    # coupling (cq+j, cq+j+1) — internal for j < q-1, boundary at j == q-1.
    band_g = jnp.concatenate(
        [band, jnp.zeros((1, 3, 3), band.dtype)]
    ).reshape(NC, q, 3, 3)
    Dsum = diag.reshape(NC, q, 3, 3).sum(axis=1)
    internal = band_g[:, : q - 1].sum(axis=1) if q > 1 else 0.0
    Dc = Dsum + internal + (
        jnp.swapaxes(internal, -1, -2) if q > 1 else 0.0
    )
    Bc = band_g[:-1, q - 1]  # [NC-1, 3, 3]
    return Dc, Bc


def _cut_band(band: jnp.ndarray, q: int) -> jnp.ndarray:
    """Zero every coupling that crosses an aggregate boundary."""
    i = jnp.arange(band.shape[0])
    keep = ((i + 1) % q) != 0
    return band * keep[:, None, None].astype(band.dtype)


# Largest dense coarse chain the once-per-outer Cholesky may build (3*NC).
_COARSE_DENSE_MAX = 4096


def _group_aggregates(diag, band, q):
    """Reshape the cut chain into NC independent [q]-long batched chains."""
    N = diag.shape[0]
    NC = -(-N // q)
    Np = NC * q
    if Np > N:
        eye = jnp.broadcast_to(jnp.eye(3, dtype=diag.dtype), (Np - N, 3, 3))
        diag = jnp.concatenate([diag, eye])
    bpad = Np - 1 - band.shape[0]
    if bpad > 0:
        band = jnp.concatenate([band, jnp.zeros((bpad, 3, 3), band.dtype)])
    band = jnp.concatenate([band, jnp.zeros((1, 3, 3), band.dtype)])
    diag_g = diag.reshape(NC, q, 3, 3)
    band_g = band.reshape(NC, q, 3, 3)[:, : q - 1]  # within-aggregate only
    return diag_g, band_g


def two_level_factor(
    diag: jnp.ndarray,
    band: jnp.ndarray,
    q: int,
    mask: jnp.ndarray,
    clamp_band: float = 0.4999,
    cycle: str = "additive",
) -> TwoLevelFactor:
    """Factor both levels.  ``diag``/``band`` are the (gauge-masked) chain
    T; ``mask`` f32[N,1] is the gauge mask (0 at the fixed pose).

    Additive (default, "v2" since r4): the fine level is a BATCHED
    cyclic reduction over the [NC, q] aggregate grid — log2(q) levels of
    [NC, ...]-wide ops instead of log2(N) levels of shrinking ones (the
    single-chain form was measured launch-latency-bound at 100k: ~1.7 ms
    per apply across ~85 tiny kernels).  The coarse chain is materialized
    dense and Cholesky-factored ONCE per outer iteration when 3*NC fits
    the budget; each apply is then two triangular solves.
    """
    if cycle == "vcycle":
        fine = btridiag_factor(
            diag, _cut_band(band, q), clamp_band=clamp_band
        )
        Dc, Bc = _coarse_galerkin(diag, band, q)
        coarse = btridiag_factor(Dc, Bc, clamp_band=clamp_band)
        return TwoLevelFactor(
            fine, coarse, q, diag.shape[0], mask, diag, band, cycle
        )

    diag_g, band_g = _group_aggregates(diag, band, q)
    fine = btridiag_factor(diag_g, band_g, clamp_band=clamp_band)
    Dc, Bc = _coarse_galerkin(diag, band, q)
    NC = Dc.shape[0]
    if 3 * NC <= _COARSE_DENSE_MAX:
        # PD-guarded dense coarse: f32 cancellation leaves occasional
        # indefinite diag(S) blocks (measured r3: min eig -0.23 outliers
        # at 100k) and the aggregated coarse chain inherits them — a raw
        # cho_factor then NaNs the whole preconditioner (caught r4: the
        # first v2 run at 100k silently degraded CG to breakdown-stops).
        # Same cure as btridiag: symmetric block-Jacobi prescale (guarded
        # pivots) + band clamp < 1/2 makes the scaled chain provably PD;
        # the dense factor is of that surrogate.
        from jax.scipy.linalg import cho_factor

        from boslam.solver.btridiag import (
            _chol3x3,
            _inv_lower3x3,
            _specnorm3x3,
            btridiag_dense,
        )

        Lc = _chol3x3(Dc)
        Linv_c = _inv_lower3x3(Lc)
        Bc_s = jnp.einsum(
            "nij,njk,nlk->nil", Linv_c[:-1], Bc, Linv_c[1:]
        )
        s = _specnorm3x3(Bc_s)
        fclamp = jnp.minimum(1.0, 0.4999 / jnp.maximum(s, 1e-30))
        Bc_s = Bc_s * fclamp[:, None, None]
        eye = jnp.broadcast_to(jnp.eye(3, dtype=Dc.dtype), Dc.shape)
        Tc = btridiag_dense(eye, Bc_s)
        coarse = (cho_factor(Tc, lower=True), Linv_c)
        dense = True
    else:
        coarse = btridiag_factor(Dc, Bc, clamp_band=clamp_band)
        dense = False
    return TwoLevelFactor(
        fine, coarse, q, diag.shape[0], mask, None, None, cycle, dense
    )


def _restrict(r: jnp.ndarray, q: int) -> jnp.ndarray:
    """P^T r: sum each aggregate's q rows.  r f32[N,3] -> [NC,3]."""
    N = r.shape[0]
    NC = -(-N // q)
    if NC * q > N:
        r = jnp.concatenate([r, jnp.zeros((NC * q - N, 3), r.dtype)])
    return r.reshape(NC, q, 3).sum(axis=1)


def _prolong(zc: jnp.ndarray, q: int, n: int) -> jnp.ndarray:
    """P z_c: each coarse value repeated over its aggregate."""
    return jnp.repeat(zc, q, axis=0)[:n]


def _t_matvec(diag, band, x):
    """y = T x for the block-tridiagonal chain (shifts, no gathers)."""
    y = jnp.einsum("nij,nj->ni", diag, x)
    up = jnp.einsum("nij,nj->ni", band, x[1:])  # row i += C_i x_{i+1}
    lo = jnp.einsum("nji,nj->ni", band, x[:-1])  # row i+1 += C_i^T x_i
    y = y.at[:-1].add(up).at[1:].add(lo)
    return y


def _coarse_apply(f: TwoLevelFactor, rc: jnp.ndarray) -> jnp.ndarray:
    if f.coarse_dense:
        from jax.scipy.linalg import cho_solve

        chol, Linv_c = f.coarse
        r = jnp.einsum("nij,nj->ni", Linv_c, rc)  # L^-1 r
        z = cho_solve(chol, r.reshape(-1)).reshape(rc.shape)
        return jnp.einsum("nji,nj->ni", Linv_c, z)  # L^-T z
    return btridiag_solve(f.coarse, rc)


def two_level_solve(f: TwoLevelFactor, r: jnp.ndarray) -> jnp.ndarray:
    """Apply M^-1 r (additive) or the symmetric V-cycle."""
    if f.cycle == "additive":
        NC = -(-f.n // f.q)
        rg = r
        if NC * f.q > f.n:
            rg = jnp.concatenate(
                [r, jnp.zeros((NC * f.q - f.n, 3), r.dtype)]
            )
        z_fine = btridiag_solve(
            f.fine, rg.reshape(NC, f.q, 3)
        ).reshape(NC * f.q, 3)[: f.n]
        rm = r * f.mask
        zc = _coarse_apply(f, _restrict(rm, f.q))
        return z_fine + _prolong(zc, f.q, f.n) * f.mask
    # symmetric V(1,1): pre-smooth with the cut factor, coarse-correct on
    # the exact T residual, post-smooth — SPD because pre/post smoothers
    # are identical and the cut factor is SPD.
    z1 = btridiag_solve(f.fine, r)
    r1 = (r - _t_matvec(f.diag, f.band, z1)) * f.mask
    zc = btridiag_solve(f.coarse, _restrict(r1, f.q))
    z2 = z1 + _prolong(zc, f.q, f.n) * f.mask
    r2 = r - _t_matvec(f.diag, f.band, z2)
    return z2 + btridiag_solve(f.fine, r2)
