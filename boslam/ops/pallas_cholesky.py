"""Single-kernel VMEM-resident blocked Cholesky solve (Pallas TPU).

The dense-path linear solve H x = b dominates the GN step once assembly is
matmul-formulated: XLA's cho_factor/cho_solve lowers to a long chain of
small kernels (panel factorizations, triangular solves) whose launch +
synchronization latency is ~1 ms at N≈1200 on TPU.  At this size the whole
matrix fits in VMEM (1280^2 f32 = 6.5 MB of ~16 MB), so the entire
factorize + forward/backward substitution can run as ONE Pallas kernel
with zero HBM round-trips between stages:

- right-looking blocked Cholesky, 128x128 tiles, trailing updates on MXU;
- per-tile triangular inverses via recursive block inversion
  (inv [[A,0],[B,C]] = [[iA,0],[-iC B iA, iC]]) — log-depth, matmul-rich —
  so panels and substitutions are plain matmuls instead of per-row solves;
- forward/backward block substitution in the same kernel.

The kernel is numerically identical (f32) to jax.scipy cho_solve and is
verified against it in tests (interpret mode on CPU, compiled on TPU).
Shapes beyond the VMEM budget fall back to jax.scipy.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = 128  # tile size (MXU native)
# max padded dimension whose working set fits comfortably in VMEM
MAX_VMEM_DIM = 13 * B  # 1664: H 11.1 MB + tiles/panels ~2 MB

_HIGH = jax.lax.Precision.HIGHEST


def _tri_inv(L: jnp.ndarray) -> jnp.ndarray:
    """Inverse of a lower-triangular (n, n) tile, n a power of two >= 8.

    Recursive block inversion: matmul-heavy, statically unrolled (depth
    log2(n/8)); the 8x8 base case is an unrolled forward substitution.
    """
    n = L.shape[0]
    if n == 8:
        # X = inv(L) row-by-row, fully unrolled (static); all shapes kept
        # 2D — Mosaic mishandles 1D vector relayouts.
        eye = jnp.eye(8, dtype=L.dtype)
        rows = []
        for j in range(8):
            acc = eye[j : j + 1, :]  # (1, 8)
            for k in range(j):
                acc = acc - L[j, k] * rows[k]
            rows.append(acc / L[j, j])
        return jnp.concatenate(rows, axis=0)
    h = n // 2
    A = L[:h, :h]
    Bl = L[h:, :h]
    C = L[h:, h:]
    iA = _tri_inv(A)
    iC = _tri_inv(C)
    lower_left = -jnp.dot(iC, jnp.dot(Bl, iA, precision=_HIGH), precision=_HIGH)
    top = jnp.concatenate([iA, jnp.zeros((h, n - h), L.dtype)], axis=1)
    bot = jnp.concatenate([lower_left, iC], axis=1)
    return jnp.concatenate([top, bot], axis=0)


def _chol_tile(A: jnp.ndarray) -> jnp.ndarray:
    """Unblocked Cholesky of a (B, B) SPD tile via a column fori_loop.

    Mosaic-safe: no dynamic value slicing — column j is extracted with an
    iota-mask reduction (supported VPU ops) instead of dynamic_slice.
    """
    n = A.shape[0]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    rcol = row_ids[:, 0:1]  # (n, 1) — strictly 2D for Mosaic
    # only the lower triangle of A is maintained by the blocked outer loop;
    # symmetrize so the eliminations see a consistent tile
    A = jnp.where(row_ids >= col_ids, A, 0.0)
    A = A + jnp.transpose(jnp.where(row_ids > col_ids, A, 0.0))

    def body(j, carry):
        A, L = carry
        colmask = col_ids == j
        col = jnp.sum(jnp.where(colmask, A, 0.0), axis=1, keepdims=True)  # (n,1)
        ajj = jnp.sum(jnp.where((row_ids == j) & colmask, A, 0.0))  # A[j, j]
        d = jax.lax.rsqrt(ajj)
        col = jnp.where(rcol >= j, col * d, 0.0)  # (n, 1)
        A = A - col * jnp.transpose(col)  # rank-1 update, (n,1)*(1,n)
        L = L + col * colmask.astype(L.dtype)
        return A, L

    _, L = jax.lax.fori_loop(0, n, body, (A, jnp.zeros_like(A)))
    # enforce exact lower-triangularity
    return jnp.where(row_ids >= col_ids, L, 0.0)


def _make_kernel(nb: int):
    """Build the fused kernel for an nb-block (nb*B square) system.

    ``L_ref`` aliases the H input buffer (input_output_aliases) — it holds
    H on entry and is factorized in place into L; only the lower triangle
    is maintained (``_chol_tile`` symmetrizes its diagonal tile).  Trailing
    updates run tile-by-tile so peak VMEM stays at H + Linv + O(tile).
    """

    def kernel(b_ref, H_ref, L_ref, x_ref, Linv_ref, y_ref):
        # H_ref and L_ref alias the same buffer; only L_ref is touched.
        del H_ref
        # ---- blocked right-looking factorization (static unroll) ----
        for k in range(nb):
            k0 = k * B
            Lkk = _chol_tile(L_ref[k0 : k0 + B, k0 : k0 + B])
            Linv = _tri_inv(Lkk)
            Linv_ref[k] = Linv
            L_ref[k0 : k0 + B, k0 : k0 + B] = Lkk
            LinvT = jnp.transpose(Linv)
            for i in range(k + 1, nb):
                i0 = i * B
                L_ref[i0 : i0 + B, k0 : k0 + B] = jnp.dot(
                    L_ref[i0 : i0 + B, k0 : k0 + B], LinvT, precision=_HIGH
                )
            for i in range(k + 1, nb):
                i0 = i * B
                Pi = L_ref[i0 : i0 + B, k0 : k0 + B]
                for j in range(k + 1, i + 1):
                    j0 = j * B
                    Pj = L_ref[j0 : j0 + B, k0 : k0 + B]
                    L_ref[i0 : i0 + B, j0 : j0 + B] = L_ref[
                        i0 : i0 + B, j0 : j0 + B
                    ] - jnp.dot(Pi, jnp.transpose(Pj), precision=_HIGH)

        # ---- forward substitution: L y = b ----
        for i in range(nb):
            i0 = i * B
            acc = b_ref[i0 : i0 + B, :]  # (B, 1)
            for j in range(i):
                j0 = j * B
                acc = acc - jnp.dot(
                    L_ref[i0 : i0 + B, j0 : j0 + B],
                    y_ref[j0 : j0 + B, :],
                    precision=_HIGH,
                )
            y_ref[i0 : i0 + B, :] = jnp.dot(Linv_ref[i], acc, precision=_HIGH)

        # ---- backward substitution: L^T x = y ----
        for i in reversed(range(nb)):
            i0 = i * B
            acc = y_ref[i0 : i0 + B, :]
            for j in range(i + 1, nb):
                j0 = j * B
                acc = acc - jnp.dot(
                    jnp.transpose(L_ref[j0 : j0 + B, i0 : i0 + B]),
                    x_ref[j0 : j0 + B, :],
                    precision=_HIGH,
                )
            x_ref[i0 : i0 + B, :] = jnp.dot(
                jnp.transpose(Linv_ref[i]), acc, precision=_HIGH
            )

    return kernel


@partial(jax.jit, static_argnames=("interpret",))
def cholesky_solve_padded(H: jnp.ndarray, b: jnp.ndarray, interpret: bool = False):
    """Solve H x = b for SPD H f32[Np, Np], Np a multiple of 128, b f32[Np]."""
    Np = H.shape[0]
    nb = Np // B
    assert Np % B == 0
    # H (input 1) aliases the L output: factorized in place, no working copy
    _, x = pl.pallas_call(
        _make_kernel(nb),
        out_shape=(
            jax.ShapeDtypeStruct((Np, Np), H.dtype),  # L (aliases H)
            jax.ShapeDtypeStruct((Np, 1), H.dtype),  # x
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((nb, B, B), H.dtype),  # diagonal-tile inverses
            pltpu.VMEM((Np, 1), H.dtype),  # forward-substitution y
        ],
        input_output_aliases={1: 0},  # H input (index 1 incl. b) -> L output
        interpret=interpret,
    )(b[:, None], H)
    return x[:, 0]


def pad_dim(n: int) -> int:
    return ((n + B - 1) // B) * B


def cholesky_solve(H: jnp.ndarray, b: jnp.ndarray, interpret: bool = False):
    """Solve H x = b; pads to a 128 multiple (identity diagonal, zero rhs —
    the pad block is decoupled so the true solution is unchanged).

    Falls back to jax.scipy when the padded matrix exceeds the VMEM budget.
    """
    N = H.shape[0]
    Np = pad_dim(N)
    if Np > MAX_VMEM_DIM:
        import jax.scipy.linalg as jsl

        c, lower = jsl.cho_factor(H, lower=True)
        return jsl.cho_solve((c, lower), b)
    pad = Np - N
    if pad:
        H = jnp.pad(H, ((0, pad), (0, pad)))
        H = H.at[jnp.arange(N, Np), jnp.arange(N, Np)].set(1.0)
        b = jnp.pad(b, (0, pad))
    x = cholesky_solve_padded(H, b, interpret=interpret)
    return x[:N]
