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
        # X = inv(L) column-by-column, fully unrolled (static)
        eye = jnp.eye(8, dtype=L.dtype)
        rows = []
        for j in range(8):
            acc = eye[j]
            for k in range(j):
                acc = acc - L[j, k] * rows[k]
            rows.append(acc / L[j, j])
        return jnp.stack(rows)
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
    """Unblocked Cholesky of a (B, B) SPD tile via a column fori_loop."""
    n = A.shape[0]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)

    def body(j, carry):
        A, L = carry
        d = jax.lax.rsqrt(jax.lax.dynamic_index_in_dim(
            jax.lax.dynamic_index_in_dim(A, j, 0, keepdims=False), j, 0,
            keepdims=False,
        ))
        col = jax.lax.dynamic_slice_in_dim(A, j, 1, axis=1)[:, 0] * d  # (n,)
        ids = jax.lax.broadcasted_iota(jnp.int32, (n,), 0)
        col = jnp.where(ids >= j, col, 0.0)
        A = A - col[:, None] * col[None, :]
        L = L + col[:, None] * (col_ids[0] == j).astype(L.dtype)[None, :]
        return A, L

    _, L = jax.lax.fori_loop(0, n, body, (A, jnp.zeros_like(A)))
    # enforce exact lower-triangularity
    return jnp.where(row_ids >= col_ids, L, 0.0)


def _make_kernel(nb: int):
    """Build the fused kernel for an nb-block (nb*B square) system."""

    def kernel(H_ref, b_ref, x_ref, W_ref, Linv_ref, y_ref):
        # working copy of H in VMEM scratch (input refs stay read-only)
        W_ref[:, :] = H_ref[:, :]

        # ---- blocked right-looking factorization (static unroll) ----
        for k in range(nb):
            k0 = k * B
            Lkk = _chol_tile(W_ref[k0 : k0 + B, k0 : k0 + B])
            Linv = _tri_inv(Lkk)
            Linv_ref[k] = Linv
            W_ref[k0 : k0 + B, k0 : k0 + B] = Lkk
            if k < nb - 1:
                r0 = (k + 1) * B
                panel = W_ref[r0:, k0 : k0 + B]  # (rest, B)
                P = jnp.dot(panel, Linv.T, precision=_HIGH)
                W_ref[r0:, k0 : k0 + B] = P
                W_ref[r0:, r0:] = W_ref[r0:, r0:] - jnp.dot(
                    P, P.T, precision=_HIGH
                )

        # ---- forward substitution: L y = b ----
        for i in range(nb):
            i0 = i * B
            acc = b_ref[i0 : i0 + B, :]  # (B, 1)
            if i > 0:
                acc = acc - jnp.dot(
                    W_ref[i0 : i0 + B, :i0], y_ref[:i0, :], precision=_HIGH
                )
            y_ref[i0 : i0 + B, :] = jnp.dot(Linv_ref[i], acc, precision=_HIGH)

        # ---- backward substitution: L^T x = y ----
        for i in reversed(range(nb)):
            i0 = i * B
            acc = y_ref[i0 : i0 + B, :]
            if i < nb - 1:
                r0 = (i + 1) * B
                acc = acc - jnp.dot(
                    W_ref[r0:, i0 : i0 + B].T, x_ref[r0:, :], precision=_HIGH
                )
            x_ref[i0 : i0 + B, :] = jnp.dot(
                Linv_ref[i].T, acc, precision=_HIGH
            )

    return kernel


@partial(jax.jit, static_argnames=("interpret",))
def cholesky_solve_padded(H: jnp.ndarray, b: jnp.ndarray, interpret: bool = False):
    """Solve H x = b for SPD H f32[Np, Np], Np a multiple of 128, b f32[Np]."""
    Np = H.shape[0]
    nb = Np // B
    assert Np % B == 0
    x = pl.pallas_call(
        _make_kernel(nb),
        out_shape=jax.ShapeDtypeStruct((Np, 1), H.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((Np, Np), H.dtype),  # working H -> L
            pltpu.VMEM((nb, B, B), H.dtype),  # diagonal-tile inverses
            pltpu.VMEM((Np, 1), H.dtype),  # forward-substitution y
        ],
        interpret=interpret,
    )(H, b[:, None])
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
