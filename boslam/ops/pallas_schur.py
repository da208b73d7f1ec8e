"""Fully-fused Schur solve kernel: assembly -> Cholesky -> both back-subs
in ONE Pallas launch (VERDICT r3 #5).

The headline GN step (exact Schur path) spends more wall time in kernel
launch gaps than in math: the schur-path trace shows ~0.78 ms/iter of
device span against 1.33 ms wall, spread over dozens of small kernels
(W = U Hll^-1, S = Hpp - W U^T, rhs, the solve, the landmark
back-substitution).  At reference scale everything fits VMEM
comfortably (S is 903x903), so this kernel takes the *block-sparse
pieces* and runs the whole linear solve in one launch:

    W   = U @ HllD                  (HllD = dense block-diag of Hll^-1)
    S   = m m^T . (Hpp - W U^T) + diag(1 - m)      (gauge mask fold-in)
    rhs = m . (W bl - bp)
    x   = S^-1 rhs                  (blocked in-VMEM Cholesky, aliased)
    dl  = HllD (-bl - U^T x)        (landmark back-substitution)

The factorization core (_chol_tile / _tri_inv / substitutions) is shared
with boslam/ops/pallas_cholesky.py.  The gauge mask reproduces the
reference's permute-truncate semantics (slam/solver.cpp:71-94, proven
equivalent in tests/test_gauge_fix.py); the pad rows of the 128-aligned
shapes carry mask 0 and are therefore exactly decoupled (identity
diagonal, zero rhs) — no separate padding fix-up.

Numerically: identical f32 contractions (HIGHEST precision) to the
unfused XLA path; parity is asserted in tests/test_pallas_schur.py and
by bench.py's converged-chi2 check against the C++ optimum.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from boslam.ops.pallas_cholesky import B, _chol_tile, _tri_inv

_HIGH = jax.lax.Precision.HIGHEST

# VMEM budget: Hpp/L (Np^2) + W,U (2 Np Ml) + HllD (Ml^2) + Linv + vectors.
# At Np=1280, Ml=512: 6.6 + 5.2 + 1.0 + 0.6 MB ~ 13.4 MB — the practical cap.
MAX_NP = 10 * B  # 1280
MAX_ML = 4 * B  # 512


def _make_fused_kernel(nb: int):
    def kernel(
        U_ref, HllD_ref, bp_ref, bl_ref, m_ref, lam_ref,
        Hpp_ref, L_ref, x_ref, dl_ref,
        W_ref, Linv_ref, y_ref, r_ref,
    ):
        del Hpp_ref  # aliases L_ref
        Np = nb * B
        # ---- prologue: damping + reduced system + rhs, gauge-masked ----
        W_ref[...] = jnp.dot(U_ref[...], HllD_ref[...], precision=_HIGH)
        S = L_ref[...] - jnp.dot(
            W_ref[...], jnp.transpose(U_ref[...]), precision=_HIGH
        )
        m = m_ref[...]  # (Np, 1)
        rid = jax.lax.broadcasted_iota(jnp.int32, (Np, Np), 0)
        cid = jax.lax.broadcasted_iota(jnp.int32, (Np, Np), 1)
        eye = (rid == cid).astype(S.dtype)
        S = S + lam_ref[0, 0] * eye  # pose-block damping (solver.cpp:64-69)
        L_ref[...] = S * (m * jnp.transpose(m)) + eye * (1.0 - m)
        r_ref[...] = m * (
            jnp.dot(W_ref[...], bl_ref[...], precision=_HIGH) - bp_ref[...]
        )

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

        # ---- forward substitution: L y = rhs ----
        for i in range(nb):
            i0 = i * B
            acc = r_ref[i0 : i0 + B, :]
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
            x_ref[i0 : i0 + B, :] = m[i0 : i0 + B, :] * jnp.dot(
                jnp.transpose(Linv_ref[i]), acc, precision=_HIGH
            )

        # ---- landmark back-substitution: dl = HllD (-bl - U^T x) ----
        t = -bl_ref[...] - jnp.dot(
            jnp.transpose(U_ref[...]), x_ref[...], precision=_HIGH
        )
        dl_ref[...] = jnp.dot(HllD_ref[...], t, precision=_HIGH)

    return kernel


@partial(jax.jit, static_argnames=("interpret",))
def fused_schur_solve_padded(
    Hpp, U, HllD, bp, bl, mask, damping, interpret: bool = False
):
    """One-launch reduced-system solve.

    ``Hpp`` f32[Np, Np] (dense pose Hessian, damping added in-kernel),
    ``U`` f32[Np, Ml] (dense pose-landmark coupling), ``HllD`` f32[Ml,
    Ml] (dense block-diagonal Hll^-1, already damped+inverted), ``bp``
    f32[Np], ``bl`` f32[Ml], ``mask`` f32[Np] (0 on the gauge rows AND
    the 128-alignment padding), ``damping`` f32 scalar.  Returns (x
    f32[Np] = masked delta-pose solution, dl f32[Ml]).
    """
    Np, Ml = Hpp.shape[0], HllD.shape[0]
    assert Np % B == 0 and Ml % B == 0
    nb = Np // B
    lam = jnp.asarray(damping, Hpp.dtype).reshape(1, 1)
    _, x, dl = pl.pallas_call(
        _make_fused_kernel(nb),
        out_shape=(
            jax.ShapeDtypeStruct((Np, Np), Hpp.dtype),  # L (aliases Hpp)
            jax.ShapeDtypeStruct((Np, 1), Hpp.dtype),
            jax.ShapeDtypeStruct((Ml, 1), Hpp.dtype),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5
        + [pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=tuple([pl.BlockSpec(memory_space=pltpu.VMEM)] * 3),
        scratch_shapes=[
            pltpu.VMEM((Np, Ml), Hpp.dtype),  # W
            pltpu.VMEM((nb, B, B), Hpp.dtype),  # Linv tiles
            pltpu.VMEM((Np, 1), Hpp.dtype),  # forward-substitution y
            pltpu.VMEM((Np, 1), Hpp.dtype),  # rhs
        ],
        input_output_aliases={6: 0},  # Hpp input -> first output buffer
        interpret=interpret,
    )(
        U, HllD, bp[:, None], bl[:, None], mask[:, None], lam, Hpp
    )
    return x[:, 0], dl[:, 0]


def fused_fits(n_pose_dim: int, n_lm_dim: int) -> bool:
    """True when the padded problem fits the kernel's VMEM budget."""
    Np = ((n_pose_dim + B - 1) // B) * B
    Ml = ((n_lm_dim + B - 1) // B) * B
    return Np <= MAX_NP and Ml <= MAX_ML
