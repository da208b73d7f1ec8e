"""Robust kernels as per-edge IRLS weights.

The reference implements a "simplistic threshold robust kernel"
(slam/solver.cpp:38-41,54-57): when chi = e^T Omega e exceeds
``kernel_threshold`` the *error* is rescaled by sqrt(kt/chi) — but the
Jacobian term of H is left unscaled, so only the gradient (b) side is
robustified.  That asymmetry is a deliberate quirk we reproduce bit-for-bit
under ``SolverConfig.reference_kernel_quirk`` (SURVEY §7 "hard parts" #2).

Generalization: every kernel reduces to a pair of per-edge weights
``(w_H, w_b)`` multiplying the J^T Omega J and J^T Omega e contributions.
For Huber, the IRLS weight rho'(chi) = min(1, sqrt(kt/chi)) applies to both
sides (the textbook robust-GN form).
"""

from __future__ import annotations

import jax.numpy as jnp

from boslam.config import SolverConfig


def robust_weights(
    chi2: jnp.ndarray, cfg: SolverConfig, kt=None
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-edge (w_H, w_b) from pre-kernel chi2 = e^T Omega e.

    ``kt`` optionally overrides ``cfg.kernel_threshold`` with a TRACED
    scalar — graduated non-convexity anneals the threshold across outer
    iterations inside one compiled scan (VERDICT r4 #2: the fixed
    threshold of slam/solver.cpp:38-41 clamps loop closures to ~kt of
    influence, freezing scale problems in the wrong basin).
    """
    one = jnp.ones_like(chi2)
    if cfg.robust == "none":
        return one, one
    kt = jnp.asarray(
        cfg.kernel_threshold if kt is None else kt, chi2.dtype
    )
    # sqrt(kt/chi), guarded against chi == 0 (weight is 1 below threshold
    # anyway, so the guard value never leaks into the result).
    w = jnp.sqrt(kt / jnp.maximum(chi2, jnp.finfo(chi2.dtype).tiny))
    w = jnp.where(chi2 > kt, w, one)
    if cfg.robust == "threshold":
        if cfg.reference_kernel_quirk:
            return one, w  # b-side only, slam/solver.cpp:38-45
        return w, w
    if cfg.robust == "huber":
        return w, w
    raise ValueError(f"unknown robust kernel {cfg.robust!r}")


def robust_cost(chi2: jnp.ndarray, cfg: SolverConfig, kt=None) -> jnp.ndarray:
    """rho(chi2) per edge — the objective actually minimized.

    For "threshold" the cost saturates at kt; for "huber" it grows as
    2*sqrt(kt*chi) - kt past the threshold; "none" is identity.
    ``kt`` overrides the static threshold (see robust_weights).
    """
    if cfg.robust == "none":
        return chi2
    kt = jnp.asarray(
        cfg.kernel_threshold if kt is None else kt, chi2.dtype
    )
    if cfg.robust == "threshold":
        return jnp.minimum(chi2, kt)
    if cfg.robust == "huber":
        safe = jnp.maximum(chi2, jnp.finfo(chi2.dtype).tiny)
        return jnp.where(chi2 > kt, 2.0 * jnp.sqrt(kt * safe) - kt, chi2)
    raise ValueError(f"unknown robust kernel {cfg.robust!r}")
