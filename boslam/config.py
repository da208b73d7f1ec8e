"""Solver / run configuration.

The reference has no config system at all (SURVEY §5): two never-called
setters (``slam/solver.hpp:33-34``), defaults kernel_threshold=1.0 and
damping_factor=0.01 (``slam/solver.cpp:16-17``), and compile-time switches
``WHICH_SOLVER`` (``slam/solver.hpp:13-17``).  Here every knob is a frozen
(hashable → jit-static) dataclass field.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

# Relative noise floor that bfloat16-stored coupling blocks put under the
# Schur matvec (~2^-8 per-element rounding): with coupling_dtype="bfloat16"
# the CG tolerance is clamped up to this — the true residual cannot drop
# below it, so asking for less just runs CG to the cap against rounding
# fiction.  Surfaced per-solve as stats["cg_tol_effective"].
BF16_CG_TOL_FLOOR = 4e-3


@dataclasses.dataclass(frozen=True)
class SolverConfig:
    # --- robustifier (reference: threshold kernel, slam/solver.cpp:38-41) ---
    robust: str = "threshold"  # "threshold" | "huber" | "none"
    kernel_threshold: float = 1.0  # slam/solver.cpp:16

    # --- graduated non-convexity (VERDICT r4 #2) ---
    # The reference's FIXED threshold makes large-residual loop closures
    # nearly inert (their gradient is scaled by sqrt(kt/chi)), so scale
    # problems converge to the odometry-drift basin and stay there.  With
    # gnc_kt0 > 0 and gnc_anneal_iters > 0, the effective threshold starts
    # at gnc_kt0 (large => near-quadratic objective => closures pull with
    # full weight) and anneals geometrically down to kernel_threshold over
    # the first gnc_anneal_iters outer iterations; the remaining outers
    # run at the reference threshold, so the FINAL optimum is judged by
    # the reference objective.  Implemented for the packed and pose-range
    # paths (the scale solvers).
    gnc_kt0: float = 0.0  # 0 disables
    gnc_anneal_iters: int = 0

    # --- damping ---
    # "gn": constant diagonal damping added to H (slam/solver.cpp:64-69).
    # "lm": Levenberg-Marquardt with accept/reject and multiplicative schedule.
    optimizer: str = "gn"  # "gn" | "lm"
    damping: float = 0.01  # slam/solver.cpp:17
    lm_lambda0: float = 1e-3
    lm_up: float = 10.0
    lm_down: float = 0.1
    lm_lambda_min: float = 1e-9
    lm_lambda_max: float = 1e6

    # --- linear solver ---
    # "dense":    dense Cholesky on the full (gauge-fixed) H — small N.
    # "schur":    per-landmark Schur elimination + dense Cholesky of the
    #             reduced camera system (exact; 3NP x 3NP < N x N).
    # "schur_cg": Schur elimination + matrix-free block-Jacobi PCG —
    #             the inexact-Newton scale-out path (SURVEY §7 phase 3/4).
    linear_solver: str = "dense"  # "dense" | "schur" | "schur_cg"
    cg_iters: int = 100
    cg_tol: float = 1e-5
    # Krylov restarts absorbed per CG solve before giving up: f32 roundoff
    # surfaces non-positive curvature / indefinite-preconditioner events
    # well before tight tolerances, and terminating there (the old
    # truncated-CG behavior, kept at 0) stalls the outer iteration — the
    # r4 flat 10k cross-check plateaued at chi2 6507 vs packed 5234 for
    # exactly this reason (VERDICT r4 #5).  On an event the Krylov space
    # is restarted from steepest descent; healthy solves are unaffected.
    cg_restarts: int = 8
    # PCG preconditioner for the reduced camera system:
    # "block_jacobi": exact 3x3 diag(S) blocks (always available).
    # "btridiag":     block-tridiagonal T = tridiag(diag(S), odometry band)
    #                 solved by batched prescaled cyclic reduction with a
    #                 PD band clamp (solver/btridiag.py) — captures the
    #                 dominant chain coupling; packed path + chain odometry.
    # "bband":        block-BANDED T = band_w(S) — exact in-band entries
    #                 including the bearing Schur correction, factored by
    #                 super-node cyclic reduction (solver/bband.py).
    #                 Opt-in: measured BETWEEN block_jacobi and btridiag
    #                 on chain graphs (the dropped out-of-band correction
    #                 mass dominates; see solver/bband.py's measured
    #                 verdict) — never chosen by "auto".
    # "two_level":    two-level chain scheme (solver/two_level.py): exact
    #                 q-pose aggregate solves (cut-chain cyclic reduction)
    #                 + a Galerkin-coarsened chain for the long-wavelength
    #                 modes the single-level clamp cannot represent — built
    #                 for the 100k+ regime where btridiag measurably loses
    #                 to block-Jacobi (VERDICT r3 #2).
    # "auto":         measured-best per size, see
    #                 solver/schur_packed.py::_packed_preconditioner.
    preconditioner: str = "auto"  # "auto"|"block_jacobi"|"btridiag"|"bband"|"two_level"
    # two_level knobs: poses per coarse aggregate (0 = auto sizing) and
    # the combination cycle ("additive" two-level Schwarz — SPD by
    # construction, the default — or the experimental symmetrized
    # multiplicative "vcycle").
    coarse_q: int = 0
    two_level_cycle: str = "additive"  # "additive" | "vcycle"
    # "bband" knobs: band_width = offsets 1..w of S kept exactly AND the
    # super-node size (tied so every diagonal super-block is an exact
    # principal submatrix of S — assembling narrower than the group does
    # not preserve SPD; measured to degrade below block-Jacobi at 10k).
    # band_group overrides both when nonzero.  Factor cost ~ NP * (3w)^2.
    band_width: int = 8
    band_group: int = 0
    # Legacy chain-cutting stabilizer (band zeroed every btridiag_block
    # poses), superseded in round 3: the factorization is now symmetric
    # block-Jacobi PRESCALED (O(1) blocks at every cyclic-reduction level)
    # and its scaled band is clamped to spectral norm < 1/2, which makes
    # it provably PD and breakdown-free at any chain length (see
    # solver/btridiag.py) — measured stable at 10k and 100k poses where
    # the unscaled f32 reduction went indefinite.  0 (default) = full
    # chain; set a block size only to experiment with cut sub-chains.
    btridiag_block: int = 0
    # Warm-start CG from the previous outer iteration's solution (packed
    # scan loop).  Off by default: keeps per-step parity with the flat path.
    cg_warm_start: bool = False

    # Row-chunked CG matvec (packed path): bound the (8,128)-tile-padded
    # slot-gather intermediates ([R,K,3] pads ~42x its data — the measured
    # ~8 KB/pose temp slope that capped the 1M single-chip run, VERDICT
    # r4 #7) by scanning the matvec over row chunks of this size.  0 = off
    # (small problems: chunking only adds loop latency).
    matvec_row_chunk: int = 0

    # --- packed-path gather strategy ---
    # "take":     plain index gathers.  Measured on TPU v5e: XLA fuses
    #             gathers into their consumers (the slot einsums), making
    #             them nearly free — the round-1 per-row cost applies to
    #             scatter-ADDs, which the packed layout already removed.
    # "windowed": landmark locality reorder + per-tile windowed one-hot
    #             gathers (ops/windowed_gather.py).  Experimental: exact
    #             (parity 0.0 on TPU) but measured SLOWER than "take"
    #             because the opaque kernel cannot fuse and materializes
    #             its [R, K, 128] output (PERF.md).  Kept for structures
    #             where a fused consumer is impossible.
    # "auto":     currently "take" everywhere (measured default).
    gather: str = "auto"  # "auto" | "windowed" | "take"

    # --- packed-path coupling-block storage dtype ---
    # The B coupling blocks ([NP,K,3,2] / [NLV,K2,3,2]) dominate the CG
    # matvec's HBM traffic (they are re-read every inner iteration).
    # "bfloat16" stores them half-size and runs the coupling einsums as
    # bf16 x bf16 -> f32 (MXU-native, f32 accumulate): traffic halves for
    # a ~4e-3 relative perturbation of S — an inexact-Newton-sized error,
    # bounded against cg_tol in tests/test_schur_packed.py.  The assembled
    # diagonal blocks, rhs, preconditioner, and CG vectors stay f32.
    coupling_dtype: str = "float32"  # "float32" | "bfloat16"

    # --- packed-path hot-landmark splitting ---
    # Cap on landmark-grid slots per row: landmarks observed more often
    # than the cap get multiple virtual rows + a small segment-sum finish
    # (graph/packed.py).  K2 is otherwise the MAX observation count —
    # driven by a few hot landmarks, leaving the grid ~1/3 full at scale
    # (PERF.md).  "auto" picks the cap from the count distribution (or
    # declines when counts are uniform); an int forces it; 0 disables.
    lm_split: "str | int" = "auto"  # "auto" | 0 (off) | explicit cap

    # --- normal-equation assembly strategy ---
    # "scatter": index gathers + scatter-adds (general; right at large N).
    # "matmul":  one-hot design-matrix formulation — every gather/segment-sum
    #            becomes an MXU matmul.  TPU gathers over tiny (3- and
    #            2-wide) rows are latency-bound; at reference scale this
    #            assembly is ~10x faster on TPU.  Memory: O(E*N) for the
    #            design matrix, so only for small-to-medium problems.
    # "auto":    "matmul" when E*N is small enough, else "scatter".
    assembly: str = "auto"  # "auto" | "scatter" | "matmul"
    matmul_assembly_budget: int = 40_000_000  # max E*N elements for "auto"

    # --- whole-step mega-kernel (boslam/ops/pallas_gn_step.py) ---
    # "auto": on TPU backends, GN + exact-Schur small problems run the
    #         entire iteration (edge terms -> one-hot assembly -> Schur ->
    #         Cholesky -> boxplus -> stats) as ONE Pallas launch.
    # "off":  always the unfused XLA path.
    # "force": use it regardless of backend (interpret mode off-TPU; for
    #          parity tests).
    fused_step: str = "auto"  # "auto" | "off" | "force"

    # --- dense linear-solve backend ---
    # "xla":    jax.scipy cho_factor/cho_solve (many small kernels).
    # "pallas": single fused VMEM-resident blocked Cholesky kernel
    #           (boslam/ops/pallas_cholesky.py) — TPU only, N <= ~1600.
    # "auto":   pallas on TPU backends when the size fits, else xla.
    cholesky_backend: str = "auto"  # "auto" | "xla" | "pallas"

    # --- iteration control ---
    iters: int = 50  # reference "definitely converged" count (README.md:23-24)

    # Scale only the b-side error by the robust weight, as the reference does
    # (H uses the *unscaled* J: slam/solver.cpp:38-45). Setting False applies
    # the weight to H as well (the textbook IRLS form).
    reference_kernel_quirk: bool = True

    # Numerical-vs-analytic Jacobian toggle (reference keeps a finite-difference
    # implementation for verification, solver_jacobians.cpp:170-299; ours uses
    # jax.jacfwd when enabled).
    use_autodiff_jacobians: bool = False

    dtype: str = "float32"

    def replace(self, **kw) -> "SolverConfig":
        return dataclasses.replace(self, **kw)

    @property
    def gnc_enabled(self) -> bool:
        return self.gnc_kt0 > 0 and self.gnc_anneal_iters > 0

    def kt_at(self, i):
        """Effective kernel threshold at outer iteration ``i`` (traced ok).

        Geometric interpolation gnc_kt0 -> kernel_threshold over the first
        ``gnc_anneal_iters`` outers, then the reference threshold exactly.
        Returns None (compile-time constant path) when GNC is disabled.
        """
        if not self.gnc_enabled:
            return None
        import jax.numpy as jnp

        frac = jnp.clip(
            1.0 - jnp.asarray(i, jnp.float32) / self.gnc_anneal_iters,
            0.0,
            1.0,
        )
        ratio = self.gnc_kt0 / self.kernel_threshold
        return self.kernel_threshold * jnp.power(ratio, frac)


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout for sharded normal-equation assembly."""

    n_devices: Optional[int] = None  # None → all available
    axis_name: str = "edge"
