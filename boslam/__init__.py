"""boslam — a TPU-native 2D bearing-only graph-SLAM framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
C++ solver (``torchipeppo/prb-project-bearing-only-slam``): g2o pose-graph I/O,
landmark triangulation initialization, and robust damped Gauss-Newton /
Levenberg-Marquardt least squares over the joint SE(2)-pose + landmark state
with one gauge-fixed pose — reformulated as fixed-shape batched dense block
math (segment-sums of per-edge outer products, Schur complement + CG for
large problems, data-parallel edge sharding over a device mesh).

Reference parity anchors are cited throughout as ``file:line`` into
``/root/reference``.
"""

import os as _os

import jax as _jax

# Least-squares solving is precision-critical: on TPU the DEFAULT matmul
# precision truncates f32 operands to bfloat16 inside every dot_general —
# including the ones XLA emits inside the blocked Cholesky — and the
# normal matrix here is ill-conditioned (~1e7 on the reference dataset), so
# the factorization NaNs out.  Full f32 multiplication restores the exact
# optimum (verified against the C++ reference, chi2 5.882748 vs 5.882782)
# at no measurable step-time cost.  Override with
# BOSLAM_MATMUL_PRECISION=default to opt out.
_prec = _os.environ.get("BOSLAM_MATMUL_PRECISION", "float32")
if _prec != "default":
    _jax.config.update("jax_default_matmul_precision", _prec)

from boslam.config import SolverConfig
from boslam.graph.data import FactorGraph, GraphMeta
from boslam.io.g2o import parse_g2o, write_g2o
from boslam.graph.build import build_graph
from boslam.solver.optimizer import solve

__version__ = "0.1.0"

__all__ = [
    "SolverConfig",
    "FactorGraph",
    "GraphMeta",
    "parse_g2o",
    "write_g2o",
    "build_graph",
    "solve",
]
