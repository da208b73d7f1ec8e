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
