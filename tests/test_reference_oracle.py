"""Production JAX solver vs the float64 reference-semantics oracle.

The strongest parity statement we can make without the C++ binary: both
implementations of the documented algorithm (slam/solver.cpp) produce the
same iterates from the same start.
"""

import pytest
import numpy as np

from boslam.config import SolverConfig
from boslam.graph.build import build_graph
from boslam.solver.optimizer import solve
from tests.reference_oracle import oracle_gn_iterations


def _run_both(parsed, iters, n_check=None):
    g, meta = build_graph(parsed, init="triangulate")
    cfg = SolverConfig(iters=iters)
    g2, stats = solve(g, cfg)

    op, ol, ochi = oracle_gn_iterations(
        np.asarray(g.poses),
        np.asarray(g.landmarks),
        np.asarray(g.b_pose),
        np.asarray(g.b_lm),
        np.asarray(g.b_meas),
        np.asarray(g.b_omega),
        np.asarray(g.o_src),
        np.asarray(g.o_dst),
        np.asarray(g.o_meas),
        np.asarray(g.o_omega),
        int(g.fixed_pose_ix),
        iters,
    )
    return g2, stats, op, ol, ochi


def test_mini_matches_oracle(mini_ig):
    g2, stats, op, ol, ochi = _run_both(mini_ig, iters=10)
    np.testing.assert_allclose(np.asarray(g2.poses), op, atol=2e-4)
    np.testing.assert_allclose(np.asarray(g2.landmarks), ol, atol=2e-3)
    np.testing.assert_allclose(np.asarray(stats["chi2_robust"]), ochi, rtol=1e-3, atol=1e-5)


@pytest.mark.slow
def test_full_matches_oracle_short(full_ig):
    """4 iterations on the full dataset: the f32 production path tracks the
    f64 oracle through the steep initial descent.  (Beyond ~5 iterations
    f32-vs-f64 rounding diverges measurably through the near-singular
    landmark blocks — SURVEY §7 hard part #6 explicitly scopes parity to
    tolerances, not bit-exactness; the *converged plateau* equality is
    covered by test_full_oracle_same_plateau.)"""
    g2, stats, op, ol, ochi = _run_both(full_ig, iters=4)
    np.testing.assert_allclose(
        np.asarray(stats["chi2_robust"]), ochi, rtol=5e-3
    )
    # poses agree to centimeters on a 30 m map after 4 joint solves
    # (measured 0.064 max deviation, purely f32 rounding through the
    # near-singular landmark blocks)
    err = np.abs(np.asarray(g2.poses)[:, :2] - op[:, :2]).max()
    assert err < 0.1, err


@pytest.mark.slow
def test_full_oracle_same_plateau(full_ig):
    """Both implementations converge to the same chi2 plateau and the same
    trajectory (up to f32 tolerance) after 20 iterations."""
    g2, stats, op, ol, ochi = _run_both(full_ig, iters=20)
    ours = float(np.asarray(stats["chi2_robust"])[-1])
    assert abs(ours - ochi[-1]) / ochi[-1] < 0.02, (ours, ochi[-1])
    # same optimum: pose clouds agree to centimeters
    d = np.sqrt(((np.asarray(g2.poses)[:, :2] - op[:, :2]) ** 2).sum(1))
    assert np.median(d) < 0.05
    assert d.max() < 0.3
