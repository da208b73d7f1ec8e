"""Scatter vs matmul (design-matrix) normal-equation assembly equivalence."""

import pytest
import numpy as np

from boslam.config import SolverConfig
from boslam.graph.build import build_graph
from boslam.solver.normal_eq import (
    assemble_dense,
    assemble_dense_matmul,
    edge_terms,
    use_matmul_assembly,
)
from boslam.solver.optimizer import solve


@pytest.mark.slow
def test_matmul_assembly_matches_scatter(full_ig):
    g, _ = build_graph(full_ig, init="triangulate")
    cfg_s = SolverConfig(assembly="scatter")
    H_s, b_s, _ = assemble_dense(g, cfg_s)
    H_m, b_m, _ = assemble_dense_matmul(g, cfg_s)
    scale = float(np.abs(np.asarray(H_s)).max())
    np.testing.assert_allclose(
        np.asarray(H_m), np.asarray(H_s), atol=2e-6 * scale
    )
    np.testing.assert_allclose(
        np.asarray(b_m), np.asarray(b_s), atol=2e-5 * np.abs(np.asarray(b_s)).max()
    )


def test_edge_terms_identical_across_gather_modes(full_ig):
    g, _ = build_graph(full_ig, init="triangulate")
    t_s = edge_terms(g, SolverConfig(assembly="scatter"))
    t_m = edge_terms(g, SolverConfig(assembly="matmul"))
    # one-hot matmul gathers are bit-exact
    np.testing.assert_array_equal(np.asarray(t_s.be), np.asarray(t_m.be))
    np.testing.assert_array_equal(np.asarray(t_s.bjp), np.asarray(t_m.bjp))
    np.testing.assert_array_equal(np.asarray(t_s.ojs), np.asarray(t_m.ojs))


def test_auto_mode_picks_matmul_for_reference_dataset(full_ig):
    g, _ = build_graph(full_ig, init="triangulate")
    assert use_matmul_assembly(g, SolverConfig())
    assert not use_matmul_assembly(g, SolverConfig(assembly="scatter"))
    assert not use_matmul_assembly(g, SolverConfig(matmul_assembly_budget=1000))


@pytest.mark.slow
def test_solve_same_result_both_modes(full_ig):
    g, _ = build_graph(full_ig, init="triangulate")
    g_s, s_s = solve(g, SolverConfig(iters=15, assembly="scatter"))
    g_m, s_m = solve(g, SolverConfig(iters=15, assembly="matmul"))
    # summation order differs between the two formulations -> f32 drift
    np.testing.assert_allclose(
        np.asarray(s_s["chi2_robust"]), np.asarray(s_m["chi2_robust"]), rtol=5e-4
    )
    d = np.abs(np.asarray(g_s.poses) - np.asarray(g_m.poses)).max()
    assert d < 5e-3, d
