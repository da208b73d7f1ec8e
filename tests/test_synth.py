"""Synthetic generator: the true noiseless-fixture contract the reference's
``testone`` only approximates (tests/testone.cpp:33-42) — with zero noise
the ground truth IS the optimum and must be recovered exactly."""

import pytest
import numpy as np

from boslam.config import SolverConfig
from boslam.graph.build import build_graph
from boslam.metrics import ate_metrics, match_gt_poses
from boslam.solver.optimizer import solve
from boslam.synth import generate_sequence


def test_noiseless_fixture_exact_recovery():
    ig, gt = generate_sequence(
        120,
        60,
        seed=3,
        odom_noise=(0.0, 0.0),
        bearing_noise=0.0,
        init_noise=(0.08, 0.02),
    )
    # perturbed initial poses, exact observations
    g, meta = build_graph(ig, init="triangulate")
    g2, stats = solve(g, SolverConfig(iters=50))
    gt_poses = match_gt_poses(meta, gt)
    m = ate_metrics(np.asarray(g2.poses), gt_poses)
    # raw ATE limited by the near-flat global rotation mode in f32
    # (measured 0.027 at chi2 < 1e-6); aligned error is sub-centimeter.
    assert m["ate_rmse"] < 0.05, m
    assert m["ate_rmse_aligned"] < 0.01, m
    assert float(np.asarray(stats["chi2_robust"])[-1]) < 5e-5  # f32 floor


def test_noisy_synthetic_converges():
    ig, gt = generate_sequence(300, 150, seed=1)
    g, meta = build_graph(ig, init="triangulate")
    g2, stats = solve(g, SolverConfig(iters=25))
    c = np.asarray(stats["chi2_robust"])
    assert c[-1] < c[0]
    gt_poses = match_gt_poses(meta, gt)
    m0 = ate_metrics(np.asarray(g.poses), gt_poses)
    m = ate_metrics(np.asarray(g2.poses), gt_poses)
    assert m["ate_rmse_aligned"] < m0["ate_rmse_aligned"]


@pytest.mark.slow
def test_schur_cg_on_larger_synthetic():
    """The scale path on a 1k-pose sequence: schur_cg converges like dense."""
    ig, gt = generate_sequence(1000, 400, seed=2)
    g, meta = build_graph(ig, init="triangulate")
    g_d, s_d = solve(g, SolverConfig(iters=10))
    # inexact Newton needs a few extra outer iterations to close the gap
    g_s, s_s = solve(
        g, SolverConfig(iters=18, linear_solver="schur_cg", cg_iters=100)
    )
    c_d = float(np.asarray(s_d["chi2_robust"])[-1])
    c_s = float(np.asarray(s_s["chi2_robust"])[-1])
    assert c_s < c_d * 1.1, (c_s, c_d)


def test_generator_counts_and_format():
    ig, gt = generate_sequence(200, 100, seed=0)
    assert ig.n_poses == 200
    assert len(ig.lm_ids) == 0 and len(gt.lm_ids) > 0
    assert ig.fixed_pose_id == 0
    assert len(ig.bearing_meas) == len(gt.bearing_meas)
    # ids don't collide between poses and landmarks
    assert set(gt.pose_ids).isdisjoint(set(gt.lm_ids))
    np.testing.assert_allclose(ig.odom_omega[0], np.diag([500.0, 500.0, 5000.0]))


def test_knn_fallback_matches_scipy():
    """The scipy-free kNN fallback reproduces cKDTree.query exactly
    (ADVICE r3: the generator must not hard-require scipy)."""
    import numpy as np

    from boslam.synth import _knn_bruteforce

    scipy_spatial = pytest.importorskip("scipy.spatial")
    rng = np.random.default_rng(3)
    q = rng.normal(0, 5, (200, 2))
    p = rng.normal(0, 5, (61, 2))
    d1, n1 = scipy_spatial.cKDTree(p).query(q, k=5, distance_upper_bound=8.0)
    d2, n2 = _knn_bruteforce(q, p, 5, 8.0, chunk=37)
    np.testing.assert_array_equal(n1, n2)
    finite = np.isfinite(d1)
    np.testing.assert_array_equal(finite, np.isfinite(d2))
    np.testing.assert_allclose(d1[finite], d2[finite], rtol=1e-12)
