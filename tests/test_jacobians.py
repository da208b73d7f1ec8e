"""Analytic-vs-autodiff Jacobian verification.

The reference's correctness harness compares analytic Jacobians against
central finite differences over every edge of the dataset, with recorded
acceptable diff stats (tests/solver_stuff.cpp:42-89 bearing highest_sum
0.0135; :117-163 odometry highest_sum 0.00385).  Our analogue differentiates
exactly with jax.jacfwd, so tolerances can be *much* tighter than the
reference's finite-difference noise floor.
"""

import numpy as np
import jax.numpy as jnp

from boslam.graph.build import build_graph
from boslam.solver import residuals as R


def _graph(full_ig):
    g, _ = build_graph(full_ig, init="triangulate")
    return g


def test_bearing_jacobian_matches_autodiff_full_dataset(full_ig):
    g = _graph(full_ig)
    jp, jl = R.bearing_jacobians(g.poses, g.landmarks, g.b_pose, g.b_lm)
    jp_ad, jl_ad = R.bearing_jacobians_autodiff(
        g.poses, g.landmarks, g.b_pose, g.b_lm, g.b_meas
    )
    np.testing.assert_allclose(np.asarray(jp), np.asarray(jp_ad), atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(jl), np.asarray(jl_ad), atol=2e-4, rtol=1e-3)
    # reference-style aggregate stats, far below its recorded 0.0135
    diff = np.abs(np.asarray(jp) - np.asarray(jp_ad)).sum(-1) + np.abs(
        np.asarray(jl) - np.asarray(jl_ad)
    ).sum(-1)
    assert diff.max() < 2e-3


def test_odometry_jacobian_matches_autodiff_full_dataset(full_ig):
    g = _graph(full_ig)
    js, jd = R.odometry_jacobians(g.poses, g.o_src, g.o_dst)
    js_ad, jd_ad = R.odometry_jacobians_autodiff(g.poses, g.o_src, g.o_dst, g.o_meas)
    np.testing.assert_allclose(np.asarray(js), np.asarray(js_ad), atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(jd), np.asarray(jd_ad), atol=2e-4, rtol=1e-3)


def test_bearing_jacobian_random_states(rng):
    poses = jnp.asarray(rng.uniform(-5, 5, (64, 3)).astype(np.float32))
    lms = jnp.asarray(rng.uniform(-5, 5, (32, 2)).astype(np.float32))
    b_pose = jnp.asarray(rng.integers(0, 64, 128).astype(np.int32))
    b_lm = jnp.asarray(rng.integers(0, 32, 128).astype(np.int32))
    b_meas = jnp.asarray(rng.uniform(-np.pi, np.pi, 128).astype(np.float32))
    jp, jl = R.bearing_jacobians(poses, lms, b_pose, b_lm)
    jp_ad, jl_ad = R.bearing_jacobians_autodiff(poses, lms, b_pose, b_lm, b_meas)
    np.testing.assert_allclose(np.asarray(jp), np.asarray(jp_ad), atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(jl), np.asarray(jl_ad), atol=5e-4, rtol=1e-3)


def test_predict_bearing_golden():
    """Golden predictions in the spirit of tests/solver_stuff.cpp:18-39
    ("This should be pi/2" hand checks)."""
    # robot at origin facing +x, landmark straight ahead -> bearing 0
    assert np.isclose(
        float(R.predict_bearing(jnp.array([0.0, 0, 0]), jnp.array([5.0, 0.0]))), 0.0
    )
    # landmark to the left -> +pi/2
    assert np.isclose(
        float(R.predict_bearing(jnp.array([0.0, 0, 0]), jnp.array([0.0, 3.0]))),
        np.pi / 2,
    )
    # robot rotated +pi/2, landmark ahead of world +x -> bearing -pi/2
    assert np.isclose(
        float(R.predict_bearing(jnp.array([0.0, 0, np.pi / 2]), jnp.array([4.0, 0.0]))),
        -np.pi / 2,
        atol=1e-6,
    )
    # translated robot: at (1,1) facing +x, lm at (2,2) -> pi/4
    assert np.isclose(
        float(R.predict_bearing(jnp.array([1.0, 1, 0]), jnp.array([2.0, 2.0]))),
        np.pi / 4,
        atol=1e-6,
    )


def test_predict_odometry_golden():
    """Golden odometry predictions (tests/solver_stuff.cpp:93-114 checks the
    source-frame translation convention against measured edges)."""
    src = jnp.array([1.0, 1.0, np.pi / 2])
    dst = jnp.array([1.0, 2.0, np.pi / 2])
    # moved 1m along world +y == body +x for a pi/2-rotated robot
    np.testing.assert_allclose(
        np.asarray(R.predict_odometry(src, dst)), [1.0, 0.0, 0.0], atol=1e-6
    )
    # pure rotation
    src = jnp.array([0.0, 0.0, 0.0])
    dst = jnp.array([0.0, 0.0, 3.0])
    np.testing.assert_allclose(
        np.asarray(R.predict_odometry(src, dst)), [0.0, 0.0, 3.0], atol=1e-6
    )


def test_predict_odometry_consistent_with_dataset(full_ig):
    """On the initial-guess data the odometry residuals should be small
    (the trajectory was built by integrating these odometry edges) — the
    property eyeballed by tests/plot_g2o_v2.cpp:24-29."""
    g, _ = build_graph(full_ig, init="triangulate")
    err = R.odometry_error(g.poses, g.o_src, g.o_dst, g.o_meas)
    assert float(jnp.max(jnp.abs(err))) < 0.5
    assert float(jnp.mean(jnp.abs(err))) < 0.05
