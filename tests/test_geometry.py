"""SE(2) chart maps: wrap/v2t/t2v/boxplus parity with the reference math
(framework/definitions.hpp:39-53, framework/state.hpp:11-13)."""

import numpy as np
import jax.numpy as jnp

from boslam.geometry import se2


def test_wrap_angle_interval():
    # Reference normalized_angle lands in [-pi, pi) (solver_jacobians.cpp:325-333).
    a = np.linspace(-15, 15, 10001, dtype=np.float32)
    w = np.asarray(se2.wrap_angle(a))
    assert np.all(w >= -np.pi)
    assert np.all(w < np.pi)
    # identity inside the interval
    inside = np.linspace(-np.pi, np.pi - 1e-3, 100, dtype=np.float32)
    np.testing.assert_allclose(np.asarray(se2.wrap_angle(inside)), inside, atol=1e-5)
    # mod-2pi equivalence
    np.testing.assert_allclose(
        np.sin(w), np.sin(a), atol=1e-4
    )


def test_v2t_t2v_roundtrip(rng):
    ep = rng.uniform(-3, 3, size=(64, 3)).astype(np.float32)
    back = np.asarray(se2.t2v(se2.v2t(jnp.asarray(ep))))
    np.testing.assert_allclose(back[:, :2], ep[:, :2], atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(se2.wrap_angle(back[:, 2] - ep[:, 2])), 0, atol=1e-5
    )


def test_boxplus_matches_homogeneous_product(rng):
    # boxplus(X, dx) = v2t(dx) * X (framework/state.hpp:11-13)
    X = rng.uniform(-2, 2, size=(32, 3)).astype(np.float32)
    dx = rng.uniform(-0.5, 0.5, size=(32, 3)).astype(np.float32)
    got = np.asarray(se2.boxplus_pose(jnp.asarray(X), jnp.asarray(dx)))
    want = np.asarray(se2.t2v(se2.v2t(jnp.asarray(dx)) @ se2.v2t(jnp.asarray(X))))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_boxplus_rotates_translation():
    # t' = R(dtheta) t + dt, NOT t + dt
    X = jnp.array([1.0, 0.0, 0.0])
    dx = jnp.array([0.0, 0.0, np.pi / 2])
    got = np.asarray(se2.boxplus_pose(X, dx))
    np.testing.assert_allclose(got, [0.0, 1.0, np.pi / 2], atol=1e-6)


def test_inverse_transform_point():
    pose = jnp.array([1.0, 1.0, np.pi / 2])
    p = jnp.array([1.0, 2.0])
    # world (1,2) in frame of pose at (1,1) rotated 90deg -> (1, 0)
    got = np.asarray(se2.inverse_transform_point(pose, p))
    np.testing.assert_allclose(got, [1.0, 0.0], atol=1e-6)
