"""SE(2) chart maps, vectorized.

The reference represents poses as 2D homogeneous matrices
(``Eigen::Isometry2f``, framework/definitions.hpp:17) with chart maps ``t2v``
(definitions.hpp:39-43) / ``v2t`` (definitions.hpp:45-53) and the manifold
retraction ``boxplus(X, dx) = v2t(dx) * X`` (framework/state.hpp:11-13).

TPU-first re-design: a pose is a flat ``f32[..., 3]`` array ``(x, y, theta)``
and every map below is written for arbitrary leading batch dimensions so it
vmaps/jits into fused VPU element-wise code with no per-pose Python.  The
2x2 rotation matrix is materialized only where a matrix product is genuinely
needed.  Angles are renormalized with a closed-form floor expression instead
of the reference's data-dependent while-loop (solver_jacobians.cpp:325-333),
which would not trace under XLA.
"""

from __future__ import annotations

import jax.numpy as jnp

_TWO_PI = 6.283185307179586


def wrap_angle(a: jnp.ndarray) -> jnp.ndarray:
    """Normalize angle(s) to [-pi, pi).

    Matches the semantics of ``Solver::normalized_angle``
    (solver_jacobians.cpp:325-333): the reference loops ``+=2pi`` while
    ``< -pi`` and ``-=2pi`` while ``>= pi``, i.e. the half-open interval
    [-pi, pi).  The closed form ``a - 2pi*floor((a+pi)/2pi)`` lands in the
    same interval and is branch-free (XLA-friendly).
    """
    a = jnp.asarray(a)
    return a - _TWO_PI * jnp.floor((a + jnp.pi) / _TWO_PI)


def rot2(theta: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrices ``f32[..., 2, 2]`` from angles ``f32[...]``."""
    c, s = jnp.cos(theta), jnp.sin(theta)
    return jnp.stack(
        [jnp.stack([c, -s], axis=-1), jnp.stack([s, c], axis=-1)], axis=-2
    )


def v2t(ep: jnp.ndarray) -> jnp.ndarray:
    """Euclidean pose ``(x, y, theta)`` -> homogeneous ``f32[..., 3, 3]``.

    Counterpart of ``v2t`` (framework/definitions.hpp:45-53).  Only used at
    API boundaries; the hot paths work on the flat representation.
    """
    x, y, theta = ep[..., 0], ep[..., 1], ep[..., 2]
    c, s = jnp.cos(theta), jnp.sin(theta)
    zero = jnp.zeros_like(x)
    one = jnp.ones_like(x)
    return jnp.stack(
        [
            jnp.stack([c, -s, x], axis=-1),
            jnp.stack([s, c, y], axis=-1),
            jnp.stack([zero, zero, one], axis=-1),
        ],
        axis=-2,
    )


def t2v(T: jnp.ndarray) -> jnp.ndarray:
    """Homogeneous ``f32[..., 3, 3]`` -> ``(x, y, theta)`` with wrapped theta.

    Counterpart of ``t2v`` (framework/definitions.hpp:39-43); the angle is
    recovered with atan2 like ``Rotation2f::smallestAngle``.
    """
    x = T[..., 0, 2]
    y = T[..., 1, 2]
    theta = jnp.arctan2(T[..., 1, 0], T[..., 0, 0])
    return jnp.stack([x, y, theta], axis=-1)


def boxplus_pose(pose: jnp.ndarray, delta: jnp.ndarray) -> jnp.ndarray:
    """Manifold retraction ``X' = v2t(delta) * X`` on flat poses.

    Matches ``boxplus`` (framework/state.hpp:11-13): with X=(t, theta) and
    delta=(dt, dtheta), the homogeneous product gives
    ``t' = R(dtheta) @ t + dt`` and ``theta' = theta + dtheta`` — note the
    *left* perturbation rotates the pose translation, it is NOT ``t + dt``.
    Theta is wrapped to mirror the implicit mod-2pi of the reference's
    rotation-matrix storage.
    """
    dt, dtheta = delta[..., :2], delta[..., 2]
    c, s = jnp.cos(dtheta), jnp.sin(dtheta)
    tx, ty = pose[..., 0], pose[..., 1]
    nx = c * tx - s * ty + dt[..., 0]
    ny = s * tx + c * ty + dt[..., 1]
    ntheta = wrap_angle(pose[..., 2] + dtheta)
    return jnp.stack([nx, ny, ntheta], axis=-1)


def boxplus_state(
    poses: jnp.ndarray,
    landmarks: jnp.ndarray,
    delta_poses: jnp.ndarray,
    delta_landmarks: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Apply a packed perturbation to the whole state.

    Counterpart of ``State::apply_boxplus`` (framework/state.cpp:69-80):
    per-pose manifold boxplus, Euclidean ``+=`` for landmarks.  Here the
    delta arrives pre-split as ``f32[NP, 3]`` / ``f32[NL, 2]`` blocks rather
    than the reference's packed ``[3*NP | 2*NL]`` vector.
    """
    return boxplus_pose(poses, delta_poses), landmarks + delta_landmarks


def transform_point(pose: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """``X * p``: map a point from the pose frame to the world frame."""
    c, s = jnp.cos(pose[..., 2]), jnp.sin(pose[..., 2])
    px, py = p[..., 0], p[..., 1]
    return jnp.stack(
        [c * px - s * py + pose[..., 0], s * px + c * py + pose[..., 1]],
        axis=-1,
    )


def inverse_transform_point(pose: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """``X^-1 * p``: map a world point into the pose frame.

    This is the ``pose.inverse() * lm`` of ``Solver::predict_bearing``
    (solver_jacobians.cpp:301-305): ``R^T (p - t)``.
    """
    c, s = jnp.cos(pose[..., 2]), jnp.sin(pose[..., 2])
    dx = p[..., 0] - pose[..., 0]
    dy = p[..., 1] - pose[..., 1]
    return jnp.stack([c * dx + s * dy, -s * dx + c * dy], axis=-1)
