"""Edge error functions and analytic block Jacobians, batched.

Counterpart of ``slam/solver_jacobians.cpp``.  The reference computes, per
edge, a 1xN (bearing) / 3xN (odometry) *sparse* Jacobian scattered over the
global state (solver_jacobians.cpp:66-92,148-166).  TPU-first re-design: the
Jacobian of an edge only ever has dense 1x3/1x2 (bearing) or 3x3/3x3
(odometry) blocks, so we compute exactly those blocks for *all* edges at
once as ``f32[E, ...]`` arrays — pure fused VPU math with no scatter — and
let the normal-equation assembly decide where they land.

Derivations mirror the reference's chain rule (comments at
solver_jacobians.cpp:20-29 and :109-123):

Bearing edge (solver_jacobians.cpp:9-95):
  h(X)   = atan2(g),  g = X_p^-1 * X_l = R^T (l - t)
  error  = wrap(h - z)                                (:18)
  d atan2/d g = [-gy, gx] / (gx^2 + gy^2)             (:32-49)
  d g/d dt    = -R^T                                  (:60)
  d g/d dtheta= R^T * DR'^T * l,  DR'^T = [[0,1],[-1,0]]   (:61)
  d g/d dl    = R^T                                   (:64)
  (the dtheta column uses the *absolute* landmark position l because the
  left-multiplicative boxplus perturbation acts on the world frame)

Odometry edge (solver_jacobians.cpp:97-168):
  h(X) = [ R_s^T (t_d - t_s) ; theta_d - theta_s ]    (:307-323)
  error = h - z, angle wrapped                        (:106-107)
  d/d dt_s     = [-R_s^T ; 0]                         (:135-137)
  d/d dtheta_s = [ (DR' R_s)^T t_d ; -1 ]             (:138-140)
  d/d dt_d     = [ R_s^T ; 0 ]                        (:141-143)
  d/d dtheta_d = [ R_s^T DR' t_d ; 1 ]                (:144-146)
  with DR' = [[0,-1],[1,0]].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from boslam.geometry.se2 import (
    boxplus_pose,
    inverse_transform_point,
    wrap_angle,
)


# ---------------------------------------------------------------------------
# Predictions (solver_jacobians.cpp:301-323)
# ---------------------------------------------------------------------------


def predict_bearing(pose: jnp.ndarray, lm: jnp.ndarray) -> jnp.ndarray:
    """atan2 of the landmark in the pose frame (solver_jacobians.cpp:301-305).

    Batched: ``pose`` f32[..., 3], ``lm`` f32[..., 2] -> f32[...].
    """
    g = inverse_transform_point(pose, lm)
    return jnp.arctan2(g[..., 1], g[..., 0])


def predict_odometry(src: jnp.ndarray, dst: jnp.ndarray) -> jnp.ndarray:
    """Relative motion in the source frame (solver_jacobians.cpp:307-323).

    NOT the homogeneous-product relative pose: the translation is the world
    displacement rotated into the source frame, matching the g2o SLAM-2D
    odometry convention (observation.hpp:43-47).
    """
    t = inverse_transform_point(src, dst[..., :2])  # R_s^T (t_d - t_s)
    dtheta = wrap_angle(dst[..., 2] - src[..., 2])
    return jnp.concatenate([t, dtheta[..., None]], axis=-1)


# ---------------------------------------------------------------------------
# Errors
# ---------------------------------------------------------------------------


def bearing_error_from(p: jnp.ndarray, l: jnp.ndarray, b_meas: jnp.ndarray):
    """Error from pre-gathered per-edge poses/landmarks (gather strategy is
    the caller's: index-take or one-hot matmul, see normal_eq.edge_terms)."""
    return wrap_angle(predict_bearing(p, l) - b_meas)


def bearing_error(
    poses: jnp.ndarray,
    landmarks: jnp.ndarray,
    b_pose: jnp.ndarray,
    b_lm: jnp.ndarray,
    b_meas: jnp.ndarray,
) -> jnp.ndarray:
    """Wrapped angular error for every bearing edge: f32[NB]."""
    return bearing_error_from(poses[b_pose], landmarks[b_lm], b_meas)


def odometry_error_from(src: jnp.ndarray, dst: jnp.ndarray, o_meas: jnp.ndarray):
    """Error from pre-gathered per-edge source/destination poses."""
    err = predict_odometry(src, dst) - o_meas
    return err.at[..., 2].set(wrap_angle(err[..., 2]))


def odometry_error(
    poses: jnp.ndarray,
    o_src: jnp.ndarray,
    o_dst: jnp.ndarray,
    o_meas: jnp.ndarray,
) -> jnp.ndarray:
    """Euclidean-minus error with wrapped angle component: f32[NO, 3]."""
    return odometry_error_from(poses[o_src], poses[o_dst], o_meas)


# ---------------------------------------------------------------------------
# Analytic Jacobian blocks
# ---------------------------------------------------------------------------


def bearing_jacobians_from(p: jnp.ndarray, l: jnp.ndarray):
    """Per-edge blocks (J_pose f32[NB, 3], J_lm f32[NB, 2]) from
    pre-gathered per-edge poses/landmarks.

    Dense-block formulation of solver_jacobians.cpp:30-95 evaluated at
    delta = 0, for all edges at once.
    """
    c, s = jnp.cos(p[..., 2]), jnp.sin(p[..., 2])
    g = inverse_transform_point(p, l)
    gx, gy = g[..., 0], g[..., 1]
    # guard the landmark==pose degeneracy: real edges never hit it, but
    # zero-information padding slots can (windowed gathers produce exact
    # zero coordinates for them); their contribution is omega-masked to
    # zero downstream, so any finite value is correct — NaN would not be.
    n2 = gx * gx + gy * gy
    inv_n2 = 1.0 / jnp.maximum(n2, jnp.finfo(n2.dtype).tiny)
    ax = -gy * inv_n2  # d atan2 / d gx
    ay = gx * inv_n2  # d atan2 / d gy

    # grad @ R^T with R^T = [[c, s], [-s, c]]
    gRx = ax * c - ay * s
    gRy = ax * s + ay * c

    # dtheta column: R^T @ DR'^T @ l with DR'^T @ l = (ly, -lx)
    lx, ly = l[..., 0], l[..., 1]
    col_x = c * ly - s * lx
    col_y = -s * ly - c * lx
    j_theta = ax * col_x + ay * col_y

    j_pose = jnp.stack([-gRx, -gRy, j_theta], axis=-1)
    j_lm = jnp.stack([gRx, gRy], axis=-1)
    return j_pose, j_lm


def bearing_jacobians(
    poses: jnp.ndarray,
    landmarks: jnp.ndarray,
    b_pose: jnp.ndarray,
    b_lm: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-edge blocks (J_pose f32[NB, 3], J_lm f32[NB, 2])."""
    return bearing_jacobians_from(poses[b_pose], landmarks[b_lm])


def odometry_jacobians_from(src: jnp.ndarray, dst: jnp.ndarray):
    """Per-edge blocks (J_src f32[NO, 3, 3], J_dst f32[NO, 3, 3]) from
    pre-gathered per-edge source/destination poses.

    Dense-block formulation of solver_jacobians.cpp:125-166 at delta = 0.
    """
    c, s = jnp.cos(src[..., 2]), jnp.sin(src[..., 2])
    tdx, tdy = dst[..., 0], dst[..., 1]

    zeros = jnp.zeros_like(c)
    ones = jnp.ones_like(c)

    # R_s^T = [[c, s], [-s, c]]
    # dtheta_d column (top two rows): R_s^T @ DR' @ t_d, DR' @ t_d = (-tdy, tdx)
    thd_x = -c * tdy + s * tdx
    thd_y = s * tdy + c * tdx
    # dtheta_s column: (DR' R_s)^T t_d = R_s^T DR'^T t_d = -(R_s^T DR' t_d)
    ths_x = -thd_x
    ths_y = -thd_y

    j_src = jnp.stack(
        [
            jnp.stack([-c, -s, ths_x], axis=-1),
            jnp.stack([s, -c, ths_y], axis=-1),
            jnp.stack([zeros, zeros, -ones], axis=-1),
        ],
        axis=-2,
    )
    j_dst = jnp.stack(
        [
            jnp.stack([c, s, thd_x], axis=-1),
            jnp.stack([-s, c, thd_y], axis=-1),
            jnp.stack([zeros, zeros, ones], axis=-1),
        ],
        axis=-2,
    )
    return j_src, j_dst


def odometry_jacobians(
    poses: jnp.ndarray, o_src: jnp.ndarray, o_dst: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-edge blocks (J_src f32[NO, 3, 3], J_dst f32[NO, 3, 3])."""
    return odometry_jacobians_from(poses[o_src], poses[o_dst])


# ---------------------------------------------------------------------------
# Autodiff Jacobians — the rebuild's analogue of the reference's
# finite-difference verification path (solver_jacobians.cpp:170-299): instead
# of central differences with epsilon=1e-3 we differentiate the boxplus-
# perturbed error exactly with jax.jacfwd at delta = 0.
# ---------------------------------------------------------------------------


def _bearing_err_of_delta(dp, dl, pose, lm, meas):
    p = boxplus_pose(pose, dp)
    return wrap_angle(predict_bearing(p, lm + dl) - meas)


def _odom_err_of_delta(ds, dd, src, dst, meas):
    e = predict_odometry(boxplus_pose(src, ds), boxplus_pose(dst, dd)) - meas
    return e.at[2].set(wrap_angle(e[2]))


@jax.jit
def bearing_jacobians_autodiff(poses, landmarks, b_pose, b_lm, b_meas):
    """(J_pose f32[NB,3], J_lm f32[NB,2]) via jacfwd of the perturbed error."""
    zero3 = jnp.zeros(3, poses.dtype)
    zero2 = jnp.zeros(2, poses.dtype)

    def one(pose, lm, meas):
        jp = jax.jacfwd(_bearing_err_of_delta, argnums=0)(zero3, zero2, pose, lm, meas)
        jl = jax.jacfwd(_bearing_err_of_delta, argnums=1)(zero3, zero2, pose, lm, meas)
        return jp, jl

    return jax.vmap(one)(poses[b_pose], landmarks[b_lm], b_meas)


@jax.jit
def odometry_jacobians_autodiff(poses, o_src, o_dst, o_meas):
    """(J_src f32[NO,3,3], J_dst f32[NO,3,3]) via jacfwd."""
    zero3 = jnp.zeros(3, poses.dtype)

    def one(src, dst, meas):
        js = jax.jacfwd(_odom_err_of_delta, argnums=0)(zero3, zero3, src, dst, meas)
        jd = jax.jacfwd(_odom_err_of_delta, argnums=1)(zero3, zero3, src, dst, meas)
        return js, jd

    return jax.vmap(one)(poses[o_src], poses[o_dst], o_meas)
