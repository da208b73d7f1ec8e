"""Float64 NumPy re-derivation of the reference solver's exact semantics.

This is the parity oracle: a deliberately literal, slow, sequential
implementation of the C++ algorithm — per-edge sparse-row accumulation
(slam/solver.cpp:31-62), error-only robust rescaling (:38-41), constant
diagonal damping (:64-69), permute-truncate gauge fixing (:71-94), dense
solve in float64 standing in for SimplicialLDLT, and per-element boxplus
(framework/state.cpp:69-80).  The production JAX path must land on the same
iterates to float32 tolerance.

(The real C++ binary IS also built and run live — tools/refbench compiles
the unmodified reference sources, and tests/test_cpp_parity.py checks the
JAX path against it.  This float64 oracle complements that with a
step-by-step iterate-level comparison the binary cannot provide, with every
step cross-cited.)
"""

from __future__ import annotations

import numpy as np


def wrap(a):
    # while-loop semantics of solver_jacobians.cpp:325-333, vector form
    return a - 2 * np.pi * np.floor((a + np.pi) / (2 * np.pi))


def oracle_gn_iterations(
    poses: np.ndarray,
    landmarks: np.ndarray,
    b_pose: np.ndarray,
    b_lm: np.ndarray,
    b_meas: np.ndarray,
    b_omega: np.ndarray,
    o_src: np.ndarray,
    o_dst: np.ndarray,
    o_meas: np.ndarray,
    o_omega: np.ndarray,
    fixed_pose_ix: int,
    iters: int,
    kernel_threshold: float = 1.0,
    damping: float = 0.01,
):
    """Run `iters` reference GN steps; returns (poses, landmarks, chi2_trace)."""
    poses = np.array(poses, np.float64)
    landmarks = np.array(landmarks, np.float64)
    NP_, NL = len(poses), len(landmarks)
    N = 3 * NP_ + 2 * NL
    chi2_trace = []

    for _ in range(iters):
        H = np.zeros((N, N))
        b = np.zeros(N)
        chi2_total = 0.0

        # --- bearing edges (solver.cpp:31-46, solver_jacobians.cpp:9-95) ---
        for e in range(len(b_meas)):
            p = poses[b_pose[e]]
            l = landmarks[b_lm[e]]
            c, s = np.cos(p[2]), np.sin(p[2])
            RT = np.array([[c, s], [-s, c]])
            g = RT @ (l - p[:2])
            pred = np.arctan2(g[1], g[0])
            err = wrap(pred - b_meas[e])

            chi = err * b_omega[e] * err
            chi2_total += min(chi, kernel_threshold)
            err_scaled = err
            if chi > kernel_threshold:
                err_scaled = err * np.sqrt(kernel_threshold / chi)

            inv_n2 = 1.0 / (g @ g)
            grad = np.array([-g[1], g[0]]) * inv_n2
            DRpT = np.array([[0.0, 1.0], [-1.0, 0.0]])
            j_dt = grad @ (-RT)
            j_dth = grad @ (RT @ DRpT @ l)
            j_dl = grad @ RT

            J = np.zeros(N)
            pj = 3 * b_pose[e]
            lj = 3 * NP_ + 2 * b_lm[e]
            J[pj : pj + 2] = j_dt
            J[pj + 2] = j_dth
            J[lj : lj + 2] = j_dl

            H += np.outer(J, J) * b_omega[e]
            b += J * (b_omega[e] * err_scaled)

        # --- odometry edges (solver.cpp:48-62, solver_jacobians.cpp:97-168) ---
        for e in range(len(o_meas)):
            sp = poses[o_src[e]]
            dp = poses[o_dst[e]]
            c, s = np.cos(sp[2]), np.sin(sp[2])
            RT = np.array([[c, s], [-s, c]])
            pred = np.concatenate([RT @ (dp[:2] - sp[:2]), [wrap(dp[2] - sp[2])]])
            err = pred - o_meas[e]
            err[2] = wrap(err[2])
            Om = o_omega[e]

            chi = err @ Om @ err
            chi2_total += min(chi, kernel_threshold)
            err_scaled = err.copy()
            if chi > kernel_threshold:
                err_scaled = err * np.sqrt(kernel_threshold / chi)

            DRp = np.array([[0.0, -1.0], [1.0, 0.0]])
            J = np.zeros((3, N))
            sj = 3 * o_src[e]
            dj = 3 * o_dst[e]
            J[:2, sj : sj + 2] = -RT
            J[:2, sj + 2] = (DRp @ np.array([[c, -s], [s, c]])).T @ dp[:2]
            J[2, sj + 2] = -1
            J[:2, dj : dj + 2] = RT
            J[:2, dj + 2] = RT @ DRp @ dp[:2]
            J[2, dj + 2] = 1

            H += J.T @ Om @ J
            b += J.T @ Om @ err_scaled

        chi2_trace.append(chi2_total)

        # --- damping (solver.cpp:64-69) ---
        H += damping * np.eye(N)

        # --- gauge fix by permutation + truncation (solver.cpp:71-94) ---
        fdxi = 3 * fixed_pose_ix
        keep = [i for i in range(N) if i not in (fdxi, fdxi + 1, fdxi + 2)]
        Hn = H[np.ix_(keep, keep)]
        bn = b[keep]
        dx_n = np.linalg.solve(Hn, -bn)
        dx = np.zeros(N)
        dx[keep] = dx_n

        # --- boxplus (framework/state.cpp:69-80) ---
        for i in range(NP_):
            d = dx[3 * i : 3 * i + 3]
            cdt, sdt = np.cos(d[2]), np.sin(d[2])
            x, y = poses[i, 0], poses[i, 1]
            poses[i, 0] = cdt * x - sdt * y + d[0]
            poses[i, 1] = sdt * x + cdt * y + d[1]
            poses[i, 2] = wrap(poses[i, 2] + d[2])
        for j in range(NL):
            landmarks[j] += dx[3 * NP_ + 2 * j : 3 * NP_ + 2 * j + 2]

    return poses, landmarks, np.array(chi2_trace)
