"""Linear pose-graph initialization: rotation averaging + linear translation.

Why this exists (VERDICT r4 #2): the reference's behavioral contract is
convergence to the ground-truth map in ~20 iterations
(/root/reference/README.md:22), but its only initializer is odometry
integration (the initial-guess file) + landmark triangulation
(slam/triangulation.cpp).  At 100k poses the integrated heading drift is
several radians, the problem's rotation nonconvexity puts the odometry
basin far from the global one, and the threshold robust kernel
(slam/solver.cpp:38-41) clamps the loop closures that could pull it out.
The classical fix is to initialize from the pose GRAPH first:

1. **Rotation averaging** — minimize sum_e w_e (theta_d - theta_s -
   dtheta_e - 2*pi*k_e)^2.  In 2D this is LINEAR once the integer wraps
   k_e are fixed; wraps are estimated from the current guess and
   re-rounded to convergence (2-3 rounds).
2. **Linear translation** — given the averaged headings, odometry
   translations become linear constraints t_d - t_s = R(theta_s) dt_e;
   solve the same weighted-Laplacian least squares per coordinate.
3. Landmarks are re-triangulated from the initialized poses by the
   existing batched triangulator (boslam/init/triangulation.py).

Both solves run on the HOST in float64 — this is a one-time O(NP + NC^2)
initializer, not a hot path.  The graph Laplacian of a SLAM sequence is a
CHAIN plus NC loop closures, which this module exploits exactly:

- the anchored chain Laplacian C solves in closed form by two prefix
  sums (u = reverse-cumsum of b; x = cumsum(u / w)), and C^{-1} e_i has
  the closed form (C^{-1} e_i)_m = p_min(i, m) with p = cumsum(1/w);
- the closures are a rank-NC update handled by the Woodbury identity —
  the NC x NC capacity matrix is assembled directly from p and factored
  densely (NC ~ 1e3 even at 1M poses).

Total cost: O(NP + NC^2 + NC^3) host flops; at 1M poses / 1k closures
well under a second.  No scipy.
"""

from __future__ import annotations

import logging

import numpy as np

logger = logging.getLogger("boslam.init")

_TWO_PI = 2.0 * np.pi


class _ChainPlusClosures:
    """Anchored (node 0 eliminated) Laplacian of a chain + closures.

    ``w_chain`` f64[NP-1] > 0 chain edge weights (edge e joins e, e+1);
    ``c_src``/``c_dst`` i64[NC] closure endpoints; ``w_clo`` f64[NC] > 0.
    ``solve(b)`` returns x with x[0] == 0 and (C + U W U^T) x = b on
    nodes >= 1 (b[0] is ignored — the anchored system drops that row).
    """

    def __init__(self, w_chain, c_src, c_dst, w_clo):
        n = len(w_chain) + 1
        self.n = n
        self.w_chain = w_chain
        self.c_src = c_src
        self.c_dst = c_dst
        # p_m = sum_{e < m} 1/w_e  (p[0] = 0): the chain resistance prefix
        self.p = np.concatenate([[0.0], np.cumsum(1.0 / w_chain)])
        self.nc = len(c_src)
        if self.nc:
            pm = lambda a, b: self.p[np.minimum(a[:, None], b[None, :])]
            G = (
                pm(c_dst, c_dst)
                - pm(c_dst, c_src)
                - pm(c_src, c_dst)
                + pm(c_src, c_src)
            )
            M = G + np.diag(1.0 / w_clo)
            # dense Cholesky of the SPD capacity matrix (numpy only)
            self._M_chol = np.linalg.cholesky(M)

    def _chain_solve(self, b):
        """x = C^{-1} b for the anchored chain (two prefix sums)."""
        # u_e = sum_{i >= e+1} b_i  (stationarity telescoped from the end)
        u = np.cumsum(b[::-1])[::-1][1:]
        x = np.empty(self.n, b.dtype)
        x[0] = 0.0
        np.cumsum(u / self.w_chain, out=x[1:])
        return x

    def solve(self, b):
        y = self._chain_solve(b)
        if not self.nc:
            return y
        uty = y[self.c_dst] - y[self.c_src]
        z = self._cho_solve(uty)
        # corr = sum_c z_c * C^{-1}(e_dst - e_src), using
        # (C^{-1} e_i)_m = p_min(i, m) and the split
        #   p_min(i, m) = p_m * [i >= m] + p_i * [i < m]:
        idx = np.concatenate([self.c_dst, self.c_src])
        coef = np.concatenate([z, -z])
        cnt = np.bincount(idx, weights=coef, minlength=self.n)
        cntp = np.bincount(idx, weights=coef * self.p[idx], minlength=self.n)
        s1 = np.cumsum(cnt[::-1])[::-1]  # sum over idx >= m
        s2 = np.concatenate([[0.0], np.cumsum(cntp)[:-1]])  # idx < m
        return y - (self.p * s1 + s2)

    def _cho_solve(self, rhs):
        L = self._M_chol
        y = np.linalg.solve(L, rhs)
        return np.linalg.solve(L.T, y)


def _split_chain(o_src, o_dst, n_poses):
    """Pick one i->i+1 edge per chain slot; everything else is a closure.

    Returns (chain_edge_ix i64[NP-1] or None, closure_mask bool[NO]).
    None when some consecutive pair has no edge (no chain spanning tree —
    the initializer declines rather than building a general tree).
    """
    is_fwd = o_dst == o_src + 1
    chain_ix = np.full(n_poses - 1, -1, np.int64)
    cand = np.nonzero(is_fwd)[0]
    # first edge wins per slot (iterate reversed so earlier overwrites)
    chain_ix[o_src[cand[::-1]]] = cand[::-1]
    if (chain_ix < 0).any():
        return None, None
    closure = np.ones(len(o_src), bool)
    closure[chain_ix] = False
    return chain_ix, closure


def linear_pose_init(
    poses0: np.ndarray,
    o_src: np.ndarray,
    o_dst: np.ndarray,
    o_meas: np.ndarray,
    o_omega: np.ndarray,
    fixed_ix: int,
    wrap_rounds: int = 3,
) -> np.ndarray:
    """Rotation-averaged + linearly-translated poses (f64 host math).

    Falls back to ``poses0`` (with a warning) when the odometry graph has
    no full i->i+1 chain to use as the spanning tree.
    """
    NP_ = poses0.shape[0]
    o_src = np.asarray(o_src, np.int64)
    o_dst = np.asarray(o_dst, np.int64)
    if NP_ < 2 or len(o_src) == 0:
        return np.asarray(poses0)
    chain_ix, closure_mask = _split_chain(o_src, o_dst, NP_)
    if chain_ix is None:
        logger.warning(
            "pose-graph init skipped: odometry has no full i->i+1 chain"
        )
        return np.asarray(poses0)

    poses0 = np.asarray(poses0, np.float64)
    meas = np.asarray(o_meas, np.float64)
    omega = np.asarray(o_omega, np.float64)
    w_th = np.maximum(omega[:, 2, 2], 1e-12)
    w_tr = np.maximum(0.5 * (omega[:, 0, 0] + omega[:, 1, 1]), 1e-12)

    clo = np.nonzero(closure_mask)[0]
    c_src, c_dst = o_src[clo], o_dst[clo]

    # ---------------- rotation averaging (iterative wrap rounding) ------
    A_th = _ChainPlusClosures(w_th[chain_ix], c_src, c_dst, w_th[clo])
    dth = meas[:, 2]
    theta = poses0[:, 2].copy()
    k = np.round((theta[o_dst] - theta[o_src] - dth) / _TWO_PI)
    for _ in range(max(1, wrap_rounds)):
        m = dth + _TWO_PI * k
        bw = np.bincount(
            o_dst, weights=w_th * m, minlength=NP_
        ) - np.bincount(o_src, weights=w_th * m, minlength=NP_)
        theta = A_th.solve(bw)
        k_new = np.round((theta[o_dst] - theta[o_src] - dth) / _TWO_PI)
        if np.array_equal(k, k_new):
            break
        k = k_new
    theta = theta + (poses0[fixed_ix, 2] - theta[fixed_ix])

    # ---------------- linear translation given headings -----------------
    A_tr = _ChainPlusClosures(w_tr[chain_ix], c_src, c_dst, w_tr[clo])
    c, s = np.cos(theta[o_src]), np.sin(theta[o_src])
    mx = c * meas[:, 0] - s * meas[:, 1]  # R(theta_s) @ dt, world frame
    my = s * meas[:, 0] + c * meas[:, 1]
    t = np.empty((NP_, 2))
    for d, m in ((0, mx), (1, my)):
        b = np.bincount(o_dst, weights=w_tr * m, minlength=NP_) - np.bincount(
            o_src, weights=w_tr * m, minlength=NP_
        )
        t[:, d] = A_tr.solve(b)
    t += poses0[fixed_ix, :2] - t[fixed_ix]

    out = np.empty((NP_, 3), np.float64)
    out[:, :2] = t
    # wrap to [-pi, pi) for cleanliness (residuals wrap differences anyway)
    out[:, 2] = np.arctan2(np.sin(theta), np.cos(theta))
    return out


def pgo_initialize(graph, wrap_rounds: int = 3):
    """Return ``graph`` with rotation-averaged poses + re-triangulated
    landmarks (the CLI's ``--pgo-init`` / scale-campaign initializer)."""
    import jax.numpy as jnp

    from boslam.init.triangulation import triangulate_landmarks

    poses = linear_pose_init(
        np.asarray(graph.poses),
        np.asarray(graph.o_src),
        np.asarray(graph.o_dst),
        np.asarray(graph.o_meas),
        np.asarray(graph.o_omega),
        int(graph.fixed_pose_ix),
        wrap_rounds=wrap_rounds,
    )
    poses_j = jnp.asarray(poses, graph.poses.dtype)
    landmarks = triangulate_landmarks(
        poses_j,
        graph.b_pose,
        graph.b_lm,
        graph.b_meas,
        n_landmarks=graph.n_landmarks,
    )
    return graph.with_state(poses_j, landmarks)
