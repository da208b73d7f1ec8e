"""Triangulation init vs an explicit per-landmark least-squares oracle
(slam/triangulation.cpp:21-62 semantics)."""

import numpy as np
import jax.numpy as jnp

from boslam.graph.build import build_graph
from boslam.init.triangulation import triangulate_landmarks, warn_underconstrained


def _oracle(parsed):
    """NumPy per-landmark lstsq in float64, mirroring triangulate_one_landmark."""
    pose_map = {int(pid): xyt for pid, xyt in zip(parsed.pose_ids, parsed.pose_xyt)}
    by_lm = {}
    for pid, lid, brg in zip(
        parsed.bearing_pose_id, parsed.bearing_lm_id, parsed.bearing_meas
    ):
        by_lm.setdefault(int(lid), []).append((pose_map[int(pid)], float(brg)))
    out = {}
    for lid, obs in sorted(by_lm.items()):
        A, b = [], []
        for (x, y, theta), alpha in obs:
            s, c = np.sin(theta + alpha), np.cos(theta + alpha)
            A.append([s, -c])
            b.append(s * x - c * y)
        A = np.asarray(A, np.float64)
        b = np.asarray(b, np.float64)
        out[lid] = (np.linalg.lstsq(A, b, rcond=None)[0], len(obs))
    return out


def test_triangulation_matches_oracle_full(full_ig):
    g, meta = build_graph(full_ig, init="triangulate")
    oracle = _oracle(full_ig)
    got = np.asarray(g.landmarks)
    for ix, lid in enumerate(meta.lm_ids):
        want, n_obs = oracle[lid]
        if n_obs >= 2:
            # non-degenerate landmarks must match the LS optimum
            np.testing.assert_allclose(got[ix], want, atol=2e-2, rtol=1e-3)


def test_triangulation_exact_two_rays():
    """Two orthogonal rays intersect exactly at the landmark."""
    poses = jnp.array([[0.0, 0, 0], [2.0, 0, 0]], jnp.float32)
    # landmark at (1, 1): bearings atan2(1,1)=pi/4 from pose0, 3pi/4 from pose1
    b_pose = jnp.array([0, 1], jnp.int32)
    b_lm = jnp.array([0, 0], jnp.int32)
    b_meas = jnp.array([np.pi / 4, 3 * np.pi / 4], jnp.float32)
    lm = triangulate_landmarks(poses, b_pose, b_lm, b_meas, n_landmarks=1)
    np.testing.assert_allclose(np.asarray(lm)[0], [1.0, 1.0], atol=1e-5)


def test_single_observation_on_line():
    """Degenerate landmark still lands on the observed bearing line
    (min-norm point; the reference warns and picks another point on the
    same line, triangulation.cpp:38-42)."""
    poses = jnp.array([[1.0, 0, 0]], jnp.float32)
    b_pose = jnp.array([0], jnp.int32)
    b_lm = jnp.array([0], jnp.int32)
    alpha = 0.7
    b_meas = jnp.array([alpha], jnp.float32)
    lm = np.asarray(
        triangulate_landmarks(poses, b_pose, b_lm, b_meas, n_landmarks=1)
    )[0]
    s, c = np.sin(alpha), np.cos(alpha)
    # line: s*(x - px) - c*(y - py) = 0
    assert abs(s * (lm[0] - 1.0) - c * lm[1]) < 1e-5


def test_underconstrained_ids_match_reference(full_ig):
    """The reference names landmarks 69, 112, 114 as single-observation
    (slam/triangulation.cpp:41)."""
    g, meta = build_graph(full_ig, init="triangulate")
    bad = warn_underconstrained(meta.lm_ids, np.asarray(g.b_lm), len(meta.lm_ids))
    assert sorted(bad) == [69, 112, 114]


def test_landmark_order_sorted_by_id(full_ig):
    """Triangulated landmarks added in sorted-id order (std::map iteration,
    triangulation.cpp:65-74)."""
    _, meta = build_graph(full_ig, init="triangulate")
    assert meta.lm_ids == sorted(meta.lm_ids)
    assert len(meta.lm_ids) == 141
