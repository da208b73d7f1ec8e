"""Mask-based gauge fixing vs the reference's permute-truncate semantics
(slam/solver.cpp:71-94, construct_the_permutation :99-125)."""

import numpy as np
import jax.numpy as jnp

from boslam.solver.gauss_newton import gauge_mask, solve_gauge_fixed


def _permute_truncate_oracle(H, b, fixed_dxi):
    """Explicit reference semantics: move the fixed pose's 3 rows/cols to
    the end, truncate to (N-3), solve, re-embed zero delta."""
    N = H.shape[0]
    order = [i for i in range(N) if i not in (fixed_dxi, fixed_dxi + 1, fixed_dxi + 2)]
    order += [fixed_dxi, fixed_dxi + 1, fixed_dxi + 2]
    order = np.asarray(order)
    Hp = H[np.ix_(order, order)][: N - 3, : N - 3]
    bp = b[order][: N - 3]
    dx_red = np.linalg.solve(Hp, -bp)
    dx = np.zeros(N)
    dx[order[: N - 3]] = dx_red
    return dx


def test_masked_solve_equals_permute_truncate(rng):
    n_poses, n_landmarks = 5, 4
    N = 3 * n_poses + 2 * n_landmarks
    A = rng.standard_normal((N, N))
    H = (A @ A.T + 5.0 * np.eye(N)).astype(np.float32)
    b = rng.standard_normal(N).astype(np.float32)

    for fixed_ix in [0, 2, 4]:
        want = _permute_truncate_oracle(H.astype(np.float64), b.astype(np.float64), 3 * fixed_ix)
        mask = gauge_mask(N, n_poses, jnp.asarray(fixed_ix), jnp.float32)
        got, spd_ok = solve_gauge_fixed(jnp.asarray(H), jnp.asarray(b), mask)
        assert bool(spd_ok)
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)
        # fixed pose delta is exactly zero (re-embedding, solver.cpp:87-94)
        assert np.all(np.asarray(got)[3 * fixed_ix : 3 * fixed_ix + 3] == 0.0)


def test_gauge_mask_layout():
    m = np.asarray(gauge_mask(3 * 4 + 2 * 2, 4, jnp.asarray(2), jnp.float32))
    want = np.ones(16, np.float32)
    want[6:9] = 0
    np.testing.assert_array_equal(m, want)


def test_nan_guard():
    """Non-SPD systems are flagged and the delta is frozen instead of
    poisoning the state (the reference only prints a warning and proceeds,
    slam/solver.cpp:82-84 — we must not propagate NaNs on TPU)."""
    H = jnp.asarray(np.diag([1.0, -1.0, 1.0, 1.0, 1.0, 1.0]).astype(np.float32))
    b = jnp.ones(6, jnp.float32)
    mask = jnp.ones(6, jnp.float32)
    delta, spd_ok = solve_gauge_fixed(H, b, mask)
    assert not bool(spd_ok)
    assert np.all(np.isfinite(np.asarray(delta)))
