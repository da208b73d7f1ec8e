"""Landmark triangulation from bearing rays — the initial-guess stage.

Counterpart of ``slam/triangulation.cpp``.  Each bearing observation of a
landmark contributes one line equation (derivation at triangulation.cpp:22-30):

    sin(theta+alpha) * x - cos(theta+alpha) * y
        = sin(theta+alpha) * px - cos(theta+alpha) * py

The reference buckets observations per landmark id into a std::map
(triangulation.cpp:5-19) and runs one col-pivoting-QR least-squares per
landmark (:44-59).  TPU-first re-design: with row a_i = (s, -c) having unit
norm, the per-landmark normal equations A^T A (2x2) and A^T b (2) are plain
``segment_sum``s over the *flat* edge array — no bucketing, no padding, no
per-landmark loop — followed by one batched guarded 2x2 solve.  This is the
same least-squares optimum for every landmark with >= 2 non-collinear rays.

Degenerate landmarks (all rays collinear — e.g. the single-observation ids
69, 112, 114 the reference warns about, triangulation.cpp:38-42): A^T A is
rank-1 and we return the *minimum-norm* point on the constraint line
(x = A^T A A^T b / tr^2).  The reference's pivoted QR instead zeroes the
non-pivot coordinate; both land on the same line and the landmark is
unlocalizable either way, so downstream behavior matches.
"""

from __future__ import annotations

import logging
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

log = logging.getLogger("boslam.init")

# Rank threshold for the 2x2 normal matrix: below this the rays are treated
# as collinear and the min-norm solution is used.
_DEGENERATE_RTOL = 1e-7


@partial(jax.jit, static_argnames=("n_landmarks",))
def triangulate_landmarks(
    poses: jnp.ndarray,
    b_pose_ix: jnp.ndarray,
    b_lm_ix: jnp.ndarray,
    b_meas: jnp.ndarray,
    *,
    n_landmarks: int,
) -> jnp.ndarray:
    """Triangulate all landmarks at once: returns f32[NL, 2].

    ``b_lm_ix`` must already be contiguous landmark indices (the host id
    normalization replaces the reference's std::map bucketing).
    """
    p = poses[b_pose_ix]
    ang = p[..., 2] + b_meas  # theta + alpha
    s, c = jnp.sin(ang), jnp.cos(ang)
    rhs = s * p[..., 0] - c * p[..., 1]  # s*px - c*py

    # Per-edge contributions to the landmark's 2x2 normal equations.
    a00 = s * s
    a01 = -s * c
    a11 = c * c
    atb0 = s * rhs
    atb1 = -c * rhs

    seg = lambda v: jax.ops.segment_sum(v, b_lm_ix, num_segments=n_landmarks)
    A00, A01, A11 = seg(a00), seg(a01), seg(a11)
    B0, B1 = seg(atb0), seg(atb1)

    det = A00 * A11 - A01 * A01
    tr = A00 + A11  # == number of observations (rows have unit norm)
    ok = det > _DEGENERATE_RTOL * tr * tr

    # Well-posed: Cramer solve of the 2x2 system.
    safe_det = jnp.where(ok, det, jnp.ones_like(det))
    x_ok = (A11 * B0 - A01 * B1) / safe_det
    y_ok = (A00 * B1 - A01 * B0) / safe_det

    # Rank-1 (collinear rays): minimum-norm point on the line,
    # x = (A^T A) (A^T b) / tr^2  (pinv of a rank-1 PSD matrix).
    safe_tr = jnp.maximum(tr, jnp.finfo(tr.dtype).tiny)
    x_deg = (A00 * B0 + A01 * B1) / (safe_tr * safe_tr)
    y_deg = (A01 * B0 + A11 * B1) / (safe_tr * safe_tr)

    x = jnp.where(ok, x_ok, x_deg)
    y = jnp.where(ok, y_ok, y_deg)
    return jnp.stack([x, y], axis=-1)


def warn_underconstrained(lm_ids, b_lm_ix: np.ndarray, n_landmarks: int) -> list:
    """Host-side single-observation warning (triangulation.cpp:38-42).

    Returns the offending original landmark ids (69, 112, 114 on the
    reference dataset) after logging, so callers/tests can assert on them.
    """
    counts = np.bincount(np.asarray(b_lm_ix), minlength=n_landmarks)
    bad = [int(lm_ids[i]) for i in np.nonzero(counts == 1)[0]]
    for lid in bad:
        log.warning(
            "Landmark no. %d only has one observation; "
            "bearing-only SLAM won't be able to locate it properly.",
            lid,
        )
    return bad
