"""Host-side graph construction: ids -> contiguous indices, init landmarks.

Mirrors the driver pipeline of executables/bearing_only_slam.cpp:40-71:
parse -> default the fixed pose to the first-added pose when no FIX record
exists (:63-65, framework/state.cpp:65-67) -> triangulate landmark initial
guesses (:68) -> construct the solver problem (:71).

Landmark index order: when triangulating, landmarks are added iterating a
std::map keyed by id in the reference (triangulation.cpp:65-74), i.e.
*sorted by id* — we keep that order so packed-delta layouts are comparable.
When landmarks come from VERTEX_XY records (ground-truth files) they keep
file order, matching ``State::add_landmark`` call order
(utils/g2o_utils.cpp:51-67).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from boslam.graph.data import FactorGraph, GraphMeta
from boslam.init.triangulation import triangulate_landmarks, warn_underconstrained
from boslam.io.g2o import ParsedG2O


def build_graph(
    parsed: ParsedG2O,
    *,
    init: str = "auto",
    dtype=jnp.float32,
    bearings_override: Optional[ParsedG2O] = None,
) -> Tuple[FactorGraph, GraphMeta]:
    """Build the device-side problem from a parse result.

    ``init``:
      - "triangulate": ignore any VERTEX_XY records; landmarks are the ids
        observed by bearing edges, initialized by triangulation (the main
        pipeline, bearing_only_slam.cpp:68).
      - "file": landmarks come from VERTEX_XY records (ground-truth files).
      - "auto": "file" when VERTEX_XY records exist, else "triangulate".

    ``bearings_override``: use the bearing/odometry edges of another parse
    (the reference's "noiseless observations" fixture, tests/testone.cpp:33-42,
    pairs initial-guess poses with ground-truth edges).
    """
    edges = bearings_override if bearings_override is not None else parsed

    if init == "auto":
        init = "file" if len(parsed.lm_ids) else "triangulate"

    pose_ids = parsed.pose_ids
    pose_id_to_ix = {pid: ix for ix, pid in enumerate(pose_ids)}

    if init == "file":
        lm_ids = list(parsed.lm_ids)
    elif init == "triangulate":
        lm_ids = sorted(set(int(i) for i in edges.bearing_lm_id))
    else:
        raise ValueError(f"unknown init {init!r}")
    lm_id_to_ix = {lid: ix for ix, lid in enumerate(lm_ids)}

    b_pose = np.array([pose_id_to_ix[int(i)] for i in edges.bearing_pose_id], np.int32)
    b_lm = np.array([lm_id_to_ix[int(i)] for i in edges.bearing_lm_id], np.int32)
    o_src = np.array([pose_id_to_ix[int(i)] for i in edges.odom_src_id], np.int32)
    o_dst = np.array([pose_id_to_ix[int(i)] for i in edges.odom_dst_id], np.int32)

    poses = jnp.asarray(parsed.pose_xyt, dtype)
    b_meas = jnp.asarray(edges.bearing_meas, dtype)

    if init == "file":
        landmarks = jnp.asarray(parsed.lm_xy, dtype)
    else:
        landmarks = triangulate_landmarks(
            poses,
            jnp.asarray(b_pose),
            jnp.asarray(b_lm),
            b_meas,
            n_landmarks=len(lm_ids),
        )
        warn_underconstrained(lm_ids, b_lm, len(lm_ids))

    fixed_pose_id = parsed.fixed_pose_id
    if fixed_pose_id < 0:
        # No FIX record: default to the first-added pose
        # (bearing_only_slam.cpp:63-65, framework/state.cpp:65-67).
        fixed_pose_id = pose_ids[0]

    graph = FactorGraph(
        poses=poses,
        landmarks=landmarks,
        b_pose=jnp.asarray(b_pose),
        b_lm=jnp.asarray(b_lm),
        b_meas=b_meas,
        b_omega=jnp.asarray(edges.bearing_omega, dtype),
        o_src=jnp.asarray(o_src),
        o_dst=jnp.asarray(o_dst),
        o_meas=jnp.asarray(edges.odom_meas, dtype),
        o_omega=jnp.asarray(edges.odom_omega, dtype),
        fixed_pose_ix=jnp.asarray(pose_id_to_ix[fixed_pose_id], jnp.int32),
    )
    meta = GraphMeta.from_ids(pose_ids, lm_ids, fixed_pose_id, parsed.bound)
    return graph, meta
