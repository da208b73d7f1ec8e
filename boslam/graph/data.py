"""Array-of-structs factor graph — the TPU-native ``State`` + observations.

The reference holds the joint state in a ``State`` object (vector of
``Isometry2f`` poses + vector of 2D landmarks with bidirectional id<->index
"stix" maps, framework/state.hpp:15-54) and the measurements in
``BearingObservation`` / ``OdometryObservation`` structs
(framework/observation.hpp:12-81).

TPU-first re-design: all ids are normalized to contiguous indices on the
host at load time; on device everything is a fixed-shape array so a whole
Gauss-Newton step jits into one XLA program.  ``FactorGraph`` is a pytree
(shardable with ``jax.sharding``), ``GraphMeta`` is host-only bookkeeping
(id maps, plot bound) that never crosses into jit.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class FactorGraph:
    """Device-side problem: state + edges, indices pre-resolved.

    State layout (the packed delta vector mirrors the reference's
    ``[3*NP poses | 2*NL landmarks]`` convention, slam/solver.cpp:11 and
    framework/state.cpp:69-80):

    - ``poses``:      f32[NP, 3]  (x, y, theta)
    - ``landmarks``:  f32[NL, 2]

    Bearing edges (framework/observation.hpp:12-40; information weight
    defaults to 1, the parser deliberately ignores the 4th numeric field —
    utils/g2o_utils.cpp:112-121):

    - ``b_pose``:   i32[NB] pose index, ``b_lm``: i32[NB] landmark index
    - ``b_meas``:   f32[NB] bearing angle, ``b_omega``: f32[NB]

    Odometry edges (framework/observation.hpp:48-81; translation expressed
    in the source-pose frame, the g2o SLAM-2D convention):

    - ``o_src``, ``o_dst``: i32[NO]
    - ``o_meas``:  f32[NO, 3], ``o_omega``: f32[NO, 3, 3]

    ``fixed_pose_ix`` is the gauge pose (the reference removes its 3 rows /
    cols from H, slam/solver.cpp:71-94); kept as a scalar array so a jitted
    step does not recompile when it changes.
    """

    poses: jnp.ndarray
    landmarks: jnp.ndarray
    b_pose: jnp.ndarray
    b_lm: jnp.ndarray
    b_meas: jnp.ndarray
    b_omega: jnp.ndarray
    o_src: jnp.ndarray
    o_dst: jnp.ndarray
    o_meas: jnp.ndarray
    o_omega: jnp.ndarray
    fixed_pose_ix: jnp.ndarray

    @property
    def n_poses(self) -> int:
        return self.poses.shape[0]

    @property
    def n_landmarks(self) -> int:
        return self.landmarks.shape[0]

    @property
    def n_bearing(self) -> int:
        return self.b_meas.shape[0]

    @property
    def n_odometry(self) -> int:
        return self.o_meas.shape[0]

    @property
    def state_dim(self) -> int:
        """N = 3*NP + 2*NL (slam/solver.cpp:11)."""
        return 3 * self.n_poses + 2 * self.n_landmarks

    def with_state(self, poses: jnp.ndarray, landmarks: jnp.ndarray) -> "FactorGraph":
        return dataclasses.replace(self, poses=poses, landmarks=landmarks)


@dataclasses.dataclass
class GraphMeta:
    """Host-side id bookkeeping — the reference's "stix" association maps
    (framework/state.hpp:50-53, framework/state.cpp:20-49) live here and
    only here; device code sees contiguous indices.
    """

    pose_ids: List[int]
    lm_ids: List[int]
    pose_id_to_ix: Dict[int, int]
    lm_id_to_ix: Dict[int, int]
    fixed_pose_id: int
    bound: float  # symmetric plot bound (+3 margin, utils/g2o_utils.cpp:134-135)

    @classmethod
    def from_ids(
        cls, pose_ids, lm_ids, fixed_pose_id: int, bound: float
    ) -> "GraphMeta":
        pose_ids = [int(i) for i in pose_ids]
        lm_ids = [int(i) for i in lm_ids]
        return cls(
            pose_ids=pose_ids,
            lm_ids=lm_ids,
            pose_id_to_ix={pid: ix for ix, pid in enumerate(pose_ids)},
            lm_id_to_ix={lid: ix for ix, lid in enumerate(lm_ids)},
            fixed_pose_id=int(fixed_pose_id),
            bound=float(bound),
        )

    def default_pose_id(self) -> int:
        """First-added pose id (framework/state.cpp:65-67)."""
        return self.pose_ids[0]


def pack_delta(delta_poses: np.ndarray, delta_landmarks: np.ndarray) -> np.ndarray:
    """Flatten per-block deltas into the reference's packed layout."""
    return np.concatenate([np.ravel(delta_poses), np.ravel(delta_landmarks)])


def unpack_delta(delta: jnp.ndarray, n_poses: int, n_landmarks: int):
    """Split a packed ``[3*NP | 2*NL]`` delta into per-block arrays."""
    dp = delta[: 3 * n_poses].reshape(n_poses, 3)
    dl = delta[3 * n_poses :].reshape(n_landmarks, 2)
    return dp, dl


def full_state_vector(poses, landmarks) -> np.ndarray:
    """Packed ``[3*NP | 2*NL]`` state vector (t2v per pose, then landmarks)
    — the layout of ``State::print_full_vector`` (framework/state.cpp:83-93)."""
    return pack_delta(np.asarray(poses), np.asarray(landmarks))


def print_full_state(poses, landmarks, file=None) -> None:
    """Debug dump matching ``State::print_full_vector``'s "State: <v>" line
    (framework/state.cpp:92, "been useful for debugging a bit (on the mini
    data)")."""
    import sys

    v = full_state_vector(poses, landmarks)
    print("State: " + " ".join(f"{x:g}" for x in v), file=file or sys.stdout)
