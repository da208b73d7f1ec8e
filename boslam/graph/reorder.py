"""Landmark locality reordering (host-side, one-time at pack).

The windowed gather (boslam/ops/windowed_gather.py) needs every pose
tile's observed-landmark indices to span a narrow window.  Landmark
indices as loaded are arbitrary (file id order / synth RNG order), but the
underlying structure is local: each landmark is observed from one
trajectory segment.  Relabeling landmarks by their mean observing pose
index makes consecutive poses see consecutive landmark indices — after
which both slot grids of the dual packing are banded.

Index relabeling is solver-internal and invisible to callers: the solve
unmaps the landmark order on the way out (the reference's id <-> index
indirection, framework/state.hpp:50-53, gives the rebuild the same
freedom the C++ "stix" maps give it).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from boslam.graph.data import FactorGraph


def reorder_landmarks_by_pose(
    g: FactorGraph,
) -> tuple[FactorGraph, np.ndarray, np.ndarray]:
    """Relabel landmarks by mean observing pose index.

    Returns (reordered graph, perm, inv) with ``new[i] = old[perm[i]]``
    and ``old[j] = new[inv[j]]``; unmap results with ``landmarks[inv]``.
    """
    b_lm = np.asarray(g.b_lm)
    b_pose = np.asarray(g.b_pose, np.float64)
    NL = g.n_landmarks
    sums = np.zeros(NL, np.float64)
    counts = np.zeros(NL, np.float64)
    np.add.at(sums, b_lm, b_pose)
    np.add.at(counts, b_lm, 1.0)
    # unobserved landmarks sort last (they touch no edge, any order works)
    mean = np.where(counts > 0, sums / np.maximum(counts, 1.0), np.inf)
    perm = np.argsort(mean, kind="stable").astype(np.int64)
    inv = np.empty(NL, np.int64)
    inv[perm] = np.arange(NL)
    g2 = dataclasses.replace(
        g,
        landmarks=g.landmarks[jnp.asarray(perm)],
        b_lm=jnp.asarray(inv, g.b_lm.dtype)[g.b_lm],
    )
    return g2, perm, inv
