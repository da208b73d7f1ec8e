"""Device mesh construction.

The reference has no parallelism of any kind (SURVEY §2: single process,
single thread).  This is the TPU-native communication layer mandated by
BASELINE.json configs 4-5: a 1-D ``jax.sharding.Mesh`` over all chips (ICI
within a slice; DCN across hosts when running under
``jax.distributed.initialize``), with edges data-parallel along it.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
from jax.sharding import Mesh


def make_mesh(
    n_devices: Optional[int] = None,
    axis_name: str = "edge",
    devices: Optional[Sequence] = None,
) -> Mesh:
    """1-D mesh over the first ``n_devices`` devices (default: all)."""
    import numpy as np

    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def initialize_distributed(**kwargs) -> None:
    """Multi-host bring-up: thin wrapper over ``jax.distributed.initialize``.

    On TPU pods the coordinator/process env is auto-detected; callers on
    multi-host slices call this once before building a mesh so
    ``jax.devices()`` spans all hosts (SURVEY §5 distributed backend).
    """
    jax.distributed.initialize(**kwargs)
