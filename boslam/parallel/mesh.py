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
    Exercised for real (2-process CPU cluster, cross-process psum parity)
    by tools/distributed_smoke.py / tests/test_distributed.py.
    """
    jax.distributed.initialize(**kwargs)


def put_sharded(x, sharding):
    """Place a host array under ``sharding`` — multi-process safe.

    Single process: plain ``jax.device_put``.  Multi-process (after
    ``initialize_distributed``): every process holds the same full host
    array, and each builds only its addressable shards via
    ``jax.make_array_from_callback`` — a device_put to a sharding that
    spans non-addressable devices is not allowed.
    """
    import numpy as np

    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    x = np.asarray(x)
    return jax.make_array_from_callback(x.shape, sharding, lambda idx: x[idx])
