"""Windowed gather — the TPU answer to per-row gather latency.

Measured (PERF.md): TPU row gathers cost ~10-16 ns per indexed row
regardless of width, so the packed CG matvec's two slot-grid gathers
(~NB rows each per inner iteration) dominate large problems.  This is
PERF.md roadmap #1 / VERDICT r1 item 3.

Observation: the slot grids have LOCALITY.  Poses observe landmarks seen
around the same trajectory segment, so after relabeling landmarks by mean
observing pose (boslam/graph/reorder.py) every tile of T consecutive rows
of a slot grid indexes a narrow window of the value array.  A gather with
windowed structure needs no per-row addressing:

  per row-tile t:  one contiguous DMA  values[start[t] : start[t]+W]  into
  VMEM, then  out = onehot(idx - start[t]) @ window  — a [T*K, W] x [W, C]
  matmul on the MXU.  Per-tile cost is one DMA + one small matmul instead
  of T*K scattered row fetches.

Padding/out-of-window indices simply match no one-hot column and gather
exact zeros — strictly cleaner than the fallback gather (which fetches
row 0 and relies on omega = 0 downstream).

The planner (plan_windows) is host-side numpy at pack time; it refuses
(returns None) when the index structure has no useful locality, and the
caller falls back to the plain gather.  Kernel verified against
jnp.take in tests/test_windowed_gather.py (interpret mode on CPU,
compiled on TPU).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@dataclasses.dataclass
class WindowPlan:
    """Static-shape plan for one slot grid; built once at pack time.

    ``starts`` i32[n_tiles]: first value row covered by each row-tile's
    window.  ``window`` / ``tile_rows`` are static (they pick the kernel's
    shapes).
    """

    starts: jnp.ndarray
    window: int = dataclasses.field(metadata=dict(static=True))
    tile_rows: int = dataclasses.field(metadata=dict(static=True))

    @property
    def n_tiles(self) -> int:
        return self.starts.shape[0]


jax.tree_util.register_dataclass(
    WindowPlan, data_fields=["starts"], meta_fields=["window", "tile_rows"]
)


def plan_windows(
    idx: np.ndarray,
    valid: np.ndarray,
    n_values: int,
    tile_rows: int = 256,
    max_window: int = 1024,
) -> "WindowPlan | None":
    """Build a WindowPlan for a [R, K] index grid, or None if windows would
    be too wide to beat the plain gather.

    ``valid`` masks padding slots (their indices are ignored — any value
    outside the window gathers zero, which is what padding must produce).
    The window is clamped to the (128-padded) value count: for small value
    arrays every tile just reads the whole array, which degenerates to the
    plain one-hot-matmul gather — already the fast formulation at small
    scale (cf. the "matmul" assembly mode).  Smaller row tiles are tried
    before giving up: they narrow the windows at the cost of more DMAs.

    ``max_window`` encodes the economics: the kernel's one-hot matmul
    costs ~W * 128 * 2 / peak FLOPs per gathered row (~2 ns at W = 256 on
    v5e) vs ~13 ns for a plain per-row gather, so windows beyond ~1024
    lose and the planner refuses (revisit-heavy graphs have genuinely
    non-banded structure no ordering can fix — the caller falls back).
    """
    idx = np.asarray(idx)
    valid = np.asarray(valid)
    full = max(128, ((n_values + 127) // 128) * 128)
    for T in dict.fromkeys((tile_rows, 128)):
        plan = _plan_one(idx, valid, n_values, T, min(max_window, full))
        if plan is not None:
            return plan
    return None


def _plan_one(idx, valid, n_values, tile_rows, max_window):
    R = idx.shape[0]
    n_tiles = max(1, -(-R // tile_rows))
    starts = np.zeros(n_tiles, np.int32)
    span_max = 1
    for t in range(n_tiles):
        sl = slice(t * tile_rows, min(R, (t + 1) * tile_rows))
        v = valid[sl]
        if not v.any():
            starts[t] = 0
            continue
        ix = idx[sl][v]
        lo, hi = int(ix.min()), int(ix.max())
        starts[t] = lo
        span_max = max(span_max, hi - lo + 1)
    window = min(
        max(128, ((span_max + 127) // 128) * 128),
        max(128, ((n_values + 127) // 128) * 128),
    )
    if window > max_window:
        return None
    # keep windows inside the (possibly padded) value array: the take pads
    # values up to `window` rows when window > n_values
    starts = np.clip(starts, 0, max(0, n_values - window)).astype(np.int32)
    return WindowPlan(
        starts=jnp.asarray(starts), window=window, tile_rows=tile_rows
    )


_LANES = 128  # values are padded to a full lane tile: every DMA/matmul
# shape stays 128-aligned (Mosaic refuses slices of narrower memrefs)


def _gather_kernel(T: int, K: int, W: int):
    def kernel(starts_ref, idx_ref, values_hbm, out_ref, win_ref, sem):
        t = pl.program_id(0)
        start = starts_ref[t]
        dma = pltpu.make_async_copy(
            values_hbm.at[pl.ds(start, W), :], win_ref, sem
        )
        dma.start()
        # One one-hot matmul per slot column (K is small and static); this
        # sidesteps Mosaic's unsupported [T, K] -> [T*K, 1] reshape for
        # non-lane-aligned K.  One one-hot lives at a time — materializing
        # all K of them ([T, W] f32 each) blows the VMEM budget at K ~ 24.
        cols = jax.lax.broadcasted_iota(jnp.int32, (T, W), 1)
        dma.wait()
        win = win_ref[...]
        for k in range(K):
            oh = (idx_ref[:, k : k + 1] - start == cols).astype(win.dtype)
            out_ref[:, k, :] = jnp.dot(
                oh, win, preferred_element_type=jnp.float32
            )

    return kernel


@partial(jax.jit, static_argnames=("window", "tile_rows", "interpret"))
def _windowed_take_padded(
    values: jnp.ndarray,
    idx: jnp.ndarray,
    starts: jnp.ndarray,
    window: int,
    tile_rows: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """values must already be lane-padded to [Mp, 128], Mp >= window."""
    R, K = idx.shape
    T = tile_rows
    n_tiles = R // T
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((T, K), lambda t, starts: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # values stay in HBM
        ],
        out_specs=pl.BlockSpec(
            (T, K, _LANES), lambda t, starts: (t, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((window, _LANES), values.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        _gather_kernel(T, K, window),
        out_shape=jax.ShapeDtypeStruct((R, K, _LANES), values.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(starts, idx, values)


def windowed_take(
    values: jnp.ndarray,
    idx: jnp.ndarray,
    plan: WindowPlan,
    interpret: bool = False,
) -> jnp.ndarray:
    """values f32[M, C] taken at idx i32[R, K] -> f32[R, K, C].

    Equivalent to ``values[idx]`` for in-window indices; out-of-window
    (padding) indices yield exact zeros.  Rows are padded up to a tile
    multiple internally (Pallas handles the ragged last block, but an
    explicit pad keeps the write path fully defined).
    """
    R, K = idx.shape
    C = values.shape[1]
    T = plan.tile_rows
    Rp = plan.n_tiles * T
    if Rp != R:
        idx = jnp.pad(idx, ((0, Rp - R), (0, 0)), constant_values=-1)
    # lane-pad values to a full (128) tile so every memref slice in the
    # kernel is tile-aligned; also row-pad so the window DMA stays in
    # bounds (pad rows are never matched by any one-hot column)
    row_pad = max(0, plan.window - values.shape[0])
    values = jnp.pad(values, ((0, row_pad), (0, _LANES - C)))
    out = _windowed_take_padded(
        values, idx, plan.starts, plan.window, T, interpret
    )
    return out[:R, :, :C]
