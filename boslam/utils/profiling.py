"""Profiling / timing helpers (SURVEY §5 tracing: the reference has only an
on-screen progress bar; here: jax.profiler traces + block_until_ready-
bracketed timers + simple roofline accounting for the BA step)."""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace (view with TensorBoard/XProf)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timeit(fn: Callable, *args, repeats: int = 5, warmup: int = 1) -> dict:
    """Wall-time a jitted callable with device-sync semantics."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    return {
        "best_s": min(times),
        "mean_s": sum(times) / len(times),
        "times": times,
    }


def gn_step_flops(n_poses: int, n_landmarks: int, n_bearing: int, n_odom: int) -> int:
    """Rough FLOP count of one dense-path GN step, for roofline context.

    Dominated by the Cholesky factorization (N^3/3) at reference scale and
    by edge math + segment sums at large scale.
    """
    N = 3 * n_poses + 2 * n_landmarks
    edge = n_bearing * 120 + n_odom * 700  # residual+jacobian+outer products
    chol = N**3 // 3 + 2 * N**2
    return edge + chol
