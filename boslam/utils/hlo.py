"""Ground-truth collective accounting from compiled HLO (VERDICT r2 #5).

The mesh-scaling story previously hand-computed the psum payload from the
algebra; this module extracts it from what XLA actually compiled:
``collective_bytes(fn, *args)`` lowers/compiles a jitted function and sums
the result-shape bytes of every ``all-reduce`` (psum) / ``all-gather`` /
``reduce-scatter`` / ``collective-permute`` instruction in the optimized
HLO.  Static per-execution bytes; multiply by trip counts for loops you
know (or pass the loop body itself).
"""

from __future__ import annotations

import re
from typing import Iterable

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "f16": 2, "bf16": 2, "f8e4m3fn": 1, "f8e5m2": 1,
    "s64": 8, "s32": 4, "s16": 2, "s8": 1,
    "u64": 8, "u32": 4, "u16": 2, "u8": 1,
    "pred": 1, "c64": 8, "c128": 16,
}

# one array shape like  f32[301,3,3]{2,1,0:T(8,128)}  or  s32[] or pred[4]
_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")

_COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter", "collective-permute")


def _shape_bytes(shape_str: str) -> int:
    total = 0
    for dtype, dims in _SHAPE_RE.findall(shape_str):
        if dtype not in _DTYPE_BYTES:
            continue  # e.g. token[] / opaque
        n = 1
        if dims:
            for d in dims.split(","):
                n *= int(d)
        total += n * _DTYPE_BYTES[dtype]
    return total


def collective_instruction_bytes(hlo_text: str) -> dict:
    """Per-collective-kind result bytes summed over instructions.

    Matches optimized-HLO instruction lines of the form
    ``%name = <shape(s)> all-reduce(...)`` (also the ``-start`` async
    variants; ``-done`` carries the same shape and is skipped to avoid
    double counting).
    """
    out: dict[str, int] = {k: 0 for k in _COLLECTIVES}
    out["count"] = 0
    for line in hlo_text.splitlines():
        m = re.search(r"=\s*(.+?)\s+([a-z\-]+)\(", line)
        if not m:
            continue
        op = m.group(2)
        if op.endswith("-done"):
            continue  # paired with its -start; avoid double counting
        if op.endswith("-start"):
            op = op[: -len("-start")]
        if op in _COLLECTIVES:
            out[op] += _shape_bytes(m.group(1))
            out["count"] += 1
    return out


def collective_bytes(fn, *args, **kwargs) -> dict:
    """Compile ``fn(*args)`` (jit/shard_map composition) and account its
    collectives from the optimized HLO.  Returns
    ``{"all-reduce": bytes, ..., "count": n, "total": bytes}``.
    """
    import jax

    compiled = jax.jit(fn).lower(*args, **kwargs).compile()
    text = compiled.as_text()
    rec = collective_instruction_bytes(text)
    rec["total"] = sum(rec[k] for k in _COLLECTIVES)
    return rec
