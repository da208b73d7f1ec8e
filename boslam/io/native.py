"""ctypes binding to the native C++ g2o tokenizer (``native/g2o_reader.cpp``).

The reference's parser is a C++ istringstream tokenizer
(utils/g2o_utils.cpp:10-146); ours keeps a native host-side fast path for
large synthetic sequences (100k-pose scaling runs parse ~20x faster than
pure Python) while the Python parser remains the behavioral reference.

Build: ``make -C native`` (produces ``native/libboslam_io.so``).  When the
library is missing ``parse_g2o_native`` returns None and callers fall back.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "libboslam_io.so",
)

_lib = None


class _G2OArrays(ctypes.Structure):
    _fields_ = [
        ("n_poses", ctypes.c_int64),
        ("n_landmarks", ctypes.c_int64),
        ("n_bearing", ctypes.c_int64),
        ("n_odom", ctypes.c_int64),
        ("pose_ids", ctypes.POINTER(ctypes.c_int64)),
        ("pose_xyt", ctypes.POINTER(ctypes.c_float)),
        ("lm_ids", ctypes.POINTER(ctypes.c_int64)),
        ("lm_xy", ctypes.POINTER(ctypes.c_float)),
        ("b_pose_id", ctypes.POINTER(ctypes.c_int64)),
        ("b_lm_id", ctypes.POINTER(ctypes.c_int64)),
        ("b_meas", ctypes.POINTER(ctypes.c_float)),
        ("o_src_id", ctypes.POINTER(ctypes.c_int64)),
        ("o_dst_id", ctypes.POINTER(ctypes.c_int64)),
        ("o_meas", ctypes.POINTER(ctypes.c_float)),
        ("o_omega", ctypes.POINTER(ctypes.c_float)),
        ("fixed_pose_id", ctypes.c_int64),
        ("bound", ctypes.c_float),
        ("n_unknown", ctypes.c_int64),
    ]


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.boslam_parse_g2o.argtypes = [ctypes.c_char_p]
    lib.boslam_parse_g2o.restype = ctypes.POINTER(_G2OArrays)
    lib.boslam_free_g2o.argtypes = [ctypes.POINTER(_G2OArrays)]
    lib.boslam_free_g2o.restype = None
    _lib = lib
    return lib


def _copy(ptr, count, dtype):
    if count == 0:
        return np.zeros(0, dtype=dtype)
    return np.ctypeslib.as_array(ptr, shape=(count,)).astype(dtype, copy=True)


def parse_g2o_native(path: str):
    """Parse with the native tokenizer; returns ParsedG2O or None."""
    lib = _load()
    if lib is None:
        return None
    from boslam.io.g2o import ParsedG2O

    res = lib.boslam_parse_g2o(path.encode())
    if not res:
        raise IOError(f"native g2o parser failed on {path}")
    try:
        r = res.contents
        np_, nl, nb, no = int(r.n_poses), int(r.n_landmarks), int(r.n_bearing), int(r.n_odom)
        parsed = ParsedG2O(
            pose_ids=[int(i) for i in _copy(r.pose_ids, np_, np.int64)],
            pose_xyt=_copy(r.pose_xyt, 3 * np_, np.float32).reshape(np_, 3),
            lm_ids=[int(i) for i in _copy(r.lm_ids, nl, np.int64)],
            lm_xy=_copy(r.lm_xy, 2 * nl, np.float32).reshape(nl, 2),
            bearing_pose_id=_copy(r.b_pose_id, nb, np.int64),
            bearing_lm_id=_copy(r.b_lm_id, nb, np.int64),
            bearing_meas=_copy(r.b_meas, nb, np.float32),
            bearing_omega=np.ones(nb, dtype=np.float32),
            odom_src_id=_copy(r.o_src_id, no, np.int64),
            odom_dst_id=_copy(r.o_dst_id, no, np.int64),
            odom_meas=_copy(r.o_meas, 3 * no, np.float32).reshape(no, 3),
            odom_omega=_copy(r.o_omega, 9 * no, np.float32).reshape(no, 3, 3),
            fixed_pose_id=int(r.fixed_pose_id),
            bound=float(r.bound),
        )
        return parsed
    finally:
        lib.boslam_free_g2o(res)
