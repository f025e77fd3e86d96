"""ctypes bindings for the native (C++) graph builder.

Auto-builds ``libgraphbuild.so`` on first use if a toolchain is present;
falls back silently to the numpy pipeline otherwise (sparse/build.py calls
through ``native_coo_from_triples`` when available).  Semantics are
equivalence-tested against the numpy path in tests/test_native_build.py.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(__file__)
_LIB_PATH = os.path.join(_DIR, "libgraphbuild.so")
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _DIR, "-s"], check=True, capture_output=True)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.build_adjacency_coo.restype = ctypes.c_int64
    lib.build_adjacency_coo.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int32, ctypes.c_double, ctypes.c_int32, ctypes.c_double,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_double),
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


_WEIGHTING = {"uniform": 0, "funifun": 1}
_NORM = {"none": 0, "rw": 1, "sym": 2}


def native_coo_from_triples(
    n_ent: int,
    triples: np.ndarray,
    n_rel: int | None = None,
    weighting: str = "uniform",
    w_min: float = 0.3,
    self_loops: bool = True,
    self_loop_w: float = 1.0,
    norm: str = "none",
) -> tuple[np.ndarray, np.ndarray, np.ndarray] | None:
    """Full native pipeline (build + normalize + sort). None if lib missing."""
    lib = _load()
    if lib is None:
        return None
    triples = np.ascontiguousarray(triples, dtype=np.int32)
    if n_rel is None:
        n_rel = int(triples[:, 1].max()) + 1 if len(triples) else 1
    t_ptr = triples.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    args = (t_ptr, len(triples), n_ent, max(n_rel, 1), _WEIGHTING[weighting], w_min,
            int(self_loops), self_loop_w, _NORM[norm])
    null64 = ctypes.cast(None, ctypes.POINTER(ctypes.c_int64))
    nullf = ctypes.cast(None, ctypes.POINTER(ctypes.c_double))
    total = lib.build_adjacency_coo(*args, 0, 0, null64, null64, nullf)
    if total < 0:
        raise ValueError(
            "native build_adjacency_coo rejected inputs: an entity id is "
            "outside [0, n_ent) or a relation id outside [0, n_rel) — "
            "malformed triples would corrupt the native builder's indexed "
            "accumulators, so they are rejected up front")
    src = np.empty(total, np.int64)
    dst = np.empty(total, np.int64)
    w = np.empty(total, np.float64)
    got = lib.build_adjacency_coo(
        *args, 1, total,
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        w.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    assert got == total
    return src, dst, w
