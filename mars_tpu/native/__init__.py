"""First-party native (C++) host solvers — exact oracles & fallbacks.

Builds ``mars_native.cpp`` on first import (g++ -O2 -shared; cached next to
the source) and binds it via ctypes.  See the .cpp header for what each
solver replaces from the reference's third-party native deps (SURVEY §2.4).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(__file__)
_SRC = os.path.join(_DIR, "mars_native.cpp")
_LIB = os.path.join(_DIR, "libmars_native.so")

_lib: Optional[ctypes.CDLL] = None


def _build() -> None:
    # compile to a temp path then os.replace (atomic): an interrupted build
    # must not leave a truncated .so that the mtime check would then trust
    # forever, and concurrent importers must never CDLL a half-written file
    tmp = f"{_LIB}.{os.getpid()}.tmp"
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", tmp],
            check=True,
        )
        os.replace(tmp, _LIB)
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)


def get_lib() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        if (not os.path.exists(_LIB)) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            _build()
        lib = ctypes.CDLL(_LIB)
        lib.emd_uniform.restype = ctypes.c_double
        lib.emd_uniform.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_int,
        ]
        lib.lsa_maximize.restype = None
        lib.lsa_maximize.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.rle_encode.restype = ctypes.c_int
        lib.rle_encode.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint32),
        ]
        lib.rle_decode.restype = None
        lib.rle_decode.argtypes = [
            ctypes.POINTER(ctypes.c_uint32), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.rle_to_string.restype = ctypes.c_int
        lib.rle_to_string.argtypes = [
            ctypes.POINTER(ctypes.c_uint32), ctypes.c_int, ctypes.c_char_p,
        ]
        lib.rle_from_string.restype = ctypes.c_int
        lib.rle_from_string.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.POINTER(ctypes.c_uint32),
        ]
        _lib = lib
    return _lib


def emd_exact(cost: np.ndarray) -> float:
    """Exact EMD with uniform marginals (== reference ot.emd2 with
    a=1/t, b=1/c; FilteringMergingModule.py:160-169).

    Degenerate (0-row / 0-col) matrices return 0.0, matching the device
    path's 'proposals with empty footprints get EMD 0' convention
    (ot.emd2 raises on them)."""
    c = np.ascontiguousarray(cost, np.float64)
    t, n = c.shape
    if t == 0 or n == 0:
        return 0.0
    r = float(
        get_lib().emd_uniform(c.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), t, n)
    )
    if r < 0.0:  # C++ infeasibility sentinel; unreachable for finite costs
        raise RuntimeError("emd_uniform reported an infeasible flow")
    return r


def assignment_exact(score: np.ndarray) -> np.ndarray:
    """Exact maximize linear assignment: col per row (t <= n), matching
    scipy.optimize.linear_sum_assignment's optimum."""
    s = np.ascontiguousarray(score, np.float64)
    t, n = s.shape
    if t > n:
        # hard precondition: a tall matrix drives the C++ augmenting loop
        # out of bounds (UB), so fail loudly even under python -O
        raise ValueError(f"assignment_exact needs t <= n, got {t}x{n}")
    out = np.empty(t, np.int32)
    get_lib().lsa_maximize(
        s.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), t, n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    )
    return out


def rle_encode(mask: np.ndarray) -> dict:
    """COCO-style uncompressed RLE {'size': [h, w], 'counts': [...]}
    (column-major, matching segment_anything/utils/amg.py:107-136)."""
    m = np.ascontiguousarray(mask.astype(np.uint8))
    h, w = m.shape
    out = np.empty(h * w + 1, np.uint32)
    n = get_lib().rle_encode(
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
    )
    return {"size": [h, w], "counts": out[:n].tolist()}


def rle_decode(rle: dict) -> np.ndarray:
    h, w = rle["size"]
    counts = rle["counts"]
    if isinstance(counts, (bytes, str)):
        counts = _string_to_counts(counts)
    counts = np.asarray(counts, np.uint32)
    out = np.zeros((h, w), np.uint8)
    get_lib().rle_decode(
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), len(counts), h, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out


def _counts_to_string(counts: np.ndarray) -> bytes:
    counts = np.ascontiguousarray(counts, np.uint32)
    buf = ctypes.create_string_buffer(7 * max(len(counts), 1) + 1)
    n = get_lib().rle_to_string(
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        len(counts), buf)
    return buf.raw[:n]


def _string_to_counts(s) -> np.ndarray:
    if isinstance(s, str):
        s = s.encode("ascii")
    out = np.empty(max(len(s), 1), np.uint32)
    n = get_lib().rle_from_string(
        s, len(s), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)))
    return out[:n]


def rle_compress(rle: dict) -> dict:
    """Uncompressed COCO RLE → the pycocotools interchange form
    {'size': [h, w], 'counts': bytes} (mask.encode's output format —
    LEB128-style base-32 varints with 2-back difference coding; the
    reference serializes proposal dumps through pycocotools consumers)."""
    return {"size": list(rle["size"]),
            "counts": _counts_to_string(np.asarray(rle["counts"], np.uint32))}


def rle_encode_compressed(mask: np.ndarray) -> dict:
    """(h, w) {0,1} mask → pycocotools-compatible compressed RLE, equal
    byte-for-byte to pycocotools.mask.encode(np.asfortranarray(mask))."""
    return rle_compress(rle_encode(mask))


def rle_decode_compressed(rle: dict) -> np.ndarray:
    """Inverse of rle_encode_compressed; also accepts uncompressed lists
    (rle_decode dispatches on the counts type)."""
    return rle_decode(rle)
