"""Matrix corpus file IO, format-compatible with the reference harness.

Format (written by `matrix_generator.cpp:53-85`, read by
`benchmark.cpp:171-199`):

  * first line: the matrix count, left-justified in a 16-character field
    (the generator writes 16 spaces up front and overwrites them with the
    count via ``seekp(0)``)
  * per matrix: the dimension ``n`` on its own line, then ``n*n`` values
    (the generator emits them row by row, `matrix_generator.cpp:60-71`);
    the reader is whitespace-tolerant and just streams doubles.

If built, the native fast reader (``native/libmatio.so``, see
``native/matio.cpp``) is used for parsing large corpora; the pure-Python
path is the fallback and the behavioral reference.
"""

from __future__ import annotations

import ctypes
import os
from typing import Iterable, List, Tuple

import numpy as np

_NATIVE = None
_NATIVE_TRIED = False


def _native_lib():
    """Load native/libmatio.so if present (fast tokenizer for big corpora)."""
    global _NATIVE, _NATIVE_TRIED
    if _NATIVE_TRIED:
        return _NATIVE
    _NATIVE_TRIED = True
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    path = os.path.join(here, "native", "libmatio.so")
    if os.path.exists(path):
        try:
            lib = ctypes.CDLL(path)
            lib.matio_parse_doubles.restype = ctypes.c_longlong
            lib.matio_parse_doubles.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_double),
                ctypes.c_longlong,
            ]
            _NATIVE = lib
        except OSError:
            _NATIVE = None
    return _NATIVE


def _parse_all_doubles(path: str) -> np.ndarray:
    """Parse every whitespace-separated number in the file into a flat fp64
    array (the count and the per-matrix ``n`` headers are parsed as numbers
    too and sliced off by the caller)."""
    lib = _native_lib()
    if lib is not None:
        size = os.path.getsize(path)
        # worst case: one number per 2 bytes
        cap = size // 2 + 16
        out = np.empty(cap, dtype=np.float64)
        n = lib.matio_parse_doubles(
            path.encode(),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            cap,
        )
        if n >= 0:
            return out[:n]
    # Python fallback
    with open(path) as f:
        toks = f.read().split()
    return np.array(toks, dtype=np.float64)


def read_matrix_file(path: str) -> List[np.ndarray]:
    """Read a reference-format corpus into a list of fp64 (n, n) arrays
    (row-major, matching the generator's emission order)."""
    vals = _parse_all_doubles(path)
    if vals.size == 0:
        return []
    count = int(vals[0])
    out: List[np.ndarray] = []
    pos = 1
    for _ in range(count):
        if pos >= vals.size:
            raise ValueError(f"{path}: truncated corpus (expected {count} matrices)")
        n = int(vals[pos])
        pos += 1
        if pos + n * n > vals.size:
            raise ValueError(f"{path}: truncated matrix of size {n}")
        out.append(vals[pos : pos + n * n].reshape(n, n))
        pos += n * n
    return out


def _fmt(v: float) -> str:
    """C++ ``operator<<`` default formatting (6 significant digits, %g)."""
    return f"{v:g}"


def write_matrix_file(path: str, matrices: Iterable[np.ndarray]) -> int:
    """Write a corpus in the reference format; returns the matrix count."""
    mats = list(matrices)
    with open(path, "w") as f:
        # count left-justified in the 16-space field, like seekp(0) overwrite
        f.write(f"{len(mats):<16}\n")
        for a in mats:
            a = np.asarray(a, dtype=np.float64)
            n = a.shape[0]
            f.write(f"{n}\n")
            for i in range(n):
                f.write(" ".join(_fmt(v) for v in a[i]) + " \n")
            f.write("\n")
    return len(mats)
