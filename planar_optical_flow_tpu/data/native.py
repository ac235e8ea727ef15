"""ctypes bindings for the native data-path runtime (``native/pofnative.cpp``).

Builds the shared library on first use (g++, cached next to the sources);
every entry point returns ``None``/falls through on any failure so pure-
python fallbacks keep working on machines without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_LOCK = threading.Lock()
_LIB = None
_TRIED = False

_SRC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native", "pofnative.cpp",
)
_OUT = os.path.join(os.path.dirname(_SRC), "libpofnative.so")


def _load():
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        try:
            if (not os.path.exists(_OUT)
                    or os.path.getmtime(_OUT) < os.path.getmtime(_SRC)):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _OUT],
                    check=True, capture_output=True, timeout=120,
                )
            lib = ctypes.CDLL(_OUT)
            lib.pof_read_csv.restype = ctypes.c_int
            lib.pof_read_csv.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.POINTER(ctypes.c_double)),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64),
            ]
            lib.pof_free.argtypes = [ctypes.c_void_p]
            lib.pof_lzf_decompress.restype = ctypes.c_int64
            lib.pof_lzf_decompress.argtypes = [
                ctypes.c_char_p, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ]
            _LIB = lib
        except Exception:
            _LIB = None
        return _LIB


def read_csv(path: str) -> np.ndarray | None:
    """Parse a numeric CSV into ``(rows, cols)`` float64, or None."""
    lib = _load()
    if lib is None:
        return None
    data = ctypes.POINTER(ctypes.c_double)()
    rows = ctypes.c_int64()
    cols = ctypes.c_int64()
    rc = lib.pof_read_csv(path.encode(), ctypes.byref(data),
                          ctypes.byref(rows), ctypes.byref(cols))
    if rc != 0:
        return None
    try:
        n = rows.value * cols.value
        arr = np.ctypeslib.as_array(data, shape=(n,)).copy()
        return arr.reshape(rows.value, cols.value)
    finally:
        lib.pof_free(data)


def lzf_decompress(data: bytes, expected_size: int) -> bytes | None:
    """Returns None only when the native library is unavailable (caller
    falls back to the python decoder); a corrupt stream raises — it must
    NOT fall through to a second decoder that would fail less readably."""
    lib = _load()
    if lib is None:
        return None
    out = (ctypes.c_uint8 * expected_size)()
    n = lib.pof_lzf_decompress(data, len(data), out, expected_size)
    if n < 0:
        raise ValueError(
            "corrupt LZF stream (out-of-range back-reference, truncated "
            "run, or output overflow)")
    return bytes(bytearray(out)[:n])
