"""ctypes bindings to the native IO runtime (native/csvio.cpp).

The reference's IO helpers are C++ (src/helper/helper.cu); ours are too, with
a Python fallback when the shared library hasn't been built. The library is
built on demand with ``make -C native`` (g++ is baked into the image; pybind11
is not, hence the plain C ABI + ctypes).
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libcsbmp_io.so"
_lib = None
_build_attempted = False


def _load() -> ctypes.CDLL | None:
    global _lib, _build_attempted
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists() and not _build_attempted:
        _build_attempted = True
        try:
            subprocess.run(
                ["make", "-C", str(_NATIVE_DIR)],
                check=True, capture_output=True, timeout=60,
            )
        except Exception:
            return None
    if not _LIB_PATH.exists():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.csbmp_write_csv.restype = ctypes.c_int
    lib.csbmp_write_csv.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_char_p,
    ]
    lib.csbmp_read_csv.restype = ctypes.c_int64
    lib.csbmp_read_csv.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
    ]
    _lib = lib
    return lib


def native_available() -> bool:
    return _load() is not None


def write_csv_native(arr: np.ndarray, path: str) -> bool:
    """Write a 2-D float64 array as CSV via the native writer.
    Returns False (caller should fall back) if the library is unavailable."""
    lib = _load()
    if lib is None:
        return False
    arr = np.ascontiguousarray(arr, np.float64)
    assert arr.ndim == 2
    rc = lib.csbmp_write_csv(
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        arr.shape[0], arr.shape[1], path.encode(),
    )
    return rc == 0


def read_csv_native(path: str, max_values: int = 1 << 22) -> np.ndarray | None:
    """Read all float values of a CSV in file order; None if unavailable.
    Raises FileNotFoundError/ValueError on IO/overflow errors."""
    lib = _load()
    if lib is None:
        return None
    buf = np.empty(max_values, np.float64)
    n = lib.csbmp_read_csv(
        path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        max_values,
    )
    if n == -1:
        raise FileNotFoundError(path)
    if n == -2:
        raise ValueError(f"{path}: more than {max_values} values")
    return buf[:n].copy()
