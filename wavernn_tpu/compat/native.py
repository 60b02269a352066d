"""ctypes bindings for the native host post-processing library
(native/xfade.cc).  Builds on first use with g++ (cached as a .so next to
the sources); falls back to the numpy implementations when no compiler is
available, so the package stays importable everywhere.
"""
from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path
from typing import Optional

import numpy as np

_REPO = Path(__file__).resolve().parents[2]
_SRC = _REPO / "native" / "xfade.cc"
_LIB = _REPO / "native" / "_libxfade.so"
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> Optional[ctypes.CDLL]:
    if not _SRC.exists():
        return None
    if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
        cmd = ["g++", "-O3", "-shared", "-fPIC", "-o", str(_LIB), str(_SRC)]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        except (subprocess.SubprocessError, FileNotFoundError):
            return None
    lib = ctypes.CDLL(str(_LIB))
    dptr = ctypes.POINTER(ctypes.c_double)
    lib.xfade_and_unfold.argtypes = [dptr, ctypes.c_int64, ctypes.c_int64,
                                     ctypes.c_int64, dptr]
    lib.decode_mu_law.argtypes = [dptr, ctypes.c_int64, ctypes.c_int64]
    lib.tail_fade.argtypes = [dptr, ctypes.c_int64, ctypes.c_int64]
    return lib


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if not _tried:
            _tried = True
            _lib = _build()
    return _lib


def _as_c(arr):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def xfade_and_unfold(y: np.ndarray, target: int, overlap: int) -> np.ndarray:
    """Native overlap-add; same semantics as ops/fold.py::xfade_and_unfold."""
    lib = get_lib()
    if lib is None:
        from ..ops.fold import xfade_and_unfold as np_impl
        return np_impl(y, target, overlap)
    y = np.ascontiguousarray(y, dtype=np.float64).copy()
    num_folds, length = y.shape
    t = length - 2 * overlap
    out = np.empty(num_folds * (t + overlap) + overlap, dtype=np.float64)
    lib.xfade_and_unfold(_as_c(y), num_folds, length, overlap, _as_c(out))
    return out


def decode_mu_law_inplace(y: np.ndarray, n_classes: int) -> np.ndarray:
    lib = get_lib()
    if lib is None:
        from ..dsp.audio import decode_mu_law
        return decode_mu_law(y, n_classes, from_labels=False)
    y = np.ascontiguousarray(y, dtype=np.float64)
    lib.decode_mu_law(_as_c(y), y.size, n_classes)
    return y


def tail_fade_inplace(y: np.ndarray, n_fade: int) -> np.ndarray:
    lib = get_lib()
    if lib is None:
        n = min(n_fade, len(y))
        y[-n:] *= np.linspace(1, 0, n)
        return y
    y = np.ascontiguousarray(y, dtype=np.float64)
    lib.tail_fade(_as_c(y), y.size, n_fade)
    return y
