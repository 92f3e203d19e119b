"""ctypes bindings for the native host-IO tier (csrc/).

The shared library is compiled on demand with the system g++ and cached
next to the source; everything degrades gracefully to the pure-Python
implementations when no toolchain is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_CSRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), 'csrc')
_LIB_PATH = os.path.join(_CSRC, 'libtrajloader.so')
_SRC_PATH = os.path.join(_CSRC, 'trajectory_loader.cpp')

_lock = threading.Lock()
_lib = None
_lib_failed = False


def _build() -> bool:
    """Compile to a temp file then os.replace into place: the rename is
    atomic, so concurrent builders (the threading lock is per-process
    only) and readers always see either the old or the new complete
    library — never a torn/truncated one — and a g++ killed mid-link
    cannot leave a newer-mtime partial .so that suppresses rebuilds."""
    import tempfile
    try:
        fd, tmp = tempfile.mkstemp(suffix='.so', dir=_CSRC)
        os.close(fd)
    except OSError:
        return False
    try:
        subprocess.run(
            ['g++', '-O3', '-shared', '-fPIC', _SRC_PATH, '-o', tmp],
            check=True, capture_output=True, timeout=120)
        os.replace(tmp, _LIB_PATH)
        return True
    except Exception:
        try:
            os.remove(tmp)
        except OSError:
            pass
        return False


def _load():
    global _lib, _lib_failed
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        if not os.path.exists(_SRC_PATH):
            _lib_failed = True
            return None
        try:
            stale = (not os.path.exists(_LIB_PATH) or
                     os.path.getmtime(_LIB_PATH) < os.path.getmtime(
                         _SRC_PATH))
        except OSError:  # racing rebuild/cleanup between exists and stat
            stale = True
        if stale and not _build():
            _lib_failed = True
            return None
        # two attempts: a stale/foreign .so (missing symbols, truncated)
        # triggers one rebuild before giving up, instead of failing forever
        for attempt in (0, 1):
            try:
                lib = ctypes.CDLL(_LIB_PATH)
                lib.csv_read_alloc.restype = ctypes.POINTER(ctypes.c_float)
                lib.csv_read_alloc.argtypes = [
                    ctypes.c_char_p, ctypes.POINTER(ctypes.c_long),
                    ctypes.POINTER(ctypes.c_long)]
                lib.csv_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
                lib.csv_free.restype = None
                _lib = lib
                break
            except (OSError, AttributeError):
                if attempt == 0 and _build():
                    continue
                _lib_failed = True
                break
        return _lib


def available() -> bool:
    return _load() is not None


def read_csv_matrix(path: str) -> Optional[np.ndarray]:
    """(rows, cols) float32 matrix via the native parser, or None when the
    native tier is unavailable / the file is malformed (caller falls back
    to the Python parser)."""
    lib = _load()
    if lib is None:
        return None
    rows = ctypes.c_long()
    cols = ctypes.c_long()
    ptr = lib.csv_read_alloc(path.encode(), ctypes.byref(rows),
                             ctypes.byref(cols))
    if not ptr:
        return None
    try:
        n = rows.value * cols.value
        arr = np.ctypeslib.as_array(ptr, shape=(n,)).copy()
        return arr.reshape(rows.value, cols.value)
    finally:
        lib.csv_free(ptr)
