"""Native (C++) runtime components with ctypes bindings.

Components (built on demand into ``libpinc_native.so`` by :func:`build`):

* ``iniparser.cpp`` — the configuration parser (reference row 14,
  lib/iniparser); used by config.PincConfig when available.
* ``spool.cpp`` — background-thread snapshot spooler that takes per-step
  field/particle buffers off the hot loop (reference writes HDF5
  synchronously inside the time loop, src/main.c:269-273).

Everything degrades gracefully to the pure-Python implementations when a
compiler is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
from pathlib import Path
from typing import Optional

_DIR = Path(__file__).resolve().parent
_LIB_PATH = _DIR / "libpinc_native.so"
_SOURCES = ["iniparser.cpp", "spool.cpp"]

_lib: Optional[ctypes.CDLL] = None
_tried = False


def build(force: bool = False) -> Optional[Path]:
    """Compile the shared library if stale.  Returns the path or None."""
    srcs = [_DIR / s for s in _SOURCES]
    if not force and _LIB_PATH.exists():
        newest = max(p.stat().st_mtime for p in srcs)
        if _LIB_PATH.stat().st_mtime >= newest:
            return _LIB_PATH
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", "-pthread",
           "-o", str(_LIB_PATH)] + [str(p) for p in srcs]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        print(f"pinc_tpu.native: build failed ({e}); using Python fallbacks",
              file=sys.stderr)
        return None
    return _LIB_PATH


def lib() -> Optional[ctypes.CDLL]:
    """The loaded library, building it on first use; None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    path = build()
    if path is None:
        return None
    L = ctypes.CDLL(str(path))
    # ini parser
    L.pinc_ini_new.restype = ctypes.c_void_p
    L.pinc_ini_load.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    L.pinc_ini_get.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    L.pinc_ini_get.restype = ctypes.c_char_p
    L.pinc_ini_set.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                               ctypes.c_char_p]
    L.pinc_ini_nkeys.argtypes = [ctypes.c_void_p]
    L.pinc_ini_nkeys.restype = ctypes.c_long
    L.pinc_ini_key_at.argtypes = [ctypes.c_void_p, ctypes.c_long]
    L.pinc_ini_key_at.restype = ctypes.c_char_p
    L.pinc_ini_free.argtypes = [ctypes.c_void_p]
    # spooler
    L.pinc_spool_open.argtypes = [ctypes.c_char_p]
    L.pinc_spool_open.restype = ctypes.c_void_p
    L.pinc_spool_write.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_double, ctypes.c_uint32,
        ctypes.c_uint32, ctypes.POINTER(ctypes.c_uint64), ctypes.c_void_p,
        ctypes.c_uint64]
    L.pinc_spool_pending.argtypes = [ctypes.c_void_p]
    L.pinc_spool_pending.restype = ctypes.c_uint64
    L.pinc_spool_close.argtypes = [ctypes.c_void_p]
    L.pinc_spool_close.restype = ctypes.c_uint64
    _lib = L
    return _lib


def parse_ini_native(path: str) -> Optional[dict]:
    """Parse an ini file with the C++ parser; None if unavailable."""
    L = lib()
    if L is None:
        return None
    h = L.pinc_ini_new()
    try:
        if L.pinc_ini_load(h, str(path).encode()) != 0:
            raise FileNotFoundError(path)
        out = {}
        for i in range(L.pinc_ini_nkeys(h)):
            k = L.pinc_ini_key_at(h, i).decode()
            out[k] = (L.pinc_ini_get(h, k.encode()) or b"").decode()
        return out
    finally:
        L.pinc_ini_free(h)
