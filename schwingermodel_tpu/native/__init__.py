"""Native (C++) runtime components, loaded via ctypes.

The shared library is compiled on demand with the baked-in g++ (no
pybind11/pip needed) and cached next to the sources. Every native entry
point has a pure-NumPy fallback in the calling module, so the framework
works even where no compiler exists.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "ctxt_codec.cpp")
_LIB = os.path.join(_HERE, "libctxt_codec.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def load_codec():
    """Return the ctypes library with ctxt_* symbols, or None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_LIB)
        ):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        dptr = ctypes.POINTER(ctypes.c_double)
        for name in ("ctxt_write_binary", "ctxt_read_binary",
                     "ctxt_write_text", "ctxt_read_text"):
            fn = getattr(lib, name)
            fn.argtypes = [ctypes.c_char_p, dptr, ctypes.c_int, ctypes.c_int]
            fn.restype = ctypes.c_int
        _lib = lib
        return _lib
