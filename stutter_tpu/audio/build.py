"""On-demand g++ build of the native audio runtime (ctypes, no pybind11)."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

from stutter_tpu.utils.logging import get_logger

logger = get_logger("audio.build")

_CSRC = os.path.join(os.path.dirname(__file__), "csrc", "wavio.cpp")
_SO = os.path.join(os.path.dirname(__file__), "csrc", "libwavio.so")
_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_tried = False


def _compile() -> bool:
    # build to a temp path + atomic rename: concurrent processes must never
    # dlopen a half-written .so
    tmp = f"{_SO}.tmp.{os.getpid()}"
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread", _CSRC, "-o", tmp]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, _SO)
        return True
    except (subprocess.SubprocessError, FileNotFoundError, OSError) as e:
        logger.warning("native wavio build failed (%s); using numpy fallback", e)
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return False


def get_lib() -> ctypes.CDLL | None:
    """Load (building if needed) the native library, or None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_CSRC):
            if not _compile():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError as e:
            logger.warning("could not load %s: %s", _SO, e)
            return None

        lib.wavio_decode.restype = ctypes.c_int
        lib.wavio_decode.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.wavio_free.restype = None
        lib.wavio_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
        lib.wavio_resample.restype = ctypes.c_int
        lib.wavio_resample.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_double,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.wavio_decode_batch.restype = None
        lib.wavio_decode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int64,
            ctypes.c_int32,
            ctypes.c_int64,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
        ]
        _lib = lib
        return _lib
