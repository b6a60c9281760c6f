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
_FF_CSRC = os.path.join(os.path.dirname(__file__), "csrc", "ffdecode.cpp")
_FF_SO = os.path.join(os.path.dirname(__file__), "csrc", "libffdecode.so")
# RLock: get_lib() registers the ffdecode fallback by calling get_ff_lib()
# while already holding the lock
_lock = threading.RLock()
_lib: ctypes.CDLL | None = None
_tried = False
_ff_lib: ctypes.CDLL | None = None
_ff_tried = False


def _compile_so(csrc: str, so: str, extra: list[str], what: str) -> bool:
    # build to a temp path + atomic rename: concurrent processes must never
    # dlopen a half-written .so
    tmp = f"{so}.tmp.{os.getpid()}"
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
           csrc, "-o", tmp, *extra]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, so)
        return True
    except (subprocess.SubprocessError, FileNotFoundError, OSError) as e:
        logger.warning("native %s build failed (%s); using fallback", what, e)
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return False


def _compile() -> bool:
    return _compile_so(_CSRC, _SO, [], "wavio")


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
        lib.wavio_set_fallback_decoder.restype = None
        lib.wavio_set_fallback_decoder.argtypes = [ctypes.c_void_p]
        _lib = lib
        # make every wavio entry point (incl. the batch thread pool) decode
        # compressed formats too, when libav is present
        ff = get_ff_lib()
        if ff is not None:
            _lib.wavio_set_fallback_decoder(
                ctypes.cast(ff.ffdecode_decode, ctypes.c_void_p))
        return _lib


def get_ff_lib() -> ctypes.CDLL | None:
    """Load (building if needed) the libav-backed codec library, or None.

    None means no libav dev headers / libraries on this host — the loader
    then handles WAV only, exactly like a torchaudio install without its
    ffmpeg extension (reference dependency surface, SURVEY.md §2 E1).
    """
    global _ff_lib, _ff_tried
    with _lock:
        if _ff_lib is not None or _ff_tried:
            return _ff_lib
        _ff_tried = True
        # Header probe across common layouts: Debian/Ubuntu multiarch (any
        # architecture, not just x86_64), plain /usr/include, /usr/local.
        import glob as _glob

        hits = [
            h for pat in (
                "/usr/include/*/libavformat/avformat.h",
                "/usr/include/libavformat/avformat.h",
                "/usr/local/include/libavformat/avformat.h",
            ) for h in _glob.glob(pat)
        ]
        if not hits:
            logger.info("libav headers not found; compressed-audio decode disabled")
            return None
        # non-default include roots (e.g. Fedora's /usr/include/ffmpeg/) need
        # an explicit -I at the libavformat parent, or the probe passes but
        # the build fails; gcc ignores redundant -I for default roots
        inc_flags = sorted({
            f"-I{os.path.dirname(os.path.dirname(h))}" for h in hits
        })
        if not os.path.exists(_FF_SO) or os.path.getmtime(_FF_SO) < os.path.getmtime(_FF_CSRC):
            if not _compile_so(_FF_CSRC, _FF_SO,
                               [*inc_flags, "-lavformat", "-lavcodec", "-lavutil"],
                               "ffdecode"):
                return None
        try:
            lib = ctypes.CDLL(_FF_SO)
        except OSError as e:
            logger.warning("could not load %s: %s", _FF_SO, e)
            return None
        lib.ffdecode_decode.restype = ctypes.c_int
        lib.ffdecode_decode.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.ffdecode_free.restype = None
        lib.ffdecode_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
        lib.ffdecode_probe.restype = ctypes.c_int
        lib.ffdecode_probe.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.ffdecode_encode.restype = ctypes.c_int
        lib.ffdecode_encode.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.c_int32,
            ctypes.c_int32,
        ]
        _ff_lib = lib
        return _ff_lib
