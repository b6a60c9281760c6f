"""WAV decode / write with native (C++) fast path and numpy fallback.

Capability parity: ``load_audio`` mirrors the reference's loader semantics
(``WavLM_embeddings.py:87-125``): decode -> mono mixdown -> resample to the
target rate -> optional trim to ``max_length`` seconds -> float32; returns
None on failure (the reference's per-file skip-on-error contract,
``WavLM_embeddings.py:618-620``).

The native path (audio/csrc/wavio.cpp, built on demand) adds the threaded
batch decoder used by the extraction pipeline to overlap host IO with device
compute.
"""

from __future__ import annotations

import ctypes
import os
import struct

import numpy as np

from stutter_tpu.audio.build import get_ff_lib, get_lib
from stutter_tpu.utils.logging import get_logger

logger = get_logger("audio")


# ---------------------------------------------------------------------------
# Pure-numpy RIFF/WAVE parser (fallback + reference for the C++ parser tests)
# ---------------------------------------------------------------------------


def _read_wav_numpy(path: str) -> tuple[np.ndarray, int]:
    with open(path, "rb") as f:
        blob = f.read()
    if len(blob) < 12 or blob[0:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError(f"not a RIFF/WAVE file: {path}")
    pos = 12
    fmt_tag = channels = bits = rate = None
    data = None
    while pos + 8 <= len(blob):
        cid = blob[pos : pos + 4]
        (size,) = struct.unpack("<I", blob[pos + 4 : pos + 8])
        body = blob[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt_tag, channels, rate = struct.unpack("<HHI", body[0:8])
            (bits,) = struct.unpack("<H", body[14:16])
            if fmt_tag == 0xFFFE and size >= 40:  # extensible
                (fmt_tag,) = struct.unpack("<H", body[24:26])
        elif cid == b"data":
            data = body
            break
        pos += 8 + size + (size & 1)
    if fmt_tag is None or data is None or len(data) == 0 or channels == 0:
        # empty-data / zero-channel files are failures in the native parser
        # too (rc=4) — keep the fallback's contract identical
        raise ValueError(f"missing/empty fmt/data chunk: {path}")

    if fmt_tag == 1:
        if bits == 8:
            x = (data_arr(data, np.uint8).astype(np.float32) - 128.0) / 128.0
        elif bits == 16:
            x = data_arr(data, np.int16).astype(np.float32) / 32768.0
        elif bits == 24:
            raw = np.frombuffer(data, np.uint8)
            raw = raw[: len(raw) // 3 * 3].reshape(-1, 3)
            x = (
                raw[:, 0].astype(np.int32)
                | (raw[:, 1].astype(np.int32) << 8)
                | (raw[:, 2].astype(np.int32) << 16)
            )
            x = np.where(x & 0x800000, x - (1 << 24), x).astype(np.float32) / 8388608.0
        elif bits == 32:
            x = data_arr(data, np.int32).astype(np.float32) / 2147483648.0
        else:
            raise ValueError(f"unsupported PCM bits={bits}")
    elif fmt_tag == 3:
        if bits == 32:
            x = data_arr(data, np.float32).astype(np.float32)
        elif bits == 64:
            x = data_arr(data, np.float64).astype(np.float32)
        else:
            raise ValueError(f"unsupported IEEE-float bits={bits}")
    else:
        raise ValueError(f"unsupported wav format tag {fmt_tag}")

    x = x[: len(x) // channels * channels].reshape(-1, channels)
    return x.mean(axis=1).astype(np.float32), rate


def data_arr(data: bytes, dtype) -> np.ndarray:
    n = len(data) // np.dtype(dtype).itemsize
    return np.frombuffer(data[: n * np.dtype(dtype).itemsize], dtype)


def wav_info(path: str) -> tuple[int, int]:
    """Header-only probe: (n_mono_samples, sample_rate). Cheap (no decode)."""
    with open(path, "rb") as f:
        head = f.read(12)
        if len(head) < 12 or head[0:4] != b"RIFF" or head[8:12] != b"WAVE":
            raise ValueError(f"not a RIFF/WAVE file: {path}")
        channels = bits = rate = None
        data_size = None
        while True:
            hdr = f.read(8)
            if len(hdr) < 8:
                break
            cid = hdr[0:4]
            (size,) = struct.unpack("<I", hdr[4:8])
            if cid == b"fmt ":
                body = f.read(size)
                _, channels, rate = struct.unpack("<HHI", body[0:8])
                (bits,) = struct.unpack("<H", body[14:16])
            elif cid == b"data":
                data_size = size
                break
            else:
                f.seek(size + (size & 1), 1)
        if channels is None or data_size is None or bits in (None, 0):
            raise ValueError(f"missing fmt/data chunk: {path}")
        if channels == 0 or bits < 8:
            # e.g. 4-bit ADPCM: sample count isn't derivable from the header
            # walk — raise ValueError so audio_info falls through to the
            # libav probe (which CAN size such files), not ZeroDivisionError.
            raise ValueError(f"unsupported fmt (channels={channels}, "
                             f"bits={bits}): {path}")
        return data_size // (channels * (bits // 8)), rate


def audio_info(path: str) -> tuple[int, int]:
    """Format-agnostic cheap probe: (n_mono_samples, sample_rate).

    WAV via the RIFF header walk; compressed formats via libav stream info
    (exact for FLAC STREAMINFO / MP3 Xing headers — no decode).
    """
    try:
        return wav_info(path)
    except ValueError:
        ff = get_ff_lib()
        if ff is None:
            raise
        n = ctypes.c_int64()
        sr = ctypes.c_int32()
        rc = ff.ffdecode_probe(path.encode(), ctypes.byref(n), ctypes.byref(sr))
        if rc != 0:
            raise ValueError(f"cannot probe audio file (rc={rc}): {path}")
        return n.value, sr.value


def read_wav(path: str) -> tuple[np.ndarray, int]:
    """Decode an audio file to (mono float32 samples, sample_rate).

    WAV decodes through the dependency-free native/numpy RIFF parser;
    compressed formats (FLAC/MP3/OGG/M4A/...) decode through the libav-backed
    extension when available — the same codec surface as the reference's
    ``torchaudio.load`` (``WavLM_embeddings.py:101``).
    """
    lib = get_lib()
    if lib is not None:
        out = ctypes.POINTER(ctypes.c_float)()
        n = ctypes.c_int64()
        sr = ctypes.c_int32()
        rc = lib.wavio_decode(path.encode(), ctypes.byref(out), ctypes.byref(n), ctypes.byref(sr))
        if rc == 0:
            arr = np.ctypeslib.as_array(out, shape=(n.value,)).copy()
            lib.wavio_free(out)
            return arr, sr.value
        logger.debug("native decode rc=%d for %s; falling back to numpy", rc, path)
    try:
        return _read_wav_numpy(path)
    except ValueError:
        # not RIFF: compressed-format path for the no-compiled-wavio case
        # (when the native lib loaded, its registered fallback already ran)
        if lib is None:
            got = _ff_decode_py(path)
            if got is not None:
                return got
        raise


def _ff_decode_py(path: str) -> tuple[np.ndarray, int] | None:
    """Decode via libffdecode directly (used when libwavio isn't built)."""
    ff = get_ff_lib()
    if ff is None:
        return None
    out = ctypes.POINTER(ctypes.c_float)()
    n = ctypes.c_int64()
    sr = ctypes.c_int32()
    rc = ff.ffdecode_decode(path.encode(), ctypes.byref(out), ctypes.byref(n), ctypes.byref(sr))
    if rc != 0:
        logger.debug("ffdecode rc=%d for %s", rc, path)
        return None
    arr = np.ctypeslib.as_array(out, shape=(n.value,)).copy()
    ff.ffdecode_free(out)
    return arr, sr.value


def encode_audio(path: str, samples: np.ndarray, sample_rate: int) -> None:
    """Encode float32 PCM to a compressed file; codec chosen by extension.

    ``samples`` is [T] mono or [T, C] interleaved. Test/fixture helper (the
    pipelines only read); raises RuntimeError when libav is unavailable.
    """
    ff = get_ff_lib()
    if ff is None:
        raise RuntimeError("compressed-audio encode requires the libav extension")
    x = np.asarray(samples, np.float32)
    if x.ndim == 1:
        x = x[:, None]
    x = np.ascontiguousarray(x)
    rc = ff.ffdecode_encode(
        path.encode(), x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        x.shape[0], sample_rate, x.shape[1],
    )
    if rc != 0:
        raise RuntimeError(f"encode failed (rc={rc}) for {path}")


def write_wav(path: str, samples: np.ndarray, sample_rate: int) -> None:
    """Write mono float32 [-1,1] samples as 16-bit PCM WAV."""
    import wave

    x = np.clip(np.asarray(samples, np.float32), -1.0, 1.0)
    pcm = (x * 32767.0).astype(np.int16)
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(pcm.tobytes())


def _resample_host(x: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    """Host resample: native kernel if available, else the JAX op on CPU."""
    if sr_in == sr_out:
        return x
    lib = get_lib()
    if lib is not None:
        xin = np.ascontiguousarray(x, np.float32)
        out = ctypes.POINTER(ctypes.c_float)()
        n = ctypes.c_int64()
        rc = lib.wavio_resample(
            xin.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            len(xin), sr_in, sr_out, 6, 0.99, ctypes.byref(out), ctypes.byref(n),
        )
        if rc == 0:
            arr = np.ctypeslib.as_array(out, shape=(n.value,)).copy()
            lib.wavio_free(out)
            return arr
    from stutter_tpu.ops.resample import resample

    return np.asarray(resample(x, sr_in, sr_out))


def load_audio(
    path: str,
    target_sr: int = 16000,
    max_length: float | None = None,
) -> np.ndarray | None:
    """Reference-compatible loader: decode -> mono -> resample -> trim.

    Returns None on any failure (per-file skip contract).
    """
    try:
        x, sr = read_wav(path)
        x = _resample_host(x, sr, target_sr)
        if max_length is not None:
            x = x[: int(max_length * target_sr)]
        return x.astype(np.float32)
    except Exception as e:  # noqa: BLE001 — skip-on-error is the contract
        logger.error("error loading %s: %s", path, e)
        return None


def decode_batch(
    paths: list[str],
    target_sr: int = 16000,
    max_samples: int = 16000 * 30,
    n_threads: int | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Threaded decode+resample of many files into one padded buffer.

    Returns (waves [N, max_samples] float32 zero-padded, lengths [N] int64,
    ok [N] bool). Uses the C++ thread pool when available.
    """
    n = len(paths)
    if n_threads is None:
        n_threads = min(8, os.cpu_count() or 1)
    lib = get_lib()
    if lib is not None:
        out = np.zeros((n, max_samples), np.float32)
        lengths = np.zeros((n,), np.int64)
        status = np.zeros((n,), np.int32)
        c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
        lib.wavio_decode_batch(
            c_paths, n, target_sr, max_samples, n_threads,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            status.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        return out, lengths, status == 0

    waves = np.zeros((n, max_samples), np.float32)
    lengths = np.zeros((n,), np.int64)
    ok = np.zeros((n,), bool)
    for i, p in enumerate(paths):
        x = load_audio(p, target_sr=target_sr, max_length=max_samples / target_sr)
        if x is None:
            continue
        keep = min(len(x), max_samples)
        waves[i, :keep] = x[:keep]
        lengths[i] = keep
        ok[i] = True
    return waves, lengths, ok
