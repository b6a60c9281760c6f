"""WAV decoder robustness + format coverage (native C++ parser and numpy
fallback must agree, and malformed files must hit the per-file skip
contract — load_audio returns None, never crashes).

Capability parity target: the reference loads corpora with torchaudio and
skips files that fail to decode (WavLM_embeddings.py:618-620); real corpora
contain streaming-recorder WAVs with unpatched 0xFFFFFFFF chunk sizes,
truncated tails, and exotic fmt variants.
"""

import struct

import numpy as np
import pytest

from stutter_tpu.audio.build import get_lib
from stutter_tpu.audio.wavio import _read_wav_numpy, decode_batch, load_audio, read_wav


def _encode(x: np.ndarray, fmt_tag: int, bits: int) -> bytes:
    """Interleave [frames, channels] float64 in [-1,1] as raw sample bytes."""
    flat = x.reshape(-1)
    if fmt_tag == 3:
        return flat.astype(np.float32 if bits == 32 else np.float64).tobytes()
    if bits == 8:
        return np.clip(np.round(flat * 128) + 128, 0, 255).astype(np.uint8).tobytes()
    if bits == 16:
        return np.clip(np.round(flat * 32768), -32768, 32767).astype("<i2").tobytes()
    if bits == 24:
        q = np.clip(np.round(flat * 8388608), -8388608, 8388607).astype(np.int64)
        b = np.empty((len(q), 3), np.uint8)
        b[:, 0] = q & 0xFF
        b[:, 1] = (q >> 8) & 0xFF
        b[:, 2] = (q >> 16) & 0xFF
        return b.tobytes()
    if bits == 32:
        q = np.clip(np.round(flat * 2147483648.0), -2147483648, 2147483647)
        return q.astype("<i4").tobytes()
    raise AssertionError(bits)


def _build_wav(
    payload: bytes,
    fmt_tag: int = 1,
    channels: int = 1,
    rate: int = 16000,
    bits: int = 16,
    extensible_subformat: int | None = None,
    data_size_override: int | None = None,
    pre_chunks: bytes = b"",
) -> bytes:
    block = channels * max(bits // 8, 1)
    fmt_body = struct.pack(
        "<HHIIHH",
        0xFFFE if extensible_subformat is not None else fmt_tag,
        channels, rate, rate * block, block, bits,
    )
    if extensible_subformat is not None:
        # cbSize=22: valid bits (2) + channel mask (4) + SubFormat GUID (16)
        fmt_body += struct.pack("<HHI", 22, bits, 0x3)
        fmt_body += struct.pack("<H", extensible_subformat) + b"\x00" * 14
    chunks = pre_chunks
    chunks += b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
    if len(fmt_body) & 1:
        chunks += b"\x00"
    size = len(payload) if data_size_override is None else data_size_override
    chunks += b"data" + struct.pack("<I", size & 0xFFFFFFFF) + payload
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def _write(tmp_path, blob: bytes) -> str:
    p = tmp_path / "t.wav"
    p.write_bytes(blob)
    return str(p)


def _native_numpy_parity(path: str, expected: np.ndarray, atol: float):
    y_np, sr = _read_wav_numpy(path)
    np.testing.assert_allclose(y_np, expected, atol=atol)
    if get_lib() is not None:
        y_nat, sr_nat = read_wav(path)
        assert sr_nat == sr
        np.testing.assert_allclose(y_nat, y_np, atol=1e-7)


# ---------------------------------------------------------------------------
# Format coverage: every branch of the parsers, native == numpy == expected
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "fmt_tag,bits,channels,scale",
    [
        (1, 8, 1, 128.0),
        (1, 16, 2, 32768.0),
        (1, 24, 2, 8388608.0),
        (1, 32, 1, 2147483648.0),
        (3, 32, 2, None),
        (3, 64, 1, None),
    ],
)
def test_format_decode_parity(tmp_path, rng, fmt_tag, bits, channels, scale):
    x = np.clip(rng.randn(200, channels) * 0.3, -0.99, 0.99)
    path = _write(tmp_path, _build_wav(
        _encode(x, fmt_tag, bits), fmt_tag=fmt_tag, channels=channels, bits=bits))
    # expected mono mixdown from the quantized integers, not the raw floats
    if scale is None:
        expected = x.astype(np.float32 if bits == 32 else np.float64)
    else:
        if bits == 8:
            expected = (np.clip(np.round(x * 128) + 128, 0, 255) - 128) / 128.0
        else:
            lim = int(scale)
            expected = np.clip(np.round(x * scale), -lim, lim - 1) / scale
    _native_numpy_parity(path, expected.mean(axis=1).astype(np.float32), atol=2e-7)


def test_extensible_header_pcm16(tmp_path, rng):
    x = np.clip(rng.randn(128, 2) * 0.3, -0.99, 0.99)
    path = _write(tmp_path, _build_wav(
        _encode(x, 1, 16), channels=2, bits=16, extensible_subformat=1))
    q = np.clip(np.round(x * 32768), -32768, 32767) / 32768.0
    _native_numpy_parity(path, q.mean(axis=1).astype(np.float32), atol=2e-7)


def test_junk_chunk_with_odd_size_is_skipped(tmp_path, rng):
    x = np.clip(rng.randn(64, 1) * 0.3, -0.99, 0.99)
    junk = b"JUNK" + struct.pack("<I", 7) + b"abcdefg" + b"\x00"  # odd size + pad
    path = _write(tmp_path, _build_wav(_encode(x, 1, 16), pre_chunks=junk))
    q = np.clip(np.round(x * 32768), -32768, 32767) / 32768.0
    _native_numpy_parity(path, q.mean(axis=1).astype(np.float32), atol=2e-7)


# ---------------------------------------------------------------------------
# Malformed files: per-file skip contract (None), never a crash
# ---------------------------------------------------------------------------


def test_garbage_returns_none(tmp_path):
    p = tmp_path / "g.wav"
    p.write_bytes(b"\x13\x37" * 500)
    assert load_audio(str(p)) is None


def test_truncated_header_returns_none(tmp_path):
    p = tmp_path / "h.wav"
    p.write_bytes(b"RIFF\x10\x00\x00\x00WA")
    assert load_audio(str(p)) is None


def test_zero_channels_returns_none(tmp_path):
    path = _write(tmp_path, _build_wav(b"\x00" * 64, channels=0))
    assert load_audio(path) is None


def test_unsupported_fmt_tag_returns_none(tmp_path):
    path = _write(tmp_path, _build_wav(b"\x00" * 64, fmt_tag=0x55))  # mp3-in-wav
    assert load_audio(path) is None


def test_empty_data_chunk_returns_none(tmp_path):
    path = _write(tmp_path, _build_wav(b""))
    assert load_audio(path) is None


def test_unpatched_streaming_data_size_decodes_available(tmp_path, rng):
    """data chunk claims 0xFFFFFFF0 bytes (unpatched streaming recorder);
    both parsers must decode the frames actually present, not allocate 4 GB."""
    x = np.clip(rng.randn(300, 1) * 0.3, -0.99, 0.99)
    path = _write(tmp_path, _build_wav(
        _encode(x, 1, 16), data_size_override=0xFFFFFFF0))
    y = load_audio(path)
    assert y is not None and len(y) == 300
    q = (np.clip(np.round(x * 32768), -32768, 32767) / 32768.0)[:, 0]
    np.testing.assert_allclose(y, q.astype(np.float32), atol=2e-7)
    if get_lib() is not None:
        y_nat, _ = read_wav(path)
        np.testing.assert_allclose(y_nat, _read_wav_numpy(path)[0], atol=1e-7)


def test_truncated_mid_frame_keeps_whole_frames(tmp_path, rng):
    x = np.clip(rng.randn(100, 2) * 0.3, -0.99, 0.99)
    payload = _encode(x, 1, 16)[:-3]  # cut mid-frame (and mid-sample)
    path = _write(tmp_path, _build_wav(payload, channels=2, bits=16))
    y = load_audio(path)
    assert y is not None and len(y) == 99  # last partial frame dropped
    if get_lib() is not None:
        y_nat, _ = read_wav(path)
        np.testing.assert_allclose(y_nat, _read_wav_numpy(path)[0], atol=1e-7)


def test_decode_batch_isolates_corrupt_file(tmp_path, rng):
    from stutter_tpu.audio.wavio import write_wav

    good1 = str(tmp_path / "g1.wav")
    write_wav(good1, (rng.randn(4000) * 0.2).astype(np.float32), 16000)
    bad = str(tmp_path / "bad.wav")
    with open(bad, "wb") as f:
        f.write(b"RIFFxxxxWAVEfmt corrupt")
    good2 = str(tmp_path / "g2.wav")
    write_wav(good2, (rng.randn(2000) * 0.2).astype(np.float32), 16000)

    waves, lengths, ok = decode_batch([good1, bad, good2], max_samples=8000)
    assert list(ok) == [True, False, True]
    assert list(lengths) == [4000, 0, 2000]
    assert np.all(waves[1] == 0)


def test_wav_info_sub_byte_bits_raises_value_error(tmp_path):
    """4-bit (e.g. IMA-ADPCM) headers must raise ValueError — not
    ZeroDivisionError — so audio_info can fall through to the libav probe,
    which CAN size such files (wavio.py wav_info fmt guard)."""
    from stutter_tpu.audio.wavio import wav_info

    path = _write(tmp_path, _build_wav(b"\x00" * 64, fmt_tag=0x11, bits=4))
    with pytest.raises(ValueError):
        wav_info(path)
    path2 = _write(tmp_path, _build_wav(b"\x00" * 64, channels=0))
    with pytest.raises(ValueError):
        wav_info(path2)
