"""Compressed-format decode (FLAC/MP3/OGG) through the libav extension.

Capability parity: the reference loads clips with torchaudio.load
(``WavLM_embeddings.py:101``), whose backend is ffmpeg — any format a
reference user's corpus contains must decode here too. Fixtures are encoded
in-process by the same extension (no ffmpeg CLI in this environment), so
decode is exercised against real encoder output rather than hand-rolled
bitstreams; FLAC being lossless pins the decode math sample-exactly.
"""

from __future__ import annotations

import numpy as np
import pytest

from stutter_tpu.audio.build import get_ff_lib, get_lib
from stutter_tpu.audio.wavio import (
    audio_info,
    decode_batch,
    encode_audio,
    load_audio,
    read_wav,
    write_wav,
)

pytestmark = pytest.mark.skipif(
    get_ff_lib() is None, reason="libav extension unavailable on this host"
)

SR = 22050


def _chirp(n: int, sr: int = SR, seed: int = 0) -> np.ndarray:
    """Non-periodic test signal: chirp + noise, so alignment is unambiguous."""
    t = np.arange(n) / sr
    rs = np.random.RandomState(seed)
    x = 0.4 * np.sin(2 * np.pi * (200 + 1500 * t) * t) + 0.05 * rs.randn(n)
    return np.clip(x, -0.99, 0.99).astype(np.float32)


def _aligned_corr(ref: np.ndarray, got: np.ndarray, max_lag: int = 8192) -> float:
    """Pearson correlation at the best cross-correlation lag (lossy codecs
    may leave a few samples of leading delay)."""
    probe = ref[: min(len(ref), 4096)]
    window = got[: min(len(got), len(probe) + max_lag)]
    lag = int(np.argmax(np.correlate(window, probe, mode="valid")))
    m = min(len(ref), len(got) - lag)
    a, b = ref[:m], got[lag : lag + m]
    return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))


def test_flac_roundtrip_sample_exact(tmp_path):
    x = _chirp(SR)
    p = str(tmp_path / "clip.flac")
    encode_audio(p, x, SR)
    y, sr = read_wav(p)
    assert sr == SR and len(y) == len(x)
    # FLAC is lossless; the encoder quantizes to int16 (lrintf(x*32767)),
    # decode divides by 32768 — the round trip is exactly that lattice
    expect = np.rint(x * 32767.0).astype(np.int16).astype(np.float32) / 32768.0
    np.testing.assert_allclose(y, expect, atol=1e-7)


def test_flac_stereo_mean_mixdown(tmp_path):
    x = _chirp(SR)
    stereo = np.stack([x, 0.5 * x], axis=1)
    p = str(tmp_path / "st.flac")
    encode_audio(p, stereo, SR)
    y, _ = read_wav(p)
    q = lambda v: np.rint(v * 32767.0).astype(np.int16).astype(np.float32) / 32768.0  # noqa: E731
    np.testing.assert_allclose(y, (q(x) + q(0.5 * x)) / 2.0, atol=1e-7)


@pytest.mark.parametrize("ext", ["mp3", "ogg"])
def test_lossy_roundtrip_correlation(tmp_path, ext):
    x = _chirp(2 * SR)
    p = str(tmp_path / f"clip.{ext}")
    encode_audio(p, x, SR)
    y, sr = read_wav(p)
    assert sr == SR
    # codec delay/padding is bounded; length must be within a frame or two
    assert abs(len(y) - len(x)) < 4096
    assert _aligned_corr(x, y) > 0.95


def test_audio_info_probe_no_decode(tmp_path):
    x = _chirp(3 * SR)
    p = str(tmp_path / "probe.flac")
    encode_audio(p, x, SR)
    n, sr = audio_info(p)
    assert sr == SR
    assert n == len(x)  # FLAC STREAMINFO is exact


def test_load_audio_flac_resample_trim(tmp_path):
    x = _chirp(SR)  # 1 s at 22050
    p = str(tmp_path / "clip.flac")
    encode_audio(p, x, SR)
    y = load_audio(p, target_sr=16000, max_length=0.5)
    assert y is not None and y.dtype == np.float32
    assert len(y) == 8000
    # the same clip decoded as wav must resample identically (shared kernel)
    q = np.rint(x * 32767.0).astype(np.int16).astype(np.float32) / 32768.0
    wp = str(tmp_path / "clip.wav")
    write_wav(wp, q, SR)
    yw = load_audio(wp, target_sr=16000, max_length=0.5)
    np.testing.assert_allclose(y, yw, atol=2e-4)


def test_decode_batch_mixed_formats(tmp_path):
    """The threaded native batch decoder handles wav + flac + a bad file."""
    x = _chirp(SR)
    q = np.rint(x * 32767.0).astype(np.int16).astype(np.float32) / 32768.0
    wav_p = str(tmp_path / "a.wav")
    flac_p = str(tmp_path / "b.flac")
    bad_p = str(tmp_path / "missing.flac")
    write_wav(wav_p, q, SR)
    encode_audio(flac_p, x, SR)
    waves, lengths, ok = decode_batch([wav_p, flac_p, bad_p], target_sr=16000,
                                      max_samples=16000)
    assert list(ok) == [True, True, False]
    assert lengths[0] == lengths[1] > 0
    np.testing.assert_allclose(waves[0], waves[1], atol=2e-4)


def test_native_batch_uses_fallback_decoder(tmp_path):
    """When libwavio is built, compressed paths run inside its thread pool."""
    if get_lib() is None:
        pytest.skip("native wavio unavailable")
    x = _chirp(SR // 2)
    paths = []
    for i in range(6):
        p = str(tmp_path / f"c{i}.flac")
        encode_audio(p, x, SR)
        paths.append(p)
    waves, lengths, ok = decode_batch(paths, target_sr=SR, max_samples=SR,
                                      n_threads=4)
    assert ok.all()
    expect = np.rint(x * 32767.0).astype(np.int16).astype(np.float32) / 32768.0
    for i in range(6):
        np.testing.assert_allclose(waves[i, : lengths[i]], expect, atol=1e-7)


def test_scanner_picks_up_compressed(tmp_path):
    from stutter_tpu.extract.scanner import create_metadata_from_files

    wav_dir = tmp_path / "wav"
    lab_dir = tmp_path / "lab"
    wav_dir.mkdir()
    lab_dir.mkdir()
    x = _chirp(SR // 4)
    write_wav(str(wav_dir / "train_0001.wav"), x, SR)
    encode_audio(str(wav_dir / "train_0002.flac"), x, SR)
    encode_audio(str(wav_dir / "test_0001.mp3"), x, SR)
    # label ids without extension must join both wav and flac clips
    (lab_dir / "train.csv").write_text(
        "id,label\ntrain_0001,block\ntrain_0002.wav,repetition\n")
    meta = create_metadata_from_files(str(tmp_path), split="all")
    assert sorted(meta["filename"]) == ["test_0001", "train_0001", "train_0002"]
    by_name = meta.set_index("filename")
    assert by_name.loc["train_0001", "label"] == "block"
    assert by_name.loc["train_0002", "label"] == "repetition"
    assert by_name.loc["test_0001", "split"] == "test"


def test_corrupt_compressed_returns_none(tmp_path):
    """Garbage behind a FLAC magic must fail cleanly through the fallback
    decoder (per-file skip contract), never crash the process."""
    from stutter_tpu.audio.wavio import load_audio

    p = str(tmp_path / "junk.flac")
    with open(p, "wb") as f:
        f.write(b"fLaC" + bytes(range(256)) * 8)
    assert load_audio(p) is None

    # and a bare-garbage non-RIFF file with a compressed extension
    p2 = str(tmp_path / "junk2.mp3")
    with open(p2, "wb") as f:
        f.write(b"\x13\x37" * 400)
    assert load_audio(p2) is None
