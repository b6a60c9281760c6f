"""Audio runtime tests: WAV decode (native + numpy parity), probe, batch."""

import numpy as np
import pytest

from stutter_tpu.audio.wavio import (
    _read_wav_numpy,
    decode_batch,
    load_audio,
    read_wav,
    wav_info,
    write_wav,
)


@pytest.fixture
def wav_file(tmp_path, rng):
    x = (rng.randn(12345) * 0.2).astype(np.float32)
    path = str(tmp_path / "a.wav")
    write_wav(path, x, 16000)
    return path, x


def test_roundtrip_16bit(wav_file):
    path, x = wav_file
    y, sr = read_wav(path)
    assert sr == 16000
    assert y.shape == x.shape
    # int16 quantization + write(32767)/read(32768) scale convention
    np.testing.assert_allclose(y, np.clip(x, -1, 1), atol=1e-4)


def test_native_matches_numpy(wav_file):
    from stutter_tpu.audio.build import get_lib

    path, _ = wav_file
    y_np, sr_np = _read_wav_numpy(path)
    if get_lib() is None:
        pytest.skip("no native lib")
    y_nat, sr_nat = read_wav(path)
    assert sr_nat == sr_np
    np.testing.assert_allclose(y_nat, y_np, atol=1e-7)


def test_wav_info(wav_file):
    path, x = wav_file
    n, sr = wav_info(path)
    assert (n, sr) == (len(x), 16000)


def test_load_audio_resamples(tmp_path, rng):
    x = (rng.randn(8000) * 0.2).astype(np.float32)
    path = str(tmp_path / "b.wav")
    write_wav(path, x, 8000)
    y = load_audio(path, target_sr=16000)
    assert y is not None and len(y) == 16000


def test_load_audio_max_length(wav_file):
    path, _ = wav_file
    y = load_audio(path, target_sr=16000, max_length=0.5)
    assert len(y) == 8000


def test_load_audio_missing_returns_none():
    assert load_audio("/nonexistent/file.wav") is None


def test_decode_batch(tmp_path, rng):
    paths = []
    for i, n in enumerate([4000, 8000, 16000]):
        p = str(tmp_path / f"c{i}.wav")
        write_wav(p, (rng.randn(n) * 0.2).astype(np.float32), 16000)
        paths.append(p)
    paths.append(str(tmp_path / "missing.wav"))
    waves, lengths, ok = decode_batch(paths, target_sr=16000, max_samples=8000)
    assert waves.shape == (4, 8000)
    assert list(lengths) == [4000, 8000, 8000, 0]  # third trimmed, fourth failed
    assert list(ok) == [True, True, True, False]
    assert np.all(waves[0, 4000:] == 0)


def test_native_resample_matches_jax(rng):
    from stutter_tpu.audio.build import get_lib
    from stutter_tpu.audio.wavio import _resample_host
    from stutter_tpu.ops.resample import resample

    if get_lib() is None:
        pytest.skip("no native lib")
    x = (rng.randn(5000) * 0.3).astype(np.float32)
    for sr_in, sr_out in [(8000, 16000), (44100, 16000), (16000, 8000)]:
        nat = _resample_host(x, sr_in, sr_out)
        dev = np.asarray(resample(x, sr_in, sr_out))
        assert nat.shape == dev.shape
        np.testing.assert_allclose(nat, dev, atol=1e-4)
