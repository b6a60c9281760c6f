"""Generate committed numeric goldens for the DSP kernels (VERDICT r1 #6).

torchaudio is not installed in this environment, so the resample goldens are
computed from an INDEPENDENT direct float64 evaluation of torchaudio's
documented windowed-sinc formula (sinc_interp_hann, lowpass_filter_width=6,
rolloff=0.99 — torchaudio ``functional.resample`` docs / reference usage
``WavLM_embeddings.py:101-110``):

    y[j] = sum_i x[i] * g((i - j*orig/new) * base/orig)
    g(t) = (base/orig) * sinc(pi*clip(t, +-W)) * cos^2(clip(t)*pi/(2W))
    base = min(orig, new) * rolloff,  W = lowpass_filter_width

evaluated per output sample with NO polyphase/conv machinery — so the stored
vectors independently pin the production kernel's gcd reduction, polyphase
layout, conv padding, stride, and trim.

The pitch goldens are float64 regression pins of the phase-vocoder pipeline
itself (an independent reimplementation would share every formula, so a pin
is what catches kernel-math regressions; reference behavior
``model_training_01.py:173-176``).

Run from the repo root:  python tests/golden_gen/gen_dsp_goldens.py [--check]
"""

from __future__ import annotations

import math
import os
import sys

import numpy as np

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "..", "goldens", "dsp_goldens.npz")

RESAMPLE_PAIRS = [
    (44100, 16000),  # CD-rate corpus decode (load_audio target_sr)
    (22050, 16000),
    (16000, 14400),  # speed-perturb 0.9x leg
    (14400, 16000),
    (16000, 17600),  # speed-perturb 1.1x leg
    (8000, 16000),   # upsample
]
PITCH_STEPS = [-2, 2]


def make_input(n: int = 4000, sr: int = 16000) -> np.ndarray:
    """Deterministic broadband test signal: two tones + seeded noise."""
    t = np.arange(n, dtype=np.float64) / sr
    x = 0.4 * np.sin(2 * np.pi * 440.0 * t) + 0.2 * np.sin(2 * np.pi * 1850.0 * t)
    x += 0.05 * np.random.RandomState(42).randn(n)
    return x.astype(np.float32)


def direct_sinc_resample(
    x: np.ndarray, orig_freq: int, new_freq: int,
    lowpass_filter_width: int = 6, rolloff: float = 0.99,
) -> np.ndarray:
    """Direct per-output-sample float64 evaluation (no polyphase, no conv)."""
    g = math.gcd(orig_freq, new_freq)
    orig, new = orig_freq // g, new_freq // g
    base = min(orig, new) * rolloff
    width = math.ceil(lowpass_filter_width * orig / base)
    x64 = np.asarray(x, np.float64)
    n_out = int(math.ceil(new * len(x) / orig))
    y = np.zeros(n_out, np.float64)
    for j in range(n_out):
        center = j * orig / new
        i0 = max(0, int(math.floor(center)) - width)
        i1 = min(len(x64), int(math.ceil(center)) + width + 1)
        i = np.arange(i0, i1, dtype=np.float64)
        t = np.clip((i - center) * base / orig, -lowpass_filter_width,
                    lowpass_filter_width)
        window = np.cos(t * np.pi / lowpass_filter_width / 2.0) ** 2
        tpi = t * np.pi
        sinc = np.where(tpi == 0.0, 1.0, np.sin(tpi) / np.where(tpi == 0.0, 1.0, tpi))
        y[j] = np.dot(x64[i0:i1], sinc * window * (base / orig))
    return y


def main(check: bool = False) -> int:
    arrays: dict[str, np.ndarray] = {"input": make_input()}
    x = arrays["input"]
    for orig, new in RESAMPLE_PAIRS:
        arrays[f"resample_{orig}_{new}"] = direct_sinc_resample(x, orig, new)

    # pitch pins run the production pipeline in float64-friendly CPU mode
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", False)  # production dtype path
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
    from stutter_tpu.ops.pitch import pitch_shift

    for n_steps in PITCH_STEPS:
        arrays[f"pitch_{n_steps}"] = np.asarray(
            pitch_shift(x, 16000, n_steps), np.float32
        )

    if check:
        stored = np.load(GOLDEN_PATH)
        for k, v in arrays.items():
            np.testing.assert_allclose(stored[k], v, atol=1e-6, err_msg=k)
        print(f"goldens match: {sorted(arrays)}")
        return 0
    os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
    np.savez(GOLDEN_PATH, **arrays)
    print(f"wrote {GOLDEN_PATH}: {sorted(arrays)}")
    return 0


if __name__ == "__main__":
    sys.exit(main(check="--check" in sys.argv))
