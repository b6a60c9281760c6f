"""Audio augmentation for minority-class re-extraction (reference C12).

Two profiles, mirroring the two reference variants:
- 'balanced' (``model_training_01.py:140-192``): random choice of
  speed (resample 0.9-1.1x round trip), gaussian noise (0.005-0.02),
  pitch shift (+-2 semitones, phase vocoder), volume (0.8-1.2x)
- 'conservative' (``model_training_1.py:167-214``): speed 0.95-1.05,
  noise 0.001-0.005, volume 0.9-1.1, plus an explicit 'none' option and
  NO pitch

All DSP runs as jit-compiled JAX ops with a BOUNDED number of XLA programs:
speed factors are quantized to a fixed grid and DSP input lengths snapped to
0.5 s multiples, so a full corpus sweep compiles at most
``n_rates x n_length_buckets`` programs instead of one per random draw
(a fresh remote-TPU compile is 60-90 s; the reference pays zero compiles by
running torchaudio on CPU — ``model_training_01.py:150-176``). For the same
reason the DSP is pinned to the host CPU backend by default
(``STUTTER_TPU_AUG_DEVICE=tpu`` opts back into the accelerator). Final clamp
to [-1, 1] matches the reference. Failures fall back to the original audio
(``model_training_01.py:190-192``).
"""

from __future__ import annotations

import dataclasses
import functools
import math
import os
import random

import numpy as np

from stutter_tpu.ops.pitch import pitch_shift
from stutter_tpu.ops.resample import resample
from stutter_tpu.utils.logging import get_logger

logger = get_logger("train.augment")

# Snap DSP input lengths up to multiples of this many samples (0.5 s @ 16 kHz)
# so variable-length corpora reuse a small set of compiled shapes.
DSP_LENGTH_QUANTUM = 8000
# Speed factors are snapped to this many evenly-spaced grid points across the
# profile's range — statistically indistinguishable from the reference's
# continuous uniform draw for augmentation purposes, but bounds compiles.
SPEED_GRID_POINTS = 9

# (kind, *static_config, padded_len) -> jitted fn. One entry == one XLA
# program, so ``len(compiled_dsp_programs())`` is the exact compile count a
# sweep has triggered (asserted bounded in tests/test_augment.py).
_compiled_dsp: dict = {}


def compiled_dsp_programs() -> int:
    """Number of distinct augmentation-DSP XLA programs compiled so far."""
    return len(_compiled_dsp)


@functools.lru_cache(maxsize=2)
def _dsp_device():
    import jax

    want = os.environ.get("STUTTER_TPU_AUG_DEVICE", "cpu")
    try:
        return jax.devices(want)[0]
    except RuntimeError:
        return jax.devices()[0]


def _snap_speed(f: float, lo: float, hi: float) -> float:
    grid = np.linspace(lo, hi, SPEED_GRID_POINTS)
    return float(grid[int(np.argmin(np.abs(grid - f)))])


def _pad_quantum(x: np.ndarray) -> np.ndarray:
    padded = max(DSP_LENGTH_QUANTUM,
                 int(math.ceil(len(x) / DSP_LENGTH_QUANTUM)) * DSP_LENGTH_QUANTUM)
    return np.pad(x, (0, padded - len(x))) if padded != len(x) else x


def _resampled_len(length: int, orig_freq: int, new_freq: int) -> int:
    g = math.gcd(orig_freq, new_freq)
    return int(math.ceil((new_freq // g) * length / (orig_freq // g)))


def _run_dsp(key: tuple, make_fn, x: np.ndarray) -> np.ndarray:
    """Run a cached jitted DSP program on the pinned DSP device.

    Trailing zero-padding only perturbs the last ~filter-width samples of the
    true region (sinc kernels are local; the phase vocoder is causal), which
    is irrelevant for augmentation — so padded shapes can be shared freely.
    """
    import jax

    xp = _pad_quantum(np.asarray(x, np.float32))
    full_key = key + (len(xp),)
    fn = _compiled_dsp.get(full_key)
    if fn is None:
        fn = jax.jit(make_fn())
        _compiled_dsp[full_key] = fn
    with jax.default_device(_dsp_device()):
        return np.asarray(fn(xp))


@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    kinds: tuple[str, ...]
    speed_range: tuple[float, float]
    noise_range: tuple[float, float]
    volume_range: tuple[float, float]
    pitch_steps: int = 2

    @staticmethod
    def balanced() -> "AugmentConfig":
        return AugmentConfig(
            kinds=("speed", "noise", "pitch", "volume"),
            speed_range=(0.9, 1.1),
            noise_range=(0.005, 0.02),
            volume_range=(0.8, 1.2),
        )

    @staticmethod
    def conservative() -> "AugmentConfig":
        return AugmentConfig(
            kinds=("speed", "noise", "volume", "none"),
            speed_range=(0.95, 1.05),
            noise_range=(0.001, 0.005),
            volume_range=(0.9, 1.1),
        )


def augment_audio(
    waveform: np.ndarray,
    sample_rate: int = 16000,
    augmentation_type: str = "random",
    config: AugmentConfig | None = None,
    rng: random.Random | None = None,
) -> np.ndarray:
    """Apply one randomly-chosen augmentation; returns float32 in [-1, 1]."""
    cfg = config or AugmentConfig.balanced()
    r = rng or random
    x = np.asarray(waveform, np.float32)
    if augmentation_type == "random":
        augmentation_type = r.choice(list(cfg.kinds))
    try:
        if augmentation_type == "speed":
            # reference quirk preserved: resample sr -> ~sr*f -> sr, a
            # same-length round trip (model_training_01.py:158-164); the
            # factor is snapped to a fixed grid to bound compiles, and the
            # intermediate rate to a 50 Hz multiple — the reference's bare
            # int() truncation can produce a rate COPRIME with sr (e.g.
            # int(16000*0.9625)=15399, gcd 1), whose gcd-reduced polyphase
            # kernel is ~1 GB and minutes to build (same pathology as
            # pitch_shift's freq_quantum; <=0.3% rate error is inaudible)
            f = _snap_speed(r.uniform(*cfg.speed_range), *cfg.speed_range)
            new_sr = max(50, int(round(sample_rate * f / 50.0)) * 50)
            if new_sr == sample_rate:
                y = x
            else:
                sr = sample_rate
                y = _run_dsp(
                    ("speed", sr, new_sr),
                    lambda: (lambda xp: resample(resample(xp, sr, new_sr), new_sr, sr)),
                    x,
                )
                y = y[: _resampled_len(_resampled_len(len(x), sr, new_sr), new_sr, sr)]
        elif augmentation_type == "noise":
            nf = r.uniform(*cfg.noise_range)
            # seeded from the caller's rng — global np.random would break the
            # reproducibility the random_state plumbing promises
            noise_rng = np.random.RandomState(r.randrange(2**32))
            y = x + noise_rng.randn(*x.shape).astype(np.float32) * nf
        elif augmentation_type == "pitch":
            n_steps = r.randint(-cfg.pitch_steps, cfg.pitch_steps)
            if n_steps == 0:
                y = x
            else:
                sr, ns = sample_rate, n_steps
                y = _run_dsp(
                    ("pitch", sr, ns),
                    lambda: (lambda xp: pitch_shift(xp, sr, ns)),
                    x,
                )[: len(x)]
        elif augmentation_type == "volume":
            y = x * r.uniform(*cfg.volume_range)
        elif augmentation_type == "none":
            y = x
        else:
            raise ValueError(f"unknown augmentation {augmentation_type!r}")
        return np.clip(y, -1.0, 1.0).astype(np.float32)
    except Exception as e:  # noqa: BLE001 — reference fallback contract
        logger.warning("augmentation failed: %s. Returning original audio.", e)
        return x
