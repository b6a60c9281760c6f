"""Audio augmentation for minority-class re-extraction (reference C12).

Two profiles, mirroring the two reference variants:
- 'balanced' (``model_training_01.py:140-192``): random choice of
  speed (resample 0.9-1.1x round trip), gaussian noise (0.005-0.02),
  pitch shift (+-2 semitones, phase vocoder), volume (0.8-1.2x)
- 'conservative' (``model_training_1.py:167-214``): speed 0.95-1.05,
  noise 0.001-0.005, volume 0.9-1.1, plus an explicit 'none' option and
  NO pitch

All DSP runs as jit-able JAX ops (resample/pitch on device); final clamp to
[-1, 1] matches the reference. Failures fall back to the original audio
(``model_training_01.py:190-192``).
"""

from __future__ import annotations

import dataclasses
import random

import numpy as np

from stutter_tpu.ops.pitch import pitch_shift
from stutter_tpu.ops.resample import resample
from stutter_tpu.utils.logging import get_logger

logger = get_logger("train.augment")


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
            # reference quirk preserved: resample sr -> int(sr*f) -> sr, a
            # same-length round trip (model_training_01.py:158-164)
            f = r.uniform(*cfg.speed_range)
            new_sr = int(sample_rate * f)
            y = np.asarray(resample(resample(x, sample_rate, new_sr), new_sr, sample_rate))
        elif augmentation_type == "noise":
            nf = r.uniform(*cfg.noise_range)
            # seeded from the caller's rng — global np.random would break the
            # reproducibility the random_state plumbing promises
            noise_rng = np.random.RandomState(r.randrange(2**32))
            y = x + noise_rng.randn(*x.shape).astype(np.float32) * nf
        elif augmentation_type == "pitch":
            n_steps = r.randint(-cfg.pitch_steps, cfg.pitch_steps)
            y = np.asarray(pitch_shift(x, sample_rate, n_steps)) if n_steps != 0 else x
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
