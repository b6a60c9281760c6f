"""Shared CLI helpers: model loading, mesh setup, flag plumbing.

The reference's ``--device cuda:N`` flag picked one GPU
(``WavLM_embeddings.py:442-446``); here ``--devices`` selects how many mesh
devices to use (default: all), and ``--preset`` selects fidelity vs fast
numerics. ``--model_name`` accepts an HF hub id (network required, like the
reference) or a local checkpoint directory; with ``--random_init`` the
architecture is built with fresh weights (for offline smoke runs).
"""

from __future__ import annotations

import argparse

from stutter_tpu.utils.logging import get_logger

logger = get_logger("cli")

WAVLM_PRESETS = {
    "microsoft/wavlm-base": "base",
    "microsoft/wavlm-base-plus": "base_plus",
    "microsoft/wavlm-large": "large",
    "microsoft/wavlm-large-v2": "large",
}


def str2bool(v: str | bool) -> bool:
    """Robust boolean flag parsing.

    The reference's ``type=bool`` flags are buggy (any non-empty string is
    True, ``model_training_1.py:59-72``); this accepts the same syntax but
    parses it correctly, alongside the reference's working ``--no_*``
    overrides.
    """
    if isinstance(v, bool):
        return v
    if v.lower() in ("yes", "true", "t", "y", "1"):
        return True
    if v.lower() in ("no", "false", "f", "n", "0"):
        return False
    raise argparse.ArgumentTypeError(f"boolean value expected, got {v!r}")


def add_mesh_args(parser: argparse.ArgumentParser) -> None:
    parser.add_argument("--devices", type=int, default=None,
                        help="Number of devices for the data-parallel mesh (default: all)")
    parser.add_argument("--tp", type=int, default=1,
                        help="Tensor-parallel size (model axis); devices/tp is the "
                             "data-parallel size")
    parser.add_argument("--preset", type=str, default="fast",
                        choices=["fast", "fidelity", "turbo"],
                        help="Numerics preset: fast=bf16 MXU, fidelity=f32 HIGHEST, "
                             "turbo=int8 dynamic-quant GEMMs (2x MXU rate; fidelity "
                             "measured, not guaranteed <=1e-3)")
    parser.add_argument("--device", type=str, default=None,
                        help="Accepted for reference compatibility; ignored "
                             "(device selection is mesh-based on TPU)")


from stutter_tpu.utils.jaxcache import enable_compilation_cache  # noqa: E402,F401
# (re-export: implementation moved to utils so library code can call it too)


def build_mesh(args):
    import jax

    from stutter_tpu.parallel.mesh import make_mesh

    enable_compilation_cache()

    devices = jax.devices()
    n = args.devices or len(devices)
    tp = getattr(args, "tp", 1)
    if args.device is not None:
        logger.warning("--device %r is ignored on TPU; using a %d-device mesh",
                       args.device, n)
    if n == 1:
        return None
    return make_mesh(devices[:n], data=n // tp, model=tp)


def default_model_name(model_type: str, model_name: str | None) -> str:
    """Resolve the per-backbone default checkpoint (shared by serve/predict)."""
    if model_name:
        return model_name
    return ("microsoft/wavlm-large"
            if "wavlm" in model_type or model_type == "combined"
            else "openai/whisper-large")


def make_bucket_batcher(extractor, mesh, *, buckets_s=None, audio_budget_s,
                        max_batch, max_length_s=None):
    """BucketBatcher honoring the extractor's preferences — one construction
    shared by serve/predict (the pipeline CLIs go through ExtractionPipeline,
    which applies the same rules): the extractor's ``preferred_buckets`` win
    unless the caller names buckets (whisper pads to 30 s on device, so
    multi-second default buckets would compile identical-work programs), and
    ``frame_align`` snaps bucket lengths to MXU-friendly frame counts."""
    from stutter_tpu.extract.batcher import DEFAULT_BUCKETS_S, BucketBatcher

    return BucketBatcher(
        buckets_s=buckets_s
        or getattr(extractor, "preferred_buckets", None) or DEFAULT_BUCKETS_S,
        audio_budget_s=audio_budget_s,
        max_batch=max_batch,
        batch_multiple=mesh.data_size if mesh else 1,
        max_length_s=max_length_s,
        frame_align=getattr(extractor, "frame_align", None),
    )


def load_wavlm_model(model_name: str, random_init: bool):
    """Return (cfg, params) from hub/local dir, or random init offline."""
    from stutter_tpu.models import WavLMConfig, init_wavlm_params

    if random_init:
        import jax

        preset = WAVLM_PRESETS.get(model_name, "base")
        cfg = getattr(WavLMConfig, preset)()
        logger.warning("--random_init: using fresh %s weights (no checkpoint load)", preset)
        return cfg, init_wavlm_params(jax.random.key(0), cfg)
    from stutter_tpu.weights import load_wavlm

    return load_wavlm(model_name)


_WHISPER_SIZES = (
    ("large-v3", "large_v3"), ("large-v2", "large_v2"), ("large", "large"),
    ("medium", "medium"), ("small", "small"), ("base", "base"),
    ("tiny", "tiny_official"),
)


def load_whisper_model(model_name: str, random_init: bool):
    from stutter_tpu.models import WhisperConfig, init_whisper_params

    if random_init:
        import jax

        preset = next((p for key, p in _WHISPER_SIZES if key in model_name), "base")
        cfg = getattr(WhisperConfig, preset)()
        logger.warning("--random_init: using fresh whisper %s weights", preset)
        return cfg, init_whisper_params(jax.random.key(0), cfg)
    from stutter_tpu.weights import load_whisper

    return load_whisper(model_name)
