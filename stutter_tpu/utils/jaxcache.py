"""Persistent XLA compilation cache enablement (library-level).

Lives in utils so library entry points beneath the CLIs — notably
``extract/pipeline._warmup_bucket_programs`` — can guarantee the cache is on
without importing from the CLI layer. ``cli/common.enable_compilation_cache``
re-exports this.
"""

from __future__ import annotations

import logging

logger = logging.getLogger(__name__)

DEFAULT_CACHE_DIR = "/tmp/stutter_tpu_jaxcache"


def enable_compilation_cache(cache_dir: str = DEFAULT_CACHE_DIR) -> None:
    """Persistent XLA compile cache: each bucket shape compiles once per
    machine instead of once per process (remote/TPU compiles are ~60-90 s).

    Idempotent — safe to call from every entry point that compiles device
    programs. A user-set ``jax_compilation_cache_dir`` is left untouched.
    """
    import jax

    try:
        current = jax.config.jax_compilation_cache_dir
    except AttributeError:
        current = None
    if current:
        if cache_dir != DEFAULT_CACHE_DIR and cache_dir != current:
            # an explicit custom dir loses to an earlier configuration
            # (e.g. warmup already enabled the default) — say so rather
            # than silently no-op'ing
            logger.warning(
                "compilation cache already at %s; ignoring requested %s",
                current, cache_dir,
            )
        return
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # noqa: BLE001
        logger.warning("could not enable compilation cache: %s", e)
