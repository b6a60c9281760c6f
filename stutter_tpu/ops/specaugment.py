"""SpecAugment-style time/feature masking for fine-tuning.

Capability parity: HF WavLM applies SpecAugment during training
(``modeling_wavlm.py:1004-1048`` `_mask_hidden_states`): random time spans
replaced with the learned ``masked_spec_embed`` and random feature spans
zeroed, controlled by (mask_time_prob, mask_time_length) and
(mask_feature_prob, mask_feature_length). The reference never trains, so
this only matters for the fine-tune path; semantics here are the standard
span-mask formulation in fully-vectorized JAX (no host-side numpy mask
computation): sample span starts i.i.d. with rate prob/length, expand to
spans via a max-pool over the length window.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _span_mask(rng: jax.Array, shape: tuple[int, int], prob: float, span: int) -> jax.Array:
    """[B, L] bool mask where ~prob of positions fall inside sampled spans."""
    B, L = shape
    starts = jax.random.bernoulli(rng, prob / span, (B, L))
    # expand each start into a span of `span` positions via windowed max
    expanded = jax.lax.reduce_window(
        starts.astype(jnp.float32),
        0.0,
        jax.lax.max,
        window_dimensions=(1, span),
        window_strides=(1, 1),
        padding=((0, 0), (span - 1, 0)),
    )
    return expanded > 0.0


def spec_augment(
    rng: jax.Array,
    hidden: jax.Array,  # [B, L, D]
    lengths: jax.Array | None = None,
    mask_time_prob: float = 0.05,
    mask_time_length: int = 10,
    mask_feature_prob: float = 0.0,
    mask_feature_length: int = 10,
    mask_embedding: jax.Array | None = None,  # [D] learned mask vector
) -> jax.Array:
    """Apply time + feature span masking (training only)."""
    B, L, D = hidden.shape
    t_rng, f_rng = jax.random.split(rng)
    out = hidden
    if mask_time_prob > 0.0:
        tmask = _span_mask(t_rng, (B, L), mask_time_prob, mask_time_length)
        if lengths is not None:
            tmask = tmask & (jnp.arange(L)[None, :] < lengths[:, None])
        fill = (
            mask_embedding.astype(hidden.dtype)[None, None, :]
            if mask_embedding is not None
            else jnp.zeros((), hidden.dtype)
        )
        out = jnp.where(tmask[:, :, None], fill, out)
    if mask_feature_prob > 0.0:
        fmask = _span_mask(f_rng, (B, D), mask_feature_prob, mask_feature_length)
        out = jnp.where(fmask[:, None, :], jnp.zeros((), hidden.dtype), out)
    return out
