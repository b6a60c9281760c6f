"""Length-masked pooling over time.

The reference mean-pools each hidden state over the full (unpadded, batch=1)
time axis (``WavLM_embeddings.py:321``, ``whisper_embeddings_large.py:278``).
The TPU build batches variable-length clips into padded buckets, so the pool
must ignore padding: sum over valid frames / true length, computed in float32
regardless of activation dtype to hold the 1e-3 cosine fidelity bar.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def masked_mean_pool(hidden: jax.Array, lengths: jax.Array) -> jax.Array:
    """[B, L, D] x [B] int lengths -> [B, D] float32 mean over valid frames."""
    L = hidden.shape[1]
    mask = (jnp.arange(L)[None, :] < lengths[:, None]).astype(jnp.float32)
    total = jnp.einsum("bld,bl->bd", hidden.astype(jnp.float32), mask)
    return total / jnp.maximum(lengths.astype(jnp.float32), 1.0)[:, None]
