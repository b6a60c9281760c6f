"""SMOTE oversampling as a JAX k-NN interpolation op (reference C14).

Semantics match the reference's imblearn usage
(``model_training_01.py:390-418``): resample every minority class up to the
majority count; effective ``k = min(k_neighbors, min_class_size - 1)``;
skip (return inputs unchanged) when k < 1; never fail — on error, continue
without oversampling.

The kernel math (pairwise distances + top-k + interpolation) is jit-compiled;
tests validate distributional equivalence against imblearn's published
algorithm (new samples lie on segments between same-class neighbors).
"""

from __future__ import annotations

from collections import Counter
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from stutter_tpu.utils.logging import get_logger

logger = get_logger("train.smote")


@partial(jax.jit, static_argnames=("k", "n_new"))
def _smote_class(x: jax.Array, key: jax.Array, k: int, n_new: int) -> jax.Array:
    """Generate n_new synthetic samples for one class block [n, d]."""
    n = x.shape[0]
    sq = jnp.sum(x * x, axis=1)
    d2 = sq[:, None] + sq[None, :] - 2.0 * (x @ x.T)
    d2 = d2 + jnp.eye(n) * 1e30  # exclude self
    _, nn_idx = jax.lax.top_k(-d2, k)  # [n, k] nearest same-class neighbors

    k_base, k_pick, k_gap = jax.random.split(key, 3)
    base = jax.random.randint(k_base, (n_new,), 0, n)
    pick = jax.random.randint(k_pick, (n_new,), 0, k)
    gap = jax.random.uniform(k_gap, (n_new, 1), dtype=x.dtype)
    neigh = nn_idx[base, pick]
    return x[base] + gap * (x[neigh] - x[base])


def apply_smote_oversampling(
    X: np.ndarray,
    y: np.ndarray,
    k_neighbors: int = 3,
    random_state: int = 42,
) -> tuple[np.ndarray, np.ndarray]:
    """Balance classes to the majority count via SMOTE interpolation."""
    X = np.asarray(X, np.float32)
    y = np.asarray(y)
    dist = Counter(y.tolist())
    logger.info("original distribution: %s", dict(dist))

    min_class = min(dist.values())
    k = min(k_neighbors, min_class - 1)
    if k < 1:
        logger.warning("some classes have too few samples for SMOTE; skipping oversampling")
        return X, y

    try:
        majority = max(dist.values())
        key = jax.random.key(random_state)
        new_X, new_y = [X], [y]
        for cls in sorted(dist, key=str):
            n_new = majority - dist[cls]
            if n_new <= 0:
                continue
            key, sub = jax.random.split(key)
            block = X[y == cls]
            synth = np.asarray(_smote_class(jnp.asarray(block), sub, k, n_new))
            new_X.append(synth)
            new_y.append(np.full(n_new, cls, dtype=y.dtype))
        Xr = np.concatenate(new_X)
        yr = np.concatenate(new_y)
        logger.info("after SMOTE distribution: %s", dict(Counter(yr.tolist())))
        logger.info("total samples: %d -> %d", len(y), len(yr))
        return Xr, yr
    except Exception as e:  # noqa: BLE001 — reference continue-without contract
        logger.error("SMOTE failed: %s; continuing without SMOTE", e)
        return X, y
