"""JAX-native downstream classifier heads (reference E5 -> TPU-first).

The reference trains sklearn SVM/RF/XGB pipelines on CPU
(``model_training_01.py:489-518``). The TPU build's primary classifiers are
JAX heads trained on device — a class-weighted linear (multinomial logistic)
model and an MLP (the BASELINE.json configs name an MLP classifier) — behind
an sklearn-style fit/predict interface so the training drivers treat every
backend uniformly. StandardScaler is reimplemented to mirror sklearn's
(mean/std with ddof=0) since it's part of the reference Pipeline.
"""

from __future__ import annotations

import dataclasses
import functools
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from stutter_tpu.train.class_weights import compute_class_weights
from stutter_tpu.utils.logging import get_logger

logger = get_logger("train.heads")


class StandardScaler:
    """sklearn-equivalent zero-mean unit-std feature scaling."""

    def __init__(self):
        self.mean_: np.ndarray | None = None
        self.scale_: np.ndarray | None = None

    def fit(self, X: np.ndarray) -> "StandardScaler":
        X = np.asarray(X, np.float64)
        self.mean_ = X.mean(axis=0)
        std = X.std(axis=0)
        self.scale_ = np.where(std == 0.0, 1.0, std)
        return self

    def transform(self, X: np.ndarray) -> np.ndarray:
        return ((np.asarray(X, np.float64) - self.mean_) / self.scale_).astype(np.float32)

    def fit_transform(self, X: np.ndarray) -> np.ndarray:
        return self.fit(X).transform(X)


@dataclasses.dataclass(frozen=True)
class HeadConfig:
    in_dim: int
    n_classes: int
    hidden_dims: tuple[int, ...] = ()  # () = linear / logistic head
    dropout: float = 0.1
    learning_rate: float = 1e-3
    weight_decay: float = 1e-4
    epochs: int = 200
    batch_size: int = 256
    label_smoothing: float = 0.0
    seed: int = 0


def init_head_params(rng: jax.Array, cfg: HeadConfig) -> list[dict[str, jax.Array]]:
    dims = (cfg.in_dim, *cfg.hidden_dims, cfg.n_classes)
    keys = jax.random.split(rng, len(dims) - 1)
    return [
        {
            "w": jax.random.normal(k, (din, dout), jnp.float32) * np.sqrt(2.0 / din),
            "b": jnp.zeros((dout,), jnp.float32),
        }
        for k, din, dout in zip(keys, dims[:-1], dims[1:])
    ]


def head_forward(
    params: list[dict[str, jax.Array]],
    x: jax.Array,
    dropout: float = 0.0,
    rng: jax.Array | None = None,
) -> jax.Array:
    """Logits for [B, D] features."""
    h = x
    for i, layer in enumerate(params):
        h = h @ layer["w"] + layer["b"]
        if i < len(params) - 1:
            h = jax.nn.gelu(h)
            if dropout > 0.0 and rng is not None:
                rng, sub = jax.random.split(rng)
                keep = jax.random.bernoulli(sub, 1.0 - dropout, h.shape)
                h = jnp.where(keep, h / (1.0 - dropout), 0.0)
    return h


def weighted_xent_sums(
    logits: jax.Array,
    labels: jax.Array,
    class_weights: jax.Array | None = None,
    label_smoothing: float = 0.0,
    valid: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """(weighted loss SUM, weight mass) — the un-normalized pair.

    Splitting sum from normalization makes gradient accumulation exact:
    microbatch sums add like one big batch, and the accumulated gradient is
    normalized once by the total weight mass (train/finetune.py)."""
    n_classes = logits.shape[-1]
    onehot = jax.nn.one_hot(labels, n_classes)
    if label_smoothing > 0.0:
        onehot = onehot * (1.0 - label_smoothing) + label_smoothing / n_classes
    logp = jax.nn.log_softmax(logits.astype(jnp.float32))
    per_example = -jnp.sum(onehot * logp, axis=-1)
    w = class_weights[labels] if class_weights is not None else jnp.ones_like(per_example)
    if valid is not None:
        w = w * valid.astype(w.dtype)
    return jnp.sum(per_example * w), jnp.sum(w)


def weighted_softmax_xent(
    logits: jax.Array,
    labels: jax.Array,
    class_weights: jax.Array | None = None,
    label_smoothing: float = 0.0,
    valid: jax.Array | None = None,
) -> jax.Array:
    """Class-weighted CE; ``valid`` ([B] 0/1) masks pad/failed rows out of the
    weighted mean so bucket-padded batches don't bias toward label 0."""
    loss_sum, w_sum = weighted_xent_sums(
        logits, labels, class_weights, label_smoothing, valid
    )
    return loss_sum / jnp.maximum(w_sum, 1e-9)


@functools.lru_cache(maxsize=64)
def _build_step(cfg: HeadConfig, weighted: bool):
    """jit-compiled train step, cached per HeadConfig so repeated fits over a
    layer/classifier sweep reuse one compilation (a per-fit closure would be
    a fresh jit cache key every time)."""
    import optax

    tx = optax.adamw(cfg.learning_rate, weight_decay=cfg.weight_decay)

    @jax.jit
    def step(params, opt_state, xb, yb, weights, key):
        def loss_fn(p):
            logits = head_forward(p, xb, dropout=cfg.dropout, rng=key)
            return weighted_softmax_xent(
                logits, yb, weights if weighted else None, cfg.label_smoothing
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, new_opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_opt_state, loss

    return tx, step


class JaxClassifier:
    """sklearn-style fit/predict wrapper around a jit-compiled optax loop.

    class_weight: None | 'balanced' (sklearn semantics via
    train/class_weights.py).
    """

    def __init__(self, cfg: HeadConfig, class_weight: str | None = "balanced"):
        self.cfg = cfg
        self.class_weight = class_weight
        self.params: Any = None
        self.scaler = StandardScaler()

    def fit(self, X: np.ndarray, y: np.ndarray) -> "JaxClassifier":
        cfg = self.cfg
        Xs = self.scaler.fit_transform(X)
        y = np.asarray(y, np.int32)
        weighted = self.class_weight == "balanced"
        weights = jnp.asarray(
            compute_class_weights(y, cfg.n_classes) if weighted else np.ones(cfg.n_classes),
            jnp.float32,
        )

        rng = jax.random.key(cfg.seed)
        rng, init_key = jax.random.split(rng)
        params = init_head_params(init_key, cfg)
        tx, step = _build_step(cfg, weighted)
        opt_state = tx.init(params)

        n = len(Xs)
        bs = min(cfg.batch_size, n)

        Xd = jnp.asarray(Xs)
        yd = jnp.asarray(y)
        steps_per_epoch = max(1, n // bs)
        np_rng = np.random.RandomState(cfg.seed)
        for _epoch in range(cfg.epochs):
            perm = np_rng.permutation(n)
            for s in range(steps_per_epoch):
                idx = perm[s * bs : (s + 1) * bs]
                if len(idx) < bs:  # keep shapes static
                    idx = np.concatenate([idx, perm[: bs - len(idx)]])
                rng, key = jax.random.split(rng)
                params, opt_state, _ = step(params, opt_state, Xd[idx], yd[idx],
                                            weights, key)
        self.params = params
        return self

    def predict_proba(self, X: np.ndarray) -> np.ndarray:
        Xs = jnp.asarray(self.scaler.transform(X))
        logits = head_forward(self.params, Xs)
        return np.asarray(jax.nn.softmax(logits, axis=-1))

    def predict(self, X: np.ndarray) -> np.ndarray:
        return self.predict_proba(X).argmax(axis=-1)

    # joblib/pickle support: params stored as numpy on serialize
    def __getstate__(self):
        state = dict(self.__dict__)
        if state.get("params") is not None:
            state["params"] = jax.tree.map(np.asarray, state["params"])
        return state

    def __setstate__(self, state):
        self.__dict__.update(state)
