"""End-to-end fine-tuning: WavLM backbone + layer-weighted-sum + head.

BASELINE.json config[3]: "WavLM-Large layer-wise weighted-sum features +
classifier, end-to-end fine-tune". The reference never fine-tunes (its
backbone is frozen feature extraction); this is the TPU build's first-class
training path: softmax-weighted sum over all N+1 hidden states (the standard
SUPERB-style probing/fine-tune head), masked mean-pool, MLP head,
class-weighted cross-entropy, optax adamw with separate backbone/head
learning rates, `jax.checkpoint` on the encoder scan body for memory, all
under one jit over the DP(xTP) mesh.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

from stutter_tpu.frontend.wavlm_frontend import wavlm_prepare_batch
from stutter_tpu.models.wavlm import WavLMConfig, init_wavlm_params, wavlm_forward
from stutter_tpu.ops.pooling import masked_mean_pool
from stutter_tpu.train.heads import head_forward, init_head_params, weighted_softmax_xent
from stutter_tpu.train.heads import HeadConfig
from stutter_tpu.utils.logging import get_logger

logger = get_logger("train.finetune")


@dataclasses.dataclass(frozen=True)
class FinetuneConfig:
    model: WavLMConfig
    n_classes: int
    head_hidden: tuple[int, ...] = (256,)
    head_dropout: float = 0.1
    backbone_lr: float = 1e-5
    head_lr: float = 1e-3
    weight_decay: float = 1e-4
    freeze_feature_encoder: bool = True  # standard for wav2vec2-family fine-tune
    freeze_backbone: bool = False  # True = SUPERB-style weighted-sum probe
    remat_encoder: bool = True
    # "layer": checkpoint each encoder scan layer (the standard transformer
    #   remat) — the cross-layer residual is just the [N, B, L, D] input
    #   stack; each layer's f32 attention probs recompute inside its own
    #   backward. Whole-forward remat ("nothing"/"dots") instead stacks the
    #   probs residual [N, B, H, L, L] f32 across ALL layers during the
    #   recompute — 1.88 GB at batch 32 on v5e, the allocation that OOM'd it.
    # "layer_probs": per-layer checkpoint that saves everything EXCEPT the
    #   [B, H, L, L] attention chain — backward recomputes only
    #   QK^T + bias + softmax (~1% of layer FLOPs): near no-remat speed at
    #   layer-remat-like memory.
    # "layer_dots": per-layer checkpoint that saves each layer's GEMM
    #   outputs (incl. attention logits) and recomputes only elementwise work.
    # "nothing": whole-forward remat, recompute everything in the backward;
    # "dots": whole-forward remat saving matmul outputs.
    remat_policy: str = "layer"
    precision: Any = jax.lax.Precision.DEFAULT
    activation_dtype: Any = jnp.bfloat16
    # mixed precision: cast the f32 master weights to activation_dtype for
    # the forward/backward (False = the pre-round-3 behavior, f32 weights
    # into bf16 activations — kept only for A/B measurement)
    cast_params: bool = True
    # adamw first-moment dtype: bf16 halves the momentum buffer's HBM
    # footprint and read/write traffic per update; the ~0.4% relative
    # rounding on a momentum average is far below gradient noise (nu stays
    # f32 — it is divided by, so its precision sets the step scale)
    mu_dtype: Any = jnp.bfloat16
    # lax.scan unroll factor for the gradient-accumulation microbatch loop:
    # >1 lets XLA fuse the f32 grad-tree adds into the backward epilogues at
    # the cost of a K-times-larger step program (the remote compile service
    # is the binding constraint there, DESIGN.md §6b)
    accum_unroll: int = 1
    # long-bucket attention kernels in the TRAINING step: the fused
    # gated-bias kernel has a flash-style custom VJP
    # (ops/wavlm_attention_vjp), so buckets at or past the dispatch
    # threshold (L >= 1008, i.e. >=20 s clips — models/wavlm.py, the
    # extraction-forward-measured einsum/kernel crossover;
    # STUTTER_TPU_LONG_ATTENTION_MIN_L overrides) no longer pay the einsum
    # path's [B, H, L, L] HBM chain under jax.grad. 12-16 s buckets ride
    # einsum in both directions — the training-side crossover has not been
    # measured separately and could sit lower (the einsum BACKWARD's HBM
    # chain is what the VJP eliminates); lower the env threshold to A/B.
    # None = auto: on for single-device runs, off under a mesh (a
    # pallas_call has no GSPMD partition rule — it would force its
    # DP-sharded operands replicated; FinetuneTrainer resolves this at
    # construction). Short buckets are unaffected either way.
    use_flash_attention: bool | None = None
    # int8 forward GEMMs inside the training step (ops/quant.qdot_ste):
    # the forward AND the per-layer remat re-forward ride the 2x int8 MXU
    # rate while the backward GEMMs stay bf16 with straight-through
    # gradients. The step's FLOP budget is ~4 forward-equivalents (fwd +
    # remat refwd + 2x bwd); int8 on the two forward units caps the ideal
    # speedup at ~1.33x over the bf16 roofline. Gradient fidelity vs the
    # bf16 step is measured, not assumed: scripts/finetune_int8_grad_check.py.
    int8_forward: bool = False
    seed: int = 0


def init_finetune_params(cfg: FinetuneConfig, backbone_params=None):
    rng = jax.random.key(cfg.seed)
    k_backbone, k_head = jax.random.split(rng)
    if backbone_params is None:
        backbone_params = init_wavlm_params(k_backbone, cfg.model)
    n_states = cfg.model.num_hidden_layers + 1
    head_cfg = HeadConfig(
        in_dim=cfg.model.hidden_size,
        n_classes=cfg.n_classes,
        hidden_dims=cfg.head_hidden,
        dropout=cfg.head_dropout,
    )
    return {
        "backbone": backbone_params,
        "layer_weights": jnp.zeros((n_states,), jnp.float32),
        "head": init_head_params(k_head, head_cfg),
    }


def finetune_forward(
    params,
    waves: jax.Array,
    lengths: jax.Array,
    cfg: FinetuneConfig,
    train: bool = False,
    rng: jax.Array | None = None,
) -> jax.Array:
    """[B, T] padded waves + [B] lengths -> [B, n_classes] logits."""
    x = wavlm_prepare_batch(waves, lengths, cfg.model.do_normalize)
    backbone = params["backbone"]
    if cfg.cast_params and cfg.activation_dtype != jnp.float32:
        # Mixed precision: cast the f32 master weights to the compute dtype
        # once per step, OUTSIDE the remat boundary (one cast, its bf16 tree
        # is the checkpointed function's input). f32 params otherwise poison
        # every encoder matmul into the slow f32 MXU mode — the same effect
        # cast_params_for_preset fixes for extraction (measured there as
        # +40% step time; fine-tune numbers: scripts/bench_finetune.py,
        # DESIGN.md §6b). Gradients flow through the cast and arrive f32 on
        # the master weights; adamw updates stay full-precision.
        backbone = jax.tree.map(
            lambda p: p.astype(cfg.activation_dtype)
            if p.dtype == jnp.float32 else p,
            backbone,
        )
    if cfg.int8_forward:
        # Wrap the six big per-layer GEMM weights in the {"ste": w} marker
        # that ops/quant.dense dispatches to qdot_ste — a pure pytree
        # re-labeling, so gradients flow through to the (cast) weights and
        # from there to the f32 masters unchanged.
        from stutter_tpu.ops.quant import WAVLM_QUANT_KEYS

        enc = backbone["encoder"]
        layers = {
            k: ({"ste": v} if k in WAVLM_QUANT_KEYS else v)
            for k, v in enc["layers"].items()
        }
        backbone = {**backbone, "encoder": {**enc, "layers": layers}}
    sa_rng = None
    if train and rng is not None and cfg.model.apply_spec_augment:
        rng, sa_rng = jax.random.split(rng)
    fwd = wavlm_forward
    if cfg.freeze_feature_encoder or cfg.freeze_backbone:
        # Structural freeze of the conv stem (same reasoning as the
        # freeze_backbone stop_gradient below): the optimizer already labels
        # the stem frozen, so stopping the gradient at the stem output lets
        # XLA prune the transposed-conv backward over the ~50 kHz-sample
        # activations from the step program entirely.
        fwd = functools.partial(wavlm_forward, stop_stem_gradient=True)
    remat_layers: bool | str = False
    if cfg.remat_encoder and cfg.remat_policy.startswith("layer"):
        # per-layer checkpoint variants (see FinetuneConfig.remat_policy)
        remat_layers = {"layer": True, "layer_dots": "dots",
                        "layer_probs": "save_but_probs"}[cfg.remat_policy]
    if cfg.remat_encoder and not remat_layers:
        fwd = jax.checkpoint(
            fwd,
            # cfg, precision, activation_dtype, hidden_reducer, use_flash,
            # f32_attention_softmax
            static_argnums=(2, 4, 5, 7, 8, 9),
            policy=(jax.checkpoint_policies.dots_with_no_batch_dims_saveable
                    if cfg.remat_policy == "dots"
                    else jax.checkpoint_policies.nothing_saveable),
        )
    # use_flash (cfg.use_flash_attention, None->True here): the long-bucket
    # (L>=512) fused attention kernel is differentiable via its custom VJP
    # (ops/wavlm_attention_vjp — gradient-equivalence-tested against the
    # einsum path); its in-kernel softmax runs in f32, matching the training
    # softmax policy below. Short buckets dispatch to the einsum path by L
    # at trace time either way. Eval shares the flag so train==eval numerics.
    # f32_attention_softmax=True: the extraction-tuned bf16 logits/bias/
    # softmax shortcut (-6 ms/batch, validated on INFERENCE fidelity only)
    # must not set gradient numerics — training keeps the f32 attention
    # softmax it was measured/converged with (caught by round-2 code review).
    # Pool INSIDE the encoder scan (hidden_reducer), so the [N+1, B, L, D]
    # hidden stack never materializes — only [N+1, B, D] pooled vectors do.
    # masked_mean_pool is linear, so pooling commutes with the layer-weighted
    # sum: pool(sum_s w_s h_s) == sum_s w_s pool(h_s). At batch 32 the old
    # stack was 236 MB bf16 + a 472 MB f32 cast — the single biggest buffer
    # in the step program (batch 32 OOM'd HBM by just 139 MB), plus its
    # read/write traffic every step.
    from stutter_tpu.models.wavlm import wavlm_feature_lengths

    frame_lengths = wavlm_feature_lengths(cfg.model, lengths)

    def reducer(h):
        return masked_mean_pool(h, frame_lengths)  # [B, D] f32, mask-aware

    kw = {"remat_layers": remat_layers} if remat_layers else {}
    use_flash = (cfg.use_flash_attention
                 if cfg.use_flash_attention is not None else True)
    _, pooled_states, _ = fwd(
        backbone, x, cfg.model, lengths,
        cfg.precision, cfg.activation_dtype, sa_rng, reducer, use_flash, True,
        **kw,
    )
    if cfg.freeze_backbone:
        # Structural freeze: the optimizer's set_to_zero() alone still makes
        # value_and_grad BUILD the full encoder backward only to discard it.
        # stop_gradient makes the backbone grads structurally zero, so XLA
        # prunes the backbone backward from the step program — the SUPERB-
        # style probe then costs ~forward + head backward, not fwd+bwd.
        pooled_states = jax.lax.stop_gradient(pooled_states)
    w = jax.nn.softmax(params["layer_weights"])
    pooled = jnp.einsum("s,sbd->bd", w, pooled_states.astype(jnp.float32))
    return head_forward(params["head"], pooled,
                        dropout=cfg.head_dropout if train else 0.0, rng=rng)


def make_optimizer(cfg: FinetuneConfig, params) -> optax.GradientTransformation:
    """adamw with separate backbone/head LRs; optionally frozen conv stem."""

    def label_fn(tree):
        def lab(path):
            if not path:
                return "head"
            if path[0] == "backbone":
                if cfg.freeze_backbone:
                    return "frozen"
                if cfg.freeze_feature_encoder and len(path) > 1 and path[1] == "feature_encoder":
                    return "frozen"
                return "backbone"
            return "head"

        from stutter_tpu.parallel.sharding import _tree_map_with_path

        return _tree_map_with_path(lambda p, _leaf: lab(p), tree)

    return optax.multi_transform(
        {
            "backbone": optax.adamw(cfg.backbone_lr, weight_decay=cfg.weight_decay,
                                    mu_dtype=cfg.mu_dtype),
            "head": optax.adamw(cfg.head_lr, weight_decay=cfg.weight_decay,
                                mu_dtype=cfg.mu_dtype),
            "frozen": optax.set_to_zero(),
        },
        label_fn,
    )


def make_train_step(cfg: FinetuneConfig, tx: optax.GradientTransformation,
                    grad_accum: int = 1):
    """One jit-able (params, opt_state, batch, key) -> (params, opt_state, aux).

    ``grad_accum > 1`` builds the accumulating variant: batch arrays carry a
    leading microbatch axis ([K, B, ...]) and a ``lax.scan`` accumulates the
    un-normalized gradient sums (heads.weighted_xent_sums) before ONE
    optimizer update — numerically identical to a K·B batch (the weighted-CE
    mean normalizes by total weight mass, applied once to the summed grads),
    while the compiled backward graph stays microbatch-sized. This is the
    scale-past-the-compiler path: the dev environment's remote compile
    service 500s on WavLM-Large backward graphs at batch >= 32 (DESIGN.md
    §6b), and grad accumulation reaches any effective batch from the batch-16
    graph that does compile."""
    if grad_accum > 1:
        return _make_accum_train_step(cfg, tx, grad_accum)

    def train_step(params, opt_state, waves, lengths, labels, valid, class_weights, key):
        # ``valid`` ([B] 0/1) masks bucket-pad rows and decode-failed rows out
        # of loss AND accuracy — BucketBatcher pads every batch to the fixed
        # per-bucket size with zero-audio label-0 rows (ADVICE r1 medium).
        def loss_fn(p):
            logits = finetune_forward(p, waves, lengths, cfg, train=True, rng=key)
            loss = weighted_softmax_xent(logits, labels, class_weights, valid=valid)
            return loss, logits

        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        v = valid.astype(jnp.float32)
        hits = (jnp.argmax(logits, -1) == labels).astype(jnp.float32)
        acc = jnp.sum(hits * v) / jnp.maximum(jnp.sum(v), 1.0)
        return params, opt_state, {"loss": loss, "accuracy": acc}

    return train_step


def _make_accum_train_step(cfg: FinetuneConfig, tx: optax.GradientTransformation,
                           grad_accum: int):
    """Gradient-accumulation step: scan K microbatches, one optimizer update."""
    from stutter_tpu.train.heads import weighted_xent_sums

    def train_step(params, opt_state, waves, lengths, labels, valid, class_weights, key):
        # waves [K, B, T], lengths/labels/valid [K, B]
        keys = jax.random.split(key, grad_accum)

        fwd_params = params
        if cfg.cast_params and cfg.activation_dtype != jnp.float32:
            # Hoist the mixed-precision cast OUT of the microbatch scan: one
            # f32->bf16 backbone cast per STEP instead of one per microbatch
            # (finetune_forward's own cast then no-ops on the already-bf16
            # leaves). Differentiating w.r.t. the cast tree gives bf16 grads
            # whose f32 accumulation below is EXACTLY what the in-scan cast's
            # transpose produced (astype to f32, then add) — identical
            # numerics, minus (K-1) x ~1.9 GB of cast HBM traffic per step.
            fwd_params = {**params, "backbone": jax.tree.map(
                lambda p: p.astype(cfg.activation_dtype)
                if p.dtype == jnp.float32 else p,
                params["backbone"],
            )}

        def loss_sums(p, w, l, y, v, kk):
            logits = finetune_forward(p, w, l, cfg, train=True, rng=kk)
            loss_sum, w_sum = weighted_xent_sums(logits, y, class_weights, valid=v)
            return loss_sum, (w_sum, logits)

        grad_fn = jax.value_and_grad(loss_sums, has_aux=True)

        def micro(carry, xs):
            g_acc, ls_acc, ws_acc, hit_acc, n_acc = carry
            w, l, y, v, kk = xs
            (ls, (ws, logits)), g = grad_fn(fwd_params, w, l, y, v, kk)
            vf = v.astype(jnp.float32)
            hits = jnp.sum((jnp.argmax(logits, -1) == y).astype(jnp.float32) * vf)
            return (
                jax.tree.map(lambda a, b: a + b.astype(a.dtype), g_acc, g),
                ls_acc + ls, ws_acc + ws, hit_acc + hits, n_acc + jnp.sum(vf),
            ), None

        zero = jnp.zeros((), jnp.float32)
        # f32 accumulators shaped like the MASTER params (grads from the cast
        # tree arrive bf16 and are upcast in the add above)
        g0 = jax.tree.map(lambda x: jnp.zeros(x.shape, x.dtype), params)
        (g_sum, loss_sum, w_sum, hits, n_valid), _ = jax.lax.scan(
            micro, (g0, zero, zero, zero, zero),
            (waves, lengths, labels, valid, keys),
            unroll=cfg.accum_unroll,
        )
        # normalize the SUMMED grads by the total weight mass once — exactly
        # the gradient of the K·B-batch weighted mean
        denom = jnp.maximum(w_sum, 1e-9)
        grads = jax.tree.map(lambda g: (g / denom).astype(g.dtype), g_sum)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        aux = {"loss": loss_sum / denom,
               "accuracy": hits / jnp.maximum(n_valid, 1.0)}
        return params, opt_state, aux

    return train_step


def make_eval_step(cfg: FinetuneConfig):
    def eval_step(params, waves, lengths):
        return jnp.argmax(finetune_forward(params, waves, lengths, cfg, train=False), -1)

    return eval_step


class FinetuneTrainer:
    """Minimal epoch loop over padded (waves, lengths, labels) batches."""

    def __init__(self, cfg: FinetuneConfig, backbone_params=None, mesh=None,
                 grad_accum: int = 1):
        from stutter_tpu.parallel.mesh import replicate

        if cfg.use_flash_attention is None:
            # auto: fused long-attention kernels only off-mesh (a pallas_call
            # has no GSPMD partition rule — under the DP(xTP) mesh it would
            # force its sharded operands replicated)
            cfg = dataclasses.replace(cfg, use_flash_attention=mesh is None)
        self.cfg = cfg
        self.mesh = mesh
        self.grad_accum = int(grad_accum)
        self.params = init_finetune_params(cfg, backbone_params)
        self.tx = make_optimizer(cfg, self.params)
        self.opt_state = self.tx.init(self.params)
        if mesh is not None:
            self.params = replicate(mesh, self.params)
            self.opt_state = replicate(mesh, self.opt_state)
        self._train_step = jax.jit(make_train_step(cfg, self.tx), donate_argnums=(0, 1))
        self._accum_step = (
            jax.jit(make_train_step(cfg, self.tx, self.grad_accum),
                    donate_argnums=(0, 1))
            if self.grad_accum > 1 else None
        )
        self._eval_step = jax.jit(make_eval_step(cfg))
        self._rng = jax.random.key(cfg.seed + 1)
        # XLA:CPU's in-process collective rendezvous CHECK-fails (SIGABRT in
        # InProcessCommunicator::AllGather) when many collective programs are
        # enqueued asynchronously on the virtual multi-device test backend —
        # cross-step rendezvous interleave. TPU streams serialize program
        # order per device, so async chaining is only allowed there.
        self._serialize_steps = jax.default_backend() == "cpu"

    def step(self, waves, lengths, labels, class_weights, valid=None,
             sync: bool = True):
        """One training step. sync=True returns host floats (blocks on the
        device). sync=False returns the live device aux dict — the step is
        dispatched asynchronously and the caller fetches metrics when it
        wants (e.g. every K steps), so the hot loop never stalls on a
        device->host round trip per step."""
        from stutter_tpu.parallel.mesh import shard_batch

        if valid is None:
            valid = np.ones(len(np.asarray(labels)), np.float32)
        waves, lengths, labels, valid = shard_batch(
            self.mesh, np.asarray(waves, np.float32),
            np.asarray(lengths, np.int32), np.asarray(labels, np.int32),
            np.asarray(valid, np.float32),
        )
        self._rng, key = jax.random.split(self._rng)
        self.params, self.opt_state, aux = self._train_step(
            self.params, self.opt_state, waves, lengths, labels, valid,
            jnp.asarray(class_weights, jnp.float32), key,
        )
        if not sync:
            if self._serialize_steps:
                jax.block_until_ready(aux)  # one in-flight program at a time
            return aux
        return {k: float(v) for k, v in aux.items()}

    def step_accum(self, microbatches, class_weights, sync: bool = True):
        """One accumulated update over K same-shape microbatches.

        ``microbatches`` is a list of exactly ``grad_accum`` tuples
        ``(waves [B, T], lengths [B], labels [B], valid [B])`` sharing one
        padded shape (one bucket); short groups are padded by repeating the
        last microbatch with ``valid=0`` — weight-mass normalization makes
        the repeat a numerical no-op, and the jit program keeps its single
        static [K, B, ...] shape."""
        assert self._accum_step is not None, "trainer built with grad_accum=1"
        K = self.grad_accum
        assert 1 <= len(microbatches) <= K, (len(microbatches), K)
        mbs = list(microbatches)
        while len(mbs) < K:
            w, l, y, _ = mbs[-1]
            mbs.append((w, l, y, np.zeros(len(np.asarray(y)), np.float32)))
        from stutter_tpu.parallel.mesh import shard_batch

        stacked = [np.stack([np.asarray(mb[i]) for mb in mbs]) for i in range(4)]
        waves, lengths, labels, valid = shard_batch(
            self.mesh, stacked[0].astype(np.float32), stacked[1].astype(np.int32),
            stacked[2].astype(np.int32), stacked[3].astype(np.float32), axis=1,
        )
        self._rng, key = jax.random.split(self._rng)
        self.params, self.opt_state, aux = self._accum_step(
            self.params, self.opt_state, waves, lengths, labels, valid,
            jnp.asarray(class_weights, jnp.float32), key,
        )
        if not sync:
            if self._serialize_steps:
                jax.block_until_ready(aux)
            return aux
        return {k: float(v) for k, v in aux.items()}

    def predict(self, waves, lengths) -> np.ndarray:
        from stutter_tpu.parallel.mesh import shard_batch

        waves, lengths = shard_batch(
            self.mesh, np.asarray(waves, np.float32), np.asarray(lengths, np.int32)
        )
        return np.asarray(self._eval_step(self.params, waves, lengths))
