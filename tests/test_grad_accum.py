"""Gradient accumulation: K microbatches == one K·B batch, exactly.

The accumulating step (train/finetune.py:_make_accum_train_step) exists to
scale effective batch past the dev environment's remote-compile limit
(WavLM-Large backward graphs 500 at batch >= 32 — DESIGN.md §6b). Its
correctness contract is strict equality with the big-batch step: summed
un-normalized grads (heads.weighted_xent_sums) normalized once by total
weight mass ARE the big-batch weighted-mean gradient.
"""

import dataclasses

import jax
import numpy as np
import pytest

from stutter_tpu.models import WavLMConfig
from stutter_tpu.train.finetune import FinetuneConfig, FinetuneTrainer


def _cfg():
    # deterministic forward: no SpecAugment, no head dropout — the accum
    # path draws per-microbatch rng keys, so stochastic layers would differ
    # from the big batch by design
    model = dataclasses.replace(WavLMConfig.tiny(32, 2, 4), apply_spec_augment=False)
    return FinetuneConfig(model=model, n_classes=3, head_hidden=(16,),
                          head_dropout=0.0, activation_dtype=jax.numpy.float32)


def _batch(rng, b, n=3200):
    waves = (rng.randn(b, n) * 0.1).astype(np.float32)
    lengths = np.full((b,), n, np.int32)
    labels = rng.randint(0, 3, size=b).astype(np.int32)
    valid = np.ones((b,), np.float32)
    return waves, lengths, labels, valid


def _tree_allclose(a, b, atol):
    flat_a, _ = jax.tree.flatten(a)
    flat_b, _ = jax.tree.flatten(b)
    for x, y in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=atol)


def test_grad_accum_matches_big_batch(rng):
    cfg = _cfg()
    cw = np.array([1.0, 2.0, 0.5], np.float32)
    mb1, mb2 = _batch(rng, 4), _batch(rng, 4)
    big = tuple(np.concatenate([a, b]) for a, b in zip(mb1, mb2))

    accum = FinetuneTrainer(cfg, grad_accum=2)
    ref = FinetuneTrainer(cfg)
    # identical init by construction (same cfg.seed)
    _tree_allclose(accum.params, ref.params, atol=0)

    aux_a = accum.step_accum([mb1, mb2], cw)
    aux_r = ref.step(big[0], big[1], big[2], cw, valid=big[3])

    assert np.isfinite(aux_a["loss"])
    np.testing.assert_allclose(aux_a["loss"], aux_r["loss"], atol=1e-5)
    np.testing.assert_allclose(aux_a["accuracy"], aux_r["accuracy"], atol=1e-6)
    # one adamw update from identical grads -> identical params (fp-sum
    # reassociation between the scan and the fused batch is the only slack)
    _tree_allclose(accum.params, ref.params, atol=5e-5)


def test_grad_accum_short_group_pads_as_noop(rng):
    """A short group (len < K) padded with valid=0 repeats == exact K'=len accum."""
    cfg = _cfg()
    cw = np.ones((3,), np.float32)
    mb1, mb2 = _batch(rng, 4), _batch(rng, 4)

    padded = FinetuneTrainer(cfg, grad_accum=3)
    exact = FinetuneTrainer(cfg, grad_accum=2)

    aux_p = padded.step_accum([mb1, mb2], cw)  # internally padded to K=3
    aux_e = exact.step_accum([mb1, mb2], cw)

    np.testing.assert_allclose(aux_p["loss"], aux_e["loss"], atol=1e-5)
    _tree_allclose(padded.params, exact.params, atol=5e-5)


@pytest.mark.parametrize("int8", [False, True], ids=["bf16", "int8_forward"])
def test_grad_accum_dp_mesh_matches_unsharded(rng, int8):
    """[K, B] stacks DP-sharded on axis 1 == the unsharded accumulation.

    dp=2 keeps the collective at 2 participants with a tiny per-device
    program (the XLA:CPU rendezvous spin-wait constraint — CLAUDE.md).
    int8_forward rides the same check: qdot_ste is pure jnp
    (quantize/dot/dequant + custom VJP), so GSPMD shards it like any dense
    op — this pins that the int8 training step stays mesh-compatible
    (unlike the pallas attention kernels, which the trainer auto-disables
    under a mesh)."""
    import jax

    from stutter_tpu.parallel.mesh import make_mesh

    cfg = dataclasses.replace(_cfg(), int8_forward=int8)
    cw = np.ones((3,), np.float32)
    mb1, mb2 = _batch(rng, 4), _batch(rng, 4)

    sharded = FinetuneTrainer(cfg, mesh=make_mesh(jax.devices()[:2], data=2),
                              grad_accum=2)
    local = FinetuneTrainer(cfg, grad_accum=2)

    aux_s = sharded.step_accum([mb1, mb2], cw)
    aux_l = local.step_accum([mb1, mb2], cw)
    assert np.isfinite(aux_s["loss"])
    np.testing.assert_allclose(aux_s["loss"], aux_l["loss"], atol=1e-5)
    _tree_allclose(sharded.params, local.params, atol=5e-5)


def test_grad_accum_rejects_oversized_group(rng):
    cfg = _cfg()
    t = FinetuneTrainer(cfg, grad_accum=2)
    mbs = [_batch(rng, 4)] * 3
    with pytest.raises(AssertionError):
        t.step_accum(mbs, np.ones((3,), np.float32))


def test_frozen_backbone_prunes_backbone_grads(rng):
    """freeze_backbone stops gradients structurally (train/finetune.py):
    backbone grads are exactly zero, while head/layer-weight grads equal the
    unfrozen step's (the freeze must not change forward numerics)."""
    import jax.numpy as jnp

    from stutter_tpu.train.finetune import finetune_forward
    from stutter_tpu.train.heads import weighted_softmax_xent

    cw = np.ones((3,), np.float32)
    waves, lengths, labels, valid = _batch(rng, 4)
    cfg_frozen = dataclasses.replace(_cfg(), freeze_backbone=True)
    cfg_open = _cfg()
    params = FinetuneTrainer(cfg_open).params

    def loss_for(cfg):
        def loss_fn(p):
            logits = finetune_forward(p, jnp.asarray(waves), jnp.asarray(lengths),
                                      cfg, train=True, rng=jax.random.key(0))
            return weighted_softmax_xent(logits, jnp.asarray(labels),
                                         jnp.asarray(cw), valid=jnp.asarray(valid))
        return jax.jit(jax.value_and_grad(loss_fn))

    loss_f, g_f = loss_for(cfg_frozen)(params)
    loss_o, g_o = loss_for(cfg_open)(params)

    np.testing.assert_allclose(float(loss_f), float(loss_o), atol=1e-6)
    # backbone grads: exactly zero under the structural freeze
    for leaf in jax.tree.leaves(g_f["backbone"]):
        assert float(np.abs(np.asarray(leaf)).max()) == 0.0
    # head + layer-weight grads identical (hidden states are the same values)
    _tree_allclose(g_f["head"], g_o["head"], atol=1e-6)
    _tree_allclose(g_f["layer_weights"], g_o["layer_weights"], atol=1e-6)
    # and the open step's backbone grads are NOT all zero (the freeze is real)
    assert any(float(np.abs(np.asarray(l)).max()) > 0
               for l in jax.tree.leaves(g_o["backbone"]))


