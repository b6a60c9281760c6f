"""Gradient equivalence of the fused long-attention custom VJP.

Pins ops/wavlm_attention_vjp against a pure-jnp reference of the same math
(the einsum path's numerics) — value AND all five gradients (q, k, v,
position_bias, gate). Interpret mode on CPU; the real-TPU kernel is driven
by scripts/bench_finetune.py and the long-bucket fine-tune path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stutter_tpu.ops.wavlm_attention_vjp import wavlm_attention_long_diff


def _reference(q, k, v, pb, gate, mask):
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        precision=jax.lax.Precision.HIGHEST)
    logits = logits + gate[..., None] * pb[None] + mask[:, None, None, :]
    attn = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", attn, v,
                      precision=jax.lax.Precision.HIGHEST)


def _rand_inputs(B=2, H=2, L=256, d=64, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((B, H, L, d)), jnp.float32) * 0.3
    k = jnp.asarray(rng.standard_normal((B, H, L, d)), jnp.float32) * 0.3
    v = jnp.asarray(rng.standard_normal((B, H, L, d)), jnp.float32)
    pb = jnp.asarray(rng.standard_normal((H, L, L)), jnp.float32)
    gate = jnp.asarray(rng.uniform(0.5, 2.0, (B, H, L)), jnp.float32)
    mask = np.zeros((B, L), np.float32)
    mask[0, L - 37:] = -1e9  # one partially padded row
    return q, k, v, pb, gate, jnp.asarray(mask)


def test_forward_matches_reference():
    args = _rand_inputs()
    out = wavlm_attention_long_diff(*args, block_q=128, interpret=True)
    ref = _reference(*args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_gradients_match_reference():
    args = _rand_inputs(seed=1)
    cot = jnp.asarray(
        np.random.default_rng(9).standard_normal(args[0].shape), jnp.float32)

    def loss_fused(q, k, v, pb, gate, mask):
        out = wavlm_attention_long_diff(q, k, v, pb, gate, mask,
                                        block_q=128, interpret=True)
        return jnp.sum(out * cot)

    def loss_ref(q, k, v, pb, gate, mask):
        return jnp.sum(_reference(q, k, v, pb, gate, mask) * cot)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(*args)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(*args)
    for name, a, b in zip("q k v pb gate".split(), g_fused, g_ref):
        a, b = np.asarray(a), np.asarray(b)
        denom = max(1e-6, float(np.abs(b).max()))
        np.testing.assert_allclose(a, b, rtol=3e-5, atol=3e-5 * denom,
                                   err_msg=f"grad mismatch: {name}")


def test_short_variant_gradients_match_reference():
    from stutter_tpu.ops.wavlm_attention_vjp import wavlm_attention_short_diff

    # B=4 -> BB=1 batch blocks; L=128 spans full rows like the real kernel
    args = _rand_inputs(B=4, H=2, L=128, d=64, seed=5)
    cot = jnp.asarray(
        np.random.default_rng(7).standard_normal(args[0].shape), jnp.float32)

    def loss_fused(q, k, v, pb, gate, mask):
        out = wavlm_attention_short_diff(q, k, v, pb, gate, mask,
                                         interpret=True)
        return jnp.sum(out * cot)

    def loss_ref(q, k, v, pb, gate, mask):
        return jnp.sum(_reference(q, k, v, pb, gate, mask) * cot)

    np.testing.assert_allclose(
        float(loss_fused(*args)), float(loss_ref(*args)), rtol=2e-5)
    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(*args)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(*args)
    for name, a, b in zip("q k v pb gate".split(), g_fused, g_ref):
        a, b = np.asarray(a), np.asarray(b)
        denom = max(1e-6, float(np.abs(b).max()))
        np.testing.assert_allclose(a, b, rtol=3e-5, atol=3e-5 * denom,
                                   err_msg=f"grad mismatch (short): {name}")


def test_short_variant_batch_blocked_accumulation():
    # B=16 -> BB=16 single block; B=8 -> BB=8; B=2 -> BB=1 x 2 grid steps,
    # which exercises the dbias in-place accumulation across batch blocks
    from stutter_tpu.ops.wavlm_attention_vjp import wavlm_attention_short_diff

    args = _rand_inputs(B=2, H=2, L=128, d=64, seed=6)
    cot = jnp.asarray(
        np.random.default_rng(8).standard_normal(args[0].shape), jnp.float32)

    g_pb = jax.grad(
        lambda pb: jnp.sum(wavlm_attention_short_diff(
            args[0], args[1], args[2], pb, args[4], args[5],
            interpret=True) * cot))(args[3])
    g_pb_ref = jax.grad(
        lambda pb: jnp.sum(_reference(
            args[0], args[1], args[2], pb, args[4], args[5]) * cot))(args[3])
    a, b = np.asarray(g_pb), np.asarray(g_pb_ref)
    np.testing.assert_allclose(a, b, rtol=3e-5,
                               atol=3e-5 * float(np.abs(b).max()))


def test_gradients_under_checkpoint_and_uneven_block():
    # L=384 forces the backward's block halving (384 % 256 != 0 -> BQ=128)
    # and jax.checkpoint exercises the remat path fine-tuning uses.
    args = _rand_inputs(B=1, H=2, L=384, d=64, seed=2)
    cot = jnp.asarray(
        np.random.default_rng(3).standard_normal(args[0].shape), jnp.float32)

    @jax.checkpoint
    def loss_fused(q, k, v, pb, gate, mask):
        out = wavlm_attention_long_diff(q, k, v, pb, gate, mask,
                                        block_q=384, interpret=True)
        return jnp.sum(out * cot)

    def loss_ref(q, k, v, pb, gate, mask):
        return jnp.sum(_reference(q, k, v, pb, gate, mask) * cot)

    g_fused = jax.grad(loss_fused, argnums=(0, 3, 4))(*args)
    g_ref = jax.grad(loss_ref, argnums=(0, 3, 4))(*args)
    for name, a, b in zip("q pb gate".split(), g_fused, g_ref):
        a, b = np.asarray(a), np.asarray(b)
        denom = max(1e-6, float(np.abs(b).max()))
        np.testing.assert_allclose(a, b, rtol=3e-5, atol=3e-5 * denom,
                                   err_msg=f"grad mismatch: {name}")


def test_exp_dtype_bf16_forward_close():
    """The off-default bf16-exp forward (measured-negative perf knob, kept
    for other hardware) must stay numerically close to the f32 softmax."""
    args = _rand_inputs()
    out32 = wavlm_attention_long_diff(*args, block_q=128, interpret=True)
    out16 = wavlm_attention_long_diff(*args, block_q=128, interpret=True,
                                      exp_dtype=jnp.bfloat16)
    a = np.asarray(out16, np.float64).reshape(-1)
    b = np.asarray(out32, np.float64).reshape(-1)
    cos = 1 - a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cos < 1e-4, cos


def test_short_backward_block_is_vmem_safe():
    """Regression: the short BACKWARD kernel must tile the batch at BB=8,
    not the forward's 16 — its ~6 [BB, L, L] f32 temporaries overflow the
    16 MB scoped VMEM at BB=16/L=160 and the remote compile service crashes
    opaquely (round 4, DESIGN.md §10). Checks the exposed block-choice
    helper AND that the backward actually routes through it — checking the
    helper alone would let a refactor hardcode BB=16 at the call site and
    still pass (round-5 self-review)."""
    import inspect

    from stutter_tpu.ops import wavlm_attention_vjp as m

    assert m.SHORT_BWD_BATCH_BLOCK <= 8
    assert m._short_bwd_batch_block(16) == m.SHORT_BWD_BATCH_BLOCK
    assert m._short_bwd_batch_block(8) == m.SHORT_BWD_BATCH_BLOCK
    # non-divisible batches fall back to per-item tiling, never the forward's 16
    assert m._short_bwd_batch_block(6) == 1
    # call-site pin: the backward must take its block from the helper
    assert "_short_bwd_batch_block(" in inspect.getsource(m._attention_short_bwd)
