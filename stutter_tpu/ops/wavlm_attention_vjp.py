"""Custom VJP for the long-bucket fused WavLM attention kernel.

``ops/wavlm_attention_pallas.wavlm_fused_attention_long`` is a raw
``pallas_call`` — no autodiff rule — so fine-tuning on >=12 s clips had to
fall back to the einsum path, which materializes the [B, H, L, L] f32
logits/bias/probs chain in HBM on BOTH the forward and the (remat re-run +
transpose) backward (VERDICT r3 missing #4). This module gives the kernel a
flash-attention-style backward that recomputes the probabilities per q-block
in VMEM, so the only [.., L, L]-shaped HBM resident in the whole fine-tune
step stays the batch-shared [H, L, L] position-bias table.

Math (per batch b, head h; q pre-scaled by the caller):

    p  = q @ k^T + gate[:, None] * bias + mask[None, :]
    a  = softmax_rows(p)
    out = a @ v

Backward, given d(out) = do (the standard softmax-attention VJP with the
row-sum trick D_i = sum_d do_id * out_id == sum_j a_ij da_ij):

    da = do @ v^T
    dp = a * (da - D[:, None])
    dq = dp @ k           dk = dp^T @ q         dv = a^T @ do
    dgate_i = sum_j dp_ij * bias_ij             (gate enters via gate*bias)
    dbias_ij = sum_b gate_bi * dp_bij           (bias is batch-shared)
    dmask = not needed (derived from lengths, non-differentiable)

Accumulations dictate the grids: dk/dv sum over q-blocks -> kernel 1 runs
grid (b, h, qb) with qb INNERMOST (Pallas TPU grids iterate sequentially, so
an output block whose index map ignores the innermost dims is revisited on
consecutive steps and can accumulate in place); dbias sums over the batch ->
kernel 2 runs grid (h, qb, b) with b innermost. Each kernel re-does the
s/softmax recompute, so the backward costs ~7 L^2 d-ish matmuls vs the
forward's 2 — the usual flash backward trade of MXU FLOPs (abundant here)
for the [B, H, L, L] HBM traffic that actually bounds this regime.

Gradient equivalence vs the einsum path is pinned by
tests/test_attention_vjp.py (interpret mode on CPU, real kernel on TPU).

Kernel guide: /opt/skills/guides/pallas_guide.md.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stutter_tpu.ops.wavlm_attention_pallas import wavlm_fused_attention_long

# Short-kernel BACKWARD batch block: 8, NOT the forward's 16. The backward
# holds ~6 [BB, L, L] f32 temporaries (s, p, e, a, da, dp) vs the forward's
# ~4, and BB=16 at L=160 overflows the 16 MB scoped VMEM — the remote compile
# service crashes opaquely (HTTP 500, tpu_compile_helper exit 1) instead of
# reporting the overflow; BB=8 compiles and runs (measured round 4).
SHORT_BWD_BATCH_BLOCK = 8


def _short_bwd_batch_block(batch: int) -> int:
    """Batch tile for the short backward kernel (1 when B isn't divisible)."""
    bb = SHORT_BWD_BATCH_BLOCK
    return bb if batch % bb == 0 else 1


def _bwd_dqkv_kernel(q_ref, k_ref, v_ref, bias_ref, gate_ref, mask_ref,
                     do_ref, dsum_ref,
                     dq_ref, dk_ref, dv_ref, dgate_ref):
    qb = pl.program_id(2)  # innermost: q-block index (dk/dv accumulate here)
    q = q_ref[0, 0]        # [BQ, d] bf16 (pre-scaled)
    k = k_ref[0, 0]        # [L, d]
    v = v_ref[0, 0]
    do = do_ref[0, 0]      # [BQ, d]
    # recompute the probability block exactly as the forward kernel did
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [BQ, L] f32
    bias = bias_ref[0]     # [BQ, L] f32
    p = s + gate_ref[0, 0] * bias + mask_ref[0, 0][None, :]
    p_max = jnp.max(p, axis=-1, keepdims=True)
    e = jnp.exp(p - p_max)
    a = e / jnp.sum(e, axis=-1, keepdims=True)  # [BQ, L] f32
    da = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [BQ, L] f32
    dp = a * (da - dsum_ref[0, 0])  # [BQ, L] f32 (dsum rides as [BQ, 1])
    dq_ref[0, 0] = jax.lax.dot_general(
        dp.astype(k.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dq_ref.dtype)
    dgate_ref[0, 0] = jnp.sum(dp * bias, axis=-1, keepdims=True).astype(
        dgate_ref.dtype)
    dk_blk = jax.lax.dot_general(
        dp.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [L, d] f32
    dv_blk = jax.lax.dot_general(
        a.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(qb == 0)
    def _init():
        dk_ref[0, 0] = dk_blk.astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_blk.astype(dv_ref.dtype)

    @pl.when(qb != 0)
    def _acc():
        dk_ref[0, 0] += dk_blk.astype(dk_ref.dtype)
        dv_ref[0, 0] += dv_blk.astype(dv_ref.dtype)


def _bwd_dbias_kernel(q_ref, k_ref, v_ref, bias_ref, gate_ref, mask_ref,
                      do_ref, dsum_ref, dbias_ref):
    b = pl.program_id(2)  # innermost: batch index (dbias accumulates here)
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    do = do_ref[0, 0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    gate = gate_ref[0, 0]  # [BQ, 1] f32
    p = s + gate * bias_ref[0] + mask_ref[0, 0][None, :]
    p_max = jnp.max(p, axis=-1, keepdims=True)
    e = jnp.exp(p - p_max)
    a = e / jnp.sum(e, axis=-1, keepdims=True)
    da = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    dp = a * (da - dsum_ref[0, 0])
    db_blk = gate * dp  # [BQ, L] f32

    @pl.when(b == 0)
    def _init():
        dbias_ref[0] = db_blk

    @pl.when(b != 0)
    def _acc():
        dbias_ref[0] += db_blk


def _bwd_short_kernel(q_ref, k_ref, v_ref, bias_ref, gate_ref, mask_ref,
                      do_ref, dsum_ref,
                      dq_ref, dk_ref, dv_ref, dgate_ref, dbias_ref):
    bblk = pl.program_id(1)  # innermost: batch-block (dbias accumulates here)
    q = q_ref[:, 0]   # [BB, L, d]
    k = k_ref[:, 0]
    v = v_ref[:, 0]
    do = do_ref[:, 0]
    bias = bias_ref[0]  # [L, L] f32 (batch-shared, per head)
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # [BB, L, L]
    gate = gate_ref[:, 0]  # [BB, L, 1]
    p = s + gate * bias[None] + mask_ref[:, 0][:, None, :]
    p_max = jnp.max(p, axis=-1, keepdims=True)
    e = jnp.exp(p - p_max)
    a = e / jnp.sum(e, axis=-1, keepdims=True)
    da = jax.lax.dot_general(
        do, v, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    dp = a * (da - dsum_ref[:, 0])  # [BB, L, L] f32
    dpc = dp.astype(q.dtype)
    dq_ref[:, 0] = jax.lax.dot_general(
        dpc, k, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ).astype(dq_ref.dtype)
    dk_ref[:, 0] = jax.lax.dot_general(
        dpc, q, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ).astype(dk_ref.dtype)
    dv_ref[:, 0] = jax.lax.dot_general(
        a.astype(do.dtype), do, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(dv_ref.dtype)
    dgate_ref[:, 0] = jnp.sum(dp * bias[None], axis=-1, keepdims=True).astype(
        dgate_ref.dtype)
    db_blk = jnp.sum(gate * dp, axis=0)  # [L, L]

    @pl.when(bblk == 0)
    def _init():
        dbias_ref[0] = db_blk

    @pl.when(bblk != 0)
    def _acc():
        dbias_ref[0] += db_blk


def _attention_short_fwd(q, k, v, position_bias, gate, key_mask_bias,
                         interpret):
    from stutter_tpu.ops.wavlm_attention_pallas import wavlm_fused_attention

    out = wavlm_fused_attention(q, k, v, position_bias, gate, key_mask_bias,
                                interpret=interpret)
    return out, (q, k, v, position_bias, gate, key_mask_bias, out)


def _attention_short_bwd(interpret, res, do):
    q, k, v, position_bias, gate, key_mask_bias, out = res
    B, H, L, d = q.shape
    BB = _short_bwd_batch_block(B)  # see SHORT_BWD_BATCH_BLOCK note above
    dsum = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1,
                   keepdims=True)
    gate4 = gate[..., None]
    mask3 = key_mask_bias[:, None, :]
    pb = position_bias.astype(jnp.float32)
    qkv_spec = pl.BlockSpec((BB, 1, L, d), lambda h, b: (b, h, 0, 0),
                            memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((BB, 1, L, 1), lambda h, b: (b, h, 0, 0),
                            memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((1, L, L), lambda h, b: (h, 0, 0),
                             memory_space=pltpu.VMEM)
    dq, dk, dv, dgate4, dbias = pl.pallas_call(
        _bwd_short_kernel,
        grid=(H, B // BB),  # b innermost -> the dbias block accumulates
        in_specs=[
            qkv_spec, qkv_spec, qkv_spec, bias_spec, vec_spec,
            pl.BlockSpec((BB, 1, L), lambda h, b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            qkv_spec, vec_spec,
        ],
        out_specs=[qkv_spec, qkv_spec, qkv_spec, vec_spec, bias_spec],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, L, d), q.dtype),
            jax.ShapeDtypeStruct((B, H, L, d), k.dtype),
            jax.ShapeDtypeStruct((B, H, L, d), v.dtype),
            jax.ShapeDtypeStruct((B, H, L, 1), jnp.float32),
            jax.ShapeDtypeStruct((H, L, L), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v, pb, gate4, mask3, do, dsum)
    return (dq, dk, dv, dbias.astype(position_bias.dtype),
            dgate4[..., 0].astype(gate.dtype), None)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def _attention_short_diff(q, k, v, position_bias, gate, key_mask_bias,
                          interpret):
    from stutter_tpu.ops.wavlm_attention_pallas import wavlm_fused_attention

    return wavlm_fused_attention(q, k, v, position_bias, gate, key_mask_bias,
                                 interpret=interpret)


_attention_short_diff.defvjp(_attention_short_fwd, _attention_short_bwd)


def wavlm_attention_short_diff(
    q: jax.Array,  # [B, H, L, d] (pre-scaled)
    k: jax.Array,
    v: jax.Array,
    position_bias: jax.Array,  # [H, L, L] f32 (shared across batch)
    gate: jax.Array,  # [B, H, L] f32
    key_mask_bias: jax.Array,  # [B, L] f32 (0 valid / -1e9 pad)
    interpret: bool = False,
) -> jax.Array:
    """Differentiable short-bucket gated-bias attention (fused fwd+bwd).

    Same contract as ``wavlm_fused_attention``; one backward kernel over the
    (head, batch-block) grid — every intermediate ([BB, L, L] probs chain)
    stays in VMEM, so under per-layer remat a training step's attention
    writes only q/k/v/out-sized tensors to HBM. Off-default for training
    until the end-to-end A/B (scripts/bench_finetune.py) decides.
    """
    return _attention_short_diff(q, k, v, position_bias, gate, key_mask_bias,
                                 interpret)


def _attention_long_fwd(q, k, v, position_bias, gate, key_mask_bias,
                        block_q, interpret, exp_dtype):
    out = wavlm_fused_attention_long(
        q, k, v, position_bias, gate, key_mask_bias,
        block_q=block_q, interpret=interpret, exp_dtype=exp_dtype,
    )
    return out, (q, k, v, position_bias, gate, key_mask_bias, out)


def _attention_long_bwd(block_q, interpret, exp_dtype, res, do):
    # exp_dtype applies to the FORWARD kernel only: the backward recompute
    # keeps its f32 softmax — the bf16 exp's ~0.4% prob rounding is far
    # below gradient noise, and sharing one backward program across both
    # forward variants keeps the compile-cache footprint halved
    del exp_dtype
    q, k, v, position_bias, gate, key_mask_bias, out = res
    B, H, L, d = q.shape
    # the backward kernels hold ~3 extra [BQ, L] f32 tiles (a, da, dp) vs the
    # forward's ~2, so halve the q-block to stay inside scoped VMEM (the
    # forward's 512 tile at L=1536 already sits near the 16 MB ceiling)
    BQ = min(block_q, 256)
    while L % BQ:  # forward asserts L % block_q == 0; mirror for the halved BQ
        BQ //= 2
    grid_sizes = (B, H, L // BQ)
    # row-sum trick: D = sum_d do * out, computed as one cheap XLA reduction
    # outside the kernels; rides in as a [B, H, L, 1] block operand
    dsum = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1,
                   keepdims=True)
    gate4 = gate[..., None]
    mask3 = key_mask_bias[:, None, :]
    pb = position_bias.astype(jnp.float32)

    def q_spec(order):  # [*, BQ, d] blocks of a [B, H, L, d] operand
        return pl.BlockSpec((1, 1, BQ, d), order, memory_space=pltpu.VMEM)

    def kv_spec(order):
        return pl.BlockSpec((1, 1, L, d), order, memory_space=pltpu.VMEM)

    # kernel 1: grid (b, h, qb), qb innermost -> dk/dv accumulate in place
    bhq = lambda b, h, qb: (b, h, qb, 0)
    bh0 = lambda b, h, qb: (b, h, 0, 0)
    dq, dk, dv, dgate4 = pl.pallas_call(
        _bwd_dqkv_kernel,
        grid=grid_sizes,
        in_specs=[
            q_spec(bhq), kv_spec(bh0), kv_spec(bh0),
            pl.BlockSpec((1, BQ, L), lambda b, h, qb: (h, qb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, BQ, 1), bhq, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, L), lambda b, h, qb: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            q_spec(bhq),
            pl.BlockSpec((1, 1, BQ, 1), bhq, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            q_spec(bhq), kv_spec(bh0), kv_spec(bh0),
            pl.BlockSpec((1, 1, BQ, 1), bhq, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, L, d), q.dtype),
            jax.ShapeDtypeStruct((B, H, L, d), jnp.float32),
            jax.ShapeDtypeStruct((B, H, L, d), jnp.float32),
            jax.ShapeDtypeStruct((B, H, L, 1), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v, pb, gate4, mask3, do, dsum)

    # kernel 2: grid (h, qb, b), b innermost -> batch-shared dbias accumulates
    hqb = lambda h, qb, b: (b, h, qb, 0)
    hb0 = lambda h, qb, b: (b, h, 0, 0)
    dbias = pl.pallas_call(
        _bwd_dbias_kernel,
        grid=(H, L // BQ, B),
        in_specs=[
            pl.BlockSpec((1, 1, BQ, d), hqb, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, L, d), hb0, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, L, d), hb0, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BQ, L), lambda h, qb, b: (h, qb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, BQ, 1), hqb, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, L), lambda h, qb, b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, BQ, d), hqb, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, BQ, 1), hqb, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BQ, L), lambda h, qb, b: (h, qb, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, L, L), jnp.float32),
        interpret=interpret,
    )(q, k, v, pb, gate4, mask3, do, dsum)

    dgate = dgate4[..., 0].astype(gate.dtype)
    return (dq, dk.astype(k.dtype), dv.astype(v.dtype),
            dbias.astype(position_bias.dtype), dgate, None)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def _attention_long_diff(q, k, v, position_bias, gate, key_mask_bias,
                         block_q, interpret, exp_dtype):
    return wavlm_fused_attention_long(
        q, k, v, position_bias, gate, key_mask_bias,
        block_q=block_q, interpret=interpret, exp_dtype=exp_dtype,
    )


_attention_long_diff.defvjp(_attention_long_fwd, _attention_long_bwd)


def wavlm_attention_long_diff(
    q: jax.Array,  # [B, H, L, d] (pre-scaled)
    k: jax.Array,
    v: jax.Array,
    position_bias: jax.Array,  # [H, L, L] f32 (shared across batch)
    gate: jax.Array,  # [B, H, L] f32
    key_mask_bias: jax.Array,  # [B, L] f32 (0 valid / -1e9 pad)
    block_q: int = 256,
    interpret: bool = False,
    exp_dtype=None,
) -> jax.Array:
    """Differentiable long-bucket gated-bias attention (fused Pallas fwd+bwd).

    Same contract as ``wavlm_fused_attention_long``; safe under ``jax.grad``
    and ``jax.checkpoint``. ``key_mask_bias`` gets no gradient (lengths).
    ``exp_dtype`` (default f32) sets the forward softmax's exp/divide dtype;
    the backward recompute always uses f32 (see _attention_long_bwd).
    """
    import jax.numpy as _jnp

    return _attention_long_diff(q, k, v, position_bias, gate, key_mask_bias,
                                block_q, interpret,
                                exp_dtype or _jnp.float32)
