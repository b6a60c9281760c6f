"""Fused Pallas kernel for WavLM's gated relative-position-bias attention.

For short buckets (the 3 s stutter-clip workload, L~144) the XLA einsum path
is memory-bound on the [B, H, L, L] float32 logits: the gated bias is
materialized, added, softmaxed and re-read — several full HBM round trips per
layer. This kernel runs one (batch, head) tile entirely in VMEM:

    s   = q @ k^T            (MXU, f32 accumulate; q pre-scaled)
    p   = s + gate * bias_h + key_mask      (VPU, f32)
    a   = softmax_rows(p)                   (VPU, f32)
    out = a @ v              (MXU)

Only q/k/v/out ([L, d] tiles) and the per-head shared bias ([L, L], identical
for the whole batch) cross HBM; the batch-dependent [B, H, L, L] tensor never
exists. The gate (WavLM's GRU-style per-token scalar) and the key-padding
mask are tiny [L] vectors applied in-kernel.

Kernel guide: /opt/skills/guides/pallas_guide.md.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, gate_ref, mask_ref, out_ref):
    q = q_ref[:, 0]  # [BB, L, d] bf16 (pre-scaled)
    k = k_ref[:, 0]
    v = v_ref[:, 0]
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # [BB, L, L] f32
    gate = gate_ref[:, 0]  # [BB, L, 1] f32
    p = s + gate * bias_ref[0][None] + mask_ref[:, 0][:, None, :]
    p_max = jnp.max(p, axis=-1, keepdims=True)
    e = jnp.exp(p - p_max)
    a = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(v.dtype)
    out = jax.lax.dot_general(
        a, v, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    out_ref[:, 0] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def wavlm_fused_attention(
    q: jax.Array,  # [B, H, L, d] (pre-scaled)
    k: jax.Array,
    v: jax.Array,
    position_bias: jax.Array,  # [H, L, L] f32 (shared across batch)
    gate: jax.Array,  # [B, H, L] f32
    key_mask_bias: jax.Array,  # [B, L] f32 (0 valid / -1e9 pad)
    interpret: bool = False,
) -> jax.Array:
    B, H, L, d = q.shape
    # block up to 16 clips per step (amortizes per-step pipeline overhead);
    # grid (H, B-blocks) keeps the per-head bias block constant along the
    # inner loop so it is fetched once per head
    BB = 16 if B % 16 == 0 else (8 if B % 8 == 0 else 1)
    grid = (H, B // BB)
    qkv_spec = pl.BlockSpec((BB, 1, L, d), lambda h, b: (b, h, 0, 0),
                            memory_space=pltpu.VMEM)
    # tiling rule: a block's last two dims must be (8, 128)-aligned or span
    # the full array dim — so gate rides as [B, H, L, 1], mask as [B, 1, L]
    gate4 = gate[..., None]
    mask3 = key_mask_bias[:, None, :]
    return pl.pallas_call(
        _attn_kernel,
        grid=grid,
        in_specs=[
            qkv_spec,
            qkv_spec,
            qkv_spec,
            pl.BlockSpec((1, L, L), lambda h, b: (h, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, 1, L, 1), lambda h, b: (b, h, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, 1, L), lambda h, b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, L, d), q.dtype),
        interpret=interpret,
    )(q, k, v, position_bias, gate4, mask3)


# ---------------------------------------------------------------------------
# Long-sequence variant: q-blocked, full-key rows, bias computed in-kernel
# ---------------------------------------------------------------------------


def _attn_long_kernel(q_ref, k_ref, v_ref, bias_ref, gate_ref, mask_ref, out_ref,
                      *, exp_dtype=jnp.float32):
    q = q_ref[0, 0]  # [BQ, d] bf16 (pre-scaled)
    k = k_ref[0, 0]  # [L, d]
    v = v_ref[0, 0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [BQ, L] f32
    p = s + gate_ref[0, 0] * bias_ref[0] + mask_ref[0, 0][None, :]
    p_max = jnp.max(p, axis=-1, keepdims=True)
    # exp_dtype=bfloat16: the exp + divide run at the VPU's bf16 rate; the
    # max-subtraction keeps the argument in [-inf, 0] where bf16's relative
    # step (~0.8%) perturbs probs far below the 1e-3 fidelity bar, and the
    # row sum accumulates in f32 (the L~1500 sum would lose bf16 precision)
    e = jnp.exp((p - p_max).astype(exp_dtype))
    r = jnp.sum(e, axis=-1, keepdims=True, dtype=jnp.float32)
    a = (e * (1.0 / r).astype(exp_dtype)).astype(v.dtype)
    out_ref[0, 0] = jax.lax.dot_general(
        a, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "interpret", "exp_dtype"))
def wavlm_fused_attention_long(
    q: jax.Array,  # [B, H, L, d] (pre-scaled)
    k: jax.Array,
    v: jax.Array,
    position_bias: jax.Array,  # [H, L, L] f32 (shared across batch)
    gate: jax.Array,  # [B, H, L] f32
    key_mask_bias: jax.Array,  # [B, L] f32 (0 valid / -1e9 pad)
    block_q: int = 256,
    interpret: bool = False,
    exp_dtype=jnp.float32,
) -> jax.Array:
    """Long-bucket (L >= ~512) gated-bias attention without the [B, H, L, L]
    HBM tensor.

    The flash-ab path must MATERIALIZE the gated bias as a full [B, H, L, L]
    f32 array (~1.7 GB/layer at B=12, L=1504) because the stock kernel takes
    ab as an input; that write+read dominates long-bucket time. Here each
    grid step computes one q-block's full key row in VMEM:

        s[BQ, L] = q_blk @ k^T;  p = s + gate_blk * bias_blk + mask
        out_blk  = softmax_rows(p) @ v          (exact, no online rescale)

    and the gate product happens in-kernel, so only q/k/v/out and the
    BATCH-SHARED [H, L, L] bias cross HBM. Grid order (h, q_blk, b) keeps
    the bias block index constant along the inner batch loop — Pallas skips
    the re-fetch, so the bias is read once per (head, q-block), not once
    per batch element. VMEM per step ~4 MB at BQ=256, L=1536.
    """
    B, H, L, d = q.shape
    assert L % block_q == 0, (L, block_q)
    grid = (H, L // block_q, B)
    q_spec = pl.BlockSpec((1, 1, block_q, d), lambda h, qb, b: (b, h, qb, 0),
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, 1, L, d), lambda h, qb, b: (b, h, 0, 0),
                           memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_attn_long_kernel, exp_dtype=exp_dtype),
        grid=grid,
        in_specs=[
            q_spec,
            kv_spec,
            kv_spec,
            pl.BlockSpec((1, block_q, L), lambda h, qb, b: (h, qb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q, 1), lambda h, qb, b: (b, h, qb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, L), lambda h, qb, b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, L, d), q.dtype),
        interpret=interpret,
    )(q, k, v, position_bias, gate[..., None], key_mask_bias[:, None, :])
