"""Attention dispatch: Pallas flash kernel on TPU, einsum reference elsewhere.

At Whisper-encoder scale (L=1500, 32 layers) the einsum path materializes
[B, H, L, L] score/probability tensors several times per layer — pure HBM
traffic, since the matmul FLOPs are tiny. The Pallas flash kernel
(jax.experimental.pallas.ops.tpu.flash_attention) streams K/V blocks through
VMEM with an online softmax, so the L x L matrices never touch HBM.

Sequence lengths are padded up to the kernel's block multiple and padded keys
masked via SegmentIds; padded query rows are garbage and sliced off (callers
always mask/pool over true lengths anyway).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def _flash_available() -> bool:
    if os.environ.get("STUTTER_TPU_NO_PALLAS", "").lower() in ("1", "true", "yes"):
        return False
    return jax.default_backend() == "tpu" or jax.default_backend() == "axon"


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _auto_block(L_max: int, with_bias: bool = False) -> int:
    """Block size: one single block whenever the padded sequence fits 1536.

    Measured on v5e at whisper-encoder shape (B=8, H=20, L=1500, d=64):
    a single 1536 block beats 512-blocking by ~7% end-to-end — the online-
    softmax rescale passes disappear and the [block_q, block_k] logits tile
    (1536^2 f32 = 9.4 MB) still fits the 16 MB scoped-VMEM stack.

    The BIAS variant cannot go that big: the f32 ab tile rides alongside the
    f32 logits tile, so 1536 needs ~18 MB scoped VMEM and the TPU compiler
    rejects it ("exceeded scoped vmem limit" — caught by a real serve-CLI
    run of a 30 s WavLM bucket). 512 keeps ab+logits at ~2 MB.

    Beyond 1536 the single-block win is gone and a 1536 block would PAD the
    sequence up to a 1536 multiple (L=2048 -> 3072: 2.25x the attention
    FLOPs) — fall back to 512 blocking there."""
    if with_bias:
        return 512
    padded = _round_up(L_max, 512)
    return padded if padded <= 1536 else 512


def flash_mha(
    q: jax.Array,  # [B, H, Lq, d] (pre-scaled)
    k: jax.Array,  # [B, H, Lk, d]
    v: jax.Array,  # [B, H, Lk, d]
    kv_valid: jax.Array | None = None,  # [B] true key counts (None = all)
    block: int | None = None,
) -> jax.Array:
    """Flash attention with sm_scale=1 and optional key-padding masking."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        SegmentIds,
        flash_attention,
    )

    B, H, Lq, d = q.shape
    Lk = k.shape[2]
    if block is None:
        block = _auto_block(max(Lq, Lk))
    Lq_p, Lk_p = _round_up(Lq, block), _round_up(Lk, block)

    def pad_seq(t, L_p):
        L = t.shape[2]
        if L == L_p:
            return t
        return jnp.pad(t, ((0, 0), (0, 0), (0, L_p - L), (0, 0)))

    qp, kp, vp = pad_seq(q, Lq_p), pad_seq(k, Lk_p), pad_seq(v, Lk_p)

    # segment ids: real tokens are segment 1, padding segment 0 (padding keys
    # then never match real queries)
    if kv_valid is None:
        kv_ids = (jnp.arange(Lk_p)[None, :] < Lk).astype(jnp.int32)
        kv_ids = jnp.broadcast_to(kv_ids, (B, Lk_p))
    else:
        kv_ids = (jnp.arange(Lk_p)[None, :] < kv_valid[:, None]).astype(jnp.int32)
    q_ids = jnp.ones((B, Lq_p), jnp.int32)

    bs = BlockSizes(
        block_q=min(block, Lq_p), block_k_major=min(block, Lk_p),
        block_k=min(block, Lk_p), block_b=1,
    )
    out = flash_attention(
        qp, kp, vp, segment_ids=SegmentIds(q=q_ids, kv=kv_ids),
        causal=False, sm_scale=1.0, block_sizes=bs,
    )
    return out[:, :, :Lq, :]


def flash_mha_bias(
    q: jax.Array,  # [B, H, L, d] (pre-scaled)
    k: jax.Array,
    v: jax.Array,
    ab: jax.Array,  # [B, H, L, L] f32 additive bias (mask folded in)
    block: int | None = None,
) -> jax.Array:
    """Flash attention with a materialized additive bias (WavLM gated
    relative-position bias). The bias is read once per block instead of the
    einsum path's multiple [L, L] round trips."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        flash_attention,
    )

    B, H, L, d = q.shape
    if block is None:
        block = _auto_block(L, with_bias=True)
    L_p = _round_up(L, block)
    if L_p != L:
        pad = L_p - L
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
        # padded keys masked for every query; padded queries produce garbage
        # rows that callers slice off
        ab = jnp.pad(ab, ((0, 0), (0, 0), (0, pad), (0, pad)),
                     constant_values=-1e9)
    bs = BlockSizes(
        block_q=min(block, L_p), block_k_major=min(block, L_p),
        block_k=min(block, L_p), block_b=1,
    )
    out = flash_attention(q, k, v, ab=ab, causal=False, sm_scale=1.0, block_sizes=bs)
    return out[:, :, :L, :]


def mha_self(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    kv_valid: jax.Array | None = None,
    precision=jax.lax.Precision.DEFAULT,
    allow_flash: bool = True,
) -> jax.Array:
    """Self/cross attention [B, H, Lq, d] x [B, H, Lk, d] -> [B, H, Lq, d].

    q must be pre-scaled. Dispatches to the flash kernel on TPU when the
    sequence is long enough to benefit; einsum elsewhere.
    """
    Lq, Lk = q.shape[2], k.shape[2]
    # flash needs BOTH axes long: short-query cases (the whisper decoder's
    # 1-token cross-attention) would pad Lq up to the block size and waste
    # ~500x the needed work — they stay on the einsum path. The kernel is
    # also gated on bf16 activations: the fidelity preset (f32 + HIGHEST)
    # must keep the einsum path it advertises and that the goldens test,
    # same as WavLM's dispatch (wavlm.py).
    if (
        allow_flash
        and _flash_available()
        and q.dtype == jnp.bfloat16
        and Lq >= 512 and Lk >= 512 and q.shape[-1] >= 64
    ):
        env_block = os.environ.get("STUTTER_TPU_FLASH_BLOCK")
        return flash_mha(q, k, v, kv_valid=kv_valid,
                         block=int(env_block) if env_block else None)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, precision=precision).astype(jnp.float32)
    if kv_valid is not None:
        mask = jnp.arange(Lk)[None, :] < kv_valid[:, None]
        logits = logits + jnp.where(mask, 0.0, -1e9)[:, None, None, :]
    attn = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", attn, v, precision=precision)
