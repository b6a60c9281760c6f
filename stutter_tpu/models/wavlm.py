"""WavLM in functional JAX, redesigned for TPU execution.

Behavior parity target (verified by golden tests vs HF torch): the model the
reference calls at ``WavLM_embeddings.py:303-307`` with
``output_hidden_states=True`` — HF ``modeling_wavlm.py``:

- conv feature encoder, 7 Conv1d stages (dims 512, strides 5,2,2,2,2,2,2,
  kernels 10,3,3,3,3,2,2 -> 49 Hz frames), group-norm-first ("group") or
  layer-norm-per-conv ("layer") variants (``modeling_wavlm.py:682-789``)
- feature projection LN -> Linear(512 -> H) (``:93-105``)
- convolutional positional embedding k=128, 16 groups, weight-normed, SamePad
  (``:37-91``)
- gated relative-position-bias attention: T5-style log-bucket bias
  (num_buckets=320, max_distance=800, ``:243-271``) embedded only in layer 0
  and threaded through all layers (``:384,410-430``); GRU-style per-token gate
  ``gate_a * (gate_b * const - 1) + 2`` from an 8-dim head projection summed
  2x4 (``:165-180``)
- post-LN encoder layer (``:298-336``) vs pre-LN "stable" layer (``:339-373``,
  wavlm-large) selected by ``do_stable_layer_norm``

TPU-first design decisions (not a port):
- pure functions over a param pytree; per-layer params are STACKED along a
  leading axis and the encoder runs as one ``lax.scan`` — one compiled layer
  body instead of 24 unrolled blocks, with hidden states collected as scan
  outputs (the reference materializes a 25-tuple of torch tensors)
- the relative-position bucket matrix is a compile-time numpy constant per
  sequence length; the [H, L, L] bias is computed once per forward and
  broadcast, mirroring HF's layer-0-then-thread structure but without any
  cross-layer Python state
- everything is static-shaped and mask-driven so variable-length clips batch
  into padded length buckets without retraces
- matmul precision and activation dtype are explicit knobs: fidelity preset
  (f32 + HIGHEST) holds the <=1e-3 cosine bar; fast preset (bf16 activations,
  f32 accumulation/LN/softmax) feeds the MXU at full rate for the benchmark
"""

from __future__ import annotations

import dataclasses
import functools
import math
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

Params = dict[str, Any]


@dataclasses.dataclass(frozen=True)
class WavLMConfig:
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    conv_dim: tuple[int, ...] = (512, 512, 512, 512, 512, 512, 512)
    conv_stride: tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    conv_kernel: tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    conv_bias: bool = False
    feat_extract_norm: str = "group"  # "group" (base) | "layer" (large)
    do_stable_layer_norm: bool = False
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    num_buckets: int = 320
    max_bucket_distance: int = 800
    layer_norm_eps: float = 1e-5
    # frontend policy (HF preprocessor_config.json per checkpoint)
    do_normalize: bool = False
    # SpecAugment (training only; HF modeling_wavlm.py:1004-1048)
    apply_spec_augment: bool = True
    mask_time_prob: float = 0.05
    mask_time_length: int = 10
    mask_feature_prob: float = 0.0
    mask_feature_length: int = 10

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def stem_geometry(self) -> tuple[int, int]:
        """(receptive_field, stride) of the conv stem in samples (400, 320
        for the standard 7-layer stem) — used for frame-aligned bucketing."""
        k_eff, s_eff = 1, 1
        for k, s in zip(self.conv_kernel, self.conv_stride):
            k_eff += (k - 1) * s_eff
            s_eff *= s
        return k_eff, s_eff

    @staticmethod
    def base() -> "WavLMConfig":
        return WavLMConfig()

    @staticmethod
    def base_plus() -> "WavLMConfig":
        return WavLMConfig()

    @staticmethod
    def large() -> "WavLMConfig":
        return WavLMConfig(
            hidden_size=1024,
            num_hidden_layers=24,
            num_attention_heads=16,
            intermediate_size=4096,
            conv_bias=True,
            feat_extract_norm="layer",
            do_stable_layer_norm=True,
            do_normalize=True,
        )

    @staticmethod
    def tiny(hidden_size: int = 32, layers: int = 2, heads: int = 4) -> "WavLMConfig":
        """Small config for fast numerics tests (same code paths as base)."""
        return WavLMConfig(
            hidden_size=hidden_size,
            num_hidden_layers=layers,
            num_attention_heads=heads,
            intermediate_size=hidden_size * 4,
            conv_dim=(16, 16, 16),
            conv_stride=(5, 2, 2),
            conv_kernel=(10, 3, 3),
        )


# ---------------------------------------------------------------------------
# Relative position bucket bias (HF modeling_wavlm.py:243-271)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=32)
def relative_position_buckets(seq_len: int, num_buckets: int, max_distance: int) -> np.ndarray:
    """[L, L] int32 bucket index matrix (compile-time constant per length)."""
    context = np.arange(seq_len, dtype=np.int64)[:, None]
    memory = np.arange(seq_len, dtype=np.int64)[None, :]
    rel = memory - context

    nb = num_buckets // 2
    buckets = (rel > 0).astype(np.int64) * nb
    rel_abs = np.abs(rel)
    max_exact = nb // 2
    is_small = rel_abs < max_exact
    with np.errstate(divide="ignore"):
        rel_large = np.log(np.maximum(rel_abs, 1).astype(np.float32) / max_exact)
    rel_large = rel_large / math.log(max_distance / max_exact) * (nb - max_exact)
    rel_large = (max_exact + rel_large).astype(np.int64)
    rel_large = np.minimum(rel_large, nb - 1)
    buckets += np.where(is_small, rel_abs, rel_large)
    return buckets.astype(np.int32)


def compute_position_bias(rel_attn_embed: jax.Array, seq_len: int, cfg: WavLMConfig) -> jax.Array:
    """[num_buckets, H] embedding table -> [H, L, L] bias."""
    buckets = jnp.asarray(
        relative_position_buckets(seq_len, cfg.num_buckets, cfg.max_bucket_distance)
    )
    values = rel_attn_embed[buckets]  # [L, L, H]
    return jnp.transpose(values, (2, 0, 1))


# ---------------------------------------------------------------------------
# Building blocks
# ---------------------------------------------------------------------------


def layer_norm(x: jax.Array, p: Params, eps: float) -> jax.Array:
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]
    return out.astype(x.dtype)


def _gelu(x: jax.Array) -> jax.Array:
    # torch nn.GELU default is the exact erf form; keep it on f32 paths
    # (fidelity preset / HF parity). In bf16 the erf polynomial dominates the
    # elementwise time — measured +19 ms across the stem vs +0.5 ms for the
    # tanh form at B=128 on v5e — and tanh-gelu's ~1e-3 relative deviation is
    # below bf16's own 0.4% resolution (embedding fidelity stays ~3e-5).
    if x.dtype == jnp.bfloat16:
        return jax.nn.gelu(x, approximate=True)
    return jax.nn.gelu(x, approximate=False)


def _stem_im2col(x: jax.Array, k: int, stride: int) -> jax.Array:
    """[B, T, C] -> [B, L, k*C] frames via strided reshapes (no gather).

    General for any (k, stride): reshape time into stride-sized blocks, then
    window t's taps are consecutive blocks starting at block t — each part j
    is a shifted slice contributing min(stride, k - j*stride) taps. The
    frames' last axis is (tap, channel) flattened == the HIO weight reshape.
    """
    B, T, C = x.shape
    L = (T - k) // stride + 1
    nb = -(-k // stride)  # reshape blocks each output window touches
    need = (L - 1 + nb) * stride
    if need > T:  # pad; padded samples sit past every true tap (i < k)
        x = jnp.pad(x, ((0, 0), (0, need - T), (0, 0)))
    xr = x[:, :need, :].reshape(B, need // stride, stride * C)
    parts = [xr[:, j : j + L, : min(stride, k - j * stride) * C] for j in range(nb)]
    return parts[0] if nb == 1 else jnp.concatenate(parts, axis=-1)


def _stem_conv(x: jax.Array, w_oih, stride: int, precision) -> jax.Array:
    """One stem Conv1d [B, T, C] -> [B, L, O], MXU-shaped.

    Quantized weights ({"q": int8 [k*C, O], "s": [O]}) take the im2col +
    int8-GEMM path. Measured NEGATIVE end-to-end (stem 21.9 -> 64.2 ms at
    B=128): the early convs are traffic-bound on [B, ~9.6k, C] frames and
    the per-token dynamic-quant pass adds elementwise traffic — so the
    turbo preset does NOT quantize the stem; the path stays for experiments.

    For plain weights, two cases are re-expressed as matmuls (measured on
    v5e, B=128, 3.2 s clips — scripts/profile_stem.py):
    - C == 1 (the first conv): a 1-input-channel conv runs at ~0.3 TFLOP/s —
      the MXU contracts over a size-1 (padded to 8) axis. im2col via
      shifted reshapes gives a [B*L, k] x [k, O] matmul instead.
    - stride == kernel (the last two convs, k=2 s=2): non-overlapping windows
      are a FREE reshape to [B, L, k*C] -> one [k*C, O] matmul.
    Everything else stays a lax conv (the 512->512 k3 s2 convs already run at
    ~90-120 TFLOP/s, and im2col would 1.5x their HBM traffic).
    """
    B, T, C = x.shape
    if isinstance(w_oih, dict):
        from stutter_tpu.ops.quant import qdot

        k = w_oih["q"].shape[0] // C
        frames = _stem_im2col(x, k, stride)
        return qdot(frames, w_oih["q"], w_oih["s"]).astype(x.dtype)
    O, _, k = w_oih.shape
    if C == 1 or stride == k:
        frames = _stem_im2col(x, k, stride)
        w_flat = jnp.transpose(w_oih, (2, 1, 0)).reshape(k * C, O).astype(x.dtype)
        return jax.lax.dot_general(
            frames, w_flat, (((2,), (0,)), ((), ())), precision=precision
        )
    return jax.lax.conv_general_dilated(
        x,
        jnp.transpose(w_oih, (2, 1, 0)).astype(x.dtype),
        window_strides=(stride,),
        padding="VALID",
        dimension_numbers=("NHC", "HIO", "NHC"),
        precision=precision,
    )


def conv_feature_encoder(
    params: Params,
    waveform: jax.Array,
    cfg: WavLMConfig,
    precision,
    sample_lengths: jax.Array | None = None,
    compute_dtype=jnp.float32,
) -> jax.Array:
    """Raw wave [B, T] -> frames [B, L, conv_dim[-1]] at ~49 Hz.

    HF ``WavLMFeatureEncoder`` (modeling_wavlm.py:754-789): first layer
    group-norm (base) or every layer LN (large), erf-GELU activations.

    Padding correctness: the reference runs batch=1 unpadded, so batched
    extraction must be padding-invariant. The floor-chain length formula
    guarantees every valid output frame's receptive field lies inside the
    valid samples, but the group norm normalizes over TIME — so its
    statistics are computed over valid frames only, and each stage's padded
    frames are re-zeroed (otherwise padding leaks into the stats and batched
    != per-clip).
    """
    # TPU-first stem layout: NHC ([B, T, C]) end to end — the native TPU conv
    # layout (no NCH transposes in or around the LNs), with the inter-conv
    # carry kept in the activation dtype (bf16 fast preset: the early conv
    # outputs are ~1.3 GB/batch at large scale, so f32 carries double the HBM
    # traffic of the whole stem). Norm statistics always compute in f32.
    x = waveform[:, :, None].astype(compute_dtype)  # [B, T, 1]
    lengths = sample_lengths
    for i, layer in enumerate(params["conv_layers"]):
        # no preferred_element_type: it breaks the conv grad transpose with
        # mixed dtypes (fine-tune path); MXU still accumulates in f32
        x = _stem_conv(x, layer["w"], cfg.conv_stride[i], precision)
        if layer.get("b") is not None:
            x = x + layer["b"].astype(x.dtype)[None, None, :]
        mask = None
        if lengths is not None:
            lengths = (lengths - cfg.conv_kernel[i]) // cfg.conv_stride[i] + 1
            mask = (jnp.arange(x.shape[1])[None, :] < lengths[:, None])[:, :, None]
        if cfg.feat_extract_norm == "group" and i == 0:
            # GroupNorm(groups=channels) == per-channel instance norm over
            # time (axis 1 in NHC), masked so padding can't leak into stats
            xf = x.astype(jnp.float32)
            if mask is None:
                mean = jnp.mean(xf, axis=1, keepdims=True)
                var = jnp.var(xf, axis=1, keepdims=True)
            else:
                m = mask.astype(jnp.float32)
                n = jnp.maximum(jnp.sum(m, axis=1, keepdims=True), 1.0)
                mean = jnp.sum(xf * m, axis=1, keepdims=True) / n
                var = jnp.sum(jnp.square((xf - mean) * m), axis=1, keepdims=True) / n
            xf = (xf - mean) * jax.lax.rsqrt(var + 1e-5)
            x = (xf * layer["norm"]["scale"] + layer["norm"]["bias"]).astype(x.dtype)
        elif cfg.feat_extract_norm == "layer":
            x = layer_norm(x, layer["norm"], 1e-5)  # over C, the last axis
        x = _gelu(x)
        if mask is not None:
            x = x * mask.astype(x.dtype)
    return x  # [B, L, C]


def wavlm_feature_lengths(cfg: WavLMConfig, input_lengths) -> Any:
    """Conv output length chain (HF _get_feat_extract_output_lengths)."""
    lengths = input_lengths
    for k, s in zip(cfg.conv_kernel, cfg.conv_stride):
        lengths = (lengths - k) // s + 1
    return lengths


def pos_conv_embedding(params: Params, x: jax.Array, cfg: WavLMConfig, precision) -> jax.Array:
    """Grouped conv positional embedding with SamePad (modeling_wavlm.py:37-91).

    The weight-norm parameterization is folded into a plain conv weight at
    conversion time (inference/fine-tune use the effective weight directly).
    """
    k = cfg.num_conv_pos_embeddings
    y = jax.lax.conv_general_dilated(
        x,  # [B, L, C] — native NHC, no transposes
        jnp.transpose(params["w"], (2, 1, 0)).astype(x.dtype),  # OIH -> HIO
        window_strides=(1,),
        padding=[(k // 2, k // 2)],
        dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=cfg.num_conv_pos_embedding_groups,
        precision=precision,
    ).astype(jnp.float32)
    y = y + params["b"].astype(jnp.float32)
    if k % 2 == 0:  # SamePad removes the trailing element
        y = y[:, :-1, :]
    return _gelu(y).astype(x.dtype)


def gated_relpos_attention(
    layer: Params,
    x: jax.Array,
    position_bias: jax.Array,
    key_mask_bias: jax.Array | None,
    cfg: WavLMConfig,
    precision,
    allow_flash: bool = True,
    f32_softmax: bool = False,
) -> jax.Array:
    """One gated relative-position-bias MHA (modeling_wavlm.py:110-241).

    x: [B, L, D]; position_bias: [H, L, L]; key_mask_bias: [B, 1, 1, L] or None.
    """
    B, L, D = x.shape
    H, hd = cfg.num_attention_heads, cfg.head_dim

    def heads(t):
        return t.reshape(B, L, H, hd).transpose(0, 2, 1, 3)  # [B, H, L, hd]

    # GRU-style gate computed from the raw (pre-projection) head inputs —
    # projected in [B, L, H, hd] layout (a reshape view of x) so no full-
    # tensor transpose is paid; only the tiny [B, L, H, 2] result transposes.
    proj = (
        jnp.einsum(
            "blhd,de->blhe", x.reshape(B, L, H, hd), layer["gru_w"],
            precision=precision,
        )
        + layer["gru_b"]
    )
    proj = proj.reshape(B, L, H, 2, 4).sum(-1)
    gates = jax.nn.sigmoid(proj.astype(jnp.float32).transpose(0, 2, 1, 3))
    gate_a, gate_b = gates[..., 0], gates[..., 1]  # [B, H, L]
    const = layer["gru_const"].reshape(1, H, 1)
    gate = gate_a * (gate_b * const - 1.0) + 2.0  # [B, H, L]

    def gated_bias():  # [B, H, L, L] — only materialized on non-fused paths
        return gate[..., None] * position_bias[None].astype(jnp.float32)

    # separate q/k/v GEMMs: measured FASTER than a fused [D, 3D] GEMM here
    # (the in-scan weight concat + layout change cost more than the saved
    # launches — 146 vs 135 ms encoder at B=128/L=160). qdense dispatches
    # to the int8 MXU path when the preset quantized this weight (ops/quant).
    from stutter_tpu.ops.quant import dense as qdense

    # the .astype(x.dtype) is a no-op on fast/fidelity and casts the int8
    # path's f32 dequant output back to bf16 (keeps flash-kernel dispatch
    # and the residual stream in the activation dtype)
    q = heads((qdense(x, layer["q_w"], precision) + layer["q_b"]).astype(x.dtype))
    k = heads((qdense(x, layer["k_w"], precision) + layer["k_b"]).astype(x.dtype))
    v = heads((qdense(x, layer["v_w"], precision) + layer["v_b"]).astype(x.dtype))

    scale = hd**-0.5
    from stutter_tpu.models.attention import _flash_available, flash_mha_bias

    # fast preset only; allow_flash=False forces the einsum path (required
    # under tensor parallelism — a pallas_call has no GSPMD partition rule
    # and would force its TP-sharded operands replicated)
    use_kernels = allow_flash and _flash_available() and x.dtype == jnp.bfloat16
    # einsum-vs-fused-kernel crossover (trace-time, frames): below this the
    # materialized-[B, H, L, L] einsum path wins — XLA fuses the logits with
    # the bias/gate/softmax elementwise work and the quadratic term is still
    # small; above it the q-blocked fused kernel's VMEM probs win. Measured
    # on v5e turbo extraction (scripts/long_threshold_sweep.py, round 4):
    # einsum wins 3256/2955/2584 vs fused 2505/2364/2323 at L=512/608/800,
    # fused wins 2477 vs 2352 at L=1008 — the old 512 threshold was costing
    # the 10-16 s buckets 15-25%. Default 1008 so the 20 s bucket (L=1008,
    # the measured fused win) takes the kernel. The crossover is measured on
    # the extraction FORWARD; training (jax.grad) shares it — the einsum
    # backward's HBM chain could shift the training crossover lower, so
    # long-clip fine-tunes can override via env. Env override for A/Bs.
    long_min_l = int(os.environ.get("STUTTER_TPU_LONG_ATTENTION_MIN_L", "1008"))
    if use_kernels and L >= long_min_l and hd >= 64 \
            and not os.environ.get("STUTTER_TPU_LONG_ATTENTION_FLASH"):
        # long buckets: q-blocked fused kernel — the gate*bias product is
        # computed IN-KERNEL from the batch-shared [H, L, L] table, so the
        # [B, H, L, L] f32 ab tensor (~1.7 GB/layer at B=12, L=1504) that
        # the flash-ab path must materialize never exists. Measured 30 s
        # bucket on v5e: 882 -> 1999 audio-s/s (2.27x, bench long_bucket
        # field), kernel-vs-einsum cosine 2.8e-7.
        # the custom-VJP wrapper (ops/wavlm_attention_vjp) makes this branch
        # differentiable — long-bucket fine-tune uses these kernels too; in
        # inference programs the wrapper is the raw forward kernel verbatim
        from stutter_tpu.ops.wavlm_attention_vjp import (
            wavlm_attention_long_diff,
        )

        mask2 = (
            key_mask_bias[:, 0, 0, :]
            if key_mask_bias is not None
            else jnp.zeros((B, L), jnp.float32)
        )
        # block choice: smallest padded length wins (padded keys are real
        # compute); on ties take the bigger block (512 measured ~5% faster
        # than 256 at L=1536 — scripts/sweep_long_attn_block.py; 768 OOMs
        # scoped VMEM). STUTTER_TPU_LONG_ATTENTION_BLOCK forces a size for
        # end-to-end A/B retunes (isolated-kernel timings through the tunnel
        # carry ~30 ms relay noise, so only full-program sweeps decide).
        BQ = min((512, 256), key=lambda b: (((L + b - 1) // b) * b, -b))
        if os.environ.get("STUTTER_TPU_LONG_ATTENTION_BLOCK"):
            BQ = int(os.environ["STUTTER_TPU_LONG_ATTENTION_BLOCK"])
        Lp = ((L + BQ - 1) // BQ) * BQ
        pb, g, qq, kk, vv = position_bias.astype(jnp.float32), gate, q * scale, k, v
        if Lp != L:
            pad = Lp - L
            qq, kk, vv = (jnp.pad(t, ((0, 0), (0, 0), (0, pad), (0, 0)))
                          for t in (qq, kk, vv))
            pb = jnp.pad(pb, ((0, 0), (0, pad), (0, pad)))
            g = jnp.pad(g, ((0, 0), (0, 0), (0, pad)))
            mask2 = jnp.pad(mask2, ((0, 0), (0, pad)), constant_values=-1e9)
        # forward-softmax exp dtype (trace-time env). MEASURED NEGATIVE on
        # v5e (scripts/long_exp_ab.py, artifacts/long_exp_ab_r4.json): bf16
        # exp read 2067 vs f32's 2126 audio-s/s at 30 s, neutral at 20 s —
        # the kernel is near its structural roofline (head_dim=64 pins both
        # attention matmuls at ~50% MXU; softmax VPU work overlaps the MXU
        # well already), so the extra casts cost more than bf16 exp saves.
        # Knob kept for re-measurement on future TPU generations.
        exp_dtype = (jnp.bfloat16
                     if os.environ.get("STUTTER_TPU_LONG_ATTENTION_EXP",
                                       "f32") == "bf16"
                     else jnp.float32)
        out = wavlm_attention_long_diff(qq, kk, vv, pb, g, mask2,
                                        block_q=BQ,
                                        exp_dtype=exp_dtype)[:, :, :L]
    elif (use_kernels and L >= long_min_l and hd >= 64
          and os.environ.get("STUTTER_TPU_LONG_ATTENTION_FLASH")):
        # escape hatch: the stock flash kernel with a materialized ab
        ab = gated_bias()
        if key_mask_bias is not None:
            ab = ab + key_mask_bias
        ab = jnp.broadcast_to(ab, (B, H, L, L))
        out = flash_mha_bias(q * scale, k, v, ab)
    elif (
        use_kernels
        and L % 8 == 0
        and L <= 192
        and os.environ.get("STUTTER_TPU_FUSED_SHORT_ATTENTION")
    ):
        # L <= 192: the whole-row kernel holds ~4 [BB, L, L] f32 temporaries
        # at BB=16 (s/p/e/a) — L=192 is ~9.4 MB, safely under the 16 MB
        # scoped VMEM; by L=304 it's ~23.7 MB and the remote compile service
        # crashes opaquely (HTTP 500). Mid lengths fall through to einsum.
        # short buckets: fused kernel (ops/wavlm_attention_pallas.py). Wins
        # in isolation (2.85 vs 3.38 ms at B=128/L=144) but loses end-to-end
        # for EXTRACTION (XLA fuses the einsum logits with neighbors across
        # the attention boundary; the pallas_call blocks that) — so opt-in
        # only. Differentiable via the custom VJP (ops/wavlm_attention_vjp):
        # under per-layer remat the [BB, L, L] probs chain stays in VMEM in
        # both directions, the training-side case the extraction measurement
        # above does not cover (A/B: scripts/bench_finetune.py).
        from stutter_tpu.ops.wavlm_attention_vjp import (
            wavlm_attention_short_diff,
        )

        mask2 = (
            key_mask_bias[:, 0, 0, :]
            if key_mask_bias is not None
            else jnp.zeros((B, L), jnp.float32)
        )
        out = wavlm_attention_short_diff(
            q * scale, k, v, position_bias.astype(jnp.float32), gate, mask2
        )
    elif x.dtype == jnp.bfloat16 and not f32_softmax:
        # fast preset: keep the [B, H, L, L] logits/bias/softmax in bf16 —
        # these tensors are pure HBM traffic (~210 MB/layer in f32 at
        # B=128/L=160) and bf16's ~0.4% relative error post-max-subtraction
        # is far inside the 1e-3 cosine bar (bench.py re-measures fidelity)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k, precision=precision)
        logits = logits + gated_bias().astype(jnp.bfloat16)
        if key_mask_bias is not None:
            logits = logits + key_mask_bias.astype(jnp.bfloat16)
        attn = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v, precision=precision)
    else:
        # Every [B, H, L, L] intermediate is checkpoint_name-tagged so the
        # "layer_probs" remat policy (save_anything_except_these_names) can
        # refuse to save ANY of the chain: tagging only the softmax output
        # would make partial-eval save the f32 logits instead (same bytes).
        # checkpoint_name is a transparent no-op outside jax.checkpoint.
        from jax.ad_checkpoint import checkpoint_name

        def big(t):
            return checkpoint_name(t, "attn_big")

        logits = big(jnp.einsum("bhqd,bhkd->bhqk", q * scale, k,
                                precision=precision))
        logits = big(logits.astype(jnp.float32) + big(gated_bias()))
        if key_mask_bias is not None:
            logits = big(logits + key_mask_bias)
        attn = big(jax.nn.softmax(logits, axis=-1))
        attn = big(attn.astype(x.dtype))
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v, precision=precision)
    out = out.transpose(0, 2, 1, 3).reshape(B, L, D)
    return (qdense(out, layer["o_w"], precision) + layer["o_b"]).astype(x.dtype)


def feed_forward(layer: Params, x: jax.Array, precision) -> jax.Array:
    from stutter_tpu.ops.quant import dense as qdense

    h = (qdense(x, layer["ff_w1"], precision) + layer["ff_b1"]).astype(x.dtype)
    h = _gelu(h)
    return (qdense(h, layer["ff_w2"], precision) + layer["ff_b2"]).astype(x.dtype)


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


def _encoder_layer(
    layer: Params,
    x: jax.Array,
    position_bias: jax.Array,
    key_mask_bias,
    cfg: WavLMConfig,
    precision,
    allow_flash: bool = True,
    f32_softmax: bool = False,
) -> jax.Array:
    eps = cfg.layer_norm_eps
    if cfg.do_stable_layer_norm:  # pre-LN (modeling_wavlm.py:339-373)
        attn_in = layer_norm(x, {"scale": layer["ln1_s"], "bias": layer["ln1_b"]}, eps)
        x = x + gated_relpos_attention(layer, attn_in, position_bias, key_mask_bias, cfg,
                                       precision, allow_flash, f32_softmax)
        ff_in = layer_norm(x, {"scale": layer["ln2_s"], "bias": layer["ln2_b"]}, eps)
        return x + feed_forward(layer, ff_in, precision)
    # post-LN (modeling_wavlm.py:298-336)
    x = x + gated_relpos_attention(layer, x, position_bias, key_mask_bias, cfg, precision,
                                   allow_flash, f32_softmax)
    x = layer_norm(x, {"scale": layer["ln1_s"], "bias": layer["ln1_b"]}, eps)
    x = x + feed_forward(layer, x, precision)
    return layer_norm(x, {"scale": layer["ln2_s"], "bias": layer["ln2_b"]}, eps)


def wavlm_encoder(
    params: Params,
    hidden: jax.Array,
    lengths: jax.Array | None,
    cfg: WavLMConfig,
    precision,
    reducer=None,
    use_flash: bool = True,
    f32_attention_softmax: bool = False,
    remat_layers: bool | str = False,
) -> tuple[jax.Array, jax.Array]:
    """Run the transformer stack via lax.scan over stacked layer params.

    Returns (last_hidden [B, L, D], collected [N+1, ...]). With reducer=None
    the collection is the full hidden-states stack (HF parity: entry i is
    layer i's INPUT, entry N the final output — the scan yields its carry, so
    no post-hoc update-slice of the [N+1, B, L, D] buffer is needed; a
    profiled `.at[-1].set` there cost ~25% of the whole forward). A reducer
    (e.g. masked mean-pool) is applied to every collected state INSIDE the
    scan, so extraction never materializes the full stack at all.

    remat_layers=True checkpoints the scan BODY (the standard per-layer
    transformer remat): under jax.grad each layer's internals — including
    the f32 attention probabilities, whose stacked-across-layers residual
    [N, B, H, L, L] is what OOM'd whole-forward remat at batch 32 (1.88 GB
    padded on v5e) — are recomputed inside that layer's backward, and the
    only cross-layer residual is the [N, B, L, D] stack of layer inputs the
    scan saves anyway.
    """
    B, L, _ = hidden.shape
    key_mask_bias = None
    if lengths is not None:
        frame_mask = jnp.arange(L)[None, :] < lengths[:, None]  # [B, L]
        hidden = hidden * frame_mask[:, :, None].astype(hidden.dtype)
        key_mask_bias = jnp.where(frame_mask, 0.0, -1e9).astype(jnp.float32)[:, None, None, :]

    hidden = hidden + pos_conv_embedding(params["pos_conv"], hidden, cfg, precision)
    if not cfg.do_stable_layer_norm:
        hidden = layer_norm(hidden, params["ln"], cfg.layer_norm_eps)

    position_bias = compute_position_bias(params["rel_attn_embed"], L, cfg)
    collect = (lambda h: h) if reducer is None else reducer

    def body(carry, layer):
        # cast back: f32 biases/LN params upcast bf16 activations otherwise
        out = _encoder_layer(layer, carry, position_bias, key_mask_bias, cfg, precision,
                             use_flash, f32_attention_softmax)
        out = out.astype(carry.dtype)
        return out, collect(carry)  # yield layer INPUT (HF hidden_states[i])

    if remat_layers:
        # "dots" saves each layer's dot_general outputs (QKV/attn-out/FFN
        # GEMMs and the attention logits) and recomputes only elementwise/
        # norm work in that layer's backward; "save_but_probs" saves
        # everything EXCEPT the checkpoint_name-tagged [B, H, L, L]
        # attention chain (the memory hog) — the backward recomputes just
        # QK^T + bias + softmax per layer, ~1% of the layer's FLOPs;
        # True/"nothing" recomputes the whole layer (min memory).
        if remat_layers == "dots":
            policy = jax.checkpoint_policies.dots_saveable
        elif remat_layers == "save_but_probs":
            policy = jax.checkpoint_policies.save_anything_except_these_names(
                "attn_big")
        else:
            policy = jax.checkpoint_policies.nothing_saveable
        body = jax.checkpoint(body, policy=policy)
    last, states = jax.lax.scan(body, hidden, params["layers"])

    if cfg.do_stable_layer_norm:
        # HF: states 0..N-1 are pre-final-LN; the last entry carries the
        # final LN (modeling_wavlm.py:489-516)
        last = layer_norm(last, params["ln"], cfg.layer_norm_eps)
    collected = jnp.concatenate([states, collect(last)[None]], axis=0)
    return last, collected


# ---------------------------------------------------------------------------
# Top-level forwards
# ---------------------------------------------------------------------------


def wavlm_forward(
    params: Params,
    waveform: jax.Array,
    cfg: WavLMConfig,
    sample_lengths: jax.Array | None = None,
    precision=jax.lax.Precision.HIGHEST,
    activation_dtype=jnp.float32,
    spec_augment_rng: jax.Array | None = None,
    hidden_reducer=None,
    use_flash: bool = True,
    f32_attention_softmax: bool = False,
    use_fused_stem: bool = False,
    remat_layers: bool | str = False,
    stop_stem_gradient: bool = False,
):
    """Full WavLM forward with all hidden states (WavLMModel.forward parity).

    waveform: [B, T] float32 (already frontend-normalized if the checkpoint
    says so). sample_lengths: true sample counts for padded batches.
    spec_augment_rng enables training-time SpecAugment masking (HF
    _mask_hidden_states; inference passes None, matching the reference's
    no-op at WavLM_embeddings.py inference calls).

    use_fused_stem routes the conv stem through the fully-fused Pallas
    kernel (ops/wavlm_stem_pallas) when it exactly applies (layer-norm stem,
    bf16, frame-aligned bucket length — fused_stem_applicable); inference
    paths only, like use_flash: the raw pallas_call has no VJP and no GSPMD
    partition rule. MEASURED SLOWER than the XLA stem on v5e (see the kernel
    module docstring) — no production caller sets it; it stays as an
    experiment switch.

    Returns (last_hidden, all_hidden [N+1, B, L, D], frame_lengths [B]).
    """
    stem = params["feature_encoder"]
    fused = False
    if use_fused_stem and activation_dtype == jnp.bfloat16:
        from stutter_tpu.ops.wavlm_stem_pallas import (
            fused_stem_applicable, wavlm_fused_stem)

        fused = fused_stem_applicable(cfg, waveform.shape[1], stem["conv_layers"])
    if fused:
        feats = wavlm_fused_stem(waveform, stem["conv_layers"])
        if sample_lengths is not None:
            # the kernel emits unmasked frames; for the per-frame layer-norm
            # stem, end-masking == the XLA path's per-layer masking
            fl = wavlm_feature_lengths(cfg, sample_lengths)
            feats = feats * (
                jnp.arange(feats.shape[1])[None, :] < fl[:, None]
            )[:, :, None].astype(feats.dtype)
    else:
        feats = conv_feature_encoder(
            stem, waveform, cfg, precision,
            sample_lengths=sample_lengths, compute_dtype=activation_dtype,
        )
    if stop_stem_gradient:
        # Structural stem freeze (fine-tune with freeze_feature_encoder):
        # zeroing stem grads in the optimizer still makes value_and_grad
        # BUILD the whole conv-stem backward (transposed convs over the
        # ~50 kHz-sample activations) only to discard it. stop_gradient
        # makes the stem param grads structurally zero, so XLA prunes that
        # backward from the step program. Mathematically identical when the
        # optimizer labels the stem frozen (train/finetune.make_optimizer).
        feats = jax.lax.stop_gradient(feats)
    feats = layer_norm(feats, params["feature_projection"]["ln"], cfg.layer_norm_eps)
    hidden = (
        jnp.einsum(
            "blc,cd->bld", feats, params["feature_projection"]["w"], precision=precision
        )
        + params["feature_projection"]["b"]
    )
    hidden = hidden.astype(activation_dtype)

    frame_lengths = None
    if sample_lengths is not None:
        frame_lengths = wavlm_feature_lengths(cfg, sample_lengths)
    else:
        frame_lengths = jnp.full((waveform.shape[0],), hidden.shape[1], dtype=jnp.int32)

    if spec_augment_rng is not None and cfg.apply_spec_augment:
        from stutter_tpu.ops.specaugment import spec_augment

        hidden = spec_augment(
            spec_augment_rng, hidden, frame_lengths,
            cfg.mask_time_prob, cfg.mask_time_length,
            cfg.mask_feature_prob, cfg.mask_feature_length,
            params.get("masked_spec_embed"),
        )
    last, all_hidden = wavlm_encoder(
        params["encoder"], hidden,
        frame_lengths if sample_lengths is not None else None,
        cfg, precision, reducer=hidden_reducer, use_flash=use_flash,
        f32_attention_softmax=f32_attention_softmax, remat_layers=remat_layers,
    )
    return last, all_hidden, frame_lengths


def wavlm_encode(
    params: Params,
    waveform: jax.Array,
    cfg: WavLMConfig,
    layer_indices: tuple[int, ...],
    sample_lengths: jax.Array | None = None,
    precision=jax.lax.Precision.HIGHEST,
    activation_dtype=jnp.float32,
    use_flash: bool = True,
    use_fused_stem: bool = False,
) -> jax.Array:
    """Mean-pooled embeddings for the selected hidden-state indices.

    Reference selects [N-1, N-2, N-3, N//2] of the N+1 hidden states and
    mean-pools over time (WavLM_embeddings.py:506,321). Returns
    [num_selected, B, D] float32.
    """
    from stutter_tpu.ops.pooling import masked_mean_pool

    # pool INSIDE the encoder scan: the [N+1, B, L, D] stack never exists;
    # only [N+1, B, D] pooled vectors are collected (profiled ~25% win)
    frame_lengths = wavlm_feature_lengths(cfg, sample_lengths) if sample_lengths is not None \
        else None

    def reducer(h):
        if frame_lengths is None:
            return jnp.mean(h.astype(jnp.float32), axis=1)
        return masked_mean_pool(h, frame_lengths)

    _, pooled, _ = wavlm_forward(
        params, waveform, cfg, sample_lengths, precision, activation_dtype,
        hidden_reducer=reducer, use_flash=use_flash,
        use_fused_stem=use_fused_stem,
    )
    return pooled[jnp.asarray(layer_indices)]


# ---------------------------------------------------------------------------
# Initialization (random, for tests / training-from-scratch)
# ---------------------------------------------------------------------------


def init_wavlm_params(rng: jax.Array, cfg: WavLMConfig, dtype=jnp.float32) -> Params:
    keys = iter(jax.random.split(rng, 64))

    def dense(k, fan_in, fan_out):
        w = jax.random.normal(k, (fan_in, fan_out), dtype) * (fan_in**-0.5)
        return w, jnp.zeros((fan_out,), dtype)

    conv_layers = []
    in_dim = 1
    for i, out_dim in enumerate(cfg.conv_dim):
        k = cfg.conv_kernel[i]
        layer = {
            "w": jax.random.normal(next(keys), (out_dim, in_dim, k), dtype)
            * ((in_dim * k) ** -0.5),
            "b": jnp.zeros((out_dim,), dtype) if cfg.conv_bias else None,
        }
        if (cfg.feat_extract_norm == "group" and i == 0) or cfg.feat_extract_norm == "layer":
            layer["norm"] = {"scale": jnp.ones((out_dim,), dtype), "bias": jnp.zeros((out_dim,), dtype)}
        conv_layers.append(layer)
        in_dim = out_dim

    D, H, F = cfg.hidden_size, cfg.num_attention_heads, cfg.intermediate_size
    proj_w, proj_b = dense(next(keys), cfg.conv_dim[-1], D)

    def one_layer(k):
        ks = iter(jax.random.split(k, 16))
        q_w, q_b = dense(next(ks), D, D)
        k_w, k_b = dense(next(ks), D, D)
        v_w, v_b = dense(next(ks), D, D)
        o_w, o_b = dense(next(ks), D, D)
        gru_w, gru_b = dense(next(ks), cfg.head_dim, 8)
        ff_w1, ff_b1 = dense(next(ks), D, F)
        ff_w2, ff_b2 = dense(next(ks), F, D)
        return {
            "q_w": q_w, "q_b": q_b, "k_w": k_w, "k_b": k_b,
            "v_w": v_w, "v_b": v_b, "o_w": o_w, "o_b": o_b,
            "gru_w": gru_w, "gru_b": gru_b, "gru_const": jnp.ones((H,), dtype),
            "ff_w1": ff_w1, "ff_b1": ff_b1, "ff_w2": ff_w2, "ff_b2": ff_b2,
            "ln1_s": jnp.ones((D,), dtype), "ln1_b": jnp.zeros((D,), dtype),
            "ln2_s": jnp.ones((D,), dtype), "ln2_b": jnp.zeros((D,), dtype),
        }

    layer_keys = jax.random.split(next(keys), cfg.num_hidden_layers)
    layers = jax.tree.map(lambda *xs: jnp.stack(xs), *[one_layer(k) for k in layer_keys])

    pos_k = cfg.num_conv_pos_embeddings
    pos_in = D // cfg.num_conv_pos_embedding_groups
    return {
        "masked_spec_embed": jax.random.uniform(next(keys), (D,), dtype),
        "feature_encoder": {"conv_layers": conv_layers},
        "feature_projection": {
            "ln": {"scale": jnp.ones((cfg.conv_dim[-1],), dtype), "bias": jnp.zeros((cfg.conv_dim[-1],), dtype)},
            "w": proj_w,
            "b": proj_b,
        },
        "encoder": {
            "pos_conv": {
                "w": jax.random.normal(next(keys), (D, pos_in, pos_k), dtype)
                * ((pos_in * pos_k) ** -0.5),
                "b": jnp.zeros((D,), dtype),
            },
            "ln": {"scale": jnp.ones((D,), dtype), "bias": jnp.zeros((D,), dtype)},
            "rel_attn_embed": jax.random.normal(next(keys), (cfg.num_buckets, H), dtype) * 0.02,
            "layers": layers,
        },
    }
