"""Int8 dynamic-quantization matmul path (the "turbo" preset).

The v5e MXU runs int8 x int8 -> int32 at 2x the bf16 FLOP rate (394 TOPS vs
197 TFLOP/s). Measured on the wavlm-large FFN chain at extraction scale
(scripts/int8_ffn_chain_bench.py, B=128 L=144, 24 layers): 173.7 TFLOP/s in
bf16 vs 249 TFLOP/s with the FULL dynamic-quant round trip fused in — a
1.43x kernel speedup with ~1.1% per-GEMM relative error.

Scheme (standard W8A8 dynamic quantization):
- weights: static symmetric per-output-channel int8; scale = amax/127 over
  the contraction axis, computed once at preset-cast time
  (extract/pipeline.py:cast_params_for_preset)
- activations: dynamic symmetric per-token int8; scale = amax/127 over the
  feature axis, computed inside the jit program (XLA fuses the amax/round
  pass with the surrounding elementwise work)
- accumulation in int32 on the MXU (preferred_element_type), dequantized by
  the rank-1 outer product of the two scale vectors

``qdot``/``dense`` are inference paths: jnp.round has a zero gradient, so
statically-quantized params must never reach a training step directly. The
training counterpart is ``qdot_ste`` (straight-through estimator, live
per-step weight re-quantization), opted into via
``FinetuneConfig.int8_forward``. Softmax, layer norms, attention logits,
biases and residuals all stay in bf16/f32 — only the big projection/FFN
GEMMs drop to int8, which is where the 2x MXU rate lives.

No reference equivalent (the reference runs f32 torch on GPU); this is a
beyond-parity performance feature. Fidelity is measured, not assumed:
bench.py reports the turbo-vs-f32 embedding cosine distance next to the
throughput, and tests/test_quant.py bounds the per-GEMM and end-to-end
error on CPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Quantized = dict  # {"q": int8 [..., K, N], "s": f32 [..., N]}


def quantize_weight(w: jax.Array, contract_axis: int = -2) -> Quantized:
    """Symmetric per-output-channel int8 quantization of a dense weight.

    w: [..., K, N] (leading axes = stacked layers). The scale is the absmax
    over the contraction axis K, per output channel N, so dequantization is
    a per-column rescale of the int32 accumulator.
    """
    wf = w.astype(jnp.float32)
    s = jnp.max(jnp.abs(wf), axis=contract_axis, keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-12)
    q = jnp.clip(jnp.round(wf / s), -127, 127).astype(jnp.int8)
    s = jnp.squeeze(s, axis=contract_axis)
    # "cs" = per-output-channel column sum of the DEQUANTIZED weight —
    # precomputed here so the asymmetric activation path's zero-point
    # correction (qdot_asym) never re-reads the whole weight at run time
    cs = jnp.sum(q.astype(jnp.int32), axis=contract_axis).astype(jnp.float32) * s
    return {"q": q, "s": s, "cs": cs}


def qdot(x: jax.Array, wq: jax.Array, sw: jax.Array) -> jax.Array:
    """x [..., K] (bf16/f32) @ int8 weight [K, N] -> f32 [..., N].

    Dynamically quantizes x per token (absmax over K), runs the int8 MXU
    matmul with int32 accumulation, and dequantizes with the per-token and
    per-channel scales. Callers add the (bf16/f32) bias and cast back to
    the activation dtype themselves.
    """
    xf = x.astype(jnp.float32)
    s = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-8)
    xq = jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, wq, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return acc.astype(jnp.float32) * s * sw


def qdot_asym(x: jax.Array, wq: jax.Array, sw: jax.Array,
              colsum: jax.Array) -> jax.Array:
    """Like qdot but with ASYMMETRIC per-token activation quantization.

    x ~ s*xq + z (z = per-token range midpoint), so
    x @ W = s*(xq @ W) + z * colsum(W), with colsum(W) the per-channel [N]
    column sum of the dequantized weight, precomputed at quantize time
    (quantize_weight's "cs"). One-sided activations (e.g. GELU outputs:
    min ~= -0.17, max unbounded) waste half the symmetric range; centering
    halves their quantization step. Symmetric-ish inputs lose nothing
    (z ~= 0).
    """
    xf = x.astype(jnp.float32)
    hi = jnp.max(xf, axis=-1, keepdims=True)
    lo = jnp.min(xf, axis=-1, keepdims=True)
    z = (hi + lo) * 0.5
    s = jnp.maximum((hi - lo) / 254.0, 1e-8)
    xq = jnp.clip(jnp.round((xf - z) / s), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, wq, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return acc.astype(jnp.float32) * s * sw + z * colsum


@jax.custom_vjp
def qdot_ste(x: jax.Array, w: jax.Array) -> jax.Array:
    """W8A8 dynamic-quant matmul with a straight-through-estimator backward.

    The TRAINING-step counterpart of ``qdot``: the forward quantizes BOTH
    the activation (per-token) and the live weight (per-output-channel,
    re-quantized every call — the weight changes each optimizer step) and
    runs the int8 MXU GEMM; the backward ignores the quantization entirely
    and differentiates the underlying bf16 matmul (dx = g W^T, dW = x^T g),
    the standard STE used by quantization-aware training. This makes the
    forward (and any remat re-forward) ride the 2x int8 MXU rate while
    gradients stay exactly the bf16 step's *given the same residuals* —
    end-to-end grads differ only through the quantization noise in the
    activations, which scripts/finetune_int8_grad_check.py measures.
    """
    wq = quantize_weight(w)
    return qdot(x, wq["q"], wq["s"])


def _qdot_ste_fwd(x, w):
    return qdot_ste(x, w), (x, w)


def _qdot_ste_bwd(res, g):
    x, w = res
    # cotangent arrives f32 (the primal output is f32); run the backward
    # GEMMs in the compute dtype like the plain einsum path's transpose would
    gb = g.astype(w.dtype)
    dx = jnp.einsum("...n,kn->...k", gb, w).astype(x.dtype)
    dw = jnp.einsum("...k,...n->kn", x, gb).astype(w.dtype)
    return dx, dw


qdot_ste.defvjp(_qdot_ste_fwd, _qdot_ste_bwd)


def dense(x: jax.Array, w, precision) -> jax.Array:
    """Dispatch a dense projection: quantized dict -> int8 path (result cast
    back to x.dtype so downstream elementwise/gelu/flash code is unchanged);
    {"ste": w} dict -> the trainable int8 STE path; plain array -> the usual
    einsum."""
    if isinstance(w, dict):
        if "ste" in w:
            return qdot_ste(x, w["ste"]).astype(x.dtype)
        return qdot(x, w["q"], w["s"]).astype(x.dtype)
    return jnp.einsum("...d,de->...e", x, w, precision=precision)


def dense_asym(x: jax.Array, w, precision) -> jax.Array:
    """dense() with the asymmetric activation path for quantized weights.

    For GEMMs whose inputs are one-sided (post-GELU FFN projections) the
    per-GEMM error roughly halves (tests/test_quant.py). Measured END-TO-END
    on whisper-large fc2 it was a net loss (-4% encoder throughput for ~1%
    fidelity, scripts/whisper_turbo_fidelity_sweep2.py) so no production
    path uses it today; it stays available for checkpoints whose outlier
    structure makes fc2 the fidelity bottleneck."""
    if isinstance(w, dict):
        return qdot_asym(x, w["q"], w["s"], w["cs"]).astype(x.dtype)
    return jnp.einsum("...d,de->...e", x, w, precision=precision)


def quantize_conv_weight(w_oih: jax.Array) -> Quantized:
    """Quantize a stem Conv1d weight [O, I, k] into the im2col matmul layout.

    Returns {"q": int8 [k*I, O], "s": f32 [O]} — the flattened (tap, channel)
    contraction layout that conv_feature_encoder's strided-reshape im2col
    produces, so the conv becomes one int8 GEMM (see models/wavlm.py
    _stem_conv). k is recoverable as q.shape[0] // in_channels."""
    O, I, k = w_oih.shape
    w_flat = jnp.transpose(w_oih, (2, 1, 0)).reshape(k * I, O)
    return quantize_weight(w_flat)


# Per-layer weight names eligible for int8 (the big GEMMs). Everything else
# (biases, LN params, gates, rel-pos tables, conv stems) stays bf16.
WAVLM_QUANT_KEYS = ("q_w", "k_w", "v_w", "o_w", "ff_w1", "ff_w2")
WHISPER_QUANT_KEYS = (
    "attn_q_w", "attn_k_w", "attn_v_w", "attn_o_w",
    "xattn_q_w", "xattn_k_w", "xattn_v_w", "xattn_o_w",
    "fc1_w", "fc2_w",
)


def quantize_layer_stack(layers: dict, keys: tuple[str, ...]) -> dict:
    """Quantize the named weights of a stacked [N, K, M] layer pytree."""
    out = dict(layers)
    for k in keys:
        if k in out and not isinstance(out[k], dict):
            out[k] = quantize_weight(out[k])
    return out
