"""Whisper encoder + single-step decoder in functional JAX.

Behavior parity target (verified by golden tests vs HF torch): the exact
surfaces the reference touches in ``whisper_embeddings_large.py:250-262`` —
``model.encoder(input_features, output_hidden_states=True)`` and ONE decoder
step with ``input_ids=zeros((1,1))`` (token id 0, an arbitrary start token,
NOT the real SOT 50258 — a reference quirk we replicate deliberately).

HF ``modeling_whisper.py`` specifics reproduced here:
- encoder stem: Conv1d(80->D, k3, p1) + GELU, Conv1d(D->D, k3, s2, p1) + GELU
  -> 1500 frames (``:608-609,679-682``)
- non-learned sinusoidal source positions added to all 1500 positions
  (``:54-66,574,683-685``); stored as a weight so converted checkpoints carry
  whatever the checkpoint holds
- pre-LN encoder/decoder layers with a final LN (``:372-432,722,948``)
- attention scales q AFTER projection (scaling folded into q, not the
  matmul — ``:311-316``); k_proj has no bias
- decoder: learned positions, token embedding, self+cross attention
  (``:435-544,856-940``)

TPU-first: stacked layer params + ``lax.scan`` (32 layers compile as one
body), static [B, 80, 3000] input contract, f32 softmax/LN with configurable
matmul precision. The single-token decoder step is a tiny [B, 1, D] program
whose cross-attention reads the [B, 1500, D] encoder state — no KV cache
machinery is needed for this workload and none is pretended.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

Params = dict[str, Any]


@dataclasses.dataclass(frozen=True)
class WhisperConfig:
    d_model: int = 1280
    encoder_layers: int = 32
    encoder_attention_heads: int = 20
    decoder_layers: int = 32
    decoder_attention_heads: int = 20
    ffn_dim: int = 5120
    num_mel_bins: int = 80
    max_source_positions: int = 1500
    max_target_positions: int = 448
    vocab_size: int = 51865
    layer_norm_eps: float = 1e-5

    @property
    def head_dim(self) -> int:
        return self.d_model // self.encoder_attention_heads

    @staticmethod
    def large() -> "WhisperConfig":
        return WhisperConfig()

    @staticmethod
    def large_v2() -> "WhisperConfig":
        return WhisperConfig()

    @staticmethod
    def large_v3() -> "WhisperConfig":
        return WhisperConfig(num_mel_bins=128)

    @staticmethod
    def medium() -> "WhisperConfig":
        return WhisperConfig(
            d_model=1024, encoder_layers=24, encoder_attention_heads=16,
            decoder_layers=24, decoder_attention_heads=16, ffn_dim=4096,
        )

    @staticmethod
    def small() -> "WhisperConfig":
        return WhisperConfig(
            d_model=768, encoder_layers=12, encoder_attention_heads=12,
            decoder_layers=12, decoder_attention_heads=12, ffn_dim=3072,
        )

    @staticmethod
    def base() -> "WhisperConfig":
        return WhisperConfig(
            d_model=512, encoder_layers=6, encoder_attention_heads=8,
            decoder_layers=6, decoder_attention_heads=8, ffn_dim=2048,
        )

    @staticmethod
    def tiny_official() -> "WhisperConfig":
        return WhisperConfig(
            d_model=384, encoder_layers=4, encoder_attention_heads=6,
            decoder_layers=4, decoder_attention_heads=6, ffn_dim=1536,
        )

    @staticmethod
    def tiny(d_model: int = 32, layers: int = 2, heads: int = 4) -> "WhisperConfig":
        return WhisperConfig(
            d_model=d_model, encoder_layers=layers, encoder_attention_heads=heads,
            decoder_layers=layers, decoder_attention_heads=heads, ffn_dim=d_model * 4,
            max_source_positions=1500, vocab_size=128,
        )


def sinusoids(length: int, channels: int) -> np.ndarray:
    """Whisper's fixed sinusoidal positions (modeling_whisper.py:54-66)."""
    assert channels % 2 == 0
    log_timescale_increment = np.log(10000.0) / (channels // 2 - 1)
    inv_timescales = np.exp(-log_timescale_increment * np.arange(channels // 2))
    scaled_time = np.arange(length)[:, None] * inv_timescales[None, :]
    return np.concatenate([np.sin(scaled_time), np.cos(scaled_time)], axis=1).astype(np.float32)


def _layer_norm(x, scale, bias, eps):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps) * scale + bias).astype(x.dtype)


def _gelu(x):
    # exact erf gelu on f32 paths (fidelity / HF parity); tanh-approx in bf16
    # — the erf polynomial dominates elementwise time (the 32-layer ffn runs
    # ~2B gelu elements per large batch; measured ~2x elementwise cost vs
    # tanh on v5e) and its ~1e-3 relative deviation is below bf16 resolution.
    if x.dtype == jnp.bfloat16:
        return jax.nn.gelu(x, approximate=True)
    return jax.nn.gelu(x, approximate=False)


def _attention(q_in, kv_in, p, prefix, num_heads, precision, causal=False,
               allow_flash=True):
    """Whisper MHA: q scaled after projection, k_proj bias-free.

    Non-causal full-sequence attention (the encoder's 1500-position case)
    routes through the Pallas flash kernel on TPU (models/attention.py) —
    the [B, H, 1500, 1500] score tensor never hits HBM. The 1-token decoder
    steps stay on the einsum path.
    """
    B, Lq, D = q_in.shape
    Lk = kv_in.shape[1]
    hd = D // num_heads
    scale = hd**-0.5

    # qdense dispatches to the int8 MXU path when the turbo preset quantized
    # the weight (ops/quant.py); the .astype is a no-op on fast/fidelity
    from stutter_tpu.ops.quant import dense as qdense

    q = ((qdense(q_in, p[f"{prefix}_q_w"], precision)
          + p[f"{prefix}_q_b"]) * scale).astype(q_in.dtype)
    k = qdense(kv_in, p[f"{prefix}_k_w"], precision).astype(kv_in.dtype)
    v = (qdense(kv_in, p[f"{prefix}_v_w"], precision)
         + p[f"{prefix}_v_b"]).astype(kv_in.dtype)

    def heads(t, L):
        return t.reshape(B, L, num_heads, hd).transpose(0, 2, 1, 3)

    if not causal:
        from stutter_tpu.models.attention import mha_self

        out = mha_self(heads(q, Lq), heads(k, Lk), heads(v, Lk), precision=precision,
                       allow_flash=allow_flash)
    else:
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", heads(q, Lq), heads(k, Lk), precision=precision
        ).astype(jnp.float32)
        if Lq > 1:
            mask = np.triu(np.full((Lq, Lk), -1e9, np.float32), k=1)
            logits = logits + jnp.asarray(mask)[None, None]
        attn = jax.nn.softmax(logits, axis=-1).astype(q_in.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, heads(v, Lk), precision=precision)
    out = out.transpose(0, 2, 1, 3).reshape(B, Lq, D)
    return (qdense(out, p[f"{prefix}_o_w"], precision)
            + p[f"{prefix}_o_b"]).astype(q_in.dtype)


def _cross_attention_1q(q_in, enc_h, p, num_heads, precision):
    """Single-query cross-attention with the K/V projections reassociated.

    The decoder-embedding path runs exactly ONE query token over the [B, L, D]
    encoder state (whisper_embeddings_large.py:257-262). Projecting K and V
    from the full encoder state costs 2·L·D² FLOPs per layer — at L=1500,
    D=1280 that is ~315 GFLOP/clip across 32 layers, ~14% of the whole
    encoder (the measured extract-vs-encoder throughput gap). For one query
    the matmuls reassociate exactly:

        softmax((q·Wk_h)·encᵀ)              ==  softmax(q·(enc·Wk_h)ᵀ)
        (probs·enc)·Wv_h + bv_h             ==  probs·(enc·Wv_h + bv)

    (k_proj is bias-free in Whisper; softmax rows sum to 1, so the v-bias
    commutes out of the pooling). Both [L, D] @ [D, D] GEMMs become
    [1, D] @ [D, d] weight-side products plus two O(L·D·H) reductions —
    ~1000× fewer FLOPs, bitwise-equivalent up to matmul reassociation
    (bounded well under the 1e-3 fidelity bar by the golden tests).

    The head-side products (q̃, Wv fold) run in f32 — they are tiny — while
    the two [L, D]-wide einsums keep the activation dtype with f32
    accumulation, matching the einsum path's numerics profile.
    """
    B, Lq, D = q_in.shape
    assert Lq == 1, Lq
    hd = D // num_heads
    scale = hd**-0.5

    def wmat(w):
        # the turbo preset never quantizes the decoder (fidelity policy in
        # extract/pipeline.cast_params_for_preset), but dequantize rather
        # than mis-dispatch if a future preset does — at 1 token the [D, D]
        # dequant is noise
        if isinstance(w, dict):
            return w["q"].astype(jnp.float32) * w["s"]
        return w.astype(jnp.float32)

    q = jnp.einsum("bqd,de->bqe", q_in.astype(jnp.float32), wmat(p["xattn_q_w"]),
                   precision=precision)
    q = (q + p["xattn_q_b"].astype(jnp.float32)) * scale
    qh = q.reshape(B, num_heads, hd)
    wk = wmat(p["xattn_k_w"]).reshape(D, num_heads, hd)
    # q̃[b,h,:] = q_h·Wk_hᵀ — fold the key projection into the query
    qt = jnp.einsum("bhd,Dhd->bhD", qh, wk, precision=precision)
    logits = jnp.einsum(
        "bhD,blD->bhl", qt.astype(enc_h.dtype), enc_h,
        precision=precision, preferred_element_type=jnp.float32,
    )
    probs = jax.nn.softmax(logits, axis=-1)
    ctx = jnp.einsum(
        "bhl,blD->bhD", probs.astype(enc_h.dtype), enc_h,
        precision=precision, preferred_element_type=jnp.float32,
    )
    wv = wmat(p["xattn_v_w"]).reshape(D, num_heads, hd)
    out = jnp.einsum("bhD,Dhd->bhd", ctx, wv, precision=precision)
    out = out + p["xattn_v_b"].astype(jnp.float32).reshape(num_heads, hd)[None]
    out = out.reshape(B, 1, D).astype(q_in.dtype)
    from stutter_tpu.ops.quant import dense as qdense

    return (qdense(out, p["xattn_o_w"], precision)
            + p["xattn_o_b"]).astype(q_in.dtype)


def _ffn(x, p, precision):
    from stutter_tpu.ops.quant import dense as qdense

    h = (qdense(x, p["fc1_w"], precision) + p["fc1_b"]).astype(x.dtype)
    h = _gelu(h)
    # Measured negative result (scripts/whisper_turbo_fidelity_sweep2.py on
    # v5e): asymmetric activation quantization for this post-GELU fc2 input
    # (ops/quant.dense_asym) bought ~1% end-to-end fidelity (4.10e-4 ->
    # 4.05e-4) for -4% encoder throughput — the dominant int8 error lives in
    # attn_o (kept bf16 at preset-cast time), not in fc2's activation step.
    return (qdense(h, p["fc2_w"], precision) + p["fc2_b"]).astype(x.dtype)


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


def _stem_shifted_gemm(x, w, b, stride, precision, gelu=True):
    """k=3 conv as three shift-by-t GEMMs: y[i] = Σ_t x_pad[s·i + t] @ W_tᵀ.

    x: [B, L, C_in]; w: [C_out, C_in, 3] (OIH, as the checkpoint stores it);
    returns [B, L_out, C_out]. Keeps activations in [B, L, C] layout — no
    NCH transposes — and runs [L, C] @ [C, D] contractions the MXU tiles
    natively (the wavlm-stem lesson: XLA's conv lowering leaves the MXU
    underfed for 1-D stems; exact up to matmul reassociation, verified
    against the conv path in tests/test_whisper_fidelity.py).
    """
    L = x.shape[1]
    Lo = L // stride
    wt = jnp.swapaxes(w, 0, 2)  # [3, C_in, C_out]
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0)))
    y = sum(
        jnp.einsum("blc,cd->bld", xp[:, t:stride * (Lo - 1) + t + 1:stride],
                   wt[t], precision=precision)
        for t in range(3)
    )
    y = y + b.astype(y.dtype)[None, None, :]
    return _gelu(y) if gelu else y


def whisper_encoder_forward(
    params: Params,
    input_features: jax.Array,
    cfg: WhisperConfig,
    precision=jax.lax.Precision.HIGHEST,
    activation_dtype=jnp.float32,
    hidden_reducer=None,
    use_flash: bool = True,
    gemm_stem: bool = False,
):
    """[B, 80, 3000] log-mel -> (last_hidden [B, 1500, D], all_hidden [N+1, ...]).

    use_flash=False forces the einsum attention path — required under tensor
    parallelism, where a pallas_call has no GSPMD partitioning rule and would
    force its operands replicated.

    Input length is a hard contract (HF asserts 3000 mel frames,
    modeling_whisper.py:668-672). hidden_reducer, when given, is applied to
    every collected hidden state inside the scan (extraction pools there, so
    the [N+1, B, 1500, D] stack never materializes).
    """
    enc = params["encoder"]
    # stem convs, bias and gelu all run in the activation dtype (f32 on the
    # fidelity preset — identical numerics; bf16 on fast — halves the
    # [B, D, 3000] stem traffic); the positional add stays f32
    x = input_features.astype(activation_dtype)
    if gemm_stem:
        # shifted-GEMM stem (A/B: scripts/whisper_stem_ab.py)
        x = jnp.swapaxes(x, 1, 2)  # [B, 3000, mel]
        x = _stem_shifted_gemm(x, enc["conv1_w"].astype(activation_dtype),
                               enc["conv1_b"], 1, precision)
        x = _stem_shifted_gemm(x, enc["conv2_w"].astype(activation_dtype),
                               enc["conv2_b"], 2, precision)  # [B, 1500, D]
    else:
        x = jax.lax.conv_general_dilated(
            x, enc["conv1_w"].astype(activation_dtype), window_strides=(1,),
            padding=[(1, 1)],
            dimension_numbers=("NCH", "OIH", "NCH"), precision=precision,
        )
        x = _gelu(x + enc["conv1_b"].astype(x.dtype)[None, :, None])
        x = jax.lax.conv_general_dilated(
            x, enc["conv2_w"].astype(activation_dtype), window_strides=(2,),
            padding=[(1, 1)],
            dimension_numbers=("NCH", "OIH", "NCH"), precision=precision,
        )
        x = _gelu(x + enc["conv2_b"].astype(x.dtype)[None, :, None])
        x = jnp.swapaxes(x, 1, 2)  # [B, 1500, D]
    x = (x.astype(jnp.float32) + enc["pos_embed"][None].astype(jnp.float32)).astype(
        activation_dtype
    )

    eps = cfg.layer_norm_eps
    nh = cfg.encoder_attention_heads
    collect = (lambda h: h) if hidden_reducer is None else hidden_reducer

    def body(carry, layer):
        h = _layer_norm(carry, layer["ln1_s"], layer["ln1_b"], eps)
        new = carry + _attention(h, h, layer, "attn", nh, precision,
                                 allow_flash=use_flash)
        h = _layer_norm(new, layer["ln2_s"], layer["ln2_b"], eps)
        out = (new + _ffn(h, layer, precision)).astype(carry.dtype)
        return out, collect(carry)  # yield layer INPUT (HF hidden_states[i])

    last, states = jax.lax.scan(body, x, enc["layers"])
    # HF hidden_states: embedding output + each layer's output, with the
    # final LN applied to the last entry (modeling_whisper.py:697-725);
    # yielding carries gives entries 0..N-1, the final-LN output is appended.
    last = _layer_norm(last, enc["ln_s"], enc["ln_b"], eps)
    all_hidden = jnp.concatenate([states, collect(last)[None]], axis=0)
    return last, all_hidden


# ---------------------------------------------------------------------------
# Decoder (single step — the only decoder surface the reference uses)
# ---------------------------------------------------------------------------


def whisper_decoder_step(
    params: Params,
    encoder_hidden: jax.Array,
    token_id: int,
    cfg: WhisperConfig,
    precision=jax.lax.Precision.HIGHEST,
    activation_dtype=jnp.float32,
):
    """One decoder forward for a single start token.

    Replicates the reference's ``decoder(input_ids=zeros((1,1)))`` call
    (whisper_embeddings_large.py:257-262): token embedding + learned
    position 0, then self-attention over the single token and cross-attention
    over the 1500 encoder frames. Cross-attention uses the single-query
    reassociated form (_cross_attention_1q) — the full-width K/V projections
    that made this step cost ~14% of the encoder collapse to O(L·D·H) work,
    so extraction runs at ~encoder throughput. Returns
    (last_hidden [B, 1, D], all_hidden [N+1, B, 1, D]).
    """
    dec = params["decoder"]
    B = encoder_hidden.shape[0]
    tok = dec["embed_tokens"][token_id][None, None, :]  # [1, 1, D]
    pos = dec["pos_embed"][0][None, None, :]
    x = jnp.broadcast_to(tok + pos, (B, 1, cfg.d_model)).astype(activation_dtype)
    enc_h = encoder_hidden.astype(activation_dtype)

    eps = cfg.layer_norm_eps
    nh = cfg.decoder_attention_heads

    def body(carry, layer):
        h = _layer_norm(carry, layer["ln1_s"], layer["ln1_b"], eps)
        new = carry + _attention(h, h, layer, "attn", nh, precision, causal=True)
        h = _layer_norm(new, layer["ln2_s"], layer["ln2_b"], eps)
        new = new + _cross_attention_1q(h, enc_h, layer, nh, precision)
        h = _layer_norm(new, layer["ln3_s"], layer["ln3_b"], eps)
        out = (new + _ffn(h, layer, precision)).astype(carry.dtype)
        return out, carry  # yield layer INPUT (HF hidden_states[i])

    last, states = jax.lax.scan(body, x, dec["layers"])
    last = _layer_norm(last, dec["ln_s"], dec["ln_b"], eps)
    all_hidden = jnp.concatenate([states, last[None]], axis=0)
    return last, all_hidden


# ---------------------------------------------------------------------------
# Initialization
# ---------------------------------------------------------------------------


def init_whisper_params(rng: jax.Array, cfg: WhisperConfig, dtype=jnp.float32) -> Params:
    keys = iter(jax.random.split(rng, 32))
    D, F = cfg.d_model, cfg.ffn_dim

    def dense(k, fi, fo):
        return jax.random.normal(k, (fi, fo), dtype) * (fi**-0.5), jnp.zeros((fo,), dtype)

    def attn_params(k, prefix):
        ks = iter(jax.random.split(k, 8))
        q_w, q_b = dense(next(ks), D, D)
        k_w, _ = dense(next(ks), D, D)
        v_w, v_b = dense(next(ks), D, D)
        o_w, o_b = dense(next(ks), D, D)
        return {
            f"{prefix}_q_w": q_w, f"{prefix}_q_b": q_b, f"{prefix}_k_w": k_w,
            f"{prefix}_v_w": v_w, f"{prefix}_v_b": v_b,
            f"{prefix}_o_w": o_w, f"{prefix}_o_b": o_b,
        }

    def ln(name):
        return {f"{name}_s": jnp.ones((D,), dtype), f"{name}_b": jnp.zeros((D,), dtype)}

    def enc_layer(k):
        ks = iter(jax.random.split(k, 4))
        fc1_w, fc1_b = dense(next(ks), D, F)
        fc2_w, fc2_b = dense(next(ks), F, D)
        return {**attn_params(next(ks), "attn"), **ln("ln1"), **ln("ln2"),
                "fc1_w": fc1_w, "fc1_b": fc1_b, "fc2_w": fc2_w, "fc2_b": fc2_b}

    def dec_layer(k):
        ks = iter(jax.random.split(k, 5))
        fc1_w, fc1_b = dense(next(ks), D, F)
        fc2_w, fc2_b = dense(next(ks), F, D)
        return {**attn_params(next(ks), "attn"), **attn_params(next(ks), "xattn"),
                **ln("ln1"), **ln("ln2"), **ln("ln3"),
                "fc1_w": fc1_w, "fc1_b": fc1_b, "fc2_w": fc2_w, "fc2_b": fc2_b}

    enc_keys = jax.random.split(next(keys), cfg.encoder_layers)
    dec_keys = jax.random.split(next(keys), cfg.decoder_layers)
    enc_layers = jax.tree.map(lambda *xs: jnp.stack(xs), *[enc_layer(k) for k in enc_keys])
    dec_layers = jax.tree.map(lambda *xs: jnp.stack(xs), *[dec_layer(k) for k in dec_keys])

    return {
        "encoder": {
            "conv1_w": jax.random.normal(next(keys), (D, cfg.num_mel_bins, 3), dtype)
            * ((cfg.num_mel_bins * 3) ** -0.5),
            "conv1_b": jnp.zeros((D,), dtype),
            "conv2_w": jax.random.normal(next(keys), (D, D, 3), dtype) * ((D * 3) ** -0.5),
            "conv2_b": jnp.zeros((D,), dtype),
            "pos_embed": jnp.asarray(sinusoids(cfg.max_source_positions, D), dtype),
            "ln_s": jnp.ones((D,), dtype), "ln_b": jnp.zeros((D,), dtype),
            "layers": enc_layers,
        },
        "decoder": {
            "embed_tokens": jax.random.normal(next(keys), (cfg.vocab_size, D), dtype) * 0.02,
            "pos_embed": jax.random.normal(next(keys), (cfg.max_target_positions, D), dtype) * 0.02,
            "ln_s": jnp.ones((D,), dtype), "ln_b": jnp.zeros((D,), dtype),
            "layers": dec_layers,
        },
    }
