"""Attention-core variants under turbo: where do the [B,H,L,L] passes go?

Variants of the short-bucket (einsum) attention at B=128, L=144:
- current:   gated bias formed in f32, cast bf16, added to bf16 logits
- bias_bf16: gate and position bias multiplied directly in bf16
- no_gate:   position bias added without the per-token gate (lower bound)
- no_bias:   plain softmax(qk) (absolute lower bound for the core)
All keep the q/k/v/o int8 projections identical; only the core changes.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from stutter_tpu.cli.common import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from stutter_tpu.extract.pipeline import cast_params_for_preset
    from stutter_tpu.models import WavLMConfig, init_wavlm_params
    from stutter_tpu.models.wavlm import compute_position_bias, layer_norm
    from stutter_tpu.ops.quant import dense as qdense
    from stutter_tpu.utils.benchmarking import chain_time

    cfg = WavLMConfig.large()
    params = cast_params_for_preset(init_wavlm_params(jax.random.key(0), cfg), "turbo")
    enc = params["encoder"]
    B, L = 128, 144
    H, hd = cfg.num_attention_heads, cfg.head_dim
    D = cfg.hidden_size
    prec = jax.lax.Precision.DEFAULT
    rs = np.random.RandomState(0)
    hidden = jax.device_put(jnp.asarray(
        (rs.randn(B, L, D) * 0.05).astype(np.float32), jnp.bfloat16))
    pb = compute_position_bias(enc["rel_attn_embed"], L, cfg)
    pb_bf = pb.astype(jnp.bfloat16)
    scale = hd**-0.5

    def attn(l, x, mode):
        def heads(t):
            return t.reshape(B, L, H, hd).transpose(0, 2, 1, 3)

        proj = (jnp.einsum("blhd,de->blhe", x.reshape(B, L, H, hd), l["gru_w"],
                           precision=prec) + l["gru_b"])
        proj = proj.reshape(B, L, H, 2, 4).sum(-1)
        gates = jax.nn.sigmoid(proj.astype(jnp.float32).transpose(0, 2, 1, 3))
        gate = gates[..., 0] * (gates[..., 1] * l["gru_const"].reshape(1, H, 1) - 1.0) + 2.0

        q = heads((qdense(x, l["q_w"], prec) + l["q_b"]).astype(x.dtype))
        k = heads((qdense(x, l["k_w"], prec) + l["k_b"]).astype(x.dtype))
        v = heads((qdense(x, l["v_w"], prec) + l["v_b"]).astype(x.dtype))
        logits = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k, precision=prec)
        if mode == "current":
            logits = logits + (gate[..., None] * pb[None].astype(jnp.float32)
                               ).astype(jnp.bfloat16)
        elif mode == "bias_bf16":
            logits = logits + gate.astype(jnp.bfloat16)[..., None] * pb_bf[None]
        elif mode == "no_gate":
            logits = logits + pb_bf[None]
        attn_w = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn_w, v, precision=prec)
        out = out.transpose(0, 2, 1, 3).reshape(B, L, D)
        return (qdense(out, l["o_w"], prec) + l["o_b"]).astype(x.dtype)

    def scan_over(mode):
        @jax.jit
        def f(layers, h):
            def body(c, l):
                a_in = layer_norm(c, {"scale": l["ln1_s"], "bias": l["ln1_b"]}, 1e-5)
                return ((c + attn(l, a_in, mode)).astype(c.dtype),
                        jnp.mean(c.astype(jnp.float32), axis=1))
            out, states = jax.lax.scan(body, h, layers)
            return jnp.sum(states) + jnp.sum(out.astype(jnp.float32))
        return f

    out = {}
    for mode in ("current", "bias_bf16", "no_gate", "no_bias"):
        t = chain_time(scan_over(mode), (enc["layers"], hidden), iters=10)
        out[f"{mode}_ms"] = round(t * 1e3, 2)
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
