"""WavLM-Large encoder dissection under the int8 turbo preset.

Times scan variants with pieces knocked out to attribute the ~97 ms
encoder: attention-only, ffn-only, projections-only, and the full layer.
Numbers are not additive (fusion changes at boundaries) but rank the
targets for the next optimization.
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
    from stutter_tpu.models.wavlm import (
        _encoder_layer,
        compute_position_bias,
        feed_forward,
        gated_relpos_attention,
        layer_norm,
    )
    from stutter_tpu.ops.quant import dense as qdense
    from stutter_tpu.utils.benchmarking import chain_time

    cfg = WavLMConfig.large()
    params = cast_params_for_preset(init_wavlm_params(jax.random.key(0), cfg), "turbo")
    enc = params["encoder"]
    B, L = 128, 144
    prec = jax.lax.Precision.DEFAULT
    rs = np.random.RandomState(0)
    hidden = jax.device_put(jnp.asarray(
        (rs.randn(B, L, cfg.hidden_size) * 0.05).astype(np.float32), jnp.bfloat16))
    lengths = jax.device_put(np.full((B,), L, np.int32))

    def scan_over(body):
        @jax.jit
        def f(layers, h):
            out, states = jax.lax.scan(
                lambda c, l: (body(l, c).astype(c.dtype),
                              jnp.mean(c.astype(jnp.float32), axis=1)),
                h, layers)
            return jnp.sum(states) + jnp.sum(out.astype(jnp.float32))
        return f

    pb = compute_position_bias(enc["rel_attn_embed"], L, cfg)
    kmb = jnp.zeros((B, 1, 1, L), jnp.float32)

    variants = {
        "full_layer": lambda l, c: _encoder_layer(l, c, pb, kmb, cfg, prec),
        "attn_only": lambda l, c: c + gated_relpos_attention(
            l, layer_norm(c, {"scale": l["ln1_s"], "bias": l["ln1_b"]}, 1e-5),
            pb, kmb, cfg, prec),
        "ffn_only": lambda l, c: c + feed_forward(
            l, layer_norm(c, {"scale": l["ln2_s"], "bias": l["ln2_b"]}, 1e-5), prec),
        "proj_only": lambda l, c: c + qdense(
            qdense(c, l["q_w"], prec).astype(c.dtype), l["o_w"], prec).astype(c.dtype),
    }
    out = {}
    for name, body in variants.items():
        t = chain_time(scan_over(body), (enc["layers"], hidden), iters=10)
        out[f"{name}_ms"] = round(t * 1e3, 2)
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
