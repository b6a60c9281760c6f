"""Stem component dissection: convs-only vs +norm vs +gelu, one jit each."""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


from stutter_tpu.utils.benchmarking import chain_time as timeit


def main():
    import jax
    import jax.numpy as jnp

    from stutter_tpu.cli.common import enable_compilation_cache

    enable_compilation_cache()
    from stutter_tpu.extract.pipeline import cast_params_for_preset
    from stutter_tpu.models import WavLMConfig, init_wavlm_params
    from stutter_tpu.models.wavlm import _stem_conv, layer_norm

    cfg = WavLMConfig.large()
    params = cast_params_for_preset(init_wavlm_params(jax.random.key(0), cfg), "fast")
    conv_layers = params["feature_encoder"]["conv_layers"]
    B, T = 128, 51280
    rs = np.random.RandomState(0)
    waves = jax.device_put((rs.randn(B, T) * 0.1).astype(np.float32))

    def stem(w, use_norm, use_gelu, use_bias):
        x = w[:, :, None].astype(jnp.bfloat16)
        for i, layer in enumerate(conv_layers):
            x = _stem_conv(x, layer["w"], cfg.conv_stride[i], jax.lax.Precision.DEFAULT)
            if use_bias and layer.get("b") is not None:
                x = x + layer["b"].astype(x.dtype)[None, None, :]
            if use_norm:
                x = layer_norm(x, layer["norm"], 1e-5)
            if use_gelu:
                x = jax.nn.gelu(x, approximate=False)
        return jnp.sum(x.astype(jnp.float32))

    variants = {
        "convs_only": (False, False, False),
        "convs_bias": (False, False, True),
        "convs_bias_norm": (True, False, True),
        "convs_bias_norm_gelu": (True, True, True),
    }
    out = {}
    for name, (n, g, b) in variants.items():
        f = jax.jit(lambda w, n=n, g=g, b=b: stem(w, n, g, b))
        out[name] = round(timeit(f, (waves,)) * 1e3, 2)
        print(json.dumps({name: out[name]}), flush=True)

    # gelu tanh-approx variant
    def stem_approx(w):
        x = w[:, :, None].astype(jnp.bfloat16)
        for i, layer in enumerate(conv_layers):
            x = _stem_conv(x, layer["w"], cfg.conv_stride[i], jax.lax.Precision.DEFAULT)
            if layer.get("b") is not None:
                x = x + layer["b"].astype(x.dtype)[None, None, :]
            x = layer_norm(x, layer["norm"], 1e-5)
            x = jax.nn.gelu(x, approximate=True)
        return jnp.sum(x.astype(jnp.float32))

    out["gelu_tanh_approx"] = round(timeit(jax.jit(stem_approx), (waves,)) * 1e3, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
