"""Per-conv stem profile on the real TPU: which of the 7 convs eats the time.

Times each conv stage in isolation (bf16, VALID, NHC) plus its norm+gelu
epilogue, with the chained-accumulator method.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, args, iters=10):
    acc = fn(*args)
    float(acc)
    t0 = time.perf_counter()
    acc = fn(*args)
    for _ in range(iters - 1):
        acc = acc + fn(*args)
    float(acc)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    from stutter_tpu.cli.common import enable_compilation_cache

    enable_compilation_cache()
    from stutter_tpu.models import WavLMConfig

    cfg = WavLMConfig.large()
    B = 128
    T = 51280
    rs = np.random.RandomState(0)

    lens, cin = T, 1
    report = []
    for i, (cout, k, s) in enumerate(zip(cfg.conv_dim, cfg.conv_kernel, cfg.conv_stride)):
        x = jax.device_put(jnp.asarray(
            (rs.randn(B, lens, cin) * 0.1).astype(np.float32), jnp.bfloat16))
        w = jax.device_put(jnp.asarray(
            (rs.randn(k, cin, cout) * 0.05).astype(np.float32), jnp.bfloat16))
        scale = jax.device_put(jnp.ones((cout,), jnp.float32))
        bias = jax.device_put(jnp.zeros((cout,), jnp.float32))

        def conv_only(x, w):
            y = jax.lax.conv_general_dilated(
                x, w, window_strides=(s,), padding="VALID",
                dimension_numbers=("NHC", "HIO", "NHC"),
            )
            return jnp.sum(y.astype(jnp.float32))

        def conv_ln_gelu(x, w, scale, bias):
            y = jax.lax.conv_general_dilated(
                x, w, window_strides=(s,), padding="VALID",
                dimension_numbers=("NHC", "HIO", "NHC"),
            )
            yf = y.astype(jnp.float32)
            mean = jnp.mean(yf, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(yf - mean), axis=-1, keepdims=True)
            yf = (yf - mean) * jax.lax.rsqrt(var + 1e-5) * scale + bias
            y = jax.nn.gelu(yf.astype(jnp.bfloat16), approximate=False)
            return jnp.sum(y.astype(jnp.float32))

        t_conv = timeit(jax.jit(conv_only), (x, w))
        t_full = timeit(jax.jit(conv_ln_gelu), (x, w, scale, bias))
        out_len = (lens - k) // s + 1
        gflop = 2 * B * out_len * cout * cin * k / 1e9
        report.append({
            "conv": i, "in": [lens, cin], "out": [out_len, cout], "k": k, "s": s,
            "conv_ms": round(t_conv * 1e3, 2),
            "conv_ln_gelu_ms": round(t_full * 1e3, 2),
            "gflop": round(gflop, 1),
            "conv_tflops": round(gflop / t_conv / 1e3, 1),
        })
        print(json.dumps(report[-1]), flush=True)
        lens, cin = out_len, cout

    total = sum(r["conv_ln_gelu_ms"] for r in report)
    print(json.dumps({"total_conv_ln_gelu_ms": round(total, 2)}))


if __name__ == "__main__":
    main()
