"""24-layer FFN chain (wavlm-large shape) bf16 vs dynamic-int8.

Models the real integration: per-token dynamic activation quant + static
per-channel weight quant on fc1/fc2, gelu + residual in bf16, inside a
lax.scan over 24 layers — the same program structure as wavlm_encoder.
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

    from stutter_tpu.utils.benchmarking import chain_time

    B, L, D, F, N = 128, 144, 1024, 4096, 24
    rs = np.random.RandomState(0)
    x = jax.device_put(jnp.asarray(rs.randn(B * L, D).astype(np.float32) * 0.5,
                                   jnp.bfloat16))
    w1 = rs.randn(N, D, F).astype(np.float32) * (D ** -0.5)
    w2 = rs.randn(N, F, D).astype(np.float32) * (F ** -0.5)
    w1_bf = jax.device_put(jnp.asarray(w1, jnp.bfloat16))
    w2_bf = jax.device_put(jnp.asarray(w2, jnp.bfloat16))

    def quant_w(w):  # per-output-channel symmetric
        s = np.abs(w).max(axis=-2, keepdims=True) / 127.0
        q = np.clip(np.round(w / s), -127, 127).astype(np.int8)
        return jax.device_put(q), jax.device_put(jnp.asarray(s.squeeze(-2), jnp.float32))

    w1_q, s1 = quant_w(w1)
    w2_q, s2 = quant_w(w2)

    @jax.jit
    def ffn_bf16(x, w1, w2):
        def body(h, ws):
            a, b = ws
            y = jax.nn.gelu(jnp.dot(h, a), approximate=True)
            return (h + jnp.dot(y, b)).astype(h.dtype), None
        out, _ = jax.lax.scan(body, x, (w1, w2))
        return jnp.sum(out.astype(jnp.float32))

    def qdot(h, wq, sw):
        s = jnp.max(jnp.abs(h).astype(jnp.float32), axis=-1) / 127.0
        s = jnp.maximum(s, 1e-8)
        hq = jnp.clip(jnp.round(h.astype(jnp.float32) / s[:, None]), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(hq, wq, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        return acc.astype(jnp.float32) * s[:, None] * sw[None, :]

    @jax.jit
    def ffn_int8(x, w1q, s1, w2q, s2):
        def body(h, ws):
            a, sa, b, sb = ws
            y = jax.nn.gelu(qdot(h, a, sa), approximate=True).astype(jnp.bfloat16)
            return (h + qdot(y, b, sb).astype(jnp.bfloat16)).astype(h.dtype), None
        out, _ = jax.lax.scan(body, x, (w1q, s1, w2q, s2))
        return jnp.sum(out.astype(jnp.float32))

    flops = 2.0 * B * L * D * F * 2 * N
    out = {}
    print("timing bf16...", flush=True)
    t = chain_time(ffn_bf16, (x, w1_bf, w2_bf), iters=10)
    out["bf16_ms"] = round(t * 1e3, 2)
    out["bf16_tflops"] = round(flops / t / 1e12, 1)
    print(json.dumps(out), flush=True)
    print("timing int8...", flush=True)
    t = chain_time(ffn_int8, (x, w1_q, s1, w2_q, s2), iters=10)
    out["int8_ms"] = round(t * 1e3, 2)
    out["int8_tflops"] = round(flops / t / 1e12, 1)
    print(json.dumps(out), flush=True)

    # numeric sanity: relative error of one int8 layer vs f32
    y_ref = np.asarray(jnp.dot(x.astype(jnp.float32), jnp.asarray(w1[0])))
    y_q = np.asarray(qdot(x, w1_q[0], s1[0]))
    out["layer_rel_err"] = float(np.linalg.norm(y_q - y_ref) / np.linalg.norm(y_ref))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
