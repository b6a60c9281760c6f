"""Does int8 x int8 -> int32 hit the v5e MXU 8-bit path through XLA?

v5e peak: 197 TFLOP/s bf16, 394 TOPS int8. If XLA lowers
lax.dot_general(int8, int8, preferred_element_type=int32) to the 8-bit MXU
mode, a big GEMM should run ~2x the bf16 rate. Measures the wavlm-large FFN
shape [B*L, 1024] x [1024, 4096] plus the dequant epilogue, and a fused
quantize->gemm->dequant round trip (the real per-layer cost).
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

    M, K, N = 128 * 144, 1024, 4096
    rs = np.random.RandomState(0)
    x_bf = jax.device_put(jnp.asarray(rs.randn(M, K).astype(np.float32), jnp.bfloat16))
    w_bf = jax.device_put(jnp.asarray(rs.randn(K, N).astype(np.float32) * 0.02, jnp.bfloat16))
    x_i8 = jax.device_put((rs.randint(-127, 128, (M, K))).astype(np.int8))
    w_i8 = jax.device_put((rs.randint(-127, 128, (K, N))).astype(np.int8))
    sx = jax.device_put(jnp.asarray(rs.rand(M).astype(np.float32) * 0.01))
    sw = jax.device_put(jnp.asarray(rs.rand(N).astype(np.float32) * 0.01))

    @jax.jit
    def gemm_bf16(x, w):
        return jnp.sum(jnp.dot(x, w).astype(jnp.float32))

    @jax.jit
    def gemm_i8(x, w, a, b):
        acc = jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        y = acc.astype(jnp.float32) * a[:, None] * b[None, :]
        return jnp.sum(y)

    @jax.jit
    def gemm_i8_roundtrip(x, w, b):
        # dynamic per-row activation quant (the real runtime epilogue/prologue)
        s = jnp.max(jnp.abs(x).astype(jnp.float32), axis=1) / 127.0
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / s[:, None]), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(xq, w, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        y = (acc.astype(jnp.float32) * s[:, None] * b[None, :]).astype(jnp.bfloat16)
        return jnp.sum(y.astype(jnp.float32))

    flops = 2.0 * M * K * N
    out = {"shape": [M, K, N]}
    t = chain_time(gemm_bf16, (x_bf, w_bf), iters=30)
    out["bf16_tflops"] = round(flops / t / 1e12, 1)
    t = chain_time(gemm_i8, (x_i8, w_i8, sx, sw), iters=30)
    out["int8_tflops"] = round(flops / t / 1e12, 1)
    t = chain_time(gemm_i8_roundtrip, (x_bf, w_i8, sw), iters=30)
    out["int8_roundtrip_tflops"] = round(flops / t / 1e12, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
