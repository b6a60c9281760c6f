"""Block-size sweep for wavlm_fused_attention_long at the 30 s bucket shape."""

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

    from stutter_tpu.ops.wavlm_attention_pallas import wavlm_fused_attention_long
    from stutter_tpu.utils.benchmarking import chain_time

    B, H, L, d = 12, 16, 1536, 64
    rs = np.random.RandomState(0)
    q = jax.device_put(jnp.asarray(rs.randn(B, H, L, d).astype(np.float32) * 0.1,
                                   jnp.bfloat16))
    k = jax.device_put(jnp.asarray(rs.randn(B, H, L, d).astype(np.float32) * 0.1,
                                   jnp.bfloat16))
    v = jax.device_put(jnp.asarray(rs.randn(B, H, L, d).astype(np.float32) * 0.1,
                                   jnp.bfloat16))
    bias = jax.device_put(jnp.asarray(rs.randn(H, L, L).astype(np.float32)))
    gate = jax.device_put(jnp.asarray(rs.rand(B, H, L).astype(np.float32)))
    mask = jax.device_put(jnp.zeros((B, L), jnp.float32))

    out = {}
    for bq in (128, 256, 512, 768):
        f = jax.jit(lambda q, k, v, b, g, m, bq=bq: jnp.sum(
            wavlm_fused_attention_long(q, k, v, b, g, m, block_q=bq)
            .astype(jnp.float32)))
        t = chain_time(f, (q, k, v, bias, gate, mask), iters=10)
        out[f"bq{bq}_ms"] = round(t * 1e3, 2)
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
