"""Probe: int8 attention matmuls inside the long fused WavLM kernel.

head_dim=64 pins BOTH long-bucket attention matmuls at 50% bf16 MXU
(QK^T contracts over K=64; AV outputs N=64) and two-head packing cannot fix
it (separating heads needs block-diagonal operands = 2x the MACs at 2x the
utilization — a wash). The int8 MXU path runs 2x the bf16 rate, so
quantizing the matmul operands IN-KERNEL doubles the effective rate of
exactly the matmuls the roofline pins:

  QK^T: q per-row symmetric int8 (absmax over d), k per-row int8;
        s = (qq @ kq^T) * sq[:, None] * sk[None, :]  (int32 accumulate)
  AV:   a in [0, 1] -> fixed scale 127 (round only); v per-COLUMN int8
        (absmax over L); out = (aq @ vq) * (1/127) * sv[None, :]

RESULT (kept, negative — artifacts/attn_int8_probe_r5.json): SLOWER than
the bf16 kernel (0.78-0.84x) — the kernel is VPU-bound on the softmax
chain, so trading MXU time for MORE VPU quantization work goes backwards.
The large measured cosine (~0.3-0.4) is additionally a known flaw of the
fixed-127 AV scale on DIFFUSE attention rows (mean prob ~1/L rounds to 0);
a per-row rowmax scale fixes the numerics but adds yet another [BQ, L]
reduction, moving speed further in the wrong direction — not pursued.

Probes, per (L, shape) case on the real TPU:
  1. compile + run (the remote service 500s opaquely on VMEM overflows —
     memory discipline: probe before wiring anything into source)
  2. numerics vs the f32 reference path (cosine over outputs)
  3. isolated chained timing vs the incumbent bf16 kernel at the real
     batch shape (coarse through the tunnel, but a 2x-level matmul effect
     is visible at ~60 ms/call scales)

    python scripts/attn_int8_probe.py
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cases", type=str, default="1008,30;1504,25")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--loops", type=int, default=3)
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()

    from stutter_tpu.cli.common import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from stutter_tpu.ops.wavlm_attention_pallas import wavlm_fused_attention_long
    from stutter_tpu.utils.benchmarking import chain_time

    def _int8_kernel(q_ref, k_ref, v_ref, bias_ref, gate_ref, mask_ref, out_ref):
        q = q_ref[0, 0].astype(jnp.float32)   # [BQ, d]
        k = k_ref[0, 0].astype(jnp.float32)   # [L, d]
        v = v_ref[0, 0].astype(jnp.float32)
        sq = jnp.maximum(jnp.max(jnp.abs(q), axis=1, keepdims=True), 1e-8) / 127.0
        sk = jnp.maximum(jnp.max(jnp.abs(k), axis=1, keepdims=True), 1e-8) / 127.0
        qq = jnp.round(q / sq).astype(jnp.int8)
        kq = jnp.round(k / sk).astype(jnp.int8)
        s32 = jax.lax.dot_general(
            qq, kq, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32)
        s = s32.astype(jnp.float32) * sq * sk.T  # [BQ, L]
        p = s + gate_ref[0, 0] * bias_ref[0] + mask_ref[0, 0][None, :]
        p_max = jnp.max(p, axis=-1, keepdims=True)
        e = jnp.exp(p - p_max)
        r = jnp.sum(e, axis=-1, keepdims=True)
        a = e / r  # [BQ, L] f32 in [0, 1]
        aq = jnp.round(a * 127.0).astype(jnp.int8)
        sv = jnp.maximum(jnp.max(jnp.abs(v), axis=0, keepdims=True), 1e-8) / 127.0
        vq = jnp.round(v / sv).astype(jnp.int8)
        o32 = jax.lax.dot_general(
            aq, vq, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
        out_ref[0, 0] = (o32.astype(jnp.float32) * (1.0 / 127.0) * sv).astype(
            out_ref.dtype)

    @functools.partial(jax.jit, static_argnames=("block_q",))
    def int8_attention_long(q, k, v, position_bias, gate, key_mask_bias,
                            block_q=512):
        B, H, L, d = q.shape
        assert L % block_q == 0, (L, block_q)
        grid = (H, L // block_q, B)
        q_spec = pl.BlockSpec((1, 1, block_q, d), lambda h, qb, b: (b, h, qb, 0),
                              memory_space=pltpu.VMEM)
        kv_spec = pl.BlockSpec((1, 1, L, d), lambda h, qb, b: (b, h, 0, 0),
                               memory_space=pltpu.VMEM)
        return pl.pallas_call(
            _int8_kernel,
            grid=grid,
            in_specs=[
                q_spec, kv_spec, kv_spec,
                pl.BlockSpec((1, block_q, L), lambda h, qb, b: (h, qb, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, block_q, 1), lambda h, qb, b: (b, h, qb, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, L), lambda h, qb, b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=q_spec,
            out_shape=jax.ShapeDtypeStruct((B, H, L, d), q.dtype),
        )(q, k, v, position_bias, gate[..., None], key_mask_bias[:, None, :])

    H, d = 16, 64
    out = {"metric": "attn_int8_probe", "cases": {}}
    for case in args.cases.split(";"):
        L, B = (int(x) for x in case.split(","))
        BQ = 504 if L % 504 == 0 else (376 if L % 376 == 0 else 512)
        rs = np.random.RandomState(0)
        mk = lambda *s: jax.device_put(jnp.asarray(
            rs.randn(*s).astype(np.float32) * 0.3, jnp.bfloat16))
        q, k, v = mk(B, H, L, d), mk(B, H, L, d), mk(B, H, L, d)
        bias = jax.device_put(jnp.asarray(rs.randn(H, L, L).astype(np.float32)))
        gate = jax.device_put(jnp.asarray(rs.rand(B, H, L).astype(np.float32)))
        mask = jax.device_put(jnp.zeros((B, L), jnp.float32))
        case_out = {"B": B, "block_q": BQ}

        # f32 einsum reference on a small slice (numerics bar)
        def ref(q, k, v, bias, gate, mask):
            s = jnp.einsum("bhld,bhmd->bhlm", q.astype(jnp.float32),
                           k.astype(jnp.float32))
            p = s + gate[..., None] * bias[None] + mask[:, None, None, :]
            a = jax.nn.softmax(p, axis=-1)
            return jnp.einsum("bhlm,bhmd->bhld", a, v.astype(jnp.float32))

        try:
            o8 = int8_attention_long(q, k, v, bias, gate, mask, block_q=BQ)
            o8.block_until_ready()
        except Exception as e:  # noqa: BLE001
            case_out["error"] = f"{type(e).__name__}: {str(e)[:300]}"
            out["cases"][f"L{L}"] = case_out
            print(json.dumps({f"L{L}": case_out}), flush=True)
            continue

        sl = (slice(0, 2),)
        o8_np = np.asarray(o8[sl], np.float64)
        ref_np = np.asarray(
            jax.jit(ref)(q[sl], k[sl], v[sl], bias, gate[sl], mask[sl]),
            np.float64)
        bf = wavlm_fused_attention_long(q, k, v, bias, gate, mask, block_q=BQ)
        bf_np = np.asarray(bf[sl], np.float64)

        def cos(a, b):
            a, b = a.reshape(-1), b.reshape(-1)
            return float(1 - a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

        case_out["int8_vs_f32_cosine"] = cos(o8_np, ref_np)
        case_out["bf16_vs_f32_cosine"] = cos(bf_np, ref_np)

        f8 = jax.jit(lambda *a: jnp.sum(
            int8_attention_long(*a, block_q=BQ).astype(jnp.float32)))
        fb = jax.jit(lambda *a: jnp.sum(
            wavlm_fused_attention_long(*a, block_q=BQ).astype(jnp.float32)))
        arr = (q, k, v, bias, gate, mask)
        float(f8(*arr)); float(fb(*arr))
        t8, tb = [], []
        for _ in range(args.loops):
            t8.append(chain_time(f8, arr, iters=args.iters))
            tb.append(chain_time(fb, arr, iters=args.iters))
        case_out["int8_ms"] = [round(t * 1e3, 2) for t in t8]
        case_out["bf16_ms"] = [round(t * 1e3, 2) for t in tb]
        case_out["speedup_min"] = round(min(tb) / min(t8), 3)
        out["cases"][f"L{L}"] = case_out
        print(json.dumps({f"L{L}": case_out}), flush=True)
        del q, k, v, bias, gate, mask

    print(json.dumps(out))
    if args.out:
        os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
