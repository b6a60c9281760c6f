"""Probe: softmax-chain variants of the long fused WavLM attention kernel.

The int8-matmul probe (artifacts/attn_int8_probe_r5.json) showed the long
kernel is VPU-bound, not MXU-bound: at B=30/H=16/L=1008/d=64 the bf16
kernel reads ~6.5 ms/call while its two matmuls at 50% MXU account for only
~1.3 ms — the [BQ, L] f32 elementwise chain (gate*bias add, max, sub, exp,
normalize) dominates. So the lever for the 20/30 s buckets is cheaper
softmax elementwise work, not faster matmuls. Variants:

  A incumbent: f32 chain, divide-then-AV (ops/wavlm_attention_pallas.py)
  B postnorm:  AV on UNNORMALIZED e (bf16), scale rows by 1/r after the
               matmul — replaces a [BQ, L] multiply with a [BQ, d] one
  C bf16chain: p assembled and exp'd in bf16 (bias/gate cast once), row
               sum in f32 — halves VPU element width for the whole chain
               (r4's exp-only A/B kept the chain f32 and measured negative;
               this is the full-chain version)
  D both:      B + C

    python scripts/attn_softmax_variants_probe.py
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

    def make_kernel(postnorm: bool, bf16chain: bool):
        def kern(q_ref, k_ref, v_ref, bias_ref, gate_ref, mask_ref, out_ref):
            q = q_ref[0, 0]
            k = k_ref[0, 0]
            v = v_ref[0, 0]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            if bf16chain:
                p = (s.astype(jnp.bfloat16)
                     + gate_ref[0, 0].astype(jnp.bfloat16)
                     * bias_ref[0].astype(jnp.bfloat16)
                     + mask_ref[0, 0][None, :].astype(jnp.bfloat16))
                p_max = jnp.max(p, axis=-1, keepdims=True)
                e = jnp.exp(p - p_max)
                r = jnp.sum(e, axis=-1, keepdims=True, dtype=jnp.float32)
            else:
                p = s + gate_ref[0, 0] * bias_ref[0] + mask_ref[0, 0][None, :]
                p_max = jnp.max(p, axis=-1, keepdims=True)
                e = jnp.exp(p - p_max)
                r = jnp.sum(e, axis=-1, keepdims=True)
            if postnorm:
                o = jax.lax.dot_general(
                    e.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                out_ref[0, 0] = (o / r).astype(out_ref.dtype)
            else:
                a = (e / r).astype(v.dtype) if not bf16chain else (
                    e * (1.0 / r).astype(e.dtype)).astype(v.dtype)
                out_ref[0, 0] = jax.lax.dot_general(
                    a, v, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(out_ref.dtype)
        return kern

    @functools.partial(jax.jit, static_argnames=("block_q", "postnorm", "bf16chain"))
    def variant(q, k, v, position_bias, gate, key_mask_bias,
                block_q=512, postnorm=False, bf16chain=False):
        B, H, L, d = q.shape
        assert L % block_q == 0
        grid = (H, L // block_q, B)
        q_spec = pl.BlockSpec((1, 1, block_q, d), lambda h, qb, b: (b, h, qb, 0),
                              memory_space=pltpu.VMEM)
        kv_spec = pl.BlockSpec((1, 1, L, d), lambda h, qb, b: (b, h, 0, 0),
                               memory_space=pltpu.VMEM)
        return pl.pallas_call(
            make_kernel(postnorm, bf16chain),
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
    out = {"metric": "attn_softmax_variants_probe", "cases": {}}
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
        arr = (q, k, v, bias, gate, mask)
        case_out = {"B": B, "block_q": BQ}

        def ref(q, k, v, bias, gate, mask):
            s = jnp.einsum("bhld,bhmd->bhlm", q.astype(jnp.float32),
                           k.astype(jnp.float32))
            p = s + gate[..., None] * bias[None] + mask[:, None, None, :]
            a = jax.nn.softmax(p, axis=-1)
            return jnp.einsum("bhlm,bhmd->bhld", a, v.astype(jnp.float32))

        sl = (slice(0, 2),)
        ref_np = np.asarray(
            jax.jit(ref)(q[sl], k[sl], v[sl], bias, gate[sl], mask[sl]),
            np.float64)

        variants = {
            "A_incumbent": dict(postnorm=False, bf16chain=False),
            "B_postnorm": dict(postnorm=True, bf16chain=False),
            "C_bf16chain": dict(postnorm=False, bf16chain=True),
            "D_both": dict(postnorm=True, bf16chain=True),
        }
        fns = {}
        for name, kw in variants.items():
            try:
                f = jax.jit(lambda *a, kw=kw: jnp.sum(
                    variant(*a, block_q=BQ, **kw).astype(jnp.float32)))
                o = variant(*arr, block_q=BQ, **kw)
                o_np = np.asarray(o[sl], np.float64)
                a_, b_ = o_np.reshape(-1), ref_np.reshape(-1)
                case_out[name + "_cosine"] = float(
                    1 - a_ @ b_ / (np.linalg.norm(a_) * np.linalg.norm(b_)))
                float(f(*arr))
                fns[name] = f
            except Exception as e:  # noqa: BLE001
                case_out[name + "_error"] = f"{type(e).__name__}: {str(e)[:200]}"
        # incumbent source kernel as the absolute baseline
        fns["src_incumbent"] = jax.jit(lambda *a: jnp.sum(
            wavlm_fused_attention_long(*a, block_q=BQ).astype(jnp.float32)))
        float(fns["src_incumbent"](*arr))

        times = {k: [] for k in fns}
        for _ in range(args.loops):
            for name, f in fns.items():
                times[name].append(chain_time(f, arr, iters=args.iters))
        for name, ts in times.items():
            case_out[name + "_ms"] = [round(t * 1e3, 2) for t in ts]
        out["cases"][f"L{L}"] = case_out
        print(json.dumps({f"L{L}": case_out}), flush=True)
        del q, k, v, bias, gate, mask, arr

    print(json.dumps(out))
    if args.out:
        os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
