"""Whisper-large bf16 encoder scan decomposition: attention vs FFN shares.

Stretch item VERDICT r4 #9 (whisper bf16 MFU 0.556 -> >=0.6): the stage
profile shows the layer scan IS the whole encoder cost (scan 164 ms ==
full 163 ms at B=8 — mel/stem fuse/overlap away). This times ablated scans
(attention-only, ffn-only, ln-only) to locate the non-MXU time, plus a
flash-vs-einsum attention A/B at the whisper shape (L=1500, hd=64, no
bias — the wavlm crossover at L=1008 need not transfer).

    python scripts/profile_whisper_scan_split.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from stutter_tpu.cli.common import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from stutter_tpu.extract.pipeline import cast_params_for_preset
    from stutter_tpu.models import WhisperConfig, init_whisper_params
    from stutter_tpu.models.whisper import _attention, _ffn, _layer_norm
    from stutter_tpu.utils.benchmarking import chain_time

    cfg = WhisperConfig.large()
    params = cast_params_for_preset(init_whisper_params(jax.random.key(0), cfg), "fast")
    B = int(os.environ.get("PROFILE_BATCH", "8"))
    rs = np.random.RandomState(0)
    hidden = jax.device_put(jnp.asarray(
        (rs.randn(B, cfg.max_source_positions, cfg.d_model) * 0.05)
        .astype(np.float32), jnp.bfloat16))
    enc = params["encoder"]
    eps = cfg.layer_norm_eps
    nh = cfg.encoder_attention_heads
    prec = jax.lax.Precision.DEFAULT

    def make_scan(use_attn, use_ffn, allow_flash=True):
        def body(carry, layer):
            h = carry
            if use_attn:
                hh = _layer_norm(h, layer["ln1_s"], layer["ln1_b"], eps)
                h = h + _attention(hh, hh, layer, "attn", nh, prec,
                                   allow_flash=allow_flash)
            if use_ffn:
                hh = _layer_norm(h, layer["ln2_s"], layer["ln2_b"], eps)
                h = (h + _ffn(hh, layer, prec)).astype(carry.dtype)
            h = h.astype(carry.dtype)
            return h, jnp.mean(carry.astype(jnp.float32), axis=1)

        def fn(p, x):
            last, states = jax.lax.scan(body, x, p["layers"])
            return jnp.sum(states) + jnp.sum(last.astype(jnp.float32))

        return jax.jit(fn)

    variants = {
        "full": make_scan(True, True),
        "attn_only": make_scan(True, False),
        "ffn_only": make_scan(False, True),
        "full_einsum_attn": make_scan(True, True, allow_flash=False),
    }
    for f in variants.values():
        float(f(enc, hidden))
    times = {k: [] for k in variants}
    for _ in range(3):
        for k, f in variants.items():
            times[k].append(chain_time(f, (enc, hidden), iters=6))
    out = {"metric": "whisper_scan_split", "batch": B}
    for k, ts in times.items():
        out[k + "_ms"] = [round(t * 1e3, 2) for t in ts]
        out[k + "_min_ms"] = round(min(ts) * 1e3, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
