"""Attribute whisper turbo int8 error to GEMM classes and find the cheapest
fidelity fix (VERDICT r2 next #3: widen the 7.4e-4 margin to <4e-4 at ±3%
throughput).

For each candidate quant-key subset, quantizes only those keys, measures the
worst pooled-output cosine distance vs the f32/HIGHEST reference (same
surface as bench.py's whisper_turbo_fidelity), and times the encoder +
extract programs. Run on the real TPU:

    python scripts/whisper_turbo_fidelity_sweep.py
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
    from stutter_tpu.models.whisper import whisper_decoder_step, whisper_encoder_forward
    from stutter_tpu.ops.logmel_pallas import whisper_log_mel_pallas
    from stutter_tpu.ops.quant import WHISPER_QUANT_KEYS, quantize_layer_stack
    from stutter_tpu.utils.benchmarking import chain_time

    cfg = WhisperConfig.large()
    params_f32 = init_whisper_params(jax.random.key(0), cfg)
    params_fast = cast_params_for_preset(params_f32, "fast")
    fast = dict(precision=jax.lax.Precision.DEFAULT, activation_dtype=jnp.bfloat16)
    exact = dict(precision=jax.lax.Precision.HIGHEST, activation_dtype=jnp.float32)
    sel = jnp.asarray((cfg.encoder_layers, cfg.encoder_layers - 1,
                       cfg.encoder_layers - 2))

    def extract_fn(p, waves, opts):
        mel = whisper_log_mel_pallas(waves)
        enc_last, pooled = whisper_encoder_forward(
            p, mel, cfg, **opts,
            hidden_reducer=lambda h: jnp.mean(h.astype(jnp.float32), axis=1),
        )
        _, dec_states = whisper_decoder_step(p, enc_last, 0, cfg, **opts)
        return pooled[sel], dec_states[sel].astype(jnp.float32)[:, :, 0, :]

    rs = np.random.RandomState(0)
    small = jax.device_put((rs.randn(2, 480000) * 0.1).astype(np.float32))

    enc_ref, dec_ref = jax.jit(lambda p, w: extract_fn(p, w, exact))(params_f32, small)
    enc_ref = np.asarray(enc_ref, np.float64)
    dec_ref = np.asarray(dec_ref, np.float64)
    del params_f32

    def quantize_subset(enc_keys, dec_keys):
        p = dict(params_fast)
        for block, keys in (("encoder", enc_keys), ("decoder", dec_keys)):
            if keys and block in p:
                p[block] = dict(p[block])
                p[block]["layers"] = quantize_layer_stack(p[block]["layers"], keys)
        return p

    def fidelity(p):
        enc_t, dec_t = jax.jit(lambda pp, w: extract_fn(pp, w, fast))(p, small)
        worst = 0.0
        for ref, got in ((enc_ref, enc_t), (dec_ref, dec_t)):
            got = np.asarray(got, np.float64)
            for s in range(ref.shape[0]):
                for b in range(ref.shape[1]):
                    u, v = ref[s, b], got[s, b]
                    worst = max(
                        worst,
                        1.0 - u @ v / (np.linalg.norm(u) * np.linalg.norm(v)),
                    )
        return worst

    ALL = WHISPER_QUANT_KEYS
    # named configurations: (encoder keys, decoder keys)
    configs = {
        "full_turbo": (ALL, ALL),
        "enc_only": (ALL, ()),
        "dec_only": ((), ALL),
        "no_fc2": (tuple(k for k in ALL if k != "fc2_w"),
                   tuple(k for k in ALL if k != "fc2_w")),
        "no_xattn": (tuple(k for k in ALL if not k.startswith("xattn")),
                     tuple(k for k in ALL if not k.startswith("xattn"))),
        "no_attn_o": (tuple(k for k in ALL if k != "attn_o_w"),
                      tuple(k for k in ALL if k != "attn_o_w")),
        "enc_all_dec_no_xattn": (
            ALL, tuple(k for k in ALL if not k.startswith("xattn"))),
    }

    out = {}
    for name, (ek, dk) in configs.items():
        try:
            out[name] = round(float(fidelity(quantize_subset(ek, dk))), 8)
            print(f"{name}: {out[name]:.2e}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {e}", flush=True)

    # throughput check on the most promising subsets vs full turbo
    waves = jax.device_put((rs.randn(8, 480000) * 0.1).astype(np.float32))

    @jax.jit
    def enc_only_t(p, w):
        mel = whisper_log_mel_pallas(w)
        _, pooled = whisper_encoder_forward(
            p, mel, cfg, **fast,
            hidden_reducer=lambda h: jnp.mean(h.astype(jnp.float32), axis=1),
        )
        return jnp.sum(pooled[sel])

    @jax.jit
    def extract_t(p, w):
        enc, dec = extract_fn(p, w, fast)
        return jnp.sum(enc) + jnp.sum(dec)

    tp = {}
    for name in ("full_turbo", "no_fc2", "no_xattn", "enc_all_dec_no_xattn"):
        ek, dk = configs[name]
        p = quantize_subset(ek, dk)
        float(enc_only_t(p, waves))  # compile+warm
        t_enc = chain_time(enc_only_t, (p, waves), iters=5)
        float(extract_t(p, waves))
        t_ext = chain_time(extract_t, (p, waves), iters=5)
        tp[name] = {
            "encoder_audio_s_per_s": round(8 * 30.0 / t_enc, 2),
            "extract_audio_s_per_s": round(8 * 30.0 / t_ext, 2),
        }
        print(f"{name}: {tp[name]}", flush=True)
        del p

    print(json.dumps({"fidelity": out, "throughput": tp}))


if __name__ == "__main__":
    main()
