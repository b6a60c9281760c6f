"""Round-2 sweep for the whisper turbo config (after the bf16-decoder and
asym-fc2 changes): does precomputing the asym colsum recover the encoder
throughput, and does keeping encoder attn_o in bf16 buy fidelity at <=3%?

All configs keep the decoder bf16 (the production turbo choice). Run on the
real TPU:  python scripts/whisper_turbo_fidelity_sweep2.py
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

    import stutter_tpu.ops.quant as quant
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
    waves = jax.device_put((rs.randn(8, 480000) * 0.1).astype(np.float32))

    enc_ref, dec_ref = jax.jit(lambda p, w: extract_fn(p, w, exact))(params_f32, small)
    enc_ref = np.asarray(enc_ref, np.float64)
    dec_ref = np.asarray(dec_ref, np.float64)
    del params_f32

    def quantize_enc(keys):
        p = dict(params_fast)
        p["encoder"] = dict(p["encoder"])
        p["encoder"]["layers"] = quantize_layer_stack(p["encoder"]["layers"], keys)
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

    # fresh jit wrappers per config: sym- and asym-fc2 configs share a param
    # pytree STRUCTURE, so a module-level @jax.jit would silently reuse the
    # first config's trace for the second
    def make_enc_only():
        def f(p, w):
            mel = whisper_log_mel_pallas(w)
            _, pooled = whisper_encoder_forward(
                p, mel, cfg, **fast,
                hidden_reducer=lambda h: jnp.mean(h.astype(jnp.float32), axis=1),
            )
            return jnp.sum(pooled[sel])
        return jax.jit(f)

    def make_extract():
        return jax.jit(lambda p, w: sum(map(jnp.sum, extract_fn(p, w, fast))))

    ALL = WHISPER_QUANT_KEYS
    NO_ATTN_O = tuple(k for k in ALL if k != "attn_o_w")
    _dense_asym_orig = quant.dense_asym

    # (name, encoder keys, use the asym fc2 path?)
    configs = [
        ("prod_asym_fc2", ALL, True),          # the shipped config
        ("sym_fc2", ALL, False),               # sweep-1 enc_only re-measured
        ("no_attn_o_asym_fc2", NO_ATTN_O, True),
        ("no_attn_o_sym_fc2", NO_ATTN_O, False),
    ]
    out = {}
    for name, keys, asym in configs:
        quant.dense_asym = _dense_asym_orig if asym else quant.dense
        p = quantize_enc(keys)
        enc_only_t, extract_t = make_enc_only(), make_extract()
        row = {"fidelity": round(float(fidelity(p)), 8)}
        float(enc_only_t(p, waves))
        row["encoder_audio_s_per_s"] = round(8 * 30.0 / chain_time(
            enc_only_t, (p, waves), iters=5), 2)
        float(extract_t(p, waves))
        row["extract_audio_s_per_s"] = round(8 * 30.0 / chain_time(
            extract_t, (p, waves), iters=5), 2)
        out[name] = row
        print(f"{name}: {row}", flush=True)
        del p
    quant.dense_asym = _dense_asym_orig

    print(json.dumps(out))


if __name__ == "__main__":
    main()
