"""Where do the stem's non-conv milliseconds go? prepare_batch + mask passes.

profile_stem3 measures the bare conv+LN+tanh-gelu chain at ~21 ms (B=128),
but bench.py's stem stage reads ~2x that. Suspects: wavlm_prepare_batch's
masked waveform norm, and the per-stage padding re-zero (a full read+write of
the early ~1.3 GB conv activations, x7 stages). For the layer-norm stem
(wavlm-large) the per-stage re-zero is not needed for correctness: LN is
per-frame (no time statistics) and the floor-chain length formula keeps every
valid frame's receptive field inside valid samples — only the FINAL output
must be zero-padded (the k=128 SamePad positional conv downstream reads
across the valid/pad boundary).
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stutter_tpu.utils.benchmarking import chain_time


def main():
    import jax
    import jax.numpy as jnp

    from stutter_tpu.cli.common import enable_compilation_cache

    enable_compilation_cache()
    from stutter_tpu.extract.pipeline import cast_params_for_preset
    from stutter_tpu.frontend.wavlm_frontend import wavlm_prepare_batch
    from stutter_tpu.models import WavLMConfig, init_wavlm_params
    from stutter_tpu.models.wavlm import _gelu, _stem_conv, conv_feature_encoder, layer_norm

    cfg = WavLMConfig.large()
    params = cast_params_for_preset(init_wavlm_params(jax.random.key(0), cfg), "fast")
    fe = params["feature_encoder"]
    B, T = 128, 51280
    rs = np.random.RandomState(0)
    waves = jax.device_put((rs.randn(B, T) * 0.1).astype(np.float32))
    lengths = jax.device_put(np.full((B,), T, np.int32))

    prec = jax.lax.Precision.DEFAULT

    @jax.jit
    def current(w, l):
        x = wavlm_prepare_batch(w, l, cfg.do_normalize)
        return jnp.sum(conv_feature_encoder(fe, x, cfg, prec, sample_lengths=l,
                                            compute_dtype=jnp.bfloat16)
                       .astype(jnp.float32))

    @jax.jit
    def no_mask(w, l):
        x = wavlm_prepare_batch(w, l, cfg.do_normalize)
        return jnp.sum(conv_feature_encoder(fe, x, cfg, prec, sample_lengths=None,
                                            compute_dtype=jnp.bfloat16)
                       .astype(jnp.float32))

    @jax.jit
    def final_mask_only(w, l):
        x = wavlm_prepare_batch(w, l, cfg.do_normalize)[:, :, None].astype(jnp.bfloat16)
        ln = l
        for i, layer in enumerate(fe["conv_layers"]):
            x = _stem_conv(x, layer["w"], cfg.conv_stride[i], prec)
            if layer.get("b") is not None:
                x = x + layer["b"].astype(x.dtype)[None, None, :]
            x = layer_norm(x, layer["norm"], 1e-5)
            x = _gelu(x)
            ln = (ln - cfg.conv_kernel[i]) // cfg.conv_stride[i] + 1
        mask = (jnp.arange(x.shape[1])[None, :] < ln[:, None])[:, :, None]
        return jnp.sum((x * mask.astype(x.dtype)).astype(jnp.float32))

    @jax.jit
    def prep_only(w, l):
        return jnp.sum(wavlm_prepare_batch(w, l, cfg.do_normalize))

    out = {}
    for name, fn in (("prepare_batch_only", prep_only),
                     ("stem_current_masked", current),
                     ("stem_no_mask", no_mask),
                     ("stem_final_mask_only", final_mask_only)):
        out[name] = round(chain_time(fn, (waves, lengths)) * 1e3, 2)
        print(json.dumps({name: out[name]}), flush=True)
    # second pass to expose remote-service noise
    for name, fn in (("stem_current_masked", current),
                     ("stem_final_mask_only", final_mask_only)):
        out[name + "_rerun"] = round(chain_time(fn, (waves, lengths)) * 1e3, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
