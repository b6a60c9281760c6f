"""Whisper encoder-stem A/B: XLA conv vs shifted-GEMM formulation (bf16).

VERDICT r3 stretch #8: whisper bf16 MFU is 0.561 vs wavlm's 0.644; one named
lever is stem conv-as-matmul parity with wavlm's ``_stem_conv``. Whisper's
stem is Conv1d(80->D, k3, s1, p1) + GELU then Conv1d(D->D, k3, s2, p1) +
GELU (modeling_whisper.py:608-609). Neither has stride == kernel, so the
wavlm reshape trick doesn't apply — instead each k=3 conv is three
shift-by-t GEMMs accumulated:

    y[i] = sum_t x_pad[s*i + t] @ W[:, :, t]^T        t in {0, 1, 2}

which keeps activations in [B, L, C] layout (no NCH transposes) and runs
[L, C_in] @ [C_in, D] contractions the MXU tiles natively. This script
measures both formulations end to end at the real [8, 80|128, 3000] shape
and checks numerical equivalence; if the GEMM form wins it becomes
whisper_encoder_forward's stem.
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

    from stutter_tpu.models.whisper import (
        WhisperConfig, _gelu, init_whisper_params,
    )
    from stutter_tpu.utils.benchmarking import chain_time

    cfg = WhisperConfig.large()
    params = init_whisper_params(jax.random.key(0), cfg)
    enc = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params["encoder"])
    B = 8
    rs = np.random.RandomState(0)
    mel = jax.device_put(
        rs.randn(B, cfg.num_mel_bins, 3000).astype(np.float32) * 0.3)
    prec = jax.lax.Precision.DEFAULT

    @jax.jit
    def stem_conv(enc, mel):
        x = mel.astype(jnp.bfloat16)
        x = jax.lax.conv_general_dilated(
            x, enc["conv1_w"], window_strides=(1,), padding=[(1, 1)],
            dimension_numbers=("NCH", "OIH", "NCH"), precision=prec)
        x = _gelu(x + enc["conv1_b"][None, :, None])
        x = jax.lax.conv_general_dilated(
            x, enc["conv2_w"], window_strides=(2,), padding=[(1, 1)],
            dimension_numbers=("NCH", "OIH", "NCH"), precision=prec)
        x = _gelu(x + enc["conv2_b"][None, :, None])
        return jnp.sum(jnp.swapaxes(x, 1, 2).astype(jnp.float32))

    @jax.jit
    def stem_gemm(enc, mel):
        x = jnp.swapaxes(mel.astype(jnp.bfloat16), 1, 2)  # [B, 3000, 80]
        L = x.shape[1]
        # conv1: k3 s1 p1 -> y[i] = sum_t xp[i+t] @ W_t
        w1 = jnp.swapaxes(enc["conv1_w"], 0, 2)  # [3, 80, D] (from [D, 80, 3])
        xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0)))
        y = (jnp.einsum("blc,cd->bld", xp[:, 0:L], w1[0], precision=prec)
             + jnp.einsum("blc,cd->bld", xp[:, 1:L + 1], w1[1], precision=prec)
             + jnp.einsum("blc,cd->bld", xp[:, 2:L + 2], w1[2], precision=prec))
        y = _gelu(y + enc["conv1_b"][None, None, :])
        # conv2: k3 s2 p1 -> z[i] = sum_t yp[2i+t] @ V_t, 1500 outputs
        w2 = jnp.swapaxes(enc["conv2_w"], 0, 2)  # [3, D, D]
        yp = jnp.pad(y, ((0, 0), (1, 1), (0, 0)))
        Lo = L // 2
        z = (jnp.einsum("blc,cd->bld", yp[:, 0:2 * Lo:2], w2[0], precision=prec)
             + jnp.einsum("blc,cd->bld", yp[:, 1:2 * Lo + 1:2], w2[1], precision=prec)
             + jnp.einsum("blc,cd->bld", yp[:, 2:2 * Lo + 2:2], w2[2], precision=prec))
        z = _gelu(z + enc["conv2_b"][None, None, :])
        return jnp.sum(z.astype(jnp.float32))

    a = float(stem_conv(enc, mel))
    b = float(stem_gemm(enc, mel))
    rel = abs(a - b) / max(1e-6, abs(a))
    out = {"metric": "whisper_stem_ab", "batch": B,
           "checksum_rel_diff": rel}
    for tag, f in (("conv_ms", stem_conv), ("gemm_ms", stem_gemm)):
        ts = [chain_time(f, (enc, mel), iters=8) for _ in range(3)]
        out[tag] = round(min(ts) * 1e3, 2)
        print(json.dumps({tag: out[tag]}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
