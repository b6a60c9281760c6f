"""Pallas kernels vs XLA reference paths (interpreter mode on CPU)."""

import numpy as np


def test_pallas_logmel_matches_xla(rng):
    import jax.numpy as jnp

    from stutter_tpu.ops.logmel import whisper_log_mel
    from stutter_tpu.ops.logmel_pallas import whisper_log_mel_pallas

    w = (rng.randn(2, 480000) * 0.1).astype(np.float32)
    t = np.arange(480000) / 16000.0
    w += 0.3 * np.sin(2 * np.pi * 440 * t)[None].astype(np.float32)

    ref = np.asarray(whisper_log_mel(jnp.asarray(w)))
    pal = np.asarray(whisper_log_mel_pallas(jnp.asarray(w), interpret=True))
    assert pal.shape == ref.shape == (2, 80, 3000)
    np.testing.assert_allclose(pal, ref, atol=1e-4)


def test_fused_wavlm_attention_matches_einsum(rng):
    import jax
    import jax.numpy as jnp

    from stutter_tpu.ops.wavlm_attention_pallas import wavlm_fused_attention

    B, H, L, d = 4, 4, 16, 8
    q = jnp.asarray(rng.randn(B, H, L, d).astype(np.float32) * 0.2)
    k = jnp.asarray(rng.randn(B, H, L, d).astype(np.float32) * 0.2)
    v = jnp.asarray(rng.randn(B, H, L, d).astype(np.float32) * 0.2)
    bias = jnp.asarray(rng.randn(H, L, L).astype(np.float32))
    gate = jnp.asarray(rng.rand(B, H, L).astype(np.float32))
    # mask out the tail keys of clip 0
    mask = np.zeros((B, L), np.float32)
    mask[0, 10:] = -1e9
    mask = jnp.asarray(mask)

    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32)
    logits = logits + gate[..., None] * bias[None] + mask[:, None, None, :]
    ref = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(logits, -1), v)

    out = wavlm_fused_attention(q, k, v, bias, gate, mask, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_auto_block_selection():
    """_auto_block: one single block whenever the padded length fits 1536
    (measured ~7% at whisper-encoder shape), 512-aligned, capped at 1536."""
    from stutter_tpu.models.attention import _auto_block

    assert _auto_block(144) == 512
    assert _auto_block(512) == 512
    assert _auto_block(513) == 1024
    assert _auto_block(1500) == 1536  # whisper encoder: single block
    assert _auto_block(1536) == 1536
    # past the single-block regime, 512 blocking avoids up-to-1536 padding
    # (1536-blocking L=2048 would pad to 3072 = 2.25x the attention FLOPs)
    assert _auto_block(2048) == 512
    assert _auto_block(4096) == 512
    # the bias variant keeps 512: its f32 ab tile + f32 logits tile at 1536
    # exceed the 16 MB scoped-VMEM stack (TPU compile error, caught live)
    assert _auto_block(1500, with_bias=True) == 512
    assert _auto_block(144, with_bias=True) == 512


def test_fused_long_attention_matches_einsum(rng):
    """q-blocked long-bucket kernel (bias computed in-kernel) == einsum."""
    import jax
    import jax.numpy as jnp

    from stutter_tpu.ops.wavlm_attention_pallas import wavlm_fused_attention_long

    B, H, L, d = 2, 3, 32, 8
    q = jnp.asarray(rng.randn(B, H, L, d).astype(np.float32) * 0.2)
    k = jnp.asarray(rng.randn(B, H, L, d).astype(np.float32) * 0.2)
    v = jnp.asarray(rng.randn(B, H, L, d).astype(np.float32) * 0.2)
    bias = jnp.asarray(rng.randn(H, L, L).astype(np.float32))
    gate = jnp.asarray(rng.rand(B, H, L).astype(np.float32))
    mask = np.zeros((B, L), np.float32)
    mask[1, 20:] = -1e9
    mask = jnp.asarray(mask)

    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32)
    logits = logits + gate[..., None] * bias[None] + mask[:, None, None, :]
    ref = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(logits, -1), v)

    # block_q=16 -> 2 q-blocks per (head, batch): exercises the grid walk
    out = wavlm_fused_attention_long(q, k, v, bias, gate, mask,
                                     block_q=16, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_long_bucket_dispatch_padding(rng):
    """The L>=512 model path pads to the q-block multiple and slices back —
    batched-vs-padded invariance must hold through the fused long kernel.
    On CPU the kernel is skipped (no pallas), so this exercises the padding
    arithmetic via the einsum path; the TPU drive covers the kernel itself."""
    import jax
    import jax.numpy as jnp

    from stutter_tpu.models.wavlm import WavLMConfig, init_wavlm_params, wavlm_encode

    cfg = WavLMConfig.tiny(32, 2, 4)
    params = init_wavlm_params(jax.random.key(0), cfg)
    # the tiny stem downsamples only 20x (3 convs), not the real stem's 320x:
    # 0.8 s -> L=639 frames, past the L>=512 long-bucket threshold while the
    # [L, L] bucket table / logits stay CPU-sized (12 s gave L=9600 and a
    # ~3 GB attention that thrashed the 1-core host for >25 min)
    n = int(16000 * 0.8)
    waves = jnp.asarray(rng.randn(2, n).astype(np.float32) * 0.1)
    lengths = jnp.asarray([n, n // 2], jnp.int32)
    out = wavlm_encode(params, waves, cfg, (2, 1), sample_lengths=lengths,
                       precision=jax.lax.Precision.DEFAULT,
                       activation_dtype=jnp.bfloat16)
    assert np.isfinite(np.asarray(out)).all()
