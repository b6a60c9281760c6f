"""Auxiliary subsystem tests: model verification, orbax ckpt, profiling."""

import numpy as np
import pytest


def test_verify_wavlm(rng):
    import jax

    from stutter_tpu.models import WavLMConfig, init_wavlm_params
    from stutter_tpu.models.verify import verify_wavlm

    cfg = WavLMConfig.tiny(hidden_size=32, layers=2, heads=4)
    params = init_wavlm_params(jax.random.key(0), cfg)
    n = verify_wavlm(params, cfg)
    assert n == 3
    with pytest.raises(ValueError, match="large model"):
        verify_wavlm(params, cfg, model_name="microsoft/wavlm-large")


def test_verify_whisper():
    import jax

    from stutter_tpu.models import WhisperConfig, init_whisper_params
    from stutter_tpu.models.verify import verify_whisper

    cfg = WhisperConfig.tiny(d_model=32, layers=2, heads=4)
    params = init_whisper_params(jax.random.key(0), cfg)
    n_enc, n_dec = verify_whisper(params, cfg)
    assert (n_enc, n_dec) == (3, 3)
    with pytest.raises(ValueError, match="large"):
        verify_whisper(params, cfg, model_name="openai/whisper-large")


def test_finetune_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp

    from stutter_tpu.models import WavLMConfig
    from stutter_tpu.train.checkpointing import (
        latest_step,
        restore_train_state,
        save_train_state,
    )
    from stutter_tpu.train.finetune import (
        FinetuneConfig,
        init_finetune_params,
        make_optimizer,
    )

    cfg = FinetuneConfig(
        model=WavLMConfig.tiny(hidden_size=32, layers=2, heads=4),
        n_classes=3, head_hidden=(16,), activation_dtype=jnp.float32,
    )
    params = init_finetune_params(cfg)
    tx = make_optimizer(cfg, params)
    opt_state = tx.init(params)

    ckpt_dir = str(tmp_path / "ckpt")
    save_train_state(ckpt_dir, 7, params, opt_state)
    assert latest_step(ckpt_dir) == 7

    p2, o2, step = restore_train_state(ckpt_dir, 7, params, opt_state)
    assert step == 7
    import jax

    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        params, p2,
    )


def test_stage_timer():
    from stutter_tpu.utils.profiling import StageTimer

    t = StageTimer()
    with t.stage("decode"):
        pass
    with t.stage("forward"):
        pass
    with t.stage("forward"):
        pass
    report = t.report(audio_seconds=10.0)
    assert report["forward"]["calls"] == 2
    assert "_throughput" in report
