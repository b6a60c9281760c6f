"""Mesh/sharding tests on the 8-device virtual CPU mesh (SURVEY.md §4 item 4)."""

import numpy as np
import pytest


def test_mesh_plan_shapes():
    import jax

    from stutter_tpu.parallel.mesh import make_mesh

    plan = make_mesh()
    assert plan.data_size == 8 and plan.model_size == 1
    plan2 = make_mesh(jax.devices(), data=4, model=2)
    assert plan2.data_size == 4 and plan2.model_size == 2
    assert plan.pad_batch(5) == 8
    assert plan.pad_batch(8) == 8
    with pytest.raises(ValueError):
        make_mesh(jax.devices(), data=3, model=2)


def test_mesh_process_count_agnostic(rng):
    """Multi-host readiness without multi-host hardware (VERDICT r1 weak #7):
    the mesh/sharding layer must be a pure function of the GLOBAL device list
    — same specs regardless of how many processes contributed devices, with
    the model axis grouping devices that a process-major ordering puts on one
    host (so TP collectives ride intra-host ICI, DP rides DCN)."""
    import jax

    from stutter_tpu.parallel.mesh import make_mesh, shard_batch
    from stutter_tpu.parallel.sharding import wavlm_param_spec

    devices = jax.devices()
    # simulate a 2-host pod whose process-major global ordering DIFFERS from
    # this process's default ordering: host B (devices 4..7) enumerates
    # first. jax.devices() on a pod is sorted by process_index, so this is
    # the list every process would see there.
    two_host_order = list(devices[4:]) + list(devices[:4])
    host_of = {id(d): (0 if i < 4 else 1) for i, d in enumerate(two_host_order)}
    plan = make_mesh(two_host_order, data=4, model=2)

    # make_mesh must keep the model axis fastest-varying over the GIVEN list
    # (process-major ⇒ TP pairs stay within one host, DP rides across hosts)
    dev_grid = plan.mesh.devices  # [data, model]
    for i in range(4):
        for j in range(2):
            assert dev_grid[i, j] is two_host_order[2 * i + j]
        assert host_of[id(dev_grid[i, 0])] == host_of[id(dev_grid[i, 1])], (
            "TP pair crosses the simulated host boundary"
        )

    # sharding specs depend only on axis names, not device identities
    other = make_mesh(list(reversed(devices)), data=4, model=2)
    assert wavlm_param_spec(plan) == wavlm_param_spec(other)
    assert plan.batch_sharding(2).spec == other.batch_sharding(2).spec
    assert plan.data_size == other.data_size == 4

    # and the plan executes: a sharded reduction over the full mesh
    x = shard_batch(plan, rng.randn(8, 16).astype(np.float32))
    total = float(jax.jit(lambda a: a.sum())(x))
    assert np.isfinite(total)


def test_dp_extraction_matches_single_device(rng):
    """Mesh-sharded extraction == unsharded extraction, bit-for-bit-ish."""
    import jax

    from stutter_tpu.extract.batcher import Batch
    from stutter_tpu.extract.pipeline import WavLMExtractor
    from stutter_tpu.models import WavLMConfig, init_wavlm_params
    from stutter_tpu.parallel.mesh import make_mesh

    cfg = WavLMConfig.tiny(hidden_size=32, layers=2, heads=4)
    params = init_wavlm_params(jax.random.key(0), cfg)

    waves = (rng.randn(8, 16000) * 0.1).astype(np.float32)
    lengths = np.array([16000, 12000, 8000, 16000, 5000, 16000, 9000, 16000])
    for i, n in enumerate(lengths):
        waves[i, n:] = 0.0
    batch = Batch(paths=[f"p{i}" for i in range(8)], rows=list(range(8)),
                  waves=waves, lengths=lengths, ok=np.ones(8, bool), bucket_s=1.0)

    single = WavLMExtractor(cfg, params)(batch)
    plan = make_mesh()
    sharded = WavLMExtractor(cfg, params, mesh=plan)(batch)
    assert single.keys() == sharded.keys()
    for k in single:
        np.testing.assert_allclose(sharded[k], single[k], rtol=1e-4, atol=1e-5)


def test_whisper_tp_sharded_matches(rng):
    """TP-sharded Whisper encoder + 1-step decoder == replicated forward."""
    import jax
    import jax.numpy as jnp

    from stutter_tpu.models import (
        WhisperConfig,
        init_whisper_params,
        whisper_decoder_step,
        whisper_encoder_forward,
    )
    from stutter_tpu.parallel.mesh import make_mesh
    from stutter_tpu.parallel.sharding import shard_params, whisper_param_spec

    cfg = WhisperConfig.tiny(d_model=64, layers=2, heads=4)
    params = init_whisper_params(jax.random.key(0), cfg)
    mel = (rng.randn(2, cfg.num_mel_bins, 3000) * 0.5).astype(np.float32)

    def fwd(p, m):
        enc_last, enc_hidden = whisper_encoder_forward(p, m, cfg, use_flash=False)
        _, dec_hidden = whisper_decoder_step(p, enc_last, 0, cfg)
        return enc_hidden, dec_hidden

    ref_enc, ref_dec = (np.asarray(t) for t in fwd(params, mel))

    plan = make_mesh(data=4, model=2)
    sharded = shard_params(plan, params, whisper_param_spec(plan))
    out_enc, out_dec = (np.asarray(t) for t in jax.jit(fwd)(sharded, mel))
    np.testing.assert_allclose(out_enc, ref_enc, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(out_dec, ref_dec, rtol=1e-4, atol=1e-5)


def test_tp_sharded_forward_matches(rng):
    """TP-sharded WavLM forward == replicated forward."""
    import jax

    from stutter_tpu.models import WavLMConfig, init_wavlm_params
    from stutter_tpu.models.wavlm import wavlm_forward
    from stutter_tpu.parallel.mesh import make_mesh
    from stutter_tpu.parallel.sharding import shard_params, wavlm_param_spec

    cfg = WavLMConfig.tiny(hidden_size=64, layers=2, heads=4)
    params = init_wavlm_params(jax.random.key(0), cfg)
    waves = (rng.randn(4, 8000) * 0.1).astype(np.float32)

    ref = np.asarray(wavlm_forward(params, waves, cfg)[0])

    plan = make_mesh(data=4, model=2)
    sharded = shard_params(plan, params, wavlm_param_spec(plan))
    out = np.asarray(jax.jit(lambda p, w: wavlm_forward(p, w, cfg)[0])(sharded, waves))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_spec_augment_masks():
    import jax
    import jax.numpy as jnp

    from stutter_tpu.ops.specaugment import spec_augment

    hidden = jnp.ones((2, 100, 16))
    lengths = jnp.array([100, 50])
    out = np.asarray(spec_augment(
        jax.random.key(0), hidden, lengths,
        mask_time_prob=0.5, mask_time_length=10,
        mask_embedding=jnp.full((16,), -7.0),
    ))
    # some positions masked to -7, none beyond true length for clip 1
    assert (out == -7.0).any()
    frac = (out[0, :, 0] == -7.0).mean()
    assert 0.2 < frac < 0.9, frac
    assert np.all(out[1, 50:] == 1.0)  # padding untouched
