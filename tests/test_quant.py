"""Int8 turbo-preset tests: qdot numerics, preset casting, end-to-end error.

The turbo preset (ops/quant.py) is a beyond-parity performance feature —
W8A8 dynamic quantization of the transformer GEMMs onto the 2x-rate int8
MXU path. These tests bound the quantization error on CPU and check the
preset plumbing end to end (the pipeline contract is identical to fast).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stutter_tpu.ops.quant import dense, qdot, quantize_layer_stack, quantize_weight


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def test_qdot_matches_f32_within_quant_error(rng):
    x = jnp.asarray(rng.randn(64, 256).astype(np.float32))
    w = jnp.asarray(rng.randn(256, 128).astype(np.float32) * 0.05)
    qw = quantize_weight(w)
    y = np.asarray(qdot(x, qw["q"], qw["s"]))
    y_ref = np.asarray(x @ w)
    rel = np.linalg.norm(y - y_ref) / np.linalg.norm(y_ref)
    # W8A8 symmetric quant on gaussian data: ~1% relative error per GEMM
    assert rel < 0.025, rel


def test_qdot_asym_beats_symmetric_on_one_sided_input(rng):
    """Post-GELU-shaped (one-sided) activations: the asymmetric per-token
    path must be accurate AND strictly better than symmetric, since
    centering halves the quantization step on a [-0.17, max] range."""
    from stutter_tpu.ops.quant import qdot_asym

    h = rng.randn(64, 256).astype(np.float32)
    x = jnp.asarray(np.where(h > 0, h, -0.17 * np.exp(h)))  # GELU-ish tail
    w = jnp.asarray(rng.randn(256, 128).astype(np.float32) * 0.05)
    qw = quantize_weight(w)
    y_ref = np.asarray(x @ w)
    err_sym = np.linalg.norm(np.asarray(qdot(x, qw["q"], qw["s"])) - y_ref)
    err_asym = np.linalg.norm(
        np.asarray(qdot_asym(x, qw["q"], qw["s"], qw["cs"])) - y_ref)
    assert err_asym < 0.02 * np.linalg.norm(y_ref), err_asym
    # the weight-quant error is a shared floor both paths carry; halving the
    # ACTIVATION step shows up as ~0.75x total (measured 0.752)
    assert err_asym < 0.85 * err_sym, (err_asym, err_sym)


def test_dense_asym_dispatch(rng):
    from stutter_tpu.ops.quant import dense_asym

    x = jnp.asarray(rng.randn(8, 64).astype(np.float32), jnp.bfloat16)
    w = jnp.asarray(rng.randn(64, 32).astype(np.float32) * 0.1)
    plain = dense_asym(x, w.astype(jnp.bfloat16), jax.lax.Precision.DEFAULT)
    quant = dense_asym(x, quantize_weight(w), jax.lax.Precision.DEFAULT)
    assert quant.dtype == jnp.bfloat16
    rel = np.linalg.norm(np.asarray(quant, np.float32) - np.asarray(plain, np.float32))
    rel /= np.linalg.norm(np.asarray(plain, np.float32))
    assert rel < 0.05, rel


def test_quantize_weight_stacked_layers(rng):
    w = jnp.asarray(rng.randn(4, 32, 16).astype(np.float32))
    qw = quantize_weight(w)
    assert qw["q"].shape == (4, 32, 16) and qw["q"].dtype == jnp.int8
    assert qw["s"].shape == (4, 16) and qw["s"].dtype == jnp.float32
    # per-(layer, out-channel) scale reconstructs the column absmax at 127
    recon = np.asarray(qw["q"]).astype(np.float32) * np.asarray(qw["s"])[:, None, :]
    np.testing.assert_allclose(
        np.abs(recon).max(axis=1), np.abs(np.asarray(w)).max(axis=1), rtol=1e-5
    )


def test_dense_dispatch(rng):
    x = jnp.asarray(rng.randn(8, 64).astype(np.float32), jnp.bfloat16)
    w = jnp.asarray(rng.randn(64, 32).astype(np.float32) * 0.1)
    plain = dense(x, w.astype(jnp.bfloat16), jax.lax.Precision.DEFAULT)
    quant = dense(x, quantize_weight(w), jax.lax.Precision.DEFAULT)
    assert quant.dtype == jnp.bfloat16  # cast back to activation dtype
    rel = np.linalg.norm(np.asarray(quant, np.float32) - np.asarray(plain, np.float32))
    rel /= np.linalg.norm(np.asarray(plain, np.float32))
    assert rel < 0.05, rel


def test_turbo_preset_quantizes_wavlm_layers():
    from stutter_tpu.extract.pipeline import cast_params_for_preset
    from stutter_tpu.models import WavLMConfig, init_wavlm_params

    cfg = WavLMConfig.tiny()
    params = cast_params_for_preset(init_wavlm_params(jax.random.key(0), cfg), "turbo")
    layers = params["encoder"]["layers"]
    for key in ("q_w", "k_w", "v_w", "o_w", "ff_w1", "ff_w2"):
        assert isinstance(layers[key], dict) and layers[key]["q"].dtype == jnp.int8, key
    # everything not on the quant list stays a plain bf16 tensor
    assert layers["q_b"].dtype == jnp.bfloat16
    assert layers["gru_w"].dtype == jnp.bfloat16
    assert params["feature_projection"]["w"].dtype == jnp.bfloat16


def test_turbo_preset_quantizes_whisper_layers():
    from stutter_tpu.extract.pipeline import cast_params_for_preset
    from stutter_tpu.models import WhisperConfig, init_whisper_params

    cfg = WhisperConfig.tiny()
    params = cast_params_for_preset(init_whisper_params(jax.random.key(0), cfg), "turbo")
    layers = params["encoder"]["layers"]
    for key in ("attn_q_w", "fc1_w", "fc2_w"):
        assert isinstance(layers[key], dict) and layers[key]["q"].dtype == jnp.int8, key
    # encoder attn_o stays bf16: the largest single int8 error contributor,
    # skipping it bought 4.10e-4 -> 3.40e-4 end-to-end fidelity for ~1%
    # throughput (scripts/whisper_turbo_fidelity_sweep2.py)
    assert not isinstance(layers["attn_o_w"], dict) \
        and layers["attn_o_w"].dtype == jnp.bfloat16
    # the decoder deliberately stays bf16 (its int8 error matched the whole
    # encoder's while the one-token extraction decode gained ~nothing —
    # scripts/whisper_turbo_fidelity_sweep.py)
    dec = params["decoder"]["layers"]
    for key in ("attn_q_w", "xattn_k_w", "fc2_w"):
        assert not isinstance(dec[key], dict) and dec[key].dtype == jnp.bfloat16, key
    assert params["decoder"]["embed_tokens"].dtype == jnp.bfloat16


def test_wavlm_turbo_forward_error_bounded(rng):
    """End-to-end pooled-embedding cosine error of the turbo path vs f32."""
    from stutter_tpu.extract.pipeline import cast_params_for_preset
    from stutter_tpu.models import WavLMConfig, init_wavlm_params
    from stutter_tpu.models.wavlm import wavlm_encode

    cfg = WavLMConfig.base()
    params = init_wavlm_params(jax.random.key(0), cfg)
    waves = jnp.asarray(rng.randn(2, 16000).astype(np.float32) * 0.1)
    lengths = jnp.asarray([16000, 12000], jnp.int32)
    sel = (12, 11, 10, 6)

    ref = np.asarray(wavlm_encode(
        params, waves, cfg, sel, sample_lengths=lengths,
        precision=jax.lax.Precision.HIGHEST, activation_dtype=jnp.float32))
    turbo_params = cast_params_for_preset(params, "turbo")
    got = np.asarray(wavlm_encode(
        turbo_params, waves, cfg, sel, sample_lengths=lengths,
        precision=jax.lax.Precision.DEFAULT, activation_dtype=jnp.bfloat16))

    for s in range(ref.shape[0]):
        for b in range(ref.shape[1]):
            a_v, b_v = ref[s, b].astype(np.float64), got[s, b].astype(np.float64)
            cos = 1.0 - a_v @ b_v / (np.linalg.norm(a_v) * np.linalg.norm(b_v))
            # int8 error bar: looser than the 1e-3 fast-preset bar by design;
            # bench.py reports the measured value on the real model
            assert cos < 2e-2, (s, b, cos)


def test_whisper_turbo_forward_error_bounded(rng):
    from stutter_tpu.extract.pipeline import cast_params_for_preset
    from stutter_tpu.models import WhisperConfig, init_whisper_params
    from stutter_tpu.models.whisper import whisper_decoder_step, whisper_encoder_forward

    cfg = WhisperConfig.tiny_official()
    params = init_whisper_params(jax.random.key(0), cfg)
    mel = jnp.asarray(rng.randn(2, cfg.num_mel_bins, 3000).astype(np.float32) * 0.5)

    def run(p, precision, dtype):
        last, states = whisper_encoder_forward(
            p, mel, cfg, precision, dtype,
            hidden_reducer=lambda h: jnp.mean(h.astype(jnp.float32), axis=1))
        _, dec = whisper_decoder_step(p, last, 0, cfg, precision, dtype)
        return np.asarray(states), np.asarray(dec[:, :, 0, :], np.float64)

    enc_ref, dec_ref = run(params, jax.lax.Precision.HIGHEST, jnp.float32)
    tp = cast_params_for_preset(params, "turbo")
    enc_got, dec_got = run(tp, jax.lax.Precision.DEFAULT, jnp.bfloat16)

    def max_cos(a, b):
        worst = 0.0
        for i in range(a.shape[0]):
            for j in range(a.shape[1]):
                u, v = a[i, j].astype(np.float64), b[i, j].astype(np.float64)
                worst = max(worst, 1.0 - u @ v / (np.linalg.norm(u) * np.linalg.norm(v)))
        return worst

    assert max_cos(enc_ref, enc_got) < 2e-2
    assert max_cos(dec_ref, dec_got) < 2e-2


def test_turbo_pipeline_end_to_end(tmp_path, rng):
    """The extraction pipeline contract is preset-independent."""
    from stutter_tpu.audio.synthetic import make_synthetic_corpus
    from stutter_tpu.extract import (
        BucketBatcher,
        ExtractionPipeline,
        WavLMExtractor,
        create_metadata_from_files,
    )
    from stutter_tpu.models import WavLMConfig, init_wavlm_params

    root = tmp_path / "corpus"
    make_synthetic_corpus(str(root), n_per_split={"train": 4})
    cfg = WavLMConfig.tiny()
    params = init_wavlm_params(jax.random.key(0), cfg)
    pipe = ExtractionPipeline(
        WavLMExtractor(cfg, params, preset="turbo"),
        batcher=BucketBatcher(buckets_s=(2.0, 4.0), audio_budget_s=16.0),
    )
    out = tmp_path / "emb"
    dfs = pipe.run(create_metadata_from_files(str(root), "all"), str(out))
    assert (out / "train" / "embedding_metadata.csv").exists()
    npys = list((out / "train").glob("layer_*_embeddings.npy"))
    # tiny 2-layer config: [N-1, N-2, N-3, N//2] dedups to 3 distinct taps
    assert len(npys) == 3
    for f in npys:
        assert np.isfinite(np.load(f)).all()


def test_turbo_tp_sharded_matches_replicated(rng):
    """TP-sharded turbo (int8 {q,s} pairs) == single-device turbo forward.

    parallel/sharding._lookup derives the int8 tensors' specs from the
    weight's spec: q inherits it (column/row parallel), the per-channel
    scale follows its output axis (sharded when column-parallel, replicated
    when row-parallel). The dynamic per-token activation quant reduces over
    a sharded axis in the row-parallel GEMMs — GSPMD's inserted collectives
    must reproduce the single-device amax exactly."""
    from stutter_tpu.extract.pipeline import cast_params_for_preset
    from stutter_tpu.models import WavLMConfig, init_wavlm_params
    from stutter_tpu.models.wavlm import wavlm_forward
    from stutter_tpu.parallel.mesh import make_mesh
    from stutter_tpu.parallel.sharding import shard_params, wavlm_param_spec

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    cfg = WavLMConfig.tiny(hidden_size=64, layers=2, heads=4)
    params = cast_params_for_preset(init_wavlm_params(jax.random.key(0), cfg), "turbo")
    waves = (rng.randn(4, 8000) * 0.1).astype(np.float32)

    ref = np.asarray(wavlm_forward(params, waves, cfg)[0], np.float32)

    plan = make_mesh(data=4, model=2)
    sharded = shard_params(plan, params, wavlm_param_spec(plan))
    layers = sharded["encoder"]["layers"]
    # the int8 payloads really are sharded over the model axis
    assert layers["q_w"]["q"].dtype == jnp.int8
    assert not layers["q_w"]["q"].sharding.is_fully_replicated
    assert not layers["q_w"]["s"].sharding.is_fully_replicated
    assert layers["o_w"]["s"].sharding.is_fully_replicated  # row-parallel scale

    out = np.asarray(
        jax.jit(lambda p, w: wavlm_forward(p, w, cfg)[0])(sharded, waves), np.float32)
    # elementwise equality is NOT expected: SPMD changes f32 reduction
    # orders by ~1e-7, and dynamic int8 quantization amplifies values
    # sitting on a rounding boundary into one-quantum (~1/127-of-scale)
    # flips. The norm-level agreement is what matters and stays ~1e-3.
    rel = np.linalg.norm(out - ref) / np.linalg.norm(ref)
    assert rel < 5e-3, rel


def test_turbo_whisper_pipeline_end_to_end(tmp_path, rng):
    from stutter_tpu.audio.synthetic import make_synthetic_corpus
    from stutter_tpu.extract import (
        BucketBatcher,
        ExtractionPipeline,
        WhisperExtractor,
        create_metadata_from_files,
    )
    from stutter_tpu.models import WhisperConfig, init_whisper_params

    root = tmp_path / "corpus"
    make_synthetic_corpus(str(root), n_per_split={"train": 3})
    cfg = WhisperConfig.tiny()
    params = init_whisper_params(jax.random.key(0), cfg)
    pipe = ExtractionPipeline(
        WhisperExtractor(cfg, params, preset="turbo"),
        batcher=BucketBatcher(buckets_s=(30.0,), audio_budget_s=90.0),
    )
    out = tmp_path / "emb"
    pipe.run(create_metadata_from_files(str(root), "all"), str(out))
    npys = list((out / "train").glob("*_embeddings.npy"))
    assert len(npys) == 6  # 3 encoder + 3 decoder taps
    for f in npys:
        assert np.isfinite(np.load(f)).all()


def test_qdot_ste_backward_is_exact_ste(rng):
    """qdot_ste: int8 forward, straight-through backward — the grads must be
    BIT-IDENTICAL to the plain bf16 einsum's transpose given the same
    inputs (the STE contract: quantization is invisible to autodiff)."""
    from stutter_tpu.ops.quant import qdot_ste

    x = jnp.asarray(rng.randn(4, 6, 32), jnp.bfloat16)
    w = jnp.asarray(rng.randn(32, 16) * 0.1, jnp.bfloat16)
    coeff = jnp.asarray(rng.randn(16), jnp.float32)

    def f_ste(x, w):
        return jnp.sum(qdot_ste(x, w) * coeff)

    def f_ref(x, w):
        y = jnp.einsum("blk,kn->bln", x, w).astype(jnp.float32)
        return jnp.sum(y * coeff)

    g_ste = jax.grad(f_ste, argnums=(0, 1))(x, w)
    g_ref = jax.grad(f_ref, argnums=(0, 1))(x, w)
    for a, b in zip(g_ste, g_ref):
        assert a.dtype == b.dtype
        np.testing.assert_array_equal(np.asarray(a, np.float32),
                                      np.asarray(b, np.float32))
    # and the forward really quantized (close to, but not equal to, bf16)
    y_ste = np.asarray(qdot_ste(x, w))
    y_ref = np.asarray(jnp.einsum("blk,kn->bln", x, w), np.float32)
    rel = np.linalg.norm(y_ste - y_ref) / np.linalg.norm(y_ref)
    assert 1e-5 < rel < 0.03, rel


def test_int8_forward_finetune_grads_close_to_bf16(rng):
    """FinetuneConfig.int8_forward: the step's gradients differ from the
    bf16 step only through activation quantization noise — on a tiny model
    the flattened grad cosine must stay near 1, and the loss finite."""
    import dataclasses

    from stutter_tpu.models import WavLMConfig
    from stutter_tpu.train.finetune import (
        FinetuneConfig,
        finetune_forward,
        init_finetune_params,
    )
    from stutter_tpu.train.heads import weighted_softmax_xent

    model = dataclasses.replace(WavLMConfig.tiny(32, 2, 4),
                                apply_spec_augment=False)
    base = FinetuneConfig(model=model, n_classes=3, head_hidden=(16,),
                          head_dropout=0.0)
    cfg8 = dataclasses.replace(base, int8_forward=True)
    params = init_finetune_params(base)

    b, n = 4, 3200  # tiny stem downsamples 20x -> L=160
    waves = jnp.asarray((rng.randn(b, n) * 0.1), jnp.float32)
    lengths = jnp.full((b,), n, jnp.int32)
    labels = jnp.asarray(rng.randint(0, 3, size=b), jnp.int32)
    cw = jnp.ones((3,), jnp.float32)

    def loss(p, cfg):
        logits = finetune_forward(p, waves, lengths, cfg, train=False)
        return weighted_softmax_xent(logits, labels, cw)

    l16, g16 = jax.value_and_grad(lambda p: loss(p, base))(params)
    l8, g8 = jax.value_and_grad(lambda p: loss(p, cfg8))(params)
    assert np.isfinite(float(l8)) and np.isfinite(float(l16))

    a = np.concatenate([np.asarray(x, np.float64).ravel()
                        for x in jax.tree.leaves(g16)])
    c = np.concatenate([np.asarray(x, np.float64).ravel()
                        for x in jax.tree.leaves(g8)])
    cos = a @ c / (np.linalg.norm(a) * np.linalg.norm(c))
    assert cos > 0.95, cos
    # and it is genuinely a different forward (quantization engaged)
    assert abs(float(l8) - float(l16)) > 0


def test_turbo_ffn_preset_quantizes_only_ffn():
    """turbo_ffn (graded demotion step): FFN GEMMs int8, attention bf16."""
    import dataclasses

    from stutter_tpu.extract.pipeline import cast_params_for_preset
    from stutter_tpu.models import (
        WavLMConfig,
        WhisperConfig,
        init_wavlm_params,
        init_whisper_params,
    )

    wl = cast_params_for_preset(
        init_wavlm_params(jax.random.key(0), WavLMConfig.tiny(32, 2, 4)),
        "turbo_ffn")
    layers = wl["encoder"]["layers"]
    for k in ("ff_w1", "ff_w2"):
        assert isinstance(layers[k], dict) and layers[k]["q"].dtype == jnp.int8
    for k in ("q_w", "k_w", "v_w", "o_w"):
        assert not isinstance(layers[k], dict)
        assert layers[k].dtype == jnp.bfloat16

    wh = cast_params_for_preset(
        init_whisper_params(jax.random.key(0), WhisperConfig.tiny()),
        "turbo_ffn")
    enc_layers = wh["encoder"]["layers"]
    for k in ("fc1_w", "fc2_w"):
        assert isinstance(enc_layers[k], dict)
    for k in ("attn_q_w", "attn_k_w", "attn_v_w", "attn_o_w"):
        assert not isinstance(enc_layers[k], dict)


def _preset_worst_errors(cfg, params, rng) -> dict:
    """Run a 2-clip batch through every preset; worst cosine vs fidelity.

    Shared by the graded-preset ordering test and the outlier-injection
    test so the fidelity-measurement convention lives in one place."""
    import jax

    from stutter_tpu.extract.batcher import Batch
    from stutter_tpu.extract.pipeline import WavLMExtractor

    n = 3200
    waves = (rng.randn(2, n) * 0.1).astype(np.float32)
    batch = Batch(paths=["a", "b"], rows=[0, 1], waves=waves,
                  lengths=np.full((2,), n, np.int64),
                  ok=np.ones(2, bool), bucket_s=0.2)
    outs = {}
    for preset in ("fidelity", "fast", "turbo", "turbo_ffn"):
        ex = WavLMExtractor(cfg, params, preset=preset)
        outs[preset] = {k: np.asarray(v, np.float64)
                        for k, v in ex(batch).items()}

    def err(p):
        worst = 0.0
        for k, ref in outs["fidelity"].items():
            got = outs[p][k]
            for b in range(ref.shape[0]):
                u, v = ref[b], got[b]
                worst = max(worst, 1 - u @ v /
                            (np.linalg.norm(u) * np.linalg.norm(v)))
        return worst

    return {p: err(p) for p in ("fast", "turbo", "turbo_ffn")}


def test_turbo_ffn_forward_error_between_fast_and_turbo(rng):
    """turbo_ffn error vs f32 must sit at-or-below turbo's (fewer quant
    sites) and the pipeline must run it end to end."""
    import jax

    from stutter_tpu.models import WavLMConfig, init_wavlm_params

    cfg = WavLMConfig.tiny(hidden_size=32, layers=2, heads=4)
    params = init_wavlm_params(jax.random.key(0), cfg)
    errs = _preset_worst_errors(cfg, params, rng)
    e_fast, e_tf, e_turbo = errs["fast"], errs["turbo_ffn"], errs["turbo"]
    assert np.isfinite(e_tf)
    # graded: fast <= turbo_ffn <= ~turbo (tiny-model tolerances are loose;
    # the ordering claim is the contract)
    assert e_fast <= e_tf * 1.5 + 1e-6, (e_fast, e_tf)
    assert e_tf <= e_turbo * 1.5 + 1e-6, (e_tf, e_turbo)


def test_demotion_ladder_under_outlier_channels(rng):
    """Outlier-channel robustness: the scenario the graded ladder exists for.

    Real trained transformers carry a few huge-magnitude channels in
    attention weights that break per-channel W8A8 there. Zero egress means
    no real checkpoint to measure (VERDICT carry), so this test INJECTS
    that structure into a tiny model and checks the property the bench
    demotion ladder (turbo -> turbo_ffn -> fast) relies on: full turbo's
    error degrades much more than turbo_ffn's, and turbo_ffn stays close
    to fast.

    Scope, learned while writing this test: the rescue only holds for
    outliers confined to the q/k projections, whose outputs feed the
    softmax LOGITS and not the residual stream. Injecting the same
    outliers into v_w measured turbo_ffn error ~= turbo error (5.3e-3 vs
    5.8e-3): v's outlier channels ride the residual into every downstream
    FFN input and blow up the per-token ACTIVATION scales that turbo_ffn
    still uses. Residual-stream outliers therefore demote past turbo_ffn
    to fast — which is exactly what the measured-fidelity ladder does.
    """
    import jax

    from stutter_tpu.models import WavLMConfig, init_wavlm_params

    cfg = WavLMConfig.tiny(hidden_size=32, layers=2, heads=4)
    params = init_wavlm_params(jax.random.key(0), cfg)

    # inject outliers: a few INPUT channels of the q/k projections carry
    # 80x weights (per-output-channel scales cannot absorb an input-channel
    # outlier — every column's scale inflates, crushing the other channels'
    # resolution); FFN weights stay as initialized, and v_w is left alone
    # deliberately (see docstring scope note)
    layers = dict(params["encoder"]["layers"])
    in_idx = np.array([1, 7, 19])
    for k in ("q_w", "k_w"):
        w = np.array(layers[k])  # [N, D, D] (copy — jax buffers are read-only)
        w[:, in_idx, :] *= 80.0
        layers[k] = jax.numpy.asarray(w)
    params = {**params, "encoder": {**params["encoder"], "layers": layers}}

    errs = _preset_worst_errors(cfg, params, rng)
    e_fast, e_tf, e_turbo = errs["fast"], errs["turbo_ffn"], errs["turbo"]
    # the ladder's premise: attention-site quantization is what the
    # outliers break; FFN-only int8 must stay an order closer to fast
    assert e_turbo > 3 * e_tf, (e_turbo, e_tf)
    assert e_tf < 10 * e_fast + 1e-4, (e_tf, e_fast)
