"""AOT bucket-program warmup: compile every bucket shape before any audio.

Production starts (and first-of-bucket serving requests) must not pay the
60-90 s remote XLA compile at request time; extractor.warmup(batcher) lowers
and compiles each bucket's exact program ahead of time.
"""

import glob
import os

import jax
import numpy as np
import pytest

from stutter_tpu.audio.synthetic import make_synthetic_corpus
from stutter_tpu.extract import BucketBatcher, WavLMExtractor, WhisperExtractor
from stutter_tpu.models import (
    WavLMConfig,
    WhisperConfig,
    init_wavlm_params,
    init_whisper_params,
)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("warmup_corpus"))
    make_synthetic_corpus(root, n_per_split={"train": 4}, seed=2)
    return sorted(glob.glob(os.path.join(root, "wav", "*.wav")))


def test_wavlm_warmup_then_serve(corpus):
    cfg = WavLMConfig.tiny()
    ex = WavLMExtractor(cfg, init_wavlm_params(jax.random.key(0), cfg), preset="fast")
    batcher = BucketBatcher(buckets_s=(1.0, 2.0), audio_budget_s=8.0,
                            frame_align=ex.frame_align)
    assert ex.warmup(batcher) == 2

    # a real batch through a warmed bucket executes with the exact shapes the
    # warmup lowered (batch padded to batch_size_for, bucket_samples-long)
    for batch in batcher.batches(corpus, prefetch=False):
        out = ex(batch)
        for col in ex.column_names:
            assert out[col].shape == (batcher.batch_size_for(batch.bucket_s),
                                      ex.embedding_dim)
            assert np.isfinite(out[col]).all()
        break


def test_wavlm_warmup_shapes_match_submit(corpus):
    """The lowered avals must equal what submit() actually feeds the jit —
    a drifted dtype/shape would silently compile a second program."""
    cfg = WavLMConfig.tiny()
    ex = WavLMExtractor(cfg, init_wavlm_params(jax.random.key(0), cfg), preset="fast")
    batcher = BucketBatcher(buckets_s=(1.0,), audio_budget_s=4.0,
                            frame_align=ex.frame_align)
    from stutter_tpu.extract.pipeline import encode_waves_i16

    for batch in batcher.batches(corpus[:2], prefetch=False):
        waves, scale = encode_waves_i16(batch.waves)
        lengths = batch.lengths.astype(np.int32)
        B = batcher.batch_size_for(batch.bucket_s)
        n = batcher.bucket_samples(batch.bucket_s)
        assert waves.shape == (B, n) and waves.dtype == np.int16
        assert scale.shape == (B,) and scale.dtype == np.float32
        assert lengths.shape == (B,) and lengths.dtype == np.int32
        break


def test_whisper_and_combined_warmup():
    wcfg = WhisperConfig.tiny(d_model=32, layers=2, heads=4)
    wex = WhisperExtractor(wcfg, init_whisper_params(jax.random.key(1), wcfg),
                           preset="fast")
    batcher = BucketBatcher(buckets_s=wex.preferred_buckets, audio_budget_s=60.0,
                            max_batch=2)
    assert wex.warmup(batcher) == 1

    from stutter_tpu.serve import CombinedExtractor

    cfg = WavLMConfig.tiny()
    ex = WavLMExtractor(cfg, init_wavlm_params(jax.random.key(0), cfg), preset="fast")
    combined = CombinedExtractor(ex, wex)
    # short bucket for the CPU test: tiny's 20x stem makes a 30 s bucket a
    # 24k-frame attention (CLAUDE.md) — whisper pads to 30 s internally anyway
    small = BucketBatcher(buckets_s=(0.8,), audio_budget_s=1.6, max_batch=2)
    assert combined.warmup(small) == 2


def test_warmup_on_mesh():
    """Warmup lowers with the mesh's NamedSharding so the compiled program is
    the one the sharded submit() path runs."""
    from stutter_tpu.parallel import make_mesh

    mesh = make_mesh(jax.devices()[:2], data=2, model=1)
    cfg = WavLMConfig.tiny()
    ex = WavLMExtractor(cfg, init_wavlm_params(jax.random.key(0), cfg),
                        mesh=mesh, preset="fast")
    batcher = BucketBatcher(buckets_s=(1.0,), audio_budget_s=4.0,
                            batch_multiple=2, frame_align=ex.frame_align)
    assert ex.warmup(batcher) == 1
