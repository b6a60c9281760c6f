"""Chunked long-file extraction (SURVEY.md §5 long-context handling)."""

import numpy as np
import pytest


def test_chunked_long_file(tmp_path, rng):
    import jax

    from stutter_tpu.audio.wavio import write_wav
    from stutter_tpu.extract import (
        BucketBatcher,
        ExtractionPipeline,
        WavLMExtractor,
        create_metadata_from_files,
    )
    from stutter_tpu.models import WavLMConfig, init_wavlm_params

    wav_dir = tmp_path / "wav"
    wav_dir.mkdir()
    # one short file + one 5 s file with a 2 s top bucket -> 3 chunks
    short = (rng.randn(16000) * 0.1).astype(np.float32)
    long = (rng.randn(16000 * 5) * 0.1).astype(np.float32)
    write_wav(str(wav_dir / "train_short.wav"), short, 16000)
    write_wav(str(wav_dir / "train_long.wav"), long, 16000)

    cfg = WavLMConfig.tiny(hidden_size=32, layers=2, heads=4)
    params = init_wavlm_params(jax.random.key(0), cfg)
    extractor = WavLMExtractor(cfg, params)
    meta = create_metadata_from_files(str(tmp_path), split="train")
    batcher = BucketBatcher(buckets_s=(1.0, 2.0), audio_budget_s=8.0)

    pipe = ExtractionPipeline(extractor, batcher=batcher, long_file_policy="chunk")
    df = pipe.run_split(meta, "train", str(tmp_path / "out"))
    assert len(df) == 2
    long_row = df[df["filename"] == "train_long"].iloc[0]
    assert long_row["chunks"] == 3

    # mechanism check: equals the frame-weighted average of per-chunk pools
    # (decode from disk like the pipeline does — int16 quantization matters)
    from stutter_tpu.audio.wavio import load_audio
    from stutter_tpu.extract.batcher import Batch
    from stutter_tpu.models.wavlm import wavlm_feature_lengths

    long = load_audio(str(wav_dir / "train_long.wav"), target_sr=16000)
    chunk = batcher.bucket_samples(2.0)
    n_chunks = -(-len(long) // chunk)
    waves = np.zeros((n_chunks, chunk), np.float32)
    lengths = np.zeros((n_chunks,), np.int64)
    for c in range(n_chunks):
        seg = long[c * chunk : (c + 1) * chunk]
        waves[c, : len(seg)] = seg
        lengths[c] = len(seg)
    embs = extractor(Batch(paths=["x"] * n_chunks, rows=list(range(n_chunks)),
                           waves=waves, lengths=lengths,
                           ok=np.ones(n_chunks, bool), bucket_s=2.0))
    w = np.array([int(wavlm_feature_lengths(cfg, int(n))) for n in lengths], np.float64)
    w /= w.sum()
    col = extractor.column_names[0]
    expected = (np.asarray(embs[col], np.float64) * w[:, None]).sum(axis=0)
    np.testing.assert_allclose(np.asarray(long_row[col]), expected, rtol=1e-5, atol=1e-6)

    # trim policy keeps reference semantics: single row, no chunks column value
    pipe2 = ExtractionPipeline(extractor, batcher=batcher, long_file_policy="trim")
    df2 = pipe2.run_split(meta, "train", str(tmp_path / "out2"))
    assert len(df2) == 2
    assert "chunks" not in df2.columns or df2["chunks"].isna().all()


def test_chunked_whisper_true_frame_weighting(tmp_path, rng):
    """A >30 s file chunked through WhisperExtractor must combine chunk
    embeddings weighted by TRUE mel-derived frames (n_samples // 320, capped
    at 1500) — a 5 s tail chunk weighs 250/1750, not 1/2 (VERDICT r1 weak #5)."""
    import jax

    from stutter_tpu.audio.wavio import load_audio, write_wav
    from stutter_tpu.extract import (
        BucketBatcher,
        ExtractionPipeline,
        WhisperExtractor,
        create_metadata_from_files,
    )
    from stutter_tpu.extract.batcher import Batch
    from stutter_tpu.models import WhisperConfig, init_whisper_params

    wav_dir = tmp_path / "wav"
    wav_dir.mkdir()
    long = (rng.randn(16000 * 35) * 0.1).astype(np.float32)  # 35 s -> 30+5 chunks
    write_wav(str(wav_dir / "train_long.wav"), long, 16000)

    cfg = WhisperConfig.tiny(d_model=32, layers=2, heads=4)
    params = init_whisper_params(jax.random.key(0), cfg)
    extractor = WhisperExtractor(cfg, params, preset="fidelity")
    meta = create_metadata_from_files(str(tmp_path), split="train")
    pipe = ExtractionPipeline(extractor, long_file_policy="chunk")
    df = pipe.run_split(meta, "train", str(tmp_path / "out"))
    assert len(df) == 1 and df.iloc[0]["chunks"] == 2

    # explicit expected combination: decode, chunk, embed, weight by true frames
    wave = load_audio(str(wav_dir / "train_long.wav"), target_sr=16000)
    chunk = 16000 * 30
    n_chunks = -(-len(wave) // chunk)
    n_padded = 4  # pipeline pads the chunk batch up to a multiple of 4
    waves = np.zeros((n_padded, chunk), np.float32)
    lengths = np.zeros((n_padded,), np.int64)
    for c in range(n_chunks):
        seg = wave[c * chunk : (c + 1) * chunk]
        waves[c, : len(seg)] = seg
        lengths[c] = len(seg)
    embs = extractor(Batch(paths=["x"] * n_chunks, rows=list(range(n_chunks)),
                           waves=waves, lengths=lengths,
                           ok=np.arange(n_padded) < n_chunks, bucket_s=30.0))
    w = np.array([min(1500, int(n) // 320) for n in lengths[:n_chunks]], np.float64)
    assert w[1] < w[0]  # the tail chunk must weigh less
    w_full = np.zeros(n_padded)
    w_full[:n_chunks] = w / w.sum()
    for col in extractor.column_names:
        expected = (np.asarray(embs[col], np.float64) * w_full[:, None]).sum(axis=0)
        np.testing.assert_allclose(
            np.asarray(df.iloc[0][col], np.float64), expected, rtol=1e-5, atol=1e-6
        )


def test_chunked_files_share_batches(tmp_path, rng):
    """Round-4 throughput fix: chunks from DIFFERENT long files must ride
    shared full-size bucket batches (full chunks in the top bucket, tails in
    their smallest covering bucket) instead of one tiny padded batch per
    file — and the per-file combination must equal the single-file
    chunked_embeddings math."""
    import jax

    from stutter_tpu.audio.wavio import write_wav
    from stutter_tpu.extract import (
        BucketBatcher,
        ExtractionPipeline,
        WavLMExtractor,
        create_metadata_from_files,
    )
    from stutter_tpu.extract.pipeline import chunked_embeddings
    from stutter_tpu.models import WavLMConfig, init_wavlm_params

    wav_dir = tmp_path / "wav"
    wav_dir.mkdir()
    for i in range(3):  # three 5 s files: 2+2+1 s chunks each under a 2 s cap
        wave = (rng.randn(16000 * 5) * 0.1).astype(np.float32)
        write_wav(str(wav_dir / f"train_long{i}.wav"), wave, 16000)

    cfg = WavLMConfig.tiny(hidden_size=32, layers=2, heads=4)
    params = init_wavlm_params(jax.random.key(0), cfg)
    extractor = WavLMExtractor(cfg, params)
    calls: list[tuple[float, int]] = []
    orig = extractor.__class__.__call__

    class Counting:
        def __getattr__(self, name):
            # expose everything EXCEPT submit/collect so the pipeline takes
            # the synchronous path through our counting __call__
            if name in ("submit", "collect"):
                raise AttributeError(name)
            return getattr(extractor, name)

        def __call__(self, batch):
            calls.append((batch.bucket_s, len(batch.waves)))
            return orig(extractor, batch)

    meta = create_metadata_from_files(str(tmp_path), split="train")
    batcher = BucketBatcher(buckets_s=(1.0, 2.0), audio_budget_s=8.0)
    pipe = ExtractionPipeline(Counting(), batcher=batcher,
                              long_file_policy="chunk")
    df = pipe.run_split(meta, "train", str(tmp_path / "out"))
    assert len(df) == 3 and (df["chunks"] == 3).all()

    # 6 full 2 s chunks at batch_size_for(2.0)=4 -> 2 batches; 3 one-second
    # tails at batch_size_for(1.0)=8 -> 1 batch. Per-file batching would
    # have been 3 calls of 4 x 2 s instead.
    top_calls = [c for c in calls if c[0] == 2.0]
    tail_calls = [c for c in calls if c[0] == 1.0]
    assert len(top_calls) == 2 and len(tail_calls) == 1, calls

    # equivalence with the single-file reference combiner
    for i in range(3):
        ref, n_chunks, _ = chunked_embeddings(
            extractor, batcher, str(wav_dir / f"train_long{i}.wav"))
        assert n_chunks == 3
        row = df[df["filename"] == f"train_long{i}"].iloc[0]
        col = extractor.column_names[0]
        np.testing.assert_allclose(np.asarray(row[col], np.float64),
                                   np.asarray(ref[col], np.float64),
                                   rtol=5e-3, atol=1e-5)


def test_chunk_vs_native_embedding_close(tmp_path, rng):
    """Pin chunk-vs-native closeness at the default long-file policy.

    The chunk policy computes a different function from the native
    full-clip forward (no cross-chunk attention, frame-weighted per-chunk
    pooling). Round 5 measured the delta at real scale on the real TPU
    (artifacts/chunk_quality_r5.json: per-layer cosine mean ~8e-4, worst
    ~4e-3 on 20-30 s clips, WavLM-Large); this CPU test pins the same
    comparison on a tiny model so a regression in the chunk combination
    (weighting, tail bucketing, batch sharing) shows up as a cosine blowup.
    """
    import jax

    from stutter_tpu.audio.wavio import write_wav
    from stutter_tpu.extract import (
        BucketBatcher,
        ExtractionPipeline,
        WavLMExtractor,
        create_metadata_from_files,
    )
    from stutter_tpu.models import WavLMConfig, init_wavlm_params

    wav_dir = tmp_path / "wav"
    wav_dir.mkdir()
    # deterministic tonal signal (tiny-stem frames: 4 s -> L=3200 is too
    # big; keep clips ~2 s -> L=1600 einsum on CPU is fine at hidden 32)
    sr = 16000
    t = np.arange(2 * sr) / sr
    x = (0.4 * np.sin(2 * np.pi * 220 * t)
         + 0.1 * np.asarray(rng.randn(len(t)), np.float32)).astype(np.float32)
    write_wav(str(wav_dir / "train_clip.wav"), x, sr)

    cfg = WavLMConfig.tiny(hidden_size=32, layers=2, heads=4)
    params = init_wavlm_params(jax.random.key(0), cfg)
    extractor = WavLMExtractor(cfg, params)
    meta = create_metadata_from_files(str(tmp_path), split="train")

    # native: one bucket covers the whole clip
    native = ExtractionPipeline(
        extractor,
        batcher=BucketBatcher(buckets_s=(2.0,), audio_budget_s=8.0),
        long_file_policy="trim",
    ).run_split(meta, "train", str(tmp_path / "out_native"))
    # chunk: 0.5 s cap -> 4 chunks per clip
    chunked = ExtractionPipeline(
        extractor,
        batcher=BucketBatcher(buckets_s=(0.25, 0.5), audio_budget_s=8.0),
        long_file_policy="chunk",
    ).run_split(meta, "train", str(tmp_path / "out_chunk"))

    assert len(native) == 1 and len(chunked) == 1
    for col in extractor.column_names:
        a = np.asarray(native.iloc[0][col], np.float64)
        b = np.asarray(chunked.iloc[0][col], np.float64)
        cos = 1.0 - a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
        # tiny random model, 4x chunking of a stationary signal: the
        # semantics delta stays small; a combiner bug (wrong weights, tail
        # trim, row mixup) lands orders of magnitude above this
        assert cos < 0.02, (col, cos)
