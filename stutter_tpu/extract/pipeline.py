"""Batched, resumable embedding extraction on the TPU mesh.

Replaces the reference's extraction drivers (``WavLM_embeddings.py:436-658``,
``whisper_embeddings_large.py:397-601``) with a TPU-first design:

reference                               this pipeline
---------------------------------      ----------------------------------
per-file batch=1 forward, Python       length-bucketed device batches,
dispatch per clip                      one jit per bucket shape
host STFT / norm per clip              frontend fused into the jit program
.cpu() per layer per clip              one [S, B, D] pooled device->host
                                       transfer per batch
cuda empty_cache every batch           XLA arena allocator, donated buffers
single device                          DP over a jax.sharding mesh

Checkpoint/resume and the .npy+CSV store keep the reference's on-disk
contracts (extract/checkpoint.py, extract/store.py).
"""

from __future__ import annotations

import functools
import time
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from stutter_tpu.extract.batcher import Batch, BucketBatcher
from stutter_tpu.extract.checkpoint import (
    find_latest_checkpoint,
    load_checkpoint,
    save_checkpoint,
)
from stutter_tpu.extract.store import save_embeddings
from stutter_tpu.frontend.wavlm_frontend import wavlm_prepare_batch
from stutter_tpu.models.wavlm import WavLMConfig, wavlm_encode
from stutter_tpu.models.whisper import (
    WhisperConfig,
    whisper_decoder_step,
    whisper_encoder_forward,
)
from stutter_tpu.ops.logmel import WHISPER_N_SAMPLES, log_mel_spectrogram, pad_or_trim
from stutter_tpu.ops.pooling import masked_mean_pool
from stutter_tpu.parallel.mesh import MeshPlan, replicate, shard_batch
from stutter_tpu.utils.logging import get_logger

logger = get_logger("extract.pipeline")

PRESETS = {
    # fidelity: f32 activations, HIGHEST matmul precision — the <=1e-3 bar.
    "fidelity": dict(precision=jax.lax.Precision.HIGHEST, activation_dtype=jnp.float32),
    # fast: bf16 activations with f32 accumulation/LN/softmax — MXU peak rate.
    "fast": dict(precision=jax.lax.Precision.DEFAULT, activation_dtype=jnp.bfloat16),
    # turbo: fast + int8 dynamic-quant encoder/decoder GEMMs (ops/quant.py)
    # on the 2x-rate int8 MXU path. Inference-only; fidelity is measured and
    # reported by bench.py rather than guaranteed <=1e-3.
    "turbo": dict(precision=jax.lax.Precision.DEFAULT, activation_dtype=jnp.bfloat16),
    # turbo_ffn: the graded demotion step between turbo and fast — int8 on
    # the FFN GEMMs ONLY (wavlm ff_w1/ff_w2, whisper fc1/fc2 = ~2/3 of the
    # transformer GEMM FLOPs), attention projections stay bf16; measured
    # 3339 audio-s/s at the wavlm headline shape (fast 3050 / turbo 3544).
    # Scope (tests/test_quant.py outlier test): it rescues checkpoints
    # whose int8-hostile outlier channels sit in the q/k projection
    # WEIGHTS (their outputs feed logits, not the residual); outliers that
    # reach the residual stream (v/o/LN) inflate the per-token ACTIVATION
    # scales that turbo_ffn still uses, so those checkpoints demote past
    # it to fast — which bench.py's measured-fidelity ladder
    # (turbo -> turbo_ffn -> fast) does automatically.
    "turbo_ffn": dict(precision=jax.lax.Precision.DEFAULT, activation_dtype=jnp.bfloat16),
}

_FFN_QUANT_KEYS = ("ff_w1", "ff_w2", "fc1_w", "fc2_w")


def cast_params_for_preset(params, preset: str):
    """fast preset: bf16 param tree (f32 biases otherwise upcast every
    downstream matmul into the slow f32 multi-pass MXU mode — measured +40%
    step time on whisper-large). LN/softmax still compute in f32 internally;
    fidelity tests bound the bf16 error well under the 1e-3 cosine bar.

    turbo preset: the fast cast, then the transformer-layer projection/FFN
    weights (WavLM q/k/v/o + ff, Whisper attn/xattn + fc) are replaced by
    int8 {q, s} pairs; ops/quant.dense dispatches on that structure inside
    the layer bodies. Conv stems, biases, norms and embeddings stay bf16."""
    if preset not in ("fast", "turbo", "turbo_ffn"):
        return params
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32
        else x,
        params,
    )
    if preset in ("turbo", "turbo_ffn"):
        from stutter_tpu.ops.quant import (
            WAVLM_QUANT_KEYS,
            WHISPER_QUANT_KEYS,
            quantize_layer_stack,
        )

        params = dict(params)
        # The whisper DECODER stays bf16: its quantization contributed as
        # much end-to-end error as the whole 32-layer encoder (~4.2e-4 of
        # the 7.4e-4 total, scripts/whisper_turbo_fidelity_sweep.py) while
        # the extraction decoder runs ONE token — int8 there bought ~3% of
        # extract throughput and none of the encoder headline. The whisper
        # encoder's attn_o also stays bf16: it was the single biggest int8
        # error key, and skipping it bought 4.10e-4 -> 3.40e-4 end-to-end
        # fidelity for ~1% encoder throughput (sweep2 on v5e: 1852 -> 1829
        # audio-s/s). WavLM's o_w stays int8 — its measured turbo fidelity
        # (2.7e-4) already has 3.7x margin under the 1e-3 bar.
        whisper_enc_keys = tuple(k for k in WHISPER_QUANT_KEYS
                                 if k != "attn_o_w")
        quant_keys = (_FFN_QUANT_KEYS if preset == "turbo_ffn"
                      else WAVLM_QUANT_KEYS + whisper_enc_keys)
        for block, keys in (("encoder", quant_keys),):
            if block in params and isinstance(params[block], dict) \
                    and "layers" in params[block]:
                params[block] = dict(params[block])
                params[block]["layers"] = quantize_layer_stack(
                    params[block]["layers"], keys)
        # The conv stem deliberately stays bf16: quantizing it (im2col +
        # int8 GEMM, quantize_conv_weight) measured stem 21.9 -> 64.2 ms —
        # the early convs are HBM-traffic-bound on [B, ~9.6k, 512] frames
        # and a dynamic-quant pass there ADDS elementwise traffic.
    return params


def encode_waves_i16(waves) -> tuple[np.ndarray, np.ndarray]:
    """Per-clip peak-scaled int16 host->device encoding.

    Halves the transfer bytes (the pipeline bottleneck through a bandwidth-
    limited host link). Scaling each clip to full int16 range bounds the
    quantization noise at ~3e-5 RELATIVE to that clip's peak — quiet clips
    (e.g. far-field recordings after resampling) stay ~100x below bf16's
    own 0.4% rounding even after per-clip normalization, where a fixed
    1/32768 grid would have amplified to percent-level error (self-review
    finding). Returns (int16 [B, T], f32 scale [B])."""
    w = np.asarray(waves, np.float32)
    peak = np.max(np.abs(w), axis=1)
    scale = np.where(peak > 0, peak / 32767.0, 1.0).astype(np.float32)
    q = np.clip(np.rint(w / scale[:, None]), -32767, 32767).astype(np.int16)
    return q, scale


def _warmup_bucket_programs(extractor, batcher, arg_shapes) -> int:
    """AOT-compile one device program per bucket, no audio involved.

    ``jax.jit(...).lower(shapes).compile()`` builds exactly the executable a
    real batch of that bucket's shape would trigger; the persistent compile
    cache (enabled here if the caller hasn't set one) puts the result on
    disk, so production starts and first-of-bucket serving requests never
    pay the 60-90 s remote compile at request time. ``arg_shapes(B, n)``
    returns the extractor's post-transfer argument (shape, dtype) list.
    Returns the number of bucket programs compiled."""
    import jax

    from stutter_tpu.utils.jaxcache import enable_compilation_cache

    # The AOT executable is discarded; the warmup guarantee rides on the
    # persistent cache, so turn it on for library callers who never touched
    # cli/common (no-op when a cache dir is already configured).
    enable_compilation_cache()

    mesh = getattr(extractor, "mesh", None)
    count = 0
    for bucket_s in batcher.buckets_s:
        B = batcher.batch_size_for(bucket_s)
        n = batcher.bucket_samples(bucket_s)
        structs = [
            jax.ShapeDtypeStruct(
                shape, dtype,
                sharding=mesh.batch_sharding(len(shape)) if mesh else None)
            for shape, dtype in arg_shapes(B, n)
        ]
        t0 = time.perf_counter()
        extractor._fn.lower(extractor.params, *structs).compile()
        logger.info("warmup: bucket %.1fs [B=%d, n=%d] compiled in %.1fs",
                    bucket_s, B, n, time.perf_counter() - t0)
        count += 1
    return count


def decode_waves_i16(waves, scale):
    """Device-side inverse of encode_waves_i16 (no-op for f32 transfers)."""
    if waves.dtype == jnp.int16:
        return waves.astype(jnp.float32) * scale[:, None]
    return waves


class WavLMExtractor:
    """Layer-selected mean-pooled WavLM embeddings (reference C6)."""

    def __init__(
        self,
        cfg: WavLMConfig,
        params,
        layer_indices: Sequence[int] | None = None,
        mesh: MeshPlan | None = None,
        preset: str = "fidelity",
    ):
        self.cfg = cfg
        self.mesh = mesh
        n_states = cfg.num_hidden_layers + 1
        # reference default: [N-1, N-2, N-3, N//2] (WavLM_embeddings.py:506)
        self.layer_indices = tuple(
            layer_indices
            if layer_indices is not None
            else (n_states - 1, n_states - 2, n_states - 3, n_states // 2)
        )
        self.embedding_dim = cfg.hidden_size
        self.column_names = [f"layer_{i}" for i in self.layer_indices]
        # snap bucket lengths so frame counts hit MXU-friendly multiples
        self.frame_align = (*cfg.stem_geometry, 16)

        def frame_count(n_samples: int) -> int:
            from stutter_tpu.models.wavlm import wavlm_feature_lengths

            return int(wavlm_feature_lengths(cfg, n_samples))

        self.frame_count = frame_count
        opts = PRESETS[preset]
        # fast/turbo ship waveforms host->device as per-clip-scaled int16
        # (encode_waves_i16); the fidelity preset keeps f32
        self._transfer_i16 = preset in ("fast", "turbo", "turbo_ffn")
        tp = mesh is not None and mesh.model_size > 1
        params = cast_params_for_preset(params, preset)
        if tp:
            # Megatron-style TP over the encoder weights (parallel/sharding.py);
            # turbo's int8 {q,s} pairs shard too (q inherits the weight spec,
            # scales follow their output channels — parallel/sharding._lookup)
            from stutter_tpu.parallel.sharding import shard_params, wavlm_param_spec

            self.params = shard_params(mesh, params, wavlm_param_spec(mesh))
        else:
            self.params = replicate(mesh, params)

        def fn(params, waves, scale, lengths):
            waves = decode_waves_i16(waves, scale)
            waves = wavlm_prepare_batch(waves, lengths, cfg.do_normalize)
            return wavlm_encode(
                params, waves, cfg, self.layer_indices, sample_lengths=lengths,
                use_flash=not tp,  # pallas_call has no GSPMD partition rule
                **opts,
            )

        self._fn = jax.jit(fn)

    def warmup(self, batcher) -> int:
        """AOT-compile every bucket program (``jit(...).lower().compile()``)
        without decoding any audio; see ``_warmup_bucket_programs``."""
        return _warmup_bucket_programs(
            self, batcher,
            lambda B, n: [((B, n), jnp.int16 if self._transfer_i16 else jnp.float32),
                          ((B,), jnp.float32), ((B,), jnp.int32)],
        )

    def submit(self, batch: Batch):
        """Dispatch the device program WITHOUT a host sync (JAX async
        dispatch): the returned handle is a live [S, B, D] device array."""
        waves = batch.waves
        scale = np.ones((len(waves),), np.float32)
        if self._transfer_i16:
            waves, scale = encode_waves_i16(waves)
        waves, scale, lengths = shard_batch(
            self.mesh, waves, scale, batch.lengths.astype(np.int32))
        return self._fn(self.params, waves, scale, lengths)

    def collect(self, handle) -> dict[str, np.ndarray]:
        pooled = np.asarray(handle)  # [S, B, D] f32, blocks until done
        return {name: pooled[s] for s, name in enumerate(self.column_names)}

    def __call__(self, batch: Batch) -> dict[str, np.ndarray]:
        return self.collect(self.submit(batch))


class WhisperExtractor:
    """Whisper encoder mean-pooled + decoder single-token embeddings (C7).

    Preserves the reference's quirks: 30 s zero-padded mel is attended in
    full (encoder pool is over all 1500 frames, padding included —
    whisper_embeddings_large.py:278 pools the padded sequence), and the
    decoder runs exactly one step with token id 0.
    """

    preferred_buckets = (30.0,)

    def __init__(
        self,
        cfg: WhisperConfig,
        params,
        encoder_indices: Sequence[int] | None = None,
        decoder_indices: Sequence[int] | None = None,
        mesh: MeshPlan | None = None,
        preset: str = "fidelity",
    ):
        self.cfg = cfg
        self.mesh = mesh
        n_enc, n_dec = cfg.encoder_layers + 1, cfg.decoder_layers + 1
        # reference: last three hidden states each (whisper_embeddings_large.py:454-455)
        self.encoder_indices = tuple(
            encoder_indices if encoder_indices is not None else (n_enc - 1, n_enc - 2, n_enc - 3)
        )
        self.decoder_indices = tuple(
            decoder_indices if decoder_indices is not None else (n_dec - 1, n_dec - 2, n_dec - 3)
        )
        self.embedding_dim = cfg.d_model
        self.column_names = [f"encoder_layer_{i}" for i in self.encoder_indices] + [
            f"decoder_layer_{i}" for i in self.decoder_indices
        ]
        # True encoder frames covering n_samples of audio (mel hop 160, conv
        # stem stride 2), capped at the fixed 1500 positions. Used ONLY as the
        # chunk-combination weight in chunked extraction — the encoder itself
        # still pools over all 1500 padded positions (reference quirk kept),
        # but a 2 s tail chunk must not weigh as much as a full 30 s chunk.
        from stutter_tpu.ops.logmel import WHISPER_HOP

        self.frame_count = lambda n_samples: max(
            1, min(cfg.max_source_positions, int(n_samples) // (WHISPER_HOP * 2))
        )
        opts = PRESETS[preset]
        self._transfer_i16 = preset in ("fast", "turbo", "turbo_ffn")  # see encode_waves_i16
        tp = mesh is not None and mesh.model_size > 1
        params = cast_params_for_preset(params, preset)
        if tp:
            # Megatron-style TP over encoder+decoder weights (parallel/sharding);
            # turbo int8 {q,s} pairs shard too (see parallel/sharding._lookup)
            from stutter_tpu.parallel.sharding import shard_params, whisper_param_spec

            self.params = shard_params(mesh, params, whisper_param_spec(mesh))
        else:
            self.params = replicate(mesh, params)

        def fn(params, waves, scale):
            from stutter_tpu.frontend.whisper_frontend import whisper_features

            waves = decode_waves_i16(waves, scale)
            mel = whisper_features(waves, n_mels=cfg.num_mel_bins)
            # pool inside the encoder scan — only [N+1, B, D] means are kept
            enc_last, enc_pooled_all = whisper_encoder_forward(
                params, mel, cfg, **opts,
                hidden_reducer=lambda h: jnp.mean(h.astype(jnp.float32), axis=1),
                use_flash=not tp,  # pallas_call has no GSPMD partition rule
            )
            _, dec_states = whisper_decoder_step(params, enc_last, 0, cfg, **opts)
            enc_pooled = enc_pooled_all[jnp.asarray(self.encoder_indices)]
            dec_sel = dec_states[jnp.asarray(self.decoder_indices)][:, :, 0, :]
            return enc_pooled, dec_sel.astype(jnp.float32)

        self._fn = jax.jit(fn)

    def warmup(self, batcher) -> int:
        """AOT-compile every bucket program without decoding any audio."""
        return _warmup_bucket_programs(
            self, batcher,
            lambda B, n: [((B, n), jnp.int16 if self._transfer_i16 else jnp.float32),
                          ((B,), jnp.float32)],
        )

    def submit(self, batch: Batch):
        """Dispatch the device program without a host sync (async handle)."""
        waves = batch.waves
        scale = np.ones((len(waves),), np.float32)
        if self._transfer_i16:
            waves, scale = encode_waves_i16(waves)
        waves, scale = shard_batch(self.mesh, waves, scale)
        return self._fn(self.params, waves, scale)

    def collect(self, handle) -> dict[str, np.ndarray]:
        enc, dec = handle
        enc, dec = np.asarray(enc), np.asarray(dec)
        out = {f"encoder_layer_{i}": enc[s] for s, i in enumerate(self.encoder_indices)}
        out.update({f"decoder_layer_{i}": dec[s] for s, i in enumerate(self.decoder_indices)})
        return out

    def __call__(self, batch: Batch) -> dict[str, np.ndarray]:
        return self.collect(self.submit(batch))


def chunked_embeddings(
    extractor, batcher: BucketBatcher, path: str,
) -> tuple[dict[str, np.ndarray], int, float] | None:
    """Embed one over-length file as top-bucket chunks and combine the pooled
    embeddings weighted by each chunk's TRUE frame count. For WavLM
    (mask-correct pooling) this equals the whole-file mean pool up to
    chunk-boundary effects; for Whisper (pool-over-padding quirk kept) it
    weights each chunk's padded pool by its real audio content.

    Shared by the batch pipeline's 'chunk' long-file policy and the online
    server's 'chunk' long-clip policy. Returns (column -> combined [D] f32,
    n_chunks, audio_seconds) or None on decode failure / no usable chunks.
    """
    from stutter_tpu.audio.wavio import load_audio

    sr = batcher.target_sr
    chunk_samples = batcher.bucket_samples(batcher.buckets_s[-1])
    wave = load_audio(path, target_sr=sr)
    if wave is None:
        logger.error("skipping %s (decode failed)", path)
        return None
    n_chunks = max(1, -(-len(wave) // chunk_samples))
    # pad the chunk count up to a mesh-divisible, small-shape-set size:
    # keeps DP sharding even and bounds the number of distinct jit shapes
    m = max(batcher.batch_multiple, 4)
    n_padded = ((n_chunks + m - 1) // m) * m
    waves = np.zeros((n_padded, chunk_samples), np.float32)
    lengths = np.zeros((n_padded,), np.int64)
    for c in range(n_chunks):
        seg = wave[c * chunk_samples : (c + 1) * chunk_samples]
        waves[c, : len(seg)] = seg
        lengths[c] = len(seg)
    ok = np.arange(n_padded) < n_chunks
    batch = Batch(
        paths=[path] * n_chunks, rows=list(range(n_chunks)),
        waves=waves, lengths=lengths, ok=ok,
        bucket_s=chunk_samples / sr, sample_rate=sr,
    )
    embeddings = extractor(batch)
    # frame counts weight each chunk's mean; tiny remainder chunks can
    # yield <=0 through the conv floor chain -> clamp, and guard the sum
    weights = np.array(
        [max(0, extractor.frame_count(int(n))) if ok[c] else 0
         for c, n in enumerate(lengths)], np.float64,
    )
    if weights.sum() <= 0:
        logger.error("skipping %s (no usable chunks)", path)
        return None
    weights /= weights.sum()
    combined = {
        col: np.asarray(
            (np.asarray(arr, np.float64) * weights[:, None]).sum(axis=0), np.float32)
        for col, arr in embeddings.items()
    }
    return combined, n_chunks, float(len(wave)) / sr


class ExtractionPipeline:
    """Split loop -> bucketed batches -> device forward -> store (C10).

    long_file_policy: what happens to clips longer than the top bucket —
    'trim' (reference behavior: keep the first bucket-length seconds,
    WavLM_embeddings.py:112-117) or 'chunk' (split into top-bucket-length
    chunks, embed each, and length-weight-average the pooled embeddings —
    equal to mean-pooling the whole file up to chunk-boundary effects;
    SURVEY.md §5 long-context handling).
    """

    def __init__(
        self,
        extractor,
        batcher: BucketBatcher | None = None,
        checkpoint_interval: int = 50,
        long_file_policy: str = "trim",
    ):
        assert long_file_policy in ("trim", "chunk")
        self.long_file_policy = long_file_policy
        self.extractor = extractor
        if batcher is None:
            buckets = getattr(extractor, "preferred_buckets", None)
            mesh: MeshPlan | None = getattr(extractor, "mesh", None)
            from stutter_tpu.extract.batcher import DEFAULT_BUCKETS_S

            batcher = BucketBatcher(
                buckets_s=buckets or DEFAULT_BUCKETS_S,
                batch_multiple=mesh.data_size if mesh else 1,
                frame_align=getattr(extractor, "frame_align", None),
            )
        self.batcher = batcher
        self.checkpoint_interval = checkpoint_interval

    def run_split(
        self,
        metadata: pd.DataFrame,
        split: str,
        output_dir: str,
        resume: bool = False,
    ) -> pd.DataFrame:
        """Extract one split, honoring checkpoint/resume, and persist it."""
        split_meta = metadata[metadata["split"] == split].reset_index(drop=True)
        if len(split_meta) == 0:
            logger.warning("no files for split %s", split)
            return pd.DataFrame()

        results: list[dict] = []
        ckpt_num = 0
        if resume:
            latest = find_latest_checkpoint(output_dir, split)
            if latest is not None:
                results = load_checkpoint(output_dir, split, latest)
                ckpt_num = latest
        done_paths = {r["path"] for r in results}
        todo = split_meta[~split_meta["path"].isin(done_paths)].reset_index()

        long_rows: list[int] = []
        if self.long_file_policy == "chunk":
            from stutter_tpu.audio.wavio import audio_info

            top_s = self.batcher.buckets_s[-1]
            for i, p in enumerate(todo["path"]):
                try:
                    n, sr = audio_info(p)
                    if n / sr > top_s:
                        long_rows.append(i)
                except Exception:  # noqa: BLE001 — normal path reports it
                    continue

        t0 = time.perf_counter()
        audio_s = 0.0
        since_ckpt = 0
        long_set = set(long_rows)
        short_paths = [p for i, p in enumerate(todo["path"]) if i not in long_set]
        row_of_path = {p: i for i, p in enumerate(todo["path"])}

        # 1-deep async pipeline: batch i+1 is DISPATCHED (host->device copy +
        # device compute, both async) before batch i's pooled result is
        # fetched and stored — so host-side row bookkeeping, checkpointing,
        # and the device->host transfer overlap the next batch's compute.
        can_pipeline = hasattr(self.extractor, "submit") and hasattr(self.extractor, "collect")

        def drain(pending) -> None:
            nonlocal audio_s, since_ckpt, ckpt_num
            batch, handle = pending
            embeddings = self.extractor.collect(handle) if can_pipeline else handle
            for j, row_idx in enumerate(batch.rows):
                if not batch.ok[j]:
                    if j < len(batch.paths):
                        logger.error("skipping %s (decode failed)", batch.paths[j])
                    continue
                meta_row = todo.iloc[row_idx]
                entry = {
                    "filename": meta_row["filename"],
                    "path": meta_row["path"],
                    "split": split,
                }
                if "label" in meta_row and not pd.isna(meta_row["label"]):
                    entry["label"] = meta_row["label"]
                for col, arr in embeddings.items():
                    entry[col] = np.asarray(arr[j], np.float32)
                results.append(entry)
                since_ckpt += 1
            audio_s += batch.audio_seconds
            if since_ckpt >= self.checkpoint_interval:
                ckpt_num += 1
                save_checkpoint(results, output_dir, split, ckpt_num)
                since_ckpt = 0

        pending = None
        for batch in self.batcher.batches(short_paths):
            batch.rows = [row_of_path[p] for p in batch.paths]
            handle = self.extractor.submit(batch) if can_pipeline else self.extractor(batch)
            if pending is not None:
                drain(pending)
            pending = (batch, handle)
        if pending is not None:
            drain(pending)

        if long_rows:
            def on_file_done(entry):
                nonlocal audio_s, since_ckpt, ckpt_num
                results.append(entry)
                audio_s += entry.pop("_audio_s")
                since_ckpt += 1
                if since_ckpt >= self.checkpoint_interval:
                    ckpt_num += 1
                    save_checkpoint(results, output_dir, split, ckpt_num)
                    since_ckpt = 0

            self._extract_chunked_rows(todo, long_rows, split, on_file_done)
        wall = time.perf_counter() - t0
        if wall > 0 and audio_s > 0:
            logger.info(
                "split %s: %d files, %.1f audio-s in %.1f s (%.1fx real-time)",
                split, len(results), audio_s, wall, audio_s / wall,
            )

        df = pd.DataFrame(results)
        if len(df):
            df = df.sort_values("path", kind="stable").reset_index(drop=True)
            save_embeddings(df, output_dir, split, expected_dim=self.extractor.embedding_dim)
        return df

    def _extract_chunked_rows(self, todo, long_rows: list[int], split: str,
                              on_file_done) -> None:
        """Cross-file chunk batching for the 'chunk' long-file policy.

        The single-file path (``chunked_embeddings``, kept for the online
        server) runs each over-length file as its OWN tiny padded batch —
        a 30 s file under a 12 s cap costs a batch-of-4 top-bucket program
        for 2.5 chunks of content. Here chunks from ALL long files share
        the same full-size bucket batches the short-clip path uses (full
        chunks ride the top bucket, each tail rides its smallest covering
        bucket), so a corpus of long files extracts at full-batch
        throughput. Per-file combination is identical: pooled chunk
        embeddings weighted by true frame count, accumulated as each batch
        drains; a file's entry is emitted when its last chunk lands.
        Batches are padded to the bucket's standard batch size, so no new
        jit shapes are compiled beyond the normal path's.
        """
        from stutter_tpu.audio.wavio import load_audio

        sr = self.batcher.target_sr
        top_samples = self.batcher.bucket_samples(self.batcher.buckets_s[-1])
        can_pipeline = (hasattr(self.extractor, "submit")
                        and hasattr(self.extractor, "collect"))

        # per-file accumulators: weighted embedding sums + weight mass
        acc: dict[int, dict] = {}
        # pending per-bucket buffers: bucket_s -> (slices, lengths, rowids)
        pend: dict[float, list] = {}
        inflight: list = []  # [(bucket_s, slot_meta, handle), ...]

        def finalize(row_idx: int) -> None:
            a = acc.pop(row_idx)
            if a["wsum"] <= 0:
                logger.error("skipping %s (no usable chunks)", a["path"])
                return
            meta_row = todo.iloc[row_idx]
            entry = {
                "filename": meta_row["filename"], "path": meta_row["path"],
                "split": split, "chunks": a["n_chunks"],
                "_audio_s": a["audio_s"],
            }
            if "label" in meta_row and not pd.isna(meta_row["label"]):
                entry["label"] = meta_row["label"]
            for col, v in a["sums"].items():
                entry[col] = np.asarray(v / a["wsum"], np.float32)
            logger.info("chunked %s: %d chunks (%.1f s)",
                        meta_row["filename"], a["n_chunks"], a["audio_s"])
            on_file_done(entry)

        def drain_one() -> None:
            bucket_s, slot_meta, handle = inflight.pop(0)
            embeddings = (self.extractor.collect(handle)
                          if can_pipeline else handle)
            for slot, (row_idx, w) in enumerate(slot_meta):
                if row_idx is None:
                    continue
                a = acc[row_idx]
                if w > 0:
                    for col, arr in embeddings.items():
                        a["sums"][col] = a["sums"].get(col, 0.0) + (
                            np.asarray(arr[slot], np.float64) * w)
                    a["wsum"] += w
                a["remaining"] -= 1
                if a["remaining"] == 0:
                    finalize(row_idx)

        def submit_bucket(bucket_s: float) -> None:
            slices, lengths, rowids = pend.pop(bucket_s)
            bsz = self.batcher.batch_size_for(bucket_s)
            max_samples = self.batcher.bucket_samples(bucket_s)
            waves = np.zeros((bsz, max_samples), np.float32)
            lens = np.zeros((bsz,), np.int64)
            ok = np.zeros((bsz,), bool)
            slot_meta: list[tuple[int | None, float]] = []
            for s, (seg, n, row_idx) in enumerate(zip(slices, lengths, rowids)):
                # frame-aligned bucket_samples can sit up to stride-1 samples
                # under the nominal bucket seconds — trim like decode_batch's
                # max_samples does on the normal path (<=0.02 s of tail)
                n = min(n, max_samples)
                waves[s, :n] = seg[:n]
                lens[s] = n
                ok[s] = True
                w = max(0, self.extractor.frame_count(int(n)))
                slot_meta.append((row_idx, float(w)))
            slot_meta += [(None, 0.0)] * (bsz - len(slices))
            batch = Batch(
                paths=[todo.iloc[r]["path"] for r in rowids],
                rows=list(rowids), waves=waves, lengths=lens, ok=ok,
                bucket_s=bucket_s, sample_rate=sr,
            )
            handle = (self.extractor.submit(batch)
                      if can_pipeline else self.extractor(batch))
            inflight.append((bucket_s, slot_meta, handle))
            # 1-deep: drain the previous batch after dispatching this one
            while len(inflight) > 1:
                drain_one()

        def push(bucket_s: float, seg: np.ndarray, row_idx: int) -> None:
            buf = pend.setdefault(bucket_s, ([], [], []))
            buf[0].append(seg)
            buf[1].append(len(seg))
            buf[2].append(row_idx)
            if len(buf[0]) >= self.batcher.batch_size_for(bucket_s):
                submit_bucket(bucket_s)

        # Bounded-lookahead threaded decode, matching the normal path's
        # prefetch design (the loop used to call load_audio inline). On
        # THIS dev host it measures neutral — the real chunk path is
        # host->device TRANSFER-bound through the tunnel relay, not decode-
        # bound (artifacts/chunk_real_path_r5.json: inline 1058 vs threaded
        # 1028 audio-s/s on 400x30 s WAVs; ~384 MB of int16 waveforms over
        # a ~30-60 MB/s relay is most of the wall). Kept because on real
        # hosts with compressed corpora (mp3/flac via ffdecode) decode is
        # the expensive host stage and the C++ decoder releases the GIL, so
        # lookahead overlaps it with device waits — that benefit is a
        # design expectation, not yet measured. Lookahead is bounded so at
        # most ~5 long files' waveforms are resident at once.
        import itertools
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        decode_pool = ThreadPoolExecutor(max_workers=2)
        row_iter = iter(long_rows)
        futs: deque = deque()

        def _schedule(row_idx: int) -> None:
            futs.append((row_idx, decode_pool.submit(
                load_audio, todo.iloc[row_idx]["path"], target_sr=sr)))

        try:
            for row_idx in itertools.islice(row_iter, 4):
                _schedule(row_idx)
            while futs:
                row_idx, fut = futs.popleft()
                nxt = next(row_iter, None)
                if nxt is not None:
                    _schedule(nxt)
                path = todo.iloc[row_idx]["path"]
                try:
                    wave = fut.result()
                except Exception:  # noqa: BLE001 — match load_audio's None contract
                    wave = None
                if wave is None:
                    logger.error("skipping %s (decode failed)", path)
                    continue
                n_chunks = max(1, -(-len(wave) // top_samples))
                acc[row_idx] = {"path": path, "sums": {}, "wsum": 0.0,
                                "remaining": n_chunks, "n_chunks": n_chunks,
                                "audio_s": float(len(wave)) / sr}
                for c in range(n_chunks):
                    seg = wave[c * top_samples:(c + 1) * top_samples]
                    # pick the tail bucket by SAMPLE coverage, not nominal
                    # seconds: frame-aligned bucket_samples sit up to
                    # stride-1 samples under bucket_s*sr, and choosing by
                    # seconds could trim the tail by that sliver vs the
                    # single-file combiner
                    bucket = next(
                        (b for b in self.batcher.buckets_s
                         if len(seg) <= self.batcher.bucket_samples(b)),
                        self.batcher.buckets_s[-1])
                    push(bucket, seg, row_idx)
        finally:
            # a mid-loop failure (remote compile 500, tunnel drop) must not
            # leak the pool: non-daemon workers would otherwise keep
            # decoding and block interpreter exit on a stalled read
            decode_pool.shutdown(wait=False, cancel_futures=True)

        for bucket_s in list(pend):
            submit_bucket(bucket_s)
        while inflight:
            drain_one()

    def run(
        self,
        metadata: pd.DataFrame,
        output_dir: str,
        splits: Sequence[str] = ("train", "test", "devel"),
        resume: bool = False,
    ) -> dict[str, pd.DataFrame]:
        return {s: self.run_split(metadata, s, output_dir, resume=resume) for s in splits}
