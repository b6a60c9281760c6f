"""Combined (WavLM + Whisper) serving extractor: the fusion store, live.

Training supports ``--model_type combined`` through the fusion store
(``extract/store.py:load_embeddings_combined`` — the reference accepts the
flag but implements nothing, ``model_training_01.py:49-51`` vs ``:737-753``).
This extractor gives those classifiers a serving path: one request's audio
runs through BOTH backbones, columns come back under the store's exact
naming (``wavlm_layer_24``, ``whisper_encoder_layer_32``, ... plus the
``combined_top`` hstack), so a ``combined_top``-trained artifact classifies
live audio through the ordinary ``EmbeddingServer`` + ``ServingClassifier``
machinery.

Both device programs are dispatched back to back (JAX async dispatch) before
either is collected, so the two backbones' compute overlaps on device.
"""

from __future__ import annotations

import numpy as np

from stutter_tpu.extract.store import combined_top_key


class CombinedExtractor:
    """Duck-typed extractor (submit/collect/column_names) over two parts.

    Buckets: whisper zero-pads every clip to 30 s on device, so serving uses
    whisper's single 30 s bucket; WavLM's masked statistics/pooling make its
    embeddings padding-invariant (tests/test_wavlm_fidelity.py), so the same
    padded batch is correct for both parts.
    """

    preferred_buckets = (30.0,)

    def __init__(self, wavlm_extractor, whisper_extractor):
        self.parts = (("wavlm", wavlm_extractor), ("whisper", whisper_extractor))
        self.column_names = [
            f"{name}_{col}" for name, part in self.parts for col in part.column_names
        ] + ["combined_top"]
        # chunked long-clip combination weights by TRUE audio content: use
        # the wavlm frame count (whisper's is capped at 1500 padded positions)
        self.frame_count = wavlm_extractor.frame_count
        # no frame_align: the 30 s bucket must stay exactly 480 000 samples
        # (whisper pads internally; wavlm needs no alignment for correctness)
        self._top_cols = tuple(
            f"{name}_{combined_top_key(part.column_names)}" for name, part in self.parts
        )

    def warmup(self, batcher) -> int:
        """AOT-compile both parts' bucket programs (see extract/pipeline.py)."""
        return sum(part.warmup(batcher) for _, part in self.parts)

    def submit(self, batch):
        # dispatch both programs before collecting either: device queues run
        # wavlm's batch while whisper's host-side dispatch happens
        return tuple(part.submit(batch) for _, part in self.parts)

    def collect(self, handles) -> dict[str, np.ndarray]:
        out: dict[str, np.ndarray] = {}
        for (name, part), handle in zip(self.parts, handles):
            for col, arr in part.collect(handle).items():
                out[f"{name}_{col}"] = arr
        out["combined_top"] = np.hstack([out[c] for c in self._top_cols])
        return out

    def __call__(self, batch) -> dict[str, np.ndarray]:
        return self.collect(self.submit(batch))
