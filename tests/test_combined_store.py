"""Combined (wavlm+whisper fusion) store — implemented beyond the reference."""

import os

import numpy as np
import pandas as pd


def _write_store(root, model, layer_names, dim, rows_by_split, drop=None):
    from stutter_tpu.extract.store import save_embeddings

    for split, names in rows_by_split.items():
        names = [n for n in names if (model, split, n) != drop]
        df = pd.DataFrame({
            "filename": names,
            "path": [f"/x/{n}.wav" for n in names],
            "split": split,
            "label": ["a" if i % 2 else "b" for i in range(len(names))],
        })
        rng = np.random.RandomState(hash((model, split)) % 2**31)
        for ln in layer_names:
            df[ln] = [rng.randn(dim).astype(np.float32) for _ in names]
        save_embeddings(df, os.path.join(root, model), split)


def test_load_embeddings_combined(tmp_path):
    from stutter_tpu.extract.store import load_embeddings_combined

    root = str(tmp_path)
    rows = {
        "train": [f"train_{i:03d}" for i in range(6)],
        "test": [f"test_{i:03d}" for i in range(3)],
        "devel": [f"devel_{i:03d}" for i in range(3)],
    }
    _write_store(root, "wavlm", ["layer_11", "layer_12"], 8, rows)
    # whisper store missing one devel row -> that row must be dropped
    _write_store(root, "whisper", ["encoder_layer_32", "decoder_layer_32"], 4,
                 rows, drop=("whisper", "devel", "devel_002"))

    meta, layers = load_embeddings_combined(root)
    assert meta is not None
    assert len(meta) == 11  # 12 - 1 unmatched
    assert set(layers) == {
        "wavlm_layer_11", "wavlm_layer_12",
        "whisper_encoder_layer_32", "whisper_decoder_layer_32",
        "combined_top",
    }
    assert layers["combined_top"].shape == (11, 12)  # 8 + 4
    # fusion feature is the concat of wavlm layer_12 and whisper encoder_layer_32
    np.testing.assert_array_equal(
        layers["combined_top"],
        np.hstack([layers["wavlm_layer_12"], layers["whisper_encoder_layer_32"]]),
    )
    # row alignment: every row's parts came from the same filename
    for arr in layers.values():
        assert len(arr) == len(meta)
