#!/usr/bin/env bash
# Full test suite in shards (single-core host: each shard has its own budget).
set -e
cd "$(dirname "$0")/.."
P="python -m pytest -q"
$P tests/test_frontend.py tests/test_resample.py tests/test_audio.py \
   tests/test_pallas_kernels.py tests/test_whisper_v3_mel.py \
   tests/test_wavlm_fidelity.py tests/test_whisper_fidelity.py \
   tests/test_full_scale_fidelity.py
$P tests/test_extract_pipeline.py tests/test_whisper_pipeline.py \
   tests/test_mesh.py tests/test_graft_entry.py tests/test_aux.py \
   tests/test_split_modes.py tests/test_combined_store.py \
   tests/test_edge_cases.py tests/test_chunked_extraction.py
$P tests/test_train_components.py tests/test_trainer.py tests/test_cli.py
echo "ALL SHARDS GREEN"
