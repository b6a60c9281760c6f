#!/usr/bin/env bash
# Full test suite in shards (single-core host: each shard has its own budget).
# A completeness guard below fails the run if any tests/test_*.py is not
# named in a shard — add new test files to a shard explicitly.
set -e
cd "$(dirname "$0")/.."
P="python -m pytest -q"

SHARD1="tests/test_frontend.py tests/test_resample.py tests/test_audio.py \
   tests/test_audio_formats.py tests/test_audio_robustness.py \
   tests/test_pallas_kernels.py tests/test_stem_pallas.py \
   tests/test_whisper_v3_mel.py"
SHARD2="tests/test_wavlm_fidelity.py tests/test_whisper_fidelity.py \
   tests/test_full_scale_fidelity.py tests/test_whisper_full_scale_fidelity.py \
   tests/test_quant.py tests/test_attention_vjp.py"
SHARD3="tests/test_extract_pipeline.py tests/test_whisper_pipeline.py \
   tests/test_mesh.py tests/test_graft_entry.py tests/test_aux.py \
   tests/test_split_modes.py tests/test_combined_store.py \
   tests/test_edge_cases.py tests/test_chunked_extraction.py \
   tests/test_warmup.py"
SHARD4="tests/test_train_components.py tests/test_trainer.py \
   tests/test_grad_accum.py tests/test_distributed.py"
SHARD5="tests/test_cli.py tests/test_predict_cli.py tests/test_serve.py \
   tests/test_serve_classify.py tests/test_serve_combined.py \
   tests/test_serve_http.py"

# Completeness guard: every tests/test_*.py must appear in exactly one shard.
ALL_NAMED=$(echo "$SHARD1 $SHARD2 $SHARD3 $SHARD4 $SHARD5" | tr ' ' '\n' | grep -v '^$' | sort)
ALL_FILES=$(ls tests/test_*.py | sort)
if [ "$ALL_NAMED" != "$ALL_FILES" ]; then
  echo "run_tests.sh: shard list out of sync with tests/ directory:" >&2
  diff <(echo "$ALL_NAMED") <(echo "$ALL_FILES") >&2 || true
  exit 1
fi

$P $SHARD1
$P $SHARD2
$P $SHARD3
$P $SHARD4
$P $SHARD5
echo "ALL SHARDS GREEN"
