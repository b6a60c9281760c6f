from stutter_tpu.extract.scanner import create_metadata_from_files
from stutter_tpu.extract.store import save_embeddings, load_embeddings
from stutter_tpu.extract.checkpoint import (
    save_checkpoint,
    load_checkpoint,
    find_latest_checkpoint,
)
from stutter_tpu.extract.batcher import BucketBatcher
from stutter_tpu.extract.pipeline import ExtractionPipeline, WavLMExtractor, WhisperExtractor
