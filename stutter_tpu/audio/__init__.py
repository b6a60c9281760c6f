from stutter_tpu.audio.wavio import load_audio, read_wav, write_wav, decode_batch
from stutter_tpu.audio.synthetic import make_synthetic_corpus
