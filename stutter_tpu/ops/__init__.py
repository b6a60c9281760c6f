from stutter_tpu.ops.mel import mel_filter_bank, hertz_to_mel, mel_to_hertz
from stutter_tpu.ops.logmel import (
    log_mel_spectrogram,
    whisper_log_mel,
    WHISPER_N_FFT,
    WHISPER_HOP,
    WHISPER_N_MELS,
    WHISPER_N_SAMPLES,
)
from stutter_tpu.ops.resample import resample, resample_kernel_weights
from stutter_tpu.ops.pooling import masked_mean_pool
