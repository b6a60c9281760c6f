from stutter_tpu.models.wavlm import (
    WavLMConfig,
    wavlm_forward,
    wavlm_encode,
    wavlm_feature_lengths,
    init_wavlm_params,
)
from stutter_tpu.models.whisper import (
    WhisperConfig,
    whisper_encoder_forward,
    whisper_decoder_step,
    init_whisper_params,
)
