from stutter_tpu.weights.convert import (
    convert_wavlm_state_dict,
    convert_whisper_state_dict,
    load_wavlm,
    load_whisper,
    wavlm_config_from_hf,
    whisper_config_from_hf,
)
