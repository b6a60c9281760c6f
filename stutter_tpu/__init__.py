"""stutter_tpu — TPU-native stuttered-speech representation framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
warren-machy/stuttering-speech-representation (reference mounted at
/root/reference): WavLM / Whisper embedding extraction from stuttered-speech
corpora plus the downstream stutter-event classifier stack — redesigned
TPU-first (batched jit-compiled forwards over a device mesh instead of the
reference's per-file batch=1 GPU loops, Pallas/XLA kernels for the audio
frontends, data-parallel sharding via jax.sharding instead of per-process
device flags).

Subpackages
-----------
- ``ops``       device kernels: log-mel frontend, sinc resample, augmentation,
                SMOTE, masked pooling (Pallas on TPU, jnp reference paths)
- ``models``    WavLM (gated relative-position-bias attention) and Whisper
                encoder/decoder in functional JAX; classifier heads
- ``parallel``  device mesh construction + NamedSharding strategies (DP/TP)
- ``audio``     host-side audio runtime: WAV decode (C++ extension with a
                pure-Python fallback), host resampler, synthetic corpora
- ``frontend``  model input frontends (wavlm waveform norm, whisper log-mel)
- ``weights``   HF torch checkpoint -> JAX pytree converters
- ``extract``   corpus scanner, bucketed batcher, extraction pipeline,
                .npy+CSV embedding store, checkpoint/resume
- ``train``     augmentation, SMOTE, classifier training (JAX + sklearn
                parity backends), metrics, fine-tuning
- ``report``    plots, CSV/TXT summaries
- ``cli``       flag-compatible command-line drivers
- ``utils``     config system, logging, registry
"""

__version__ = "0.1.0"
