from .mel import (
    FrontendConfig,
    hann_window_periodic,
    padded_window,
    mel_filterbank,
    spectrogram,
    log_mel_spectrogram,
    amplitude_to_db,
    quantize_pcm16,
    normalize_pcm16,
)

__all__ = [
    "FrontendConfig",
    "hann_window_periodic",
    "padded_window",
    "mel_filterbank",
    "spectrogram",
    "log_mel_spectrogram",
    "amplitude_to_db",
    "quantize_pcm16",
    "normalize_pcm16",
]
