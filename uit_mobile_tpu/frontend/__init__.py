from .mel import (
    FrontendConfig,
    hann_window_periodic,
    padded_window,
    mel_filterbank,
    spectrogram,
    log_mel_spectrogram,
    amplitude_to_db,
)

__all__ = [
    "FrontendConfig",
    "hann_window_periodic",
    "padded_window",
    "mel_filterbank",
    "spectrogram",
    "log_mel_spectrogram",
    "amplitude_to_db",
]
