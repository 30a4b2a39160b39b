from .mel import (
    FrontendConfig,
    hann_window_periodic,
    mel_filterbank,
    spectrogram,
    log_mel_spectrogram,
    amplitude_to_db,
)

__all__ = [
    "FrontendConfig",
    "hann_window_periodic",
    "mel_filterbank",
    "spectrogram",
    "log_mel_spectrogram",
    "amplitude_to_db",
]
