"""Device-side DSP and augmentation ops (pure JAX + Pallas kernels)."""

from dlsc_tpu.ops.mel import (
    MelConfig,
    amplitude_to_db,
    hann_window,
    log_mel_spectrogram,
    mel_filterbank,
    mfcc,
    power_spectrogram,
    ast_normalize,
)

__all__ = [
    "MelConfig",
    "amplitude_to_db",
    "hann_window",
    "log_mel_spectrogram",
    "mel_filterbank",
    "mfcc",
    "power_spectrogram",
    "ast_normalize",
]
