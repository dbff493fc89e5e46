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
from dlsc_tpu.ops.augment import (
    bc_mix,
    center_crop,
    gain_shift,
    image_flip_translate,
    mixup,
    multi_crop,
    one_hot,
    pad_or_trim,
    random_crop,
    spec_augment,
    time_stretch,
)
from dlsc_tpu.ops.mel_pallas import (
    ast_features_pallas,
    log_mel_pallas,
    mel_power_pallas,
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
    "bc_mix",
    "center_crop",
    "gain_shift",
    "image_flip_translate",
    "mixup",
    "multi_crop",
    "one_hot",
    "pad_or_trim",
    "random_crop",
    "spec_augment",
    "time_stretch",
    "ast_features_pallas",
    "log_mel_pallas",
    "mel_power_pallas",
]
