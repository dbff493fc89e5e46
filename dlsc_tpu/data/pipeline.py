"""Device-side preprocessing pipelines, one per ``preprocessing_mode``.

The reference runs these per item in DataLoader workers
(reference: src/datasets/esc50.py:198-289); here each mode is a pure,
batch-level JAX function meant to be called *inside* the jitted train/eval
step, so raw waveforms are the only host→device traffic and the mel
front-end runs on the MXU (dlsc_tpu.ops.mel_pallas).

Modes (reference: src/datasets/preprocessing.py:1315-1344):

- ``envnet_v2``: zero-pad T/2 each side → random crop (train) / center crop
  (eval) / 10 evenly spaced crops (multi-crop test) → optional time-stretch
  + gain-shift → optional BC mixing.
- ``ast``: log-mel (1024/160/400, 128 mels) → AmplitudeToDB(80) → per-clip
  renorm to (0, 0.5) → SpecAugment (train) → Mixup (train).
- ``cnn_esc50``: log-mel (1024/512/1024) → dB → bilinear resize 224×224 →
  Normalize(0, 0.5) → random flips + translate (train). Made shape-coherent
  (1-channel) vs the reference's broken 3-channel path.
- ``raw``: pass-through waveform.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from dlsc_tpu.ops import augment as A
from dlsc_tpu.ops import mel as M


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    mode: str = "ast"
    num_classes: int = 50
    sample_rate: int = 44_100
    # envnet (reference: preprocessing.py:795-817)
    window_length: float = 5.0
    padding_ratio: float = 0.5
    multi_crop_test: bool = False
    test_crops: int = 10
    time_stretch: tuple[float, float] | None = None
    gain_shift: tuple[float, float] | None = None
    enable_bc_mixing: bool = False
    # ast (reference: preprocessing.py:971-1005)
    n_mels: int = 128
    normalize: bool = True
    target_mean: float = 0.0
    target_std: float = 0.5
    time_mask: int = 192
    freq_mask: int = 48
    enable_mixup: bool = False
    mixup_alpha: float = 0.5
    # implementation switches
    use_pallas: bool = True

    @property
    def window_samples(self) -> int:
        return int(self.window_length * self.sample_rate)

    @property
    def padding_samples(self) -> int:
        return int(self.window_samples * self.padding_ratio)

    def mel_config(self) -> M.MelConfig:
        return M.MelConfig(sample_rate=self.sample_rate, n_mels=self.n_mels)

    def cnn_mel_config(self) -> M.MelConfig:
        # reference: preprocessing.py:1463-1470 (n_fft=1024, hop=512, win=1024)
        return M.MelConfig(
            sample_rate=self.sample_rate, n_fft=1024, hop_length=512,
            win_length=1024, n_mels=self.n_mels,
        )


class DevicePipeline:
    """Batch-level (waveform, labels) → (model inputs, soft labels)."""

    def __init__(self, cfg: PipelineConfig):
        self.cfg = cfg

    @staticmethod
    def _to_float(wave: jax.Array) -> jax.Array:
        """PCM16 wire format → float on device (shards default to int16)."""
        if jnp.issubdtype(wave.dtype, jnp.integer):
            return wave.astype(jnp.float32) / 32768.0
        return wave

    # -- feature helpers ---------------------------------------------------
    def _log_mel(self, wave: jax.Array, mel_cfg: M.MelConfig) -> jax.Array:
        if self.cfg.use_pallas and jax.default_backend() == "tpu":
            from dlsc_tpu.ops.mel_pallas import log_mel_pallas

            return log_mel_pallas(wave, mel_cfg)
        return M.log_mel_spectrogram(wave, mel_cfg)

    def _ast_features(self, wave: jax.Array) -> jax.Array:
        feats = self._log_mel(wave, self.cfg.mel_config())
        if self.cfg.normalize:
            feats = M.ast_normalize(feats, self.cfg.target_mean, self.cfg.target_std)
        return feats

    def _cnn_features(self, wave: jax.Array) -> jax.Array:
        db = self._log_mel(wave, self.cfg.cnn_mel_config())
        B = db.shape[0]
        img = jax.image.resize(db, (B, 224, 224), method="bilinear")
        return img / 0.5  # Normalize(mean=0, std=0.5)

    # -- train path ----------------------------------------------------------
    def train_batch(
        self, wave: jax.Array, labels: jax.Array, key: jax.Array,
        *, mixup_alpha: jax.Array | float | None = None,
    ) -> tuple[jax.Array, jax.Array]:
        """``mixup_alpha`` overrides ``cfg.mixup_alpha`` for this call; it may
        be a traced scalar (vmapped per-trial HPO, hpo/vmapped.py) and then
        must be > 0. Only meaningful when ``cfg.enable_mixup``."""
        cfg = self.cfg
        if mixup_alpha is not None and not cfg.enable_mixup:
            raise ValueError(
                "mixup_alpha override given but enable_mixup=False on this "
                "pipeline — enable dataset.enable_mixup to search mixup_alpha")
        wave = self._to_float(wave)
        y = A.one_hot(labels, cfg.num_classes)
        if cfg.mode == "envnet_v2":
            k_crop, k_ts, k_gs, k_bc = jax.random.split(key, 4)
            p = cfg.padding_samples
            x = jnp.pad(wave, ((0, 0), (p, p)))
            x = A.random_crop(x, k_crop, cfg.window_samples)
            if cfg.time_stretch is not None:
                x = A.time_stretch(x, k_ts, *cfg.time_stretch)
            if cfg.gain_shift is not None:
                x = A.gain_shift(x, k_gs, *cfg.gain_shift)
            if cfg.enable_bc_mixing:
                x, y = A.bc_mix(x, y, k_bc)
            return x, y
        if cfg.mode == "ast":
            k_sa, k_mix = jax.random.split(key)
            x = self._ast_features(wave)
            x = A.spec_augment(x, k_sa, cfg.time_mask, cfg.freq_mask)
            if cfg.enable_mixup:
                alpha = cfg.mixup_alpha if mixup_alpha is None else mixup_alpha
                x, y = A.mixup(x, y, k_mix, alpha)
            return x, y
        if cfg.mode == "cnn_esc50":
            x = self._cnn_features(wave)
            x = A.image_flip_translate(x, key, translate=0.1)
            return x, y
        if cfg.mode == "raw":
            return wave, y
        raise ValueError(f"Unknown preprocessing_mode: {cfg.mode}")

    # -- eval path ------------------------------------------------------------
    def eval_batch(
        self, wave: jax.Array, labels: jax.Array
    ) -> tuple[jax.Array, jax.Array]:
        """No augmentation/mixing (reference: esc50.py:563-592). For
        envnet_v2 multi-crop, returns (B, n_crops, window)."""
        cfg = self.cfg
        wave = self._to_float(wave)
        y = A.one_hot(labels, cfg.num_classes)
        if cfg.mode == "envnet_v2":
            p = cfg.padding_samples
            x = jnp.pad(wave, ((0, 0), (p, p)))
            if cfg.multi_crop_test:
                return A.multi_crop(x, cfg.window_samples, cfg.test_crops), y
            return A.center_crop(x, cfg.window_samples), y
        if cfg.mode == "ast":
            return self._ast_features(wave), y
        if cfg.mode == "cnn_esc50":
            return self._cnn_features(wave), y
        if cfg.mode == "raw":
            return wave, y
        raise ValueError(f"Unknown preprocessing_mode: {cfg.mode}")


def pipeline_from_dataset_config(ds: dict[str, Any]) -> DevicePipeline:
    """Build from the merged dataset+overrides dict the scripts assemble
    (the reference's ``dataset_overrides`` convention, train.py:91-107)."""
    pc = ds.get("preprocessing_config") or {}
    aug = ds.get("augment") or {}
    wave_aug = pc.get("augment") or {}

    def pair(v):
        return tuple(v) if isinstance(v, (list, tuple)) else None

    tm, fm = aug.get("time_mask", False), aug.get("freq_mask", False)
    for name, v in (("time_mask", tm), ("freq_mask", fm)):
        if v is True:  # int(True) == 1 would silently neuter SpecAugment
            raise ValueError(
                f"augment.{name} must be false or a max mask length (int), "
                f"got true — e.g. time_mask: 192, freq_mask: 48"
            )
    cfg = PipelineConfig(
        mode=ds.get("preprocessing_mode", "raw"),
        num_classes=int(ds.get("num_classes", 50)),
        sample_rate=int(pc.get("sample_rate", ds.get("sample_rate", 44_100))),
        window_length=float(pc.get("window_length", 5.0)),
        padding_ratio=float(pc.get("padding_ratio", 0.5)),
        multi_crop_test=bool(pc.get("multi_crop_test", False)),
        test_crops=int(pc.get("test_crops", 10)),
        time_stretch=pair(wave_aug.get("time_stretch")),
        gain_shift=pair(wave_aug.get("gain_shift")),
        enable_bc_mixing=bool(ds.get("enable_bc_mixing", False)),
        n_mels=int(pc.get("n_mels", 128)),
        normalize=bool(pc.get("normalize", True)),
        target_mean=float(pc.get("target_mean", 0.0)),
        target_std=float(pc.get("target_std", 0.5)),
        time_mask=int(tm) if tm else 0,
        freq_mask=int(fm) if fm else 0,
        enable_mixup=bool(ds.get("enable_mixup", False)),
        mixup_alpha=float(ds.get("mixup_alpha", 0.5)),
        use_pallas=bool(pc.get("use_pallas", True)),
    )
    return DevicePipeline(cfg)
