"""Log-mel spectrogram / MFCC front-end, numerically matching torchaudio.

The reference computes features on the host with torchaudio's C++ kernels
(reference: src/datasets/preprocessing.py:988-998, src/utils/audio.py:60-84).
Here the whole front-end is a pure-JAX function that runs on device under
jit/vmap/pjit, with the exact torchaudio semantics:

- ``torch.hann_window(win_length, periodic=True)``, window center-padded to
  ``n_fft`` (torch.stft behavior),
- ``center=True`` reflect padding by ``n_fft // 2`` on both sides,
- ``power=2`` one-sided spectrogram,
- HTK mel scale filterbank with triangles on the Hz axis, corner points at
  ``linspace(0, sample_rate // 2, n_freqs)`` (torchaudio
  ``melscale_fbanks(norm=None, mel_scale="htk")``),
- ``AmplitudeToDB(stype="power", top_db=80)`` with the per-clip max clamp.

A fused Pallas kernel covering frame→window→DFT→power→mel→dB lives in
``dlsc_tpu.ops.mel_pallas``; this module is both the reference implementation
its golden tests check against and the pure-XLA fallback path.

Constants mirror the reference AST front-end: n_fft=1024, hop=160,
win_length=400, n_mels=128 (reference: src/datasets/preprocessing.py:56-58).
"""

from __future__ import annotations

import dataclasses
import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

AST_N_FFT = 1024
AST_HOP_LENGTH = 160
AST_WIN_LENGTH = 400
TARGET_SR = 44_100
EPSILON = 1e-9  # reference: src/utils/audio.py:22-23
_AMIN = 1e-10   # torchaudio AmplitudeToDB amin


@dataclasses.dataclass(frozen=True)
class MelConfig:
    """Static front-end configuration (hashable → usable as a jit static arg)."""

    sample_rate: int = TARGET_SR
    n_fft: int = AST_N_FFT
    hop_length: int = AST_HOP_LENGTH
    win_length: int = AST_WIN_LENGTH
    n_mels: int = 128
    f_min: float = 0.0
    f_max: float | None = None  # defaults to sample_rate / 2
    power: float = 2.0
    top_db: float | None = 80.0
    mel_scale: str = "htk"      # torchaudio MelSpectrogram default
    mel_norm: str | None = None

    @property
    def n_freqs(self) -> int:
        return self.n_fft // 2 + 1

    def num_frames(self, num_samples: int) -> int:
        # center=True: padded length = T + 2*(n_fft//2); frames = 1 + T//hop
        return 1 + num_samples // self.hop_length


def hann_window_np(win_length: int, n_fft: int | None = None) -> np.ndarray:
    """Periodic Hann window (float64 numpy), center-padded to ``n_fft``."""
    n = np.arange(win_length)
    w = 0.5 * (1.0 - np.cos(2.0 * np.pi * n / win_length))
    if n_fft is not None and n_fft != win_length:
        left = (n_fft - win_length) // 2
        w = np.pad(w, (left, n_fft - win_length - left))
    return w


def hann_window(win_length: int, n_fft: int | None = None, dtype=jnp.float32) -> jax.Array:
    """Periodic Hann window, optionally center-padded to ``n_fft``."""
    return jnp.asarray(hann_window_np(win_length, n_fft), dtype=dtype)


def _hz_to_mel(f: np.ndarray | float, mel_scale: str) -> np.ndarray:
    if mel_scale == "htk":
        return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)
    # slaney
    f = np.asarray(f, dtype=np.float64)
    f_sp = 200.0 / 3
    mels = f / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = math.log(6.4) / 27.0
    return np.where(f >= min_log_hz, min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep, mels)


def _mel_to_hz(m: np.ndarray, mel_scale: str) -> np.ndarray:
    if mel_scale == "htk":
        return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)
    f_sp = 200.0 / 3
    freqs = np.asarray(m, dtype=np.float64) * f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = math.log(6.4) / 27.0
    return np.where(m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)


@functools.lru_cache(maxsize=16)
def _mel_filterbank_np(
    n_freqs: int, f_min: float, f_max: float, n_mels: int,
    sample_rate: int, mel_scale: str, norm: str | None,
) -> np.ndarray:
    """Filterbank matrix (n_freqs, n_mels); torchaudio melscale_fbanks algorithm."""
    # torchaudio uses `sample_rate // 2` (integer) for the frequency axis top.
    all_freqs = np.linspace(0, sample_rate // 2, n_freqs)
    m_min = _hz_to_mel(f_min, mel_scale)
    m_max = _hz_to_mel(f_max, mel_scale)
    m_pts = np.linspace(m_min, m_max, n_mels + 2)
    f_pts = _mel_to_hz(m_pts, mel_scale)
    # triangles on the Hz axis
    f_diff = f_pts[1:] - f_pts[:-1]                      # (n_mels + 1,)
    slopes = f_pts[None, :] - all_freqs[:, None]         # (n_freqs, n_mels + 2)
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    if norm == "slaney":
        enorm = 2.0 / (f_pts[2: n_mels + 2] - f_pts[:n_mels])
        fb = fb * enorm[None, :]
    return fb.astype(np.float32)


def mel_filterbank(cfg: MelConfig, dtype=jnp.float32) -> jax.Array:
    f_max = cfg.f_max if cfg.f_max is not None else cfg.sample_rate / 2.0
    fb = _mel_filterbank_np(
        cfg.n_freqs, cfg.f_min, float(f_max), cfg.n_mels,
        cfg.sample_rate, cfg.mel_scale, cfg.mel_norm,
    )
    return jnp.asarray(fb, dtype=dtype)


def frame_signal(wave: jax.Array, cfg: MelConfig) -> jax.Array:
    """Center-pad (reflect) and slice into overlapping frames.

    wave: (..., T) → frames: (..., n_frames, n_fft)
    """
    pad = cfg.n_fft // 2
    padded = jnp.pad(
        wave, [(0, 0)] * (wave.ndim - 1) + [(pad, pad)], mode="reflect"
    )
    n_frames = cfg.num_frames(wave.shape[-1])
    starts = jnp.arange(n_frames) * cfg.hop_length
    idx = starts[:, None] + jnp.arange(cfg.n_fft)[None, :]
    return padded[..., idx]


def power_spectrogram(wave: jax.Array, cfg: MelConfig) -> jax.Array:
    """One-sided power spectrogram, (..., n_freqs, n_frames)."""
    frames = frame_signal(wave.astype(jnp.float32), cfg)
    window = hann_window(cfg.win_length, cfg.n_fft)
    spec = jnp.fft.rfft(frames * window, n=cfg.n_fft, axis=-1)
    p = jnp.abs(spec) ** cfg.power if cfg.power != 2.0 else spec.real**2 + spec.imag**2
    return jnp.swapaxes(p, -1, -2)


def amplitude_to_db(
    x: jax.Array, *, stype: str = "power", top_db: float | None = 80.0
) -> jax.Array:
    """torchaudio ``AmplitudeToDB``: 10·log10(clamp(x, 1e-10)) with per-clip
    top_db clamp (max over the last two dims, matching per-channel behavior).
    """
    multiplier = 10.0 if stype == "power" else 20.0
    x_db = multiplier * jnp.log10(jnp.maximum(x, _AMIN))
    if top_db is not None:
        ref = jnp.max(x_db, axis=(-2, -1), keepdims=True)
        x_db = jnp.maximum(x_db, ref - top_db)
    return x_db


def mel_spectrogram(wave: jax.Array, cfg: MelConfig) -> jax.Array:
    """Mel power spectrogram (..., n_mels, n_frames)."""
    p = power_spectrogram(wave, cfg)  # (..., n_freqs, n_frames)
    fb = mel_filterbank(cfg)
    # HIGHEST precision: TPU einsum defaults to bf16 passes, which would
    # break the 1e-3-vs-torchaudio feature-parity target on device.
    return jnp.einsum("...ft,fm->...mt", p, fb, precision=jax.lax.Precision.HIGHEST)


def log_mel_spectrogram(wave: jax.Array, cfg: MelConfig = MelConfig()) -> jax.Array:
    """Log-mel (dB) features matching the reference AST preprocessor
    (reference: src/datasets/preprocessing.py:988-1005)."""
    return amplitude_to_db(mel_spectrogram(wave, cfg), stype="power", top_db=cfg.top_db)


def ast_normalize(
    log_mel: jax.Array, target_mean: float = 0.0, target_std: float = 0.5
) -> jax.Array:
    """Per-clip renormalization to mean 0 / std 0.5 (AST paper convention;
    reference: src/datasets/preprocessing.py:1060-1070). Uses the unbiased
    (ddof=1) std to match ``torch.Tensor.std``. Stats are per clip: reduced
    over all but the leading batch dims when input is (..., n_mels, T).
    """
    axes = tuple(range(log_mel.ndim - 2, log_mel.ndim))
    mean = jnp.mean(log_mel, axis=axes, keepdims=True)
    n = log_mel.shape[-1] * log_mel.shape[-2]
    var = jnp.sum((log_mel - mean) ** 2, axis=axes, keepdims=True) / max(n - 1, 1)
    std = jnp.sqrt(var)
    normed = (log_mel - mean) / jnp.where(std > 0, std, 1.0)
    out = normed * target_std + target_mean
    return jnp.where(std > 0, out, log_mel)


@functools.lru_cache(maxsize=8)
def _dct_matrix_np(n_mfcc: int, n_mels: int, norm: str | None) -> np.ndarray:
    """torchaudio ``create_dct``: DCT-II basis, (n_mels, n_mfcc)."""
    n = np.arange(n_mels, dtype=np.float64)
    k = np.arange(n_mfcc, dtype=np.float64)[:, None]
    dct = np.cos(np.pi / n_mels * (n + 0.5) * k)  # (n_mfcc, n_mels)
    if norm is None:
        dct *= 2.0
    else:
        dct[0] *= 1.0 / math.sqrt(2.0)
        dct *= math.sqrt(2.0 / n_mels)
    return dct.T.astype(np.float32)


def mfcc(
    wave: jax.Array,
    cfg: MelConfig = MelConfig(),
    n_mfcc: int = 40,
    norm: str | None = "ortho",
    log_mels: bool = False,
) -> jax.Array:
    """MFCCs matching ``torchaudio.transforms.MFCC`` (dB mels by default,
    top_db=None, DCT-II ortho). Output (..., n_mfcc, n_frames)."""
    mel = mel_spectrogram(wave, cfg)
    if log_mels:
        feats = jnp.log(mel + 1e-6)
    else:
        feats = amplitude_to_db(mel, stype="power", top_db=None)
    dct = jnp.asarray(_dct_matrix_np(n_mfcc, cfg.n_mels, norm))
    return jnp.einsum("...mt,mk->...kt", feats, dct, precision=jax.lax.Precision.HIGHEST)
