"""CPU golden reference for the mel front-end: torchaudio's exact algorithm
implemented with core torch ops (torchaudio itself is not installed).

This mirrors torchaudio.transforms.MelSpectrogram / AmplitudeToDB / MFCC
semantics as used by the reference stack
(reference: src/datasets/preprocessing.py:988-1005, src/utils/audio.py:60-84):
torch.stft(center=True, pad_mode='reflect', onesided=True) with a periodic
Hann window, power=2, melscale_fbanks(norm=None, mel_scale='htk'),
AmplitudeToDB('power', top_db) with per-tensor max clamp, create_dct ortho.
"""

import math

import numpy as np
import torch


def hz_to_mel_htk(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def mel_to_hz_htk(m):
    return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)


def melscale_fbanks(n_freqs, f_min, f_max, n_mels, sample_rate):
    all_freqs = np.linspace(0, sample_rate // 2, n_freqs)
    m_pts = np.linspace(hz_to_mel_htk(f_min), hz_to_mel_htk(f_max), n_mels + 2)
    f_pts = mel_to_hz_htk(m_pts)
    f_diff = f_pts[1:] - f_pts[:-1]
    slopes = f_pts[None, :] - all_freqs[:, None]
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    return torch.tensor(fb, dtype=torch.float32)


def mel_spectrogram_torch(wave, sample_rate=44100, n_fft=1024, hop_length=160,
                          win_length=400, n_mels=128, power=2.0):
    """wave: (T,) or (1, T) float32 tensor -> (n_mels, frames)."""
    wave = torch.as_tensor(wave, dtype=torch.float32).reshape(-1)
    window = torch.hann_window(win_length, periodic=True)
    spec = torch.stft(
        wave, n_fft=n_fft, hop_length=hop_length, win_length=win_length,
        window=window, center=True, pad_mode="reflect", normalized=False,
        onesided=True, return_complex=True,
    )
    p = spec.abs() ** power
    fb = melscale_fbanks(n_fft // 2 + 1, 0.0, sample_rate / 2.0, n_mels, sample_rate)
    return (p.transpose(0, 1) @ fb).transpose(0, 1)  # (n_mels, frames)


def amplitude_to_db_torch(x, top_db=80.0, stype="power"):
    mult = 10.0 if stype == "power" else 20.0
    x_db = mult * torch.log10(torch.clamp(x, min=1e-10))
    if top_db is not None:
        x_db = torch.clamp(x_db, min=x_db.max().item() - top_db)
    return x_db


def create_dct(n_mfcc, n_mels, norm="ortho"):
    n = torch.arange(float(n_mels))
    k = torch.arange(float(n_mfcc)).unsqueeze(1)
    dct = torch.cos(math.pi / float(n_mels) * (n + 0.5) * k)
    if norm is None:
        dct *= 2.0
    else:
        dct[0] *= 1.0 / math.sqrt(2.0)
        dct *= math.sqrt(2.0 / float(n_mels))
    return dct.t()


def mfcc_torch(wave, sample_rate=44100, n_fft=1024, hop_length=160,
               win_length=400, n_mels=128, n_mfcc=40):
    mel = mel_spectrogram_torch(wave, sample_rate, n_fft, hop_length, win_length, n_mels)
    db = amplitude_to_db_torch(mel, top_db=None)
    return (db.transpose(0, 1) @ create_dct(n_mfcc, n_mels)).transpose(0, 1)


def ast_preprocess_torch(wave, sample_rate=44100, n_mels=128,
                         target_mean=0.0, target_std=0.5):
    """Full reference AST preprocessing: mel → dB(top_db=80) → renorm
    (reference: src/datasets/preprocessing.py:1040-1070)."""
    log_mel = amplitude_to_db_torch(
        mel_spectrogram_torch(wave, sample_rate, n_mels=n_mels), top_db=80.0
    )
    mean, std = log_mel.mean(), log_mel.std()  # unbiased std (torch default)
    if std > 0:
        log_mel = (log_mel - mean) / std * target_std + target_mean
    return log_mel
