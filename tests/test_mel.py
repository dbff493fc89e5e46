"""Golden numerical tests: JAX mel front-end vs torch.stft CPU reference.

Target: within 1e-3 relative error of torchaudio semantics (BASELINE.md);
in practice these agree to ~1e-5.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from dlsc_tpu.ops import mel as M
from tests import reference_dsp as R


def rel_err(a, b, significance=1e-3):
    """Max relative error over significant bins + normalized max error.

    The algorithm matches torch in float64 to ~2e-7; residual fp32 roundoff in
    near-zero mel bins is not meaningful, so elementwise relative error is
    measured where ``|b| > significance * max|b|``, and a global
    ``||a-b||_inf / ||b||_inf`` guards the rest.
    """
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    norm = np.max(np.abs(a - b)) / max(np.max(np.abs(b)), 1e-12)
    mask = np.abs(b) > significance * np.max(np.abs(b))
    elem = np.max(np.abs(a - b)[mask] / np.abs(b)[mask]) if mask.any() else 0.0
    return max(norm, elem)


@pytest.fixture(scope="module")
def wave(  ):
    rng = np.random.default_rng(1234)
    return (rng.standard_normal(44100, dtype=np.float32) * 0.5).astype(np.float32)


def test_mel_filterbank_matches(wave):
    cfg = M.MelConfig()
    fb_jax = np.asarray(M.mel_filterbank(cfg))
    fb_ref = R.melscale_fbanks(513, 0.0, 22050.0, 128, 44100).numpy()
    assert rel_err(fb_jax, fb_ref) < 1e-5


@pytest.mark.parametrize("n_samples", [44100, 220500, 12345])
def test_mel_spectrogram_matches(n_samples):
    rng = np.random.default_rng(n_samples)
    w = rng.standard_normal(n_samples).astype(np.float32) * 0.3
    cfg = M.MelConfig()
    ours = np.asarray(M.mel_spectrogram(jnp.asarray(w), cfg))
    ref = R.mel_spectrogram_torch(torch.from_numpy(w)).numpy()
    assert ours.shape == ref.shape == (128, 1 + n_samples // 160)
    assert rel_err(ours, ref) < 1e-3


def test_log_mel_matches(wave):
    cfg = M.MelConfig()
    ours = np.asarray(M.log_mel_spectrogram(jnp.asarray(wave), cfg))
    ref = R.amplitude_to_db_torch(R.mel_spectrogram_torch(torch.from_numpy(wave))).numpy()
    assert np.max(np.abs(ours - ref)) < 1e-2  # dB scale: absolute tolerance
    assert rel_err(ours, ref) < 1e-3


def test_top_db_clamp_engages():
    w = np.zeros(44100, dtype=np.float32)
    w[:100] = 1.0
    out = np.asarray(M.log_mel_spectrogram(jnp.asarray(w), M.MelConfig()))
    assert out.max() - out.min() <= 80.0 + 1e-4


def test_batched_and_vmap_consistency(wave):
    cfg = M.MelConfig()
    batch = np.stack([wave, wave * 0.1 + 0.01])
    out = np.asarray(M.log_mel_spectrogram(jnp.asarray(batch), cfg))
    single0 = np.asarray(M.log_mel_spectrogram(jnp.asarray(batch[0]), cfg))
    single1 = np.asarray(M.log_mel_spectrogram(jnp.asarray(batch[1]), cfg))
    # per-clip top_db clamp must be independent across the batch
    np.testing.assert_allclose(out[0], single0, rtol=1e-6, atol=1e-5)
    np.testing.assert_allclose(out[1], single1, rtol=1e-6, atol=1e-5)


def test_mfcc_matches(wave):
    ours = np.asarray(M.mfcc(jnp.asarray(wave)))
    ref = R.mfcc_torch(torch.from_numpy(wave)).numpy()
    assert ours.shape == ref.shape == (40, 276)
    assert np.max(np.abs(ours - ref)) < 2e-2
    assert rel_err(ours, ref) < 1e-3


def test_ast_normalize_matches(wave):
    cfg = M.MelConfig()
    ours = M.ast_normalize(M.log_mel_spectrogram(jnp.asarray(wave), cfg))
    ref = R.ast_preprocess_torch(torch.from_numpy(wave)).numpy()
    ours = np.asarray(ours)
    assert abs(float(ours.mean())) < 1e-3
    assert abs(float(np.asarray(ours).std(ddof=1)) - 0.5) < 1e-3
    assert np.max(np.abs(ours - ref)) < 1e-3


def test_ast_shape_contract():
    # 5-s ESC-50 clip at 44.1 kHz → (128, 1379) (reference t_dim math ast.py:16)
    w = np.zeros(220500, dtype=np.float32)
    out = M.log_mel_spectrogram(jnp.asarray(w), M.MelConfig())
    assert out.shape == (128, 1379)
