"""Fused Pallas mel kernel vs the pure-JAX reference implementation.

Runs the kernel in interpreter mode (CPU CI); the real-TPU path is exercised
by bench.py and was verified on hardware (4.1e-6 normalized err vs XLA,
~3-5x faster than the rfft path).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from dlsc_tpu.ops import mel as M
from dlsc_tpu.ops.mel_pallas import ast_features_pallas, log_mel_pallas, mel_power_pallas


def norm_err(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return np.max(np.abs(a - b)) / max(np.max(np.abs(b)), 1e-12)


@pytest.mark.parametrize("n_samples", [44100, 220500])
def test_matches_reference_impl(n_samples):
    rng = np.random.default_rng(n_samples)
    w = (rng.standard_normal((2, n_samples)) * 0.3).astype(np.float32)
    cfg = M.MelConfig()
    ref = M.mel_spectrogram(jnp.asarray(w), cfg)
    got = mel_power_pallas(jnp.asarray(w), cfg, interpret=True)
    assert got.shape == ref.shape
    assert norm_err(got, ref) < 1e-4  # bf16x3 splits; on-device measured 4e-6


def test_1d_input():
    w = (np.random.default_rng(0).standard_normal(44100) * 0.2).astype(np.float32)
    got = mel_power_pallas(jnp.asarray(w), M.MelConfig(), interpret=True)
    assert got.shape == (128, 276)


def test_log_and_ast_paths():
    rng = np.random.default_rng(1)
    w = (rng.standard_normal((2, 44100)) * 0.3).astype(np.float32)
    cfg = M.MelConfig()
    db_ref = M.log_mel_spectrogram(jnp.asarray(w), cfg)
    db_got = log_mel_pallas(jnp.asarray(w), cfg, interpret=True)
    assert np.max(np.abs(np.asarray(db_got) - np.asarray(db_ref))) < 1e-2

    ast_ref = M.ast_normalize(db_ref)
    ast_got = ast_features_pallas(jnp.asarray(w), cfg, interpret=True)
    assert np.max(np.abs(np.asarray(ast_got) - np.asarray(ast_ref))) < 1e-3


def test_cnn_mel_config_hop512():
    """hop=512 divides the lane width → single-phase framing path."""
    cfg = M.MelConfig(n_fft=1024, hop_length=512, win_length=1024, n_mels=128)
    rng = np.random.default_rng(3)
    w = (rng.standard_normal((2, 44100)) * 0.3).astype(np.float32)
    ref = M.mel_spectrogram(jnp.asarray(w), cfg)
    got = mel_power_pallas(jnp.asarray(w), cfg, interpret=True)
    assert got.shape == ref.shape
    assert norm_err(got, ref) < 1e-4
