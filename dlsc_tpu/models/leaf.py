"""LEAF-style learnable front-end model in Flax.

Behavioral spec from reference: src/models/leaf.py:7-104 —

- ``GaborConv1d``: complex Gabor filterbank rebuilt from learnable center
  frequencies / bandwidths *every forward* (in JAX this is simply part of the
  jitted graph), Hann-windowed, energy output real²+imag² (:7-34). Note the
  reference's parameterization quirk, replicated here: center frequencies are
  normalized by Nyquist but multiplied by ``t`` in *seconds* (:18, 21-28), so
  the oscillation phase stays ≤~0.01 rad across the kernel — the initial
  filters are near-identical Gaussians and center_freqs has a vanishing
  (though nonzero) gradient,
- AvgPool(160) downsample **before** PCEN (:58, 98-100 — the reference
  applies PCEN after the downsample, not the paper's IIR smoother; replicated
  as implemented),
- ``PCEN``: 5-tap average-pool smoother, learnable (α, δ, r) where **α is a
  parameter but unused in the forward pass** (reference :45-50 — quirk
  replicated so checkpoints carry the same state),
- 3 Conv1d blocks 256→384→512 + adaptive average pool + a BN MLP classifier
  256→512→256→C (:60-96).

Input: raw waveform (B, T) or (B, 1, T) at 44.1 kHz.
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from dlsc_tpu.ops.mel import hann_window_np


class GaborConv1d(nn.Module):
    n_filters: int = 186
    kernel_size: int = 401
    sample_rate: int = 44_100
    min_freq: float = 60.0
    max_freq: float = 7800.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # x: (B, T)
        nyquist = self.sample_rate / 2
        center = self.param(
            "center_freqs",
            lambda key: jnp.linspace(self.min_freq, self.max_freq, self.n_filters)
            / nyquist,
        )
        bandwidth = self.param("bandwidths", nn.initializers.ones, (self.n_filters,))

        half = self.kernel_size // 2
        t = jnp.arange(-half, half + 1, dtype=jnp.float32) / self.sample_rate
        window = jnp.asarray(
            hann_window_np(self.kernel_size), dtype=jnp.float32
        )
        envelope = jnp.exp(
            -0.5 * (t[None, :] * bandwidth[:, None] * self.sample_rate) ** 2
        )
        phase = 2.0 * math.pi * center[:, None] * t[None, :]
        real = jnp.cos(phase) * envelope * window          # (F, K)
        imag = jnp.sin(phase) * envelope * window

        # conv1d, padding k//2 — NWC input, (K, 1, F) kernels
        xin = x[:, :, None].astype(self.dtype)
        dn = ("NWC", "WIO", "NWC")
        conv = lambda k: jax.lax.conv_general_dilated(  # noqa: E731
            xin, k.T[:, None, :].astype(self.dtype), (1,), [(half, half)],
            dimension_numbers=dn,
        )
        xr, xi = conv(real), conv(imag)
        return xr**2 + xi**2                               # (B, T, F) energy


class PCEN(nn.Module):
    num_channels: int
    alpha: float = 0.98
    delta: float = 2.0
    r: float = 0.5
    eps: float = 1e-6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, T, C)
        # α is created for state parity with the reference but (as there)
        # does not participate in the forward computation (leaf.py:45-50).
        self.param("alpha", nn.initializers.constant(self.alpha), (self.num_channels,))
        delta = self.param("delta", nn.initializers.constant(self.delta), (self.num_channels,))
        r = self.param("r", nn.initializers.constant(self.r), (self.num_channels,))
        m = nn.avg_pool(x, (5,), strides=(1,), padding=((2, 2),))
        return jnp.log(x / (self.eps + m) ** r[None, None, :] + delta[None, None, :])


class LeafModel(nn.Module):
    n_filters: int = 186
    kernel_size: int = 401
    sample_rate: int = 44_100
    num_classes: int = 50
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if x.ndim == 3:
            x = x[:, 0, :]
        x = GaborConv1d(
            self.n_filters, self.kernel_size, self.sample_rate, dtype=self.dtype
        )(x)                                               # (B, T, F)
        x = nn.avg_pool(x, (160,), strides=(160,))          # (B, ~T/160, F)
        x = PCEN(self.n_filters, dtype=self.dtype)(x)

        for feats, k, pool in ((256, 5, 4), (384, 3, 4), (512, 3, 2)):
            x = nn.Conv(feats, (k,), padding="SAME", dtype=self.dtype)(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype)(x)
            x = nn.relu(x)
            x = nn.max_pool(x, (pool,), strides=(pool,))

        x = jnp.mean(x, axis=1)                             # adaptive avg pool → (B, 512)

        for width in (256, 512, 256):
            x = nn.Dense(width, dtype=self.dtype)(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype)(x)
            x = nn.relu(x)
            x = nn.Dropout(0.3, deterministic=not train)(x)
        x = nn.Dense(self.num_classes, dtype=jnp.float32)(x)
        return x.astype(jnp.float32)
