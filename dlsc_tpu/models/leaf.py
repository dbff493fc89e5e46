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
    pool_stride: int = 0   # >0: return AvgPool(pool_stride)-downsampled energy
                           # computed with the chunked streaming path (below)
    chunk_size: int = 0    # samples per chunk when pool_stride > 0
                           # (0 = pick ~27520, a multiple of pool_stride)

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

        dn = ("NWC", "WIO", "NWC")
        kr = real.T[:, None, :].astype(self.dtype)          # (K, 1, F)
        ki = imag.T[:, None, :].astype(self.dtype)

        if self.pool_stride <= 0:
            xin = x[:, :, None].astype(self.dtype)
            conv = lambda k: jax.lax.conv_general_dilated(  # noqa: E731
                xin, k, (1,), [(half, half)], dimension_numbers=dn,
            )
            xr, xi = conv(kr), conv(ki)
            return xr**2 + xi**2                           # (B, T, F) energy

        # Streaming path: conv → |·|² → AvgPool(pool_stride) computed in
        # time chunks under lax.map + jax.checkpoint. The full-length
        # (B, T, F) energy tensor is (32, 220500, 186) ≈ 4.9 GB fp32 — the
        # training backward holds several copies and OOMs HBM (measured:
        # 20.3 GB HLO temp at batch 32). Chunking keeps per-chunk
        # intermediates ~0.6 GB and the checkpointed map backward
        # rematerializes them chunk by chunk. Numerically identical to the
        # unchunked path: chunk starts are multiples of pool_stride, so
        # every pooling window lands inside exactly one chunk.
        B, T = x.shape
        pool = self.pool_stride
        chunk = self.chunk_size or (pool * max(27520 // pool, 1))
        chunk = max(chunk - chunk % pool, pool)  # ≥ one pool window
        n_out = (T - pool) // pool + 1
        m = chunk // pool                    # pooled outputs per chunk
        n_chunks = -(-n_out // m)
        # right pad can go negative when T mod pool leaves a partial window
        # (n_out excludes it, so n_chunks*chunk < T is possible); clamp to 0
        # — the surplus real samples land in pooled outputs beyond n_out,
        # which the final slice drops
        xpad = jnp.pad(x, ((0, 0), (half, max(n_chunks * chunk + half - T, 0))))
        xpad = xpad.astype(self.dtype)

        def body(c):
            s = c * chunk
            xin = jax.lax.dynamic_slice(
                xpad, (0, s), (B, chunk + 2 * half))[:, :, None]
            conv = lambda k: jax.lax.conv_general_dilated(  # noqa: E731
                xin, k, (1,), [(0, 0)], dimension_numbers=dn,
            )
            xr, xi = conv(kr), conv(ki)
            e = xr**2 + xi**2                              # (B, chunk, F)
            e = e.reshape(B, m, pool, self.n_filters)
            return e.mean(axis=2)                          # (B, m, F)

        out = jax.lax.map(jax.checkpoint(body), jnp.arange(n_chunks))
        out = out.transpose(1, 0, 2, 3).reshape(B, n_chunks * m, self.n_filters)
        return out[:, :n_out]                              # (B, n_out, F)


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
        # Gabor energy + AvgPool(160), streamed in chunks (see GaborConv1d:
        # the monolithic (B, T, F) energy tensor OOMs the training backward)
        x = GaborConv1d(
            self.n_filters, self.kernel_size, self.sample_rate,
            dtype=self.dtype, pool_stride=160,
        )(x)                                               # (B, ~T/160, F)
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
