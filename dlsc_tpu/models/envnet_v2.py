"""EnvNet-v2 (Tokozume 2018) in Flax, raw-waveform 1-D/2-D CNN.

Behavioral spec from reference: src/models/envnet_v2.py:5-90 — a temporal
conv front-end (two strided (1,k) convs + (1,64) max-pool), a channel→
frequency swap that re-interprets the 64 conv channels as a frequency axis,
a 4-block 2-D conv trunk, and a 3-layer FC classifier. Input contract:
5 s @ 44.1 kHz mono waveform (B, 220500) → (B, num_classes) logits.

TPU notes: NHWC layout throughout (MXU-native for XLA convs); BatchNorm
statistics are computed over the *global* batch under pjit (GSPMD reduces
across the data-parallel mesh axis automatically). The reference notes this
model needs fp32 (fp16 NaNs — configs/base_training.yaml:19-24); we default
to fp32 compute and allow bf16 via ``dtype`` for experimentation.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

_conv_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")  # kaiming
_fc_init = nn.initializers.variance_scaling(1.0, "fan_in", "normal")     # N(0, 1/√fan_in)


class _ConvBNRelu(nn.Module):
    features: int
    kernel: Sequence[int]
    strides: Sequence[int] = (1, 1)
    dtype: Any = jnp.float32
    bn_barrier: str | bool = "auto"  # see __call__; 'auto' = batch >= 48

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Conv(
            self.features, self.kernel, self.strides, padding="VALID",
            kernel_init=_conv_init, bias_init=nn.initializers.zeros,
            dtype=self.dtype,
        )(x)
        # Identity-semantics fusion barrier (round-5 root cause of the
        # "bf16 b64 3.4 s/step" cliff, BASELINE.md): at (64, 57, 853, 32)
        # with an (8, 8) kernel XLA:TPU fuses the BatchNorm statistics
        # reduction INTO the conv and picks a degenerate lowering that
        # re-evaluates the conv per reduction tile — 3028 ms forward for
        # this ONE layer (not a dtype issue: BN-in-f32 still hits it; the
        # barrier fixes it to 27 ms fwd / 90 ms fwd+bwd). Step-level:
        # b64 bf16 3437 → 127 ms (502 clips/s, the ≥450 target finally
        # met), fp32 b64 → 404 clips/s. At batch 32 the conv+BN fusion is
        # actually GOOD (barrier costs −6% bf16 / −13% fp32), so 'auto'
        # applies the barrier only at batch >= 48 — the batch is static
        # under jit, so this is a trace-time choice, and b32 keeps the
        # round-4 graphs bit-identically. Gradients pass through the
        # barrier as identity. Training only: in eval BN uses running stats
        # (no reduction to fuse), and the barrier measurably COSTS ~3-4 ms
        # of eval forward at b64/b128 (round-5 probe) — so inference keeps
        # the unbarriered graphs at every batch size.
        apply_barrier = train and (
            x.shape[0] >= 48 if self.bn_barrier == "auto"
            else bool(self.bn_barrier))
        if apply_barrier:
            x = jax.lax.optimization_barrier(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype,
        )(x)
        return nn.relu(x)


class EnvNetV2(nn.Module):
    num_classes: int = 50
    dropout: float = 0.5
    dtype: Any = jnp.float32
    bn_barrier: str | bool = "auto"  # conv->BN fusion barrier (see
                             # _ConvBNRelu; 'auto' = batch >= 48 — the
                             # measured bf16-b64 cliff fix, BASELINE.md r5)
    pool_impl: str = "xla"   # 'xla': nn.max_pool reduce-window (default —
                             # measured FASTER); 'grab': argmax-capture
                             # custom-vjp pools whose backward is one fused
                             # compare/select pass (ops/pool.py). Measured
                             # v5e A/B (scripts/bench_envnet.py, round 4):
                             # xla 81 vs grab 91 ms/step bf16 b32, 105 vs
                             # 121 fp32 — XLA's select-and-scatter beats
                             # the argmax capture here (the argmax reduce
                             # in the forward plus the window-expanded
                             # compare/select write cost more than s&s's
                             # input re-read at these window shapes), so
                             # the round-3 pool-backward hypothesis is
                             # refuted by measurement; 'grab' stays as the
                             # probe knob.

    def _pool(self, x, window):
        if self.pool_impl == "grab":
            from dlsc_tpu.ops.pool import max_pool_grab

            return max_pool_grab(x, window)
        return nn.max_pool(x, window, strides=window, padding="VALID")

    @nn.compact
    def __call__(self, x, train: bool = False):
        # Accept (B, T), (B, 1, T) or (B, 1, 1, T) → NHWC (B, 1, T, 1)
        if x.ndim == 3:
            x = x[:, 0, :]
        elif x.ndim == 4:
            x = x[:, 0, 0, :]
        B, T = x.shape
        x = x.reshape(B, 1, T, 1).astype(self.dtype)

        # ---- temporal front-end (reference :14-24) ----
        x = _ConvBNRelu(32, (1, 64), (1, 2), self.dtype,
                        self.bn_barrier)(x, train)
        x = _ConvBNRelu(64, (1, 16), (1, 2), self.dtype,
                        self.bn_barrier)(x, train)
        x = self._pool(x, (1, 64))
        # channels → frequency axis (reference swapaxes :82):
        # (B, 1, W, 64) → (B, 64, W, 1)
        x = jnp.transpose(x, (0, 3, 2, 1))

        # ---- 2-D trunk: conv-conv-pool x4 (reference :40-45) ----
        block = partial(_ConvBNRelu, dtype=self.dtype,
                        bn_barrier=self.bn_barrier)
        for feats, k1, k2, pool in (
            (32, (8, 8), (8, 8), (5, 3)),
            (64, (1, 4), (1, 4), (1, 2)),
            (128, (1, 2), (1, 2), (1, 2)),
            (256, (1, 2), (1, 2), (1, 2)),
        ):
            x = block(feats, k1)(x, train)
            x = block(feats, k2)(x, train)
            x = self._pool(x, pool)

        # ---- classifier (reference :49-60) ----
        x = x.reshape(B, -1)
        for width in (4096, 4096):
            x = nn.Dense(width, kernel_init=_fc_init, dtype=self.dtype)(x)
            x = nn.relu(x)
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.Dense(self.num_classes, kernel_init=_fc_init, dtype=jnp.float32)(x)
        return x.astype(jnp.float32)
