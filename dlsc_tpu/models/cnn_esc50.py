"""Spectrogram-image CNN (Inik 2023 HPO widths) in Flax.

Behavioral spec from reference: src/models/cnn_esc50.py:5-58 — five conv
blocks with the HPO-found widths 109/203/181/210/169, Avg/Max pooling,
FC→850→num_classes with dropout 0.5.

Note on the reference's inconsistencies (documented, not silently copied):
its preprocessor emits 3×224×224 images (preprocessing.py:1496-1501) while
the model's first conv takes 1 channel (cnn_esc50.py:9), its hardcoded
flatten size 17914 matches neither, and the dataset never dispatches to the
``cnn_esc50`` mode (esc50.py:217-223). Here the pipeline is made coherent:
1-channel 224×224 log-mel images, flatten size derived from the actual
shapes.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class CNN_ESC50(nn.Module):
    num_classes: int = 50
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # (B, H, W), (B, 1, H, W) or (B, 3, H, W) → NHWC 1-channel
        if x.ndim == 4:
            x = x.mean(axis=1) if x.shape[1] > 1 else x[:, 0]
        B = x.shape[0]
        x = x[..., None].astype(self.dtype)

        def block(x, feats, k, pool=None, pool_type=None, pool_stride=None):
            x = nn.Conv(feats, (k, k), padding="VALID", dtype=self.dtype)(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype)(x)
            x = nn.relu(x)
            if pool:
                fn = nn.avg_pool if pool_type == "avg" else nn.max_pool
                x = fn(x, (pool, pool), strides=(pool_stride, pool_stride),
                       padding="VALID")
            return x

        x = block(x, 109, 2, pool=4, pool_type="avg", pool_stride=4)
        x = block(x, 203, 2, pool=4, pool_type="max", pool_stride=3)
        x = block(x, 181, 3)
        x = block(x, 210, 4)
        x = block(x, 169, 4)

        x = x.reshape(B, -1)
        x = nn.Dense(850, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.Dropout(0.5, deterministic=not train)(x)
        x = nn.Dense(self.num_classes, dtype=jnp.float32)(x)
        return x.astype(jnp.float32)
