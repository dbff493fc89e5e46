"""AST-Mini: from-scratch ViT (192/6/3) on log-mel patches.

Reference behavioral spec: src/models/ast_mini.py:39-89 (emb 192, depth 6,
heads 3, same encoder/positional/sigmoid conventions as AST-Small).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp

from dlsc_tpu.models.vit import ASTViT


def ASTMiniViT(
    num_classes: int = 50,
    sample_rate: int = 44_100,
    patch_size: int = 16,
    patch_stride: int = 10,
    overlap: int = 6,
    emb_dim: int = 192,
    depth: int = 6,
    num_heads: int = 3,
    f_dim: int = 128,
    dtype: Any = jnp.bfloat16,
    quant: str | None = None,  # int8 serving quantization (vit.py)
) -> ASTViT:
    return ASTViT(
        num_classes=num_classes,
        emb_dim=emb_dim,
        depth=depth,
        num_heads=num_heads,
        patch_size=patch_size,
        patch_stride=patch_stride,
        overlap=overlap,
        sample_rate=sample_rate,
        f_dim=f_dim,
        dropout=0.1,
        dtype=dtype,
        quant=quant,
    )
