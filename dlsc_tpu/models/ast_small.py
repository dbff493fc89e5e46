"""AST-Small: from-scratch ViT (384/12/6) on log-mel patches.

Reference behavioral spec: src/models/ast_small.py:39-88 (emb 384, depth 12,
heads 6, trunc-normal pos-embed, sigmoid head). The shipped config uses
patch_stride=16 / overlap=0 (configs/model/ast_small.yaml:14-17).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp

from dlsc_tpu.models.vit import ASTViT


def ASTViTSmall(
    num_classes: int = 50,
    sample_rate: int = 44_100,
    patch_size: int = 16,
    patch_stride: int = 10,
    overlap: int = 6,
    emb_dim: int = 384,
    depth: int = 12,
    num_heads: int = 6,
    f_dim: int = 128,
    dtype: Any = jnp.bfloat16,
    attn_impl: str = "splash",
    attn_dropout: float = 0.0,
    remat: bool = True,              # without remat the scan-stacked saved
    remat_policy: str = "attn_res",  # activations reach ~10 GB at b64 bf16
                                     # and the train step OOMs HBM (measured);
                                     # attn_res matches the bench_probe
                                     # ast_small_splash_b64 configuration
    quant: str | None = None,        # int8 serving quantization (vit.py)
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
        attn_impl=attn_impl,
        attn_dropout=attn_dropout,
        remat=remat,
        remat_policy=remat_policy,
        quant=quant,
    )
