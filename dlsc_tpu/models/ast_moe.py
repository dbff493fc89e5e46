"""AST-MoE: the from-scratch AST-Small ViT with mixture-of-experts MLPs.

Beyond-reference model family (the reference has no MoE — SURVEY.md §2.7
audit: "Expert parallelism (EP) / MoE: absent"). Same trunk, patch grid and
sigmoid-head conventions as ASTViTSmall (reference behavioral spec:
src/models/ast_small.py:39-88); every block's dense MLP is replaced by a
top-k routed expert mixture (models/moe.py), giving n_experts× MLP capacity
at ~top_k× MLP FLOPs. Expert parallelism: pass
``expert_sharding=parallel.ep.expert_sharding(mesh)`` and lay params out
with ``parallel.ep.moe_param_shardings``.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp

from dlsc_tpu.models.moe import MoeSpec
from dlsc_tpu.models.vit import ASTViT


def ASTMoE(
    num_classes: int = 50,
    sample_rate: int = 44_100,
    patch_size: int = 16,
    patch_stride: int = 16,
    overlap: int = 0,
    emb_dim: int = 384,
    depth: int = 12,
    num_heads: int = 6,
    f_dim: int = 128,
    n_experts: int = 8,
    top_k: int = 2,
    capacity_factor: float = 1.25,
    aux_weight: float = 1e-2,
    router_z_weight: float = 1e-3,
    router: str = "token",      # 'token' (Switch/GShard) | 'expert' (Zhou 2022)
    dispatch: str = "ragged",   # 'ragged' | 'einsum' | 'scatter' — ragged
                                # (dropless grouped matmuls, models/moe.py)
                                # measured +19% at the b64 train step vs
                                # einsum (447 vs 535 ms, BASELINE.md round
                                # 5); einsum is the EP lowering and the
                                # expert-choice pairing
    group_size: int = 256,
    dtype: Any = jnp.bfloat16,
    attn_impl: str = "splash",
    attn_dropout: float = 0.0,
    remat: bool = True,
    remat_policy: str = "attn_res",
    expert_sharding: Any = None,
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
        # expert-choice is capacity-based by construction — pair it with the
        # einsum lowering rather than erroring on the ragged default
        moe=MoeSpec(
            n_experts=n_experts,
            top_k=top_k,
            capacity_factor=capacity_factor,
            aux_weight=aux_weight,
            router_z_weight=router_z_weight,
            router=router,
            dispatch=("einsum" if router == "expert" and dispatch == "ragged"
                      else dispatch),
            group_size=group_size,
        ),
        expert_sharding=expert_sharding,
    )
