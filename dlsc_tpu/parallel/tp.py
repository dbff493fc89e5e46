"""Tensor-parallel sharding rules for the ViT family (SURVEY.md §2.7
"optional TP sharding of the AST MLP/attention as a stretch goal").

Megatron-style column/row split over the mesh 'model' axis, expressed purely
as parameter shardings — GSPMD propagates activation shardings and inserts
the collectives:

- attention qkv Dense: column-parallel (output dim sharded → heads split),
- attention out-projection: row-parallel (input dim sharded),
- MLP fc1: column-parallel; fc2: row-parallel,
- everything else (norms, embeddings, head) replicated.

Works for both the scan-stacked block layout (kernels carry a leading depth
axis) and the unrolled layout.

Attention under TP keeps the Pallas kernels (``use_flash=True``): the
kernels are not GSPMD-auto-partitionable, but heads attend independently,
so the model passes ``head_sharding = head_activation_sharding(mesh)`` and
the attention core runs under ``shard_map`` over the 'model' axis — each
shard invokes the full kernel on its H/tp heads (models/vit.py
``_head_sharded_mha``). This replaces the earlier dense-attention fallback,
which measurably cannot compile for *training* at AST sequence lengths on
one chip (BASELINE.md AST-Small dense rows) and made TP a toy-shape-only
feature (VERDICT r3 #3 / weak #3).
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


from dlsc_tpu.parallel.mesh import path_keys


def head_activation_sharding(mesh: Mesh, axis: str = "model") -> NamedSharding:
    """NamedSharding for the (B, H, N, dh) attention activations with heads
    over ``axis`` — pass as ``ASTViT(head_sharding=...)`` to run the Pallas
    attention kernels under TP (shard_map over heads)."""
    return NamedSharding(mesh, P(None, axis, None, None))


def _rule(path: tuple[str, ...], ndim: int) -> P:
    keys = path_keys(path)
    def last_dim(spec):  # shard the trailing dim, leading dims replicated
        return P(*([None] * (ndim - 1) + [spec]))

    def middle_dim(spec):  # shard dim -2 (kernel input dim)
        assert ndim >= 2
        return P(*([None] * (ndim - 2) + [spec, None]))

    if "attn" in keys and "qkv" in keys:
        return last_dim("model")                      # column parallel
    if "attn" in keys and "proj" in keys:
        if keys[-1] == "kernel":
            return middle_dim("model")                # row parallel
        return P()                                    # proj bias replicated
    if "mlp" in keys and "fc1" in keys:
        return last_dim("model")
    if "mlp" in keys and "fc2" in keys:
        if keys[-1] == "kernel":
            return middle_dim("model")
        return P()
    return P()


def vit_param_shardings(params: Any, mesh: Mesh) -> Any:
    """Pytree of NamedShardings implementing TP over the 'model' axis."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    specs = {}
    for path, leaf in flat:
        specs[path] = NamedSharding(mesh, _rule(path, leaf.ndim))
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(
        treedef, [specs[p] for p, _ in flat]
    )


def shard_params_tp(params: Any, mesh: Mesh) -> Any:
    """device_put params with the TP layout."""
    shardings = vit_param_shardings(params, mesh)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)
