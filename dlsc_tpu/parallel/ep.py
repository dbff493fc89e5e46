"""Expert-parallel (EP) sharding rules for MoE ViT blocks.

The reference has no MoE or expert parallelism (SURVEY.md §2.7 audit — EP
absent); this is the TPU-native addition pairing models/moe.MoeMlp: the
stacked expert weights (wi/wo/bi/bo, leading expert axis E) are sharded over
a mesh axis, the router stays replicated, and the MoeMlp dispatch buffers
carry a matching sharding constraint so GSPMD keeps expert compute local and
inserts the token all-to-alls over ICI. Like parallel/tp.py and fsdp.py,
everything is expressed purely as parameter shardings — no hand-written
collectives.

Works for both block layouts: unrolled (wi: (E, D, F)) and scan-stacked
(wi: (L, E, D, F)) — the expert axis is located from the trailing shape.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dlsc_tpu.parallel.mesh import path_keys

#: MoeMlp parameter names whose expert axis sits 3 dims from the end
#: (..., E, D, F); biases carry it 2 dims from the end (..., E, F).
_KERNELS = ("wi", "wo")
_BIASES = ("bi", "bo")


def _ep_spec(keys: list[str], ndim: int, axis: str) -> P | None:
    """EP PartitionSpec for a MoE leaf, or None for non-MoE leaves."""
    if "moe" not in keys:
        return None
    name = keys[-1]
    if name in _KERNELS:
        dim = ndim - 3
    elif name in _BIASES:
        dim = ndim - 2
    else:  # router (and anything future) replicated
        return P()
    entries: list[Any] = [None] * ndim
    entries[dim] = axis
    return P(*entries)


def moe_param_shardings(
    params: Any, mesh: Mesh, axis: str = "model", base: Any = None
) -> Any:
    """Pytree of NamedShardings: expert-stacked MoE weights sharded on the
    expert dim over ``axis``; every other leaf keeps its ``base`` sharding
    (e.g. parallel.tp.vit_param_shardings output) or stays replicated."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    base_flat = (
        jax.tree_util.tree_flatten_with_path(base)[0] if base is not None
        else [(p, NamedSharding(mesh, P())) for p, _ in flat]
    )
    out = []
    for (path, leaf), (_, b) in zip(flat, base_flat):
        spec = _ep_spec(path_keys(path), leaf.ndim, axis)
        if spec is None:
            out.append(b if isinstance(b, NamedSharding)
                       else NamedSharding(mesh, b))
        else:
            out.append(NamedSharding(mesh, spec))
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(treedef, out)


def expert_sharding(mesh: Mesh, axis: str = "model") -> NamedSharding:
    """Sharding for MoeMlp's (B, E, C, D) dispatch buffers: batch over
    'data', experts over ``axis``. Pass as ASTViT(expert_sharding=...)."""
    return NamedSharding(mesh, P("data", axis, None, None))


def shard_params_ep(
    params: Any, mesh: Mesh, axis: str = "model", base: Any = None
) -> Any:
    """device_put params with the EP layout."""
    sh = moe_param_shardings(params, mesh, axis, base)
    return jax.tree_util.tree_map(jax.device_put, params, sh)


def fsdp_ep_state_shardings(state: Any, mesh: Mesh, axis: str = "model") -> Any:
    """ZeRO-3 + EP for a whole TrainState: every leaf whose path marks it as
    a MoE expert weight — or an optimizer moment mirroring one (the moment
    subtrees carry the same 'moe'/wi/wo/bi/bo keys) — gets the expert dim on
    ``axis``, then 'data' lands on the largest still-free dimension via the
    size-gated FSDP rule. Params and moments get identical decisions, unlike
    ``fsdp_state_shardings(base_params=...)`` which applies the base to
    params only."""
    from dlsc_tpu.parallel.fsdp import add_data_axis

    def one(path, leaf):
        shape = jax.numpy.shape(leaf)
        spec = _ep_spec(path_keys(path), len(shape), axis)
        return NamedSharding(
            mesh, add_data_axis(spec, shape, mesh.shape["data"])
        )

    return jax.tree_util.tree_map_with_path(one, state)


def ep_state_shardings(state: Any, mesh: Mesh, axis: str = "model") -> Any:
    """Shardings for a whole TrainState under EP: MoE expert weights — and
    the optimizer moments mirroring them (their tree paths contain the same
    'moe'/wi/wo/bi/bo keys) — sharded on the expert dim; everything else
    replicated. Valid as jit in_shardings/out_shardings for the train step
    (cf. parallel.fsdp.fsdp_state_shardings)."""
    def one(path, leaf):
        spec = _ep_spec(path_keys(path), jax.numpy.ndim(leaf), axis)
        return NamedSharding(mesh, spec if spec is not None else P())

    return jax.tree_util.tree_map_with_path(one, state)
