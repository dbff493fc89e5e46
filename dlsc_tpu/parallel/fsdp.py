"""FSDP / ZeRO-3-style parameter + optimizer-state sharding over 'data'.

The reference stack is single-device (SURVEY.md §2.7 — no distributed layer
exists at /root/reference, configs/base_training.yaml:49 pins devices: 1);
this module is the TPU-native memory-scaling axis: every large parameter
leaf — and the Adam moments mirroring it — is sharded over the mesh 'data'
axis, expressed purely as NamedShardings. GSPMD then inserts the all-gather
before each layer's compute and reduce-scatters the gradients back to the
shard layout; no collective is written by hand (the scaling-book recipe).

Why it matters here: EnvNet-v2 is 363M params — fp32 params + Adam m/v is
≈4.4 GB replicated per chip, ≈0.55 GB/chip FSDP-sharded on a v5e-8, freeing
HBM for the device-resident dataset pool and bigger batches.

Composes with tensor parallelism: pass the Megatron TP specs
(parallel/tp.py) as ``base`` and the 'data' axis is added on the largest
still-unsharded dimension of each leaf (ZeRO + TP).
"""

from __future__ import annotations

import math
from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

#: leaves smaller than this stay replicated — sharding tiny biases/scales
#: buys nothing and costs a collective each step.
MIN_SHARD_SIZE = 16_384


def add_data_axis(
    spec: P | None,
    shape: tuple[int, ...],
    n_data: int,
    min_size: int = MIN_SHARD_SIZE,
) -> P:
    """Extend ``spec`` with 'data' on the largest free, divisible dim.

    Returns ``spec`` unchanged (replicated over 'data') when the leaf is
    small, scalar, already fully specified, or no dimension divides the data
    axis — correctness never depends on a leaf being sharded.
    """
    entries = list(spec) if spec is not None else []
    entries += [None] * (len(shape) - len(entries))
    if n_data <= 1 or math.prod(shape) < min_size:
        return P(*entries)
    for d in sorted(range(len(shape)), key=lambda d: shape[d], reverse=True):
        if entries[d] is None and shape[d] % n_data == 0:
            entries[d] = "data"
            return P(*entries)
    return P(*entries)


def fsdp_shardings(
    tree: Any,
    mesh: Mesh,
    base: Any = None,
    min_size: int = MIN_SHARD_SIZE,
) -> Any:
    """Pytree of NamedShardings sharding each large leaf over 'data'.

    ``base``: optional pytree of PartitionSpecs/NamedShardings (same
    structure) to extend — e.g. parallel.tp.vit_param_shardings output for
    ZeRO+TP. Leaves absent a base spec start replicated.
    """
    n = mesh.shape["data"]

    def one(leaf, b=None):
        spec = b.spec if isinstance(b, NamedSharding) else b
        return NamedSharding(
            mesh, add_data_axis(spec, jax.numpy.shape(leaf), n, min_size)
        )

    if base is None:
        return jax.tree_util.tree_map(one, tree)
    return jax.tree_util.tree_map(one, tree, base)


def fsdp_state_shardings(state: Any, mesh: Mesh, base_params: Any = None) -> Any:
    """Shardings for a whole TrainState: params and the optimizer moments
    (same shapes → same layout) FSDP-sharded, everything small (step
    counters, schedules, rng, BN scalars) replicated by the size gate.

    The result is valid as jit in_shardings/out_shardings for the train
    step; pass it to ``shard_state_fsdp`` to lay out an existing state.
    """
    params_sh = fsdp_shardings(state.params, mesh, base=base_params)

    def one(leaf):
        shape = jax.numpy.shape(leaf)
        return NamedSharding(mesh, add_data_axis(None, shape, mesh.shape["data"]))

    other = jax.tree_util.tree_map(one, state)
    # overlay the params subtree (and any base-spec composition) exactly;
    # optimizer moments get the same rule via `one` since shapes match —
    # identical decisions because add_data_axis depends only on shape.
    return other.replace(params=params_sh)


def shard_state_fsdp(state: Any, mesh: Mesh, base_params: Any = None) -> Any:
    """device_put a TrainState into the FSDP layout."""
    sh = fsdp_state_shardings(state, mesh, base_params)
    return jax.tree_util.tree_map(jax.device_put, state, sh)
