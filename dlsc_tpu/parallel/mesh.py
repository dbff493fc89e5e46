"""Mesh + sharding plan for SPMD training over ICI.

The reference has no distributed layer at all (single device,
configs/base_training.yaml:49, SURVEY.md §2.7); this module is the TPU-native
design: a ('data',) mesh as the default strategy (DP over ICI — gradient
all-reduce inserted by XLA/GSPMD), with the mesh shape expressed so a model
axis can be added for tensor parallelism without changing call sites.

Usage:
    plan = make_plan()                      # all local devices on 'data'
    step = jax.jit(train_step,
                   in_shardings=(plan.replicated, plan.replicated,
                                 plan.batch, plan.batch),
                   out_shardings=..., donate_argnums=0)
    wave = jax.device_put(wave, plan.batch)
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def path_keys(path) -> list[str]:
    """Stringified keys of a jax key-path (DictKey.key / GetAttrKey.name /
    SequenceKey fallback) — the one shared implementation for every
    path-pattern sharding rule (tp.py, ep.py, models/moe.py)."""
    return [getattr(p, "key", getattr(p, "name", str(p))) for p in path]


def get_mesh(
    n_devices: int | None = None,
    model_parallel: int = 1,
    devices=None,
) -> Mesh:
    """('data', 'model') mesh over the local devices. model_parallel=1 keeps
    all devices on the batch axis (the parity default)."""
    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if n % model_parallel:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    arr = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, ("data", "model"))


@dataclasses.dataclass(frozen=True)
class MeshPlan:
    mesh: Mesh

    @property
    def batch(self) -> NamedSharding:
        """Shard the leading (batch) axis over 'data'."""
        return NamedSharding(self.mesh, P("data"))

    @property
    def replicated(self) -> NamedSharding:
        return NamedSharding(self.mesh, P())

    @property
    def n_data(self) -> int:
        return self.mesh.shape["data"]

    def pad_batch(self, n: int) -> int:
        """Round a global batch size up to a multiple of the data axis."""
        d = self.n_data
        return -(-n // d) * d


def make_plan(n_devices: int | None = None, model_parallel: int = 1) -> MeshPlan:
    return MeshPlan(get_mesh(n_devices, model_parallel))


def shard_batch(batch, plan: MeshPlan):
    """device_put a host batch with the leading axis sharded over 'data'."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, plan.batch), batch
    )


def replicate(tree, plan: MeshPlan):
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, plan.replicated), tree
    )
