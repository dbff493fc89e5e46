"""Device mesh, shardings, and SPMD helpers (new component — the reference
is single-process single-device, SURVEY.md §2.7)."""

from dlsc_tpu.parallel.mesh import (
    MeshPlan,
    get_mesh,
    make_plan,
    shard_batch,
    replicate,
)
from dlsc_tpu.parallel.fsdp import (
    fsdp_shardings,
    fsdp_state_shardings,
    shard_state_fsdp,
)
from dlsc_tpu.parallel.pp import get_pp_mesh, pipeline_blocks, vit_apply_pp
from dlsc_tpu.parallel.pp_tp import get_pp_tp_mesh, vit_apply_pp_tp
from dlsc_tpu.parallel.ep import (
    ep_state_shardings,
    expert_sharding,
    fsdp_ep_state_shardings,
    moe_param_shardings,
    shard_params_ep,
)

__all__ = [
    "ep_state_shardings",
    "expert_sharding",
    "fsdp_ep_state_shardings",
    "moe_param_shardings",
    "shard_params_ep",
    "MeshPlan",
    "get_mesh",
    "make_plan",
    "shard_batch",
    "replicate",
    "fsdp_shardings",
    "fsdp_state_shardings",
    "shard_state_fsdp",
    "get_pp_mesh",
    "pipeline_blocks",
    "vit_apply_pp",
    "get_pp_tp_mesh",
    "vit_apply_pp_tp",
]
