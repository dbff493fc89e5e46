"""Device mesh, shardings, and SPMD helpers (new component — the reference
is single-process single-device, SURVEY.md §2.7)."""

from dlsc_tpu.parallel.mesh import (
    MeshPlan,
    get_mesh,
    make_plan,
    shard_batch,
    replicate,
)

__all__ = ["MeshPlan", "get_mesh", "make_plan", "shard_batch", "replicate"]
