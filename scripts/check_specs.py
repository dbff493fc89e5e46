#!/usr/bin/env python
"""Print host + accelerator specs (TPU variant of reference check_specs.py:28-43)."""

import os
import platform
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    print("== host ==")
    print(f"  os:      {platform.platform()}")
    print(f"  python:  {platform.python_version()}")
    print(f"  cpus:    {os.cpu_count()}")
    try:
        total_kb = int(
            next(l for l in open("/proc/meminfo") if l.startswith("MemTotal"))
            .split()[1]
        )
        print(f"  ram:     {total_kb / 1e6:.1f} GB")
    except Exception:
        pass

    print("== jax ==")
    import jax

    print(f"  version: {jax.__version__}")
    print(f"  backend: {jax.default_backend()}")
    for d in jax.devices():
        print(f"  device:  {d} (kind={d.device_kind}, "
              f"process={d.process_index})")
    print(f"  device_count: {jax.device_count()} "
          f"(local {jax.local_device_count()})")
    try:
        from jax.sharding import Mesh
        import numpy as np

        mesh = Mesh(np.asarray(jax.devices()).reshape(-1, 1), ("data", "model"))
        print(f"  default mesh: {dict(mesh.shape)}")
    except Exception as e:
        print(f"  mesh: unavailable ({e})")

    print("== scheduler env ==")
    for var in ("SLURM_JOB_ID", "SLURM_JOB_NODELIST", "TPU_WORKER_HOSTNAMES",
                "JAX_PLATFORMS", "XLA_FLAGS"):
        if os.environ.get(var):
            print(f"  {var}={os.environ[var]}")


if __name__ == "__main__":
    main()
