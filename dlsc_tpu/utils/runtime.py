"""Runtime knobs: persistent compilation cache, seeding, NaN debugging.

The remote-compile TPU path in this environment is slow (tens of seconds to
minutes per program) and occasionally wedges on a single helper instance;
the persistent compilation cache makes every program a one-time cost across
processes and sidesteps recompiles entirely.
"""

from __future__ import annotations

import os
import random
from pathlib import Path

import numpy as np

_DEFAULT_CACHE = Path(
    os.environ.get("DLSC_JAX_CACHE_DIR", str(Path.home() / ".cache" / "dlsc_jax_cache"))
)


def enable_compilation_cache(cache_dir: str | Path | None = None) -> None:
    if os.environ.get("DLSC_DISABLE_COMPILE_CACHE") == "1":
        return
    import jax

    path = Path(cache_dir or _DEFAULT_CACHE)
    path.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(path))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def fix_seed(seed: int) -> None:
    """Python/numpy global seeds (reference: scripts/train.py:44-50); JAX
    randomness is explicit-key based and seeded by the Trainer."""
    random.seed(seed)
    np.random.seed(seed)
