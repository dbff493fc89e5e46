"""Shared utilities: compilation cache, seeding, profiling helpers."""

from dlsc_tpu.utils.runtime import (
    enable_compilation_cache,
    fix_seed,
    rng_key,
    wait_for_backend,
)

__all__ = ["enable_compilation_cache", "fix_seed", "rng_key", "wait_for_backend"]
