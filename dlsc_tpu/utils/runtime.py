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


def rng_key(seed: int):
    """Root PRNG key for a training run, honoring ``$DLSC_RNG_IMPL``.

    ``threefry2x32`` (the JAX default, and ours) is counter-based and fully
    deterministic across shardings; ``rbg``/``unsafe_rbg`` use the TPU's
    hardware RNG instructions and generate dropout masks several times
    faster, at the cost of weaker stability guarantees across XLA versions
    (fine for throughput experiments, not for bitwise-reproducible runs).
    All per-step keys (dropout, pipeline augmentation) derive from this root
    via ``jax.random.split``/``fold_in``, which preserve the impl — so this
    one knob switches the whole step's mask generation.
    """
    import jax

    impl = os.environ.get("DLSC_RNG_IMPL")
    if impl:
        return jax.random.key(seed, impl=impl)
    return jax.random.key(seed)


def wait_for_backend(max_probes: int | None = None) -> None:
    """Ride out transient axon-TPU UNAVAILABLE windows before device work.

    ``max_probes`` defaults to ``$DLSC_WAIT_PROBES`` or 6 (~2.5 h at the
    observed ~25 min per failed probe — outages of 5 h+ have been seen, so
    driver-facing entry points err on the patient side; callers with their
    own deadline pass a smaller value).

    Observed 2026-08-17: backend init can fail with UNAVAILABLE for 5h+,
    and each failed init attempt itself blocks ~25 min. A failed init is
    cached for the life of the process, so the probe must run in a fresh
    subprocess; only when a probe succeeds does the caller's process
    initialize its own backend. No-op if this process already has a live
    backend (probing can't help once init state is cached). NB: the probe
    subprocess inherits the default (axon TPU) platform — don't call this
    from code that intends to force the CPU platform anyway.
    """
    import subprocess
    import sys

    if max_probes is None:
        max_probes = int(os.environ.get("DLSC_WAIT_PROBES", "6"))

    try:
        from jax._src import xla_bridge

        if hasattr(xla_bridge, "backends_are_initialized"):
            if xla_bridge.backends_are_initialized():
                return
        elif getattr(xla_bridge, "_backends", None):
            return
    except Exception:
        return

    last = ""
    for _ in range(max_probes):
        try:
            r = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                capture_output=True, text=True, timeout=2400,
            )
        except subprocess.TimeoutExpired:
            last = "probe timed out"
            continue
        if r.returncode == 0:
            return
        last = r.stderr.strip().splitlines()[-1] if r.stderr.strip() else "?"
        if "UNAVAILABLE" not in last and "Unable to initialize" not in last:
            break  # not the transient-outage signature; fail fast below
    raise RuntimeError(f"backend unavailable after {max_probes} probes: {last}")
