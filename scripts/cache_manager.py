#!/usr/bin/env python
"""Feature-cache CLI: stats / cleanup / optimize / benchmark
(reference: scripts/cache_manager.py:233-302).

Usage:
    python scripts/cache_manager.py stats     [--cache-dir data/cache]
    python scripts/cache_manager.py cleanup   --max-age DAYS
    python scripts/cache_manager.py optimize  --max-size GB
    python scripts/cache_manager.py benchmark [--mode ast] [--n 32]
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from dlsc_tpu.data.cache import FeatureCache


def cmd_stats(args) -> None:
    cache = FeatureCache(args.cache_dir)
    print(json.dumps(cache.report(), indent=2))


def cmd_cleanup(args) -> None:
    cache = FeatureCache(args.cache_dir)
    removed = cache.cleanup_by_age(args.max_age)
    print(f"removed {removed} entries older than {args.max_age} days")


def cmd_optimize(args) -> None:
    cache = FeatureCache(args.cache_dir)
    removed = cache.enforce_size_limit(int(args.max_size * 1e9))
    print(f"evicted {removed} entries to fit {args.max_size} GB")


def cmd_benchmark(args) -> None:
    """Measure feature compute vs cache hit latency (reference :165-230)."""
    import jax.numpy as jnp

    from dlsc_tpu.data.pipeline import DevicePipeline, PipelineConfig

    cache = FeatureCache(args.cache_dir, config={"mode": args.mode})
    pipe = DevicePipeline(PipelineConfig(mode=args.mode, num_classes=50))
    rng = np.random.default_rng(0)
    wave = rng.standard_normal((args.n, 220_500)).astype(np.float32) * 0.3

    t0 = time.perf_counter()
    feats, _ = pipe.eval_batch(jnp.asarray(wave), jnp.zeros(args.n, jnp.int32))
    feats = np.asarray(feats)
    compute_s = time.perf_counter() - t0

    for i in range(args.n):
        cache.put(f"bench_{i}", feats[i])
    t0 = time.perf_counter()
    for i in range(args.n):
        assert cache.get(f"bench_{i}") is not None
    hit_s = time.perf_counter() - t0

    print(json.dumps({
        "mode": args.mode,
        "n_clips": args.n,
        "compute_clips_per_s": round(args.n / compute_s, 1),
        "cache_hit_clips_per_s": round(args.n / hit_s, 1),
        **cache.report(),
    }, indent=2))


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--cache-dir", default="data/cache")
    sub = p.add_subparsers(dest="cmd", required=True)
    # defaults mirror the reference CLI (scripts/cache_manager.py:269-287):
    # cleanup --max-age 30 days, optimize --max-size 5.0 GB, benchmark
    # --mode envnet_v2
    sub.add_parser("stats")
    c = sub.add_parser("cleanup"); c.add_argument("--max-age", type=float, default=30)
    o = sub.add_parser("optimize"); o.add_argument("--max-size", type=float, default=5.0)
    b = sub.add_parser("benchmark")
    b.add_argument("--mode", default="envnet_v2",
                   choices=["envnet_v2", "ast", "cnn_esc50"])
    b.add_argument("--n", type=int, default=32)
    args = p.parse_args()
    {"stats": cmd_stats, "cleanup": cmd_cleanup,
     "optimize": cmd_optimize, "benchmark": cmd_benchmark}[args.cmd](args)


if __name__ == "__main__":
    main()
