#!/usr/bin/env python
"""Prepare ESC-50: raw WAVs → per-fold mmap'd shards (see dlsc_tpu.data.prepare).

Usage:
    python scripts/prepare_esc50.py [--raw data/raw/ESC-50-master] \
        [--out data/processed/esc50] [--validate-hash]

Mirrors reference scripts/prepare_esc50.py:68-118 (44.1 kHz mono
peak-normalize, folds 0..4, dataset_stats.json, optional SHA-256).
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from dlsc_tpu.data.prepare import prepare_esc50


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--raw", default="data/raw/ESC-50-master")
    p.add_argument("--out", default="data/processed/esc50")
    p.add_argument("--validate-hash", action="store_true")
    args = p.parse_args()
    stats = prepare_esc50(args.raw, args.out, validate_hash=args.validate_hash)
    print(f"prepared {stats['total_clips']} clips "
          f"({stats['total_duration_s']:.0f}s) into {args.out}")
    print({k: v for k, v in stats["folds"].items()})


if __name__ == "__main__":
    main()
