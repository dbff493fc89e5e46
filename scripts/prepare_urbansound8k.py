#!/usr/bin/env python
"""Prepare UrbanSound8K: raw WAVs → 10 per-fold shards (pad/trim to 4 s).

Usage:
    python scripts/prepare_urbansound8k.py [--raw data/raw/UrbanSound8K] \
        [--out data/processed/urbansound8k]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from dlsc_tpu.data.prepare import prepare_us8k


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--raw", default="data/raw/UrbanSound8K")
    p.add_argument("--out", default="data/processed/urbansound8k")
    args = p.parse_args()
    stats = prepare_us8k(args.raw, args.out)
    print(f"prepared {stats['total_clips']} clips into {args.out}")


if __name__ == "__main__":
    main()
