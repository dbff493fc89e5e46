#!/usr/bin/env python
"""Observable HPO debugging entry (reference: scripts/debug_optimize.py:27-67):
same sweep as optimize_hyperparams.py but with progress bars re-enabled,
frequent logging, and a small default trial budget.

Usage:
    python scripts/debug_optimize.py optuna.n_trials=3 trainer.max_epochs=5
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import scripts.train as train_script
from dlsc_tpu.config import compose
from scripts.optimize_hyperparams import build_runner


def main(argv: list[str] | None = None):
    argv = list(argv if argv is not None else sys.argv[1:])
    config_path, config_name, overrides = train_script.parse_cli(argv)
    if config_name == "training":
        config_name = "optimization"
    cfg = compose(config_path, config_name, overrides)
    if "n_trials" not in " ".join(overrides):
        cfg.update("optuna.n_trials", 3)
    train_script.fix_seed(int(cfg.select("seed", default=42)))

    runner = build_runner(
        cfg, trainer_overrides={"enable_progress_bar": True,
                                "log_every_n_steps": 10},
    )
    print(f"[debug] space: {runner.space.names()}")
    runner.optimize()
    print(runner.summary())
    return runner


if __name__ == "__main__":
    main()
