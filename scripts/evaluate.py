#!/usr/bin/env python
"""Fold-wise cross-validation evaluation.

The reference ships an EMPTY evaluate.py (reference: scripts/evaluate.py is
0 bytes; SURVEY.md §2.5) — this implements the missing capability with the
same config surface as train.py:

    # evaluate a checkpoint on its held-out fold
    python scripts/evaluate.py model=envnet_v2 dataset.fold=0 +ckpt_path=outputs/.../checkpoints/epoch-...

    # full official cross-validation (train + test on every fold)
    python scripts/evaluate.py model=envnet_v2 --cv

The CV mode reports per-fold top-1/F1/AUROC plus mean±std and writes
``cv_report.json`` — the fold-wise parity artifact BASELINE.md asks for.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import scripts.train as train_script
from dlsc_tpu.config import compose
from dlsc_tpu.train import Trainer, build_from_cfg


def evaluate_checkpoint(cfg) -> dict:
    ckpt_path = cfg.select("ckpt_path", default=None)
    if not ckpt_path:
        raise SystemExit("pass +ckpt_path=<checkpoint dir> (or use --cv)")
    datamodule = train_script.build_datamodule(cfg)
    built = build_from_cfg(cfg)
    trainer = Trainer(**cfg.trainer.to_dict(), enable_checkpointing=False,
                      seed=int(cfg.select("seed", default=42)))
    # initialize a state skeleton, restore weights into it, run test only
    state = trainer.init_state(built["model"], datamodule,
                               built["optim_spec"], built["sched_spec"])
    from dlsc_tpu.train.checkpoint import restore_state

    state = restore_state(ckpt_path, state)
    trainer.state = state
    results = trainer.test(datamodule, state=state, ckpt=None,
                           criterion=built["criterion"])
    print(f"fold {datamodule.fold}: "
          + " ".join(f"{k}={results[k]:.4f}" for k in
                     ("test/acc", "test/f1", "test/auroc")))
    return results


def evaluate_cv(config_path: str, config_name: str, overrides: list[str]) -> dict:
    """Train + test on every official fold; aggregate."""
    probe = compose(config_path, config_name, overrides)
    n_folds = 10 if "urbansound" in str(probe.select("dataset.root", default="")) else 5
    per_fold = {}
    for fold in range(n_folds):
        cfg = compose(config_path, config_name,
                      [*overrides, f"dataset.fold={fold}"])
        print(f"\n===== fold {fold}/{n_folds - 1} =====")
        results = train_script.run(cfg)
        per_fold[fold] = {k: float(results[k]) for k in
                          ("test/acc", "test/f1", "test/auroc", "test/loss")}
    accs = [v["test/acc"] for v in per_fold.values()]
    report = {
        "per_fold": per_fold,
        "mean_acc": float(np.mean(accs)),
        "std_acc": float(np.std(accs)),
        "n_folds": n_folds,
    }
    out = Path("outputs") / "cv_report.json"
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(report, indent=2))
    print(f"\nCV top-1: {report['mean_acc']:.4f} ± {report['std_acc']:.4f} "
          f"(report → {out})")
    return report


def main(argv: list[str] | None = None) -> dict:
    argv = list(argv if argv is not None else sys.argv[1:])
    cv = "--cv" in argv
    if cv:
        argv.remove("--cv")
    config_path, config_name, overrides = train_script.parse_cli(argv)
    if cv:
        return evaluate_cv(config_path, config_name, overrides)
    return evaluate_checkpoint(compose(config_path, config_name, overrides))


if __name__ == "__main__":
    main()
