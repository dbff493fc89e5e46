#!/usr/bin/env python
"""Hyperparameter optimization entry (reference: scripts/optimize_hyperparams.py).

Usage:
    python scripts/optimize_hyperparams.py                       # leaf sweep
    python scripts/optimize_hyperparams.py model=envnet_v2 optuna.n_trials=20
    python scripts/optimize_hyperparams.py optuna.study_name=my_study

Flow (SURVEY.md §3.2): modular search space from
configs/optimization/hyperparameter_spaces (training+loss+model), TPE +
Hyperband study on SQLite (resumable via study_name), per-trial train/eval
with per-epoch pruning, best-config export.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import scripts.train as train_script
from dlsc_tpu.config import compose
from dlsc_tpu.hpo import HyperparameterSpace, StudyManager
from dlsc_tpu.hpo.runner import HPORunner
from dlsc_tpu.tracking import Tracker

CONFIG_DIR = Path(__file__).resolve().parent.parent / "configs"
SPACES_DIR = CONFIG_DIR / "optimization" / "hyperparameter_spaces"


def build_runner(cfg, trainer_overrides: dict | None = None) -> HPORunner:
    spaces_dir = Path(cfg.select("optuna.spaces_dir", default=SPACES_DIR))
    space = HyperparameterSpace.from_model_config(cfg, spaces_dir)
    if not len(space):
        raise SystemExit("empty search space — add YAMLs under "
                         f"{spaces_dir} for this model")
    optuna_cfg = cfg.optuna.to_dict()
    manager = StudyManager.from_config(optuna_cfg)
    study = manager.create_study(load_if_exists=True)
    tracker = Tracker(cfg.select("logging.experiment_name", default="optuna"))
    return HPORunner(
        study=study,
        base_cfg=cfg,
        space=space,
        monitor=optuna_cfg.get("monitor", "val/acc"),
        min_epochs=int(optuna_cfg.get("min_epochs", 0)),
        n_trials=int(optuna_cfg.get("n_trials", 50)),
        timeout=optuna_cfg.get("timeout"),
        output_dir=optuna_cfg.get("output_dir", "outputs/optimization"),
        tracker=tracker,
        trainer_overrides=trainer_overrides,
    )


def run_vmapped(cfg):
    """TPU-native mode: K lockstep trials per jitted program
    (dlsc_tpu.hpo.vmapped). Enable with optuna.vmapped.enabled=true;
    vmappable hyperparameters are optimizer.lr / optimizer.weight_decay /
    loss.label_smoothing / model.dropout / dataset.mixup_alpha (see
    hpo/vmapped.py VMAPPABLE).
    Override the search ranges with e.g.
    ``'+optuna.vmapped.spaces={model.dropout: {low: 0.0, high: 0.5}}'``."""
    from dlsc_tpu.hpo import StudyManager
    from dlsc_tpu.hpo.vmapped import VmappedTrialRunner
    from dlsc_tpu.train import build_from_cfg

    optuna_cfg = cfg.optuna.to_dict()
    vm = optuna_cfg.get("vmapped", {})
    k = int(vm.get("k", 8))
    rounds = int(vm.get("rounds", max(optuna_cfg.get("n_trials", 16) // k, 1)))

    datamodule = train_script.build_datamodule(cfg)
    built = build_from_cfg(cfg)
    manager = StudyManager.from_config(optuna_cfg)
    study = manager.create_study(load_if_exists=True)

    plan = None
    if vm.get("mesh", False):
        # trial parallelism over the mesh: shard the K-trial axis over
        # 'data' (one chip trains K/n_data trials; see SCALING.md).
        # optuna.vmapped.mesh=true requires k % device_count == 0.
        import jax

        from dlsc_tpu.parallel import make_plan

        if jax.device_count() > 1:
            plan = make_plan()

    sp = vm.get("spaces", {})
    runner = VmappedTrialRunner(
        study, built["model"], datamodule.pipeline, datamodule,
        epochs=int(cfg.select("trainer.max_epochs", default=10)),
        lr_space=sp.get("optimizer.lr"),
        wd_space=sp.get("optimizer.weight_decay"),
        ls_space=sp.get("loss.label_smoothing"),
        do_space=sp.get("model.dropout"),
        ma_space=sp.get("dataset.mixup_alpha"),
        gradient_clip_val=cfg.select("trainer.gradient_clip_val", default=1.0),
        min_epochs=int(optuna_cfg.get("min_epochs", 0)),
        seed=int(cfg.select("seed", default=42)),
        plan=plan,
    )
    if vm.get("continuous", True):
        # slot recycling: pruned/finished slots refill with fresh suggestions
        total = int(optuna_cfg.get("n_trials", k * rounds))
        finished = runner.run_continuous(k=k, total_trials=total)
        print(f"[vmapped continuous] processed {len(finished)} trials "
              f"through {k} slots")
    else:
        for r in range(rounds):
            result = runner.run_batch(k=k)
            print(f"[vmapped round {r}] trials {result.trial_numbers} "
                  f"values {['%.4f' % v for v in result.values]}")
    print(study.summary())
    return study


def main(argv: list[str] | None = None):
    argv = list(argv if argv is not None else sys.argv[1:])
    config_path, config_name, overrides = train_script.parse_cli(argv)
    if config_name == "training":
        config_name = "optimization"
    cfg = compose(config_path, config_name, overrides)
    train_script.fix_seed(int(cfg.select("seed", default=42)))

    if cfg.select("optuna.vmapped.enabled", default=False):
        return run_vmapped(cfg)

    runner = build_runner(cfg)
    print(f"search space ({len(runner.space)} params): {runner.space.names()}")
    runner.optimize()

    summary = runner.summary()
    print("\n=== study summary ===")
    for k, v in summary.items():
        print(f"  {k}: {v}")
    best_path = runner.save_best_config(
        Path(cfg.select("optuna.output_dir", default="outputs/optimization"))
        / cfg.select("optuna.best_config_path", default="best_config.yaml")
    )
    print(f"best config → {best_path}")
    return runner


if __name__ == "__main__":
    main()
