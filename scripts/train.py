#!/usr/bin/env python
"""Train a sound-classification model (main entry point).

Usage (same override grammar as the reference, scripts/train.py:1-61):

    python scripts/train.py model=envnet_v2
    python scripts/train.py model=ast dataset=esc50 optimizer.lr=5e-4
    python scripts/train.py model=ast trainer.precision=bf16-mixed batch_size=128
    python scripts/train.py model=envnet_v2 +ckpt_path=outputs/.../checkpoints/epoch-07-val_acc-0.512
    python scripts/train.py --config-name my_experiment ...

Smoke run:
    python scripts/train.py model=ast trainer.max_epochs=2 \
        +trainer.limit_train_batches=5 +trainer.limit_val_batches=2

Flow (mirrors reference call stack, SURVEY.md §3.1): compose config → seed →
datamodule from dataset cfg + model dataset_overrides → model/loss/optimizer
from cfg → Trainer.fit (checkpoint best val/acc, early stop) →
Trainer.test(best checkpoint) with full metrics + figures.
"""

from __future__ import annotations

import random
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from dlsc_tpu.config import compose, flatten, instantiate
from dlsc_tpu.tracking import Tracker
from dlsc_tpu.train import Trainer, build_from_cfg

CONFIG_DIR = Path(__file__).resolve().parent.parent / "configs"


def parse_cli(argv: list[str]) -> tuple[str, str, list[str]]:
    config_path, config_name = str(CONFIG_DIR), "training"
    overrides = []
    it = iter(argv)
    for a in it:
        if a == "--config-path":
            config_path = next(it)
        elif a == "--config-name":
            config_name = next(it)
        elif a in ("-h", "--help"):
            print(__doc__)
            raise SystemExit(0)
        else:
            overrides.append(a)
    return config_path, config_name, overrides


def fix_seed(seed: int) -> None:
    """Python/numpy seeds (reference: train.py:44-50); JAX RNG is explicit
    key threading seeded by the Trainer."""
    random.seed(seed)
    np.random.seed(seed)


def build_datamodule(cfg):
    """Assemble datamodule kwargs: dataset cfg + top-level batch_size/
    num_workers + the model's ``dataset_overrides`` sub-tree (popped from the
    model cfg — the reference's convention, train.py:91-107)."""
    ds_cfg = cfg.dataset.to_dict()
    ds_cfg["batch_size"] = cfg.select("batch_size", default=64)
    ds_cfg["num_workers"] = cfg.select("num_workers", default=0)
    overrides = cfg.model.pop("dataset_overrides", None)
    if overrides is not None:
        ov = overrides.to_dict() if hasattr(overrides, "to_dict") else dict(overrides)
        ds_cfg.update(ov)
    return instantiate(ds_cfg)


def run(cfg) -> dict:
    from dlsc_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    fix_seed(int(cfg.select("seed", default=42)))
    run_dir = Path(cfg.select("hydra.run.dir", default="outputs/run"))
    run_dir.mkdir(parents=True, exist_ok=True)

    datamodule = build_datamodule(cfg)
    print(datamodule.summary())
    built = build_from_cfg(cfg)

    tracker = Tracker(cfg.select("logging.experiment_name", default="training"))
    tracker.log_params({f"cfg_{k}": v for k, v in flatten(cfg.to_dict()).items()})

    trainer_cfg = cfg.trainer.to_dict()
    ckpt_cfg = cfg.checkpoint.to_dict() if "checkpoint" in cfg else {}
    # relative dirpath goes under the run dir (reference: callbacks.py:38-56)
    dirpath = Path(ckpt_cfg.pop("dirpath", "checkpoints"))
    if not dirpath.is_absolute():
        dirpath = run_dir / dirpath
    trainer = Trainer(
        **trainer_cfg,
        checkpoint_dir=dirpath,
        seed=int(cfg.select("seed", default=42)),
    )
    # optional SWA (reference: callbacks.py:71-79 gates on cfg.swa.enabled)
    swa_cfg = None
    if cfg.select("swa.enabled", default=False):
        swa_cfg = {k: v for k, v in cfg.swa.to_dict().items() if k != "enabled"}
    trainer.fit(
        built["model"], datamodule, built["optim_spec"], built["sched_spec"],
        criterion=built["criterion"], tracker=tracker,
        checkpoint_cfg=ckpt_cfg,
        early_stop_cfg=cfg.select("early_stop", default=None) and cfg.early_stop.to_dict(),
        ckpt_path=cfg.select("ckpt_path", default=None),
        swa_cfg=swa_cfg,
        pretrained_path=cfg.select("pretrained_path", default=None),
    )
    results = trainer.test(datamodule, criterion=built["criterion"], tracker=tracker)
    tracker.finish()

    print("\n=== test results ===")
    for k in ("test/acc", "test/f1", "test/auroc", "test/loss"):
        print(f"  {k}: {results[k]:.4f}")
    print(f"run dir: {run_dir}\ntracking: {tracker.run_dir}")
    if trainer.ckpt_manager and trainer.ckpt_manager.best_path:
        print(f"best checkpoint: {trainer.ckpt_manager.best_path}")
    return results


def main(argv: list[str] | None = None) -> dict:
    config_path, config_name, overrides = parse_cli(
        argv if argv is not None else sys.argv[1:]
    )
    cfg = compose(config_path, config_name, overrides)
    return run(cfg)


if __name__ == "__main__":
    main()
