"""Config system tests: composition, interpolation, overrides, instantiate."""

import textwrap
from pathlib import Path

import pytest

from dlsc_tpu.config import Config, compose, flatten, instantiate, merge


def _write(root: Path, rel: str, text: str) -> None:
    p = root / rel
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_text(textwrap.dedent(text))


@pytest.fixture
def config_tree(tmp_path: Path) -> Path:
    _write(tmp_path, "base.yaml", """
        defaults:
          - _self_
          - override hydra/job_logging: none
        seed: 42
        trainer:
          max_epochs: 250
          precision: 32
        optimizer:
          lr: 1e-4
        scheduler:
          T_max: ${trainer.max_epochs}
    """)
    _write(tmp_path, "training.yaml", """
        defaults:
          - base
          - dataset: esc50
          - model: ast
          - _self_
        logging:
          experiment_name: ast_training
    """)
    _write(tmp_path, "dataset/esc50.yaml", """
        name: esc50
        num_classes: 50
        fold: 0
    """)
    _write(tmp_path, "model/ast.yaml", """
        _target_: dlsc_tpu.tests_dummy.Dummy
        num_classes: ${dataset.num_classes}
        patch_size: 16
        dataset_overrides:
          preprocessing_mode: ast
          enable_mixup: true
    """)
    _write(tmp_path, "model/envnet_v2.yaml", """
        _target_: dlsc_tpu.tests_dummy.Dummy
        num_classes: ${dataset.num_classes}
        dropout: 0.5
        dataset_overrides:
          preprocessing_mode: envnet_v2
    """)
    return tmp_path


def test_compose_defaults_and_groups(config_tree):
    cfg = compose(config_tree, "training")
    assert cfg.seed == 42
    assert cfg.dataset.num_classes == 50
    assert cfg.model.patch_size == 16
    assert cfg.logging.experiment_name == "ast_training"


def test_interpolation(config_tree):
    cfg = compose(config_tree, "training")
    assert cfg.scheduler.T_max == 250           # cross-file interp
    assert cfg.model.num_classes == 50          # into group option
    cfg.update("trainer.max_epochs", 10)
    assert cfg.scheduler.T_max == 10            # lazy resolution


def test_group_override(config_tree):
    cfg = compose(config_tree, "training", ["model=envnet_v2"])
    assert cfg.model.dropout == 0.5
    assert cfg.model.dataset_overrides.preprocessing_mode == "envnet_v2"


def test_value_overrides(config_tree):
    cfg = compose(
        config_tree, "training",
        ["trainer.max_epochs=5", "+ckpt_path=/tmp/x.ckpt", "optimizer.lr=0.001"],
    )
    assert cfg.trainer.max_epochs == 5
    assert cfg.scheduler.T_max == 5
    assert cfg.ckpt_path == "/tmp/x.ckpt"
    assert cfg.optimizer.lr == 0.001
    assert isinstance(cfg.optimizer.lr, float)


def test_typed_override_values(config_tree):
    cfg = compose(
        config_tree, "training",
        ["trainer.precision=bf16-mixed", "+flag=true", "+nothing=null", "+lst=[1,2]"],
    )
    assert cfg.trainer.precision == "bf16-mixed"
    assert cfg.flag is True
    assert cfg.nothing is None
    assert cfg.lst == [1, 2]


def test_delete_override(config_tree):
    cfg = compose(config_tree, "training", ["~model.dataset_overrides"])
    assert "dataset_overrides" not in cfg.model


def test_merge_and_flatten():
    a = Config({"x": {"y": 1, "z": 2}, "k": [1, 2]})
    b = Config({"x": {"y": 9}, "k": [3]})
    m = merge(a, b)
    assert m.x.y == 9 and m.x.z == 2 and m.k == [3]
    f = flatten(m)
    assert f == {"x.y": 9, "x.z": 2, "k": [3]}


def test_pop_and_select(config_tree):
    cfg = compose(config_tree, "training")
    ov = cfg.model.pop("dataset_overrides")
    assert ov.preprocessing_mode == "ast"
    assert "dataset_overrides" not in cfg.model
    assert cfg.select("dataset.fold") == 0
    assert cfg.select("no.such.key", default=None) is None


def test_instantiate_with_alias(tmp_path):
    # torch.optim.Adam target (reference configs) resolves to our optax factory.
    from dlsc_tpu.config.instantiate import resolve_target
    fn = resolve_target("dlsc_tpu.config.core.flatten")
    assert callable(fn)


def test_instantiate_nested():
    cfg = {"_target_": "collections.OrderedDict",
           "inner": {"_target_": "builtins.dict", "a": 1}}
    obj = instantiate(cfg)
    assert obj["inner"] == {"a": 1}


def test_instantiate_partial():
    cfg = {"_target_": "builtins.int", "_partial_": True}
    p = instantiate(cfg)
    assert p("7") == 7
