"""``_target_`` object instantiation with reference-compat aliases.

The reference wires every component declaratively via
``hydra.utils.instantiate`` (reference: scripts/train.py:111,
src/training/engine.py:78). We reproduce that: a ``_target_`` key names a
dotted import path; remaining keys are kwargs; nested dicts with their own
``_target_`` are instantiated recursively; ``_partial_: true`` returns a
functools.partial.

An alias table maps reference-style target strings (``src.models.*``,
``torch.optim.Adam``, ``torchmetrics...``) onto dlsc_tpu equivalents so the
reference's config trees work verbatim.
"""

from __future__ import annotations

import functools
import importlib
from typing import Any

from dlsc_tpu.config.core import Config

# Reference target string -> dlsc_tpu target string.
# Models (reference: configs/model/*.yaml).
_ALIASES: dict[str, str] = {
    "src.models.envnet_v2.EnvNetV2": "dlsc_tpu.models.envnet_v2.EnvNetV2",
    "src.models.ast.ASTModel": "dlsc_tpu.models.ast.ASTModel",
    "src.models.ast_small.ASTViTSmall": "dlsc_tpu.models.ast_small.ASTViTSmall",
    "src.models.ast_mini.ASTMiniViT": "dlsc_tpu.models.ast_mini.ASTMiniViT",
    "src.models.leaf.LeafModel": "dlsc_tpu.models.leaf.LeafModel",
    "src.models.cnn_esc50.CNN_ESC50": "dlsc_tpu.models.cnn_esc50.CNN_ESC50",
    # Data modules (reference: configs/dataset/esc50.yaml).
    "src.datasets.esc50.ESC50DataModule": "dlsc_tpu.data.esc50.ESC50DataModule",
    "src.datasets.urbansound8k.UrbanSound8KDataModule": "dlsc_tpu.data.us8k.US8KDataModule",
    # Optimizers / schedulers / losses (reference: configs/base_training.yaml).
    "torch.optim.Adam": "dlsc_tpu.train.optim.adam",
    "torch.optim.AdamW": "dlsc_tpu.train.optim.adamw",
    "torch.optim.SGD": "dlsc_tpu.train.optim.sgd",
    "torch.optim.lr_scheduler.CosineAnnealingLR": "dlsc_tpu.train.optim.cosine_annealing",
    "torch.optim.lr_scheduler.StepLR": "dlsc_tpu.train.optim.step_lr",
    "torch.nn.CrossEntropyLoss": "dlsc_tpu.train.losses.CrossEntropyLoss",
    "torch.nn.KLDivLoss": "dlsc_tpu.train.losses.KLDivLoss",
    # Metrics (reference: src/training/engine.py:95-111).
    "torchmetrics.classification.Accuracy": "dlsc_tpu.train.metrics.Accuracy",
    "torchmetrics.classification.MulticlassAccuracy": "dlsc_tpu.train.metrics.Accuracy",
    # HPO (reference: configs/optimization.yaml:36-45).
    "optuna.samplers.TPESampler": "dlsc_tpu.hpo.tpe.TPESampler",
    "optuna.pruners.HyperbandPruner": "dlsc_tpu.hpo.hyperband.HyperbandPruner",
    "optuna.pruners.MedianPruner": "dlsc_tpu.hpo.pruners.MedianPruner",
}


def resolve_target(target: str) -> Any:
    """Import the object named by *target* (after alias mapping)."""
    target = _ALIASES.get(target, target)
    module_name, _, attr = target.rpartition(".")
    if not module_name:
        raise ValueError(f"_target_ must be a dotted path, got {target!r}")
    mod = importlib.import_module(module_name)
    try:
        return getattr(mod, attr)
    except AttributeError as e:
        raise ImportError(f"{attr!r} not found in {module_name!r}") from e


def instantiate(cfg: Any, *args: Any, _recursive_: bool = True, **kwargs: Any) -> Any:
    """Instantiate an object from a ``_target_`` config node."""
    if isinstance(cfg, Config):
        cfg = cfg.to_dict()
    if not isinstance(cfg, dict):
        return cfg
    if "_target_" not in cfg:
        # plain dict: recursively instantiate children
        if _recursive_:
            return {k: _maybe_instantiate(v) for k, v in cfg.items()}
        return cfg

    cfg = dict(cfg)
    target = cfg.pop("_target_")
    partial = bool(cfg.pop("_partial_", False))
    cfg.pop("_recursive_", None)
    cfg.pop("_convert_", None)

    obj = resolve_target(target)
    call_kwargs = {}
    for k, v in cfg.items():
        call_kwargs[k] = _maybe_instantiate(v) if _recursive_ else v
    call_kwargs.update(kwargs)
    if partial:
        return functools.partial(obj, *args, **call_kwargs)
    return obj(*args, **call_kwargs)


def _maybe_instantiate(v: Any) -> Any:
    if isinstance(v, Config):
        v = v.to_dict()
    if isinstance(v, dict) and "_target_" in v:
        return instantiate(v)
    if isinstance(v, dict):
        return {k: _maybe_instantiate(x) for k, x in v.items()}
    if isinstance(v, list):
        return [_maybe_instantiate(x) for x in v]
    return v
