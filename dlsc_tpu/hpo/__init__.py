"""Hyperparameter optimization: TPE sampler + Hyperband pruning + SQLite
study persistence + config-space parsing + trial runners.

Functional replacement for the reference's Optuna stack
(reference: src/optimization/) — optuna itself is not available in this
environment, so the sampler/pruner/storage are first-class implementations
with the same semantics (TPESampler(n_startup_trials=10, n_ei_candidates=24),
HyperbandPruner(min_resource=1, max_resource=100, reduction_factor=3),
sqlite:/// storage with load_if_exists resume).
"""

from dlsc_tpu.hpo.study import Study, StudyManager, Trial, TrialPruned, TrialState
from dlsc_tpu.hpo.tpe import TPESampler, RandomSampler
from dlsc_tpu.hpo.hyperband import HyperbandPruner, SuccessiveHalvingPruner
from dlsc_tpu.hpo.pruners import MedianPruner, NopPruner
from dlsc_tpu.hpo.space import HyperparameterSpace

__all__ = [
    "Study", "StudyManager", "Trial", "TrialPruned", "TrialState",
    "TPESampler", "RandomSampler",
    "HyperbandPruner", "SuccessiveHalvingPruner", "MedianPruner", "NopPruner",
    "HyperparameterSpace",
]
