"""End-to-end HPO integration: HPORunner over real Trainer fits on CPU.

Small search space, tiny model, synthetic data, Hyperband pruning — checks
the whole optimize_hyperparams flow short of the CLI.
"""

from pathlib import Path

import flax.linen as nn
import pytest

from dlsc_tpu.config.core import Config
from dlsc_tpu.data.synthetic import make_synthetic_dataset
from dlsc_tpu.hpo import HyperparameterSpace, StudyManager, TrialState
from dlsc_tpu.hpo.runner import HPORunner


class HPOTinyModel(nn.Module):
    num_classes: int = 10
    width: int = 8

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x[..., None]
        x = nn.Conv(self.width, (5, 5), (4, 4))(x)
        x = nn.relu(x)
        return nn.Dense(self.num_classes)(x.reshape(x.shape[0], -1))


@pytest.fixture(scope="module")
def base_cfg(tmp_path_factory):
    root = tmp_path_factory.mktemp("hposynth")
    make_synthetic_dataset(root, num_classes=10, clips_per_class_per_fold=2,
                           clip_samples=8000)
    return Config({
        "seed": 0,
        "batch_size": 16,
        "num_workers": 0,
        "trainer": {"max_epochs": 3, "precision": 32,
                    "enable_progress_bar": False},
        "dataset": {
            "_target_": "dlsc_tpu.data.esc50.ESC50DataModule",
            "root": str(root), "num_classes": 10, "fold": 0, "val_split": 0.2,
        },
        "model": {
            "_target_": "tests.test_hpo_runner.HPOTinyModel",
            "num_classes": 10,
            "dataset_overrides": {
                "preprocessing_mode": "ast", "is_spectrogram": True,
                "enable_mixup": False,
            },
        },
        "optimizer": {"_target_": "dlsc_tpu.train.optim.adam", "lr": 1e-3},
        "loss": {"_target_": "dlsc_tpu.train.losses.CrossEntropyLoss"},
    })


@pytest.mark.slow
def test_hpo_runner_end_to_end(base_cfg, tmp_path):
    space = HyperparameterSpace.from_nested({
        "optimizer": {"lr": {"type": "float", "low": 1e-4, "high": 1e-2,
                             "log": True}},
        "model": {"width": {"type": "categorical", "choices": [4, 8]}},
    })
    mgr = StudyManager("hpo_e2e", f"sqlite:///{tmp_path}/hpo.db", "maximize",
                       pruner_config={"min_resource": 1, "max_resource": 3,
                                      "reduction_factor": 2})
    study = mgr.create_study()
    runner = HPORunner(study, base_cfg, space, monitor="val/acc",
                       n_trials=3, output_dir=tmp_path)
    runner.optimize()

    assert len(study.trials) == 3
    states = {t.state for t in study.trials}
    assert states <= {TrialState.COMPLETE, TrialState.PRUNED}
    best = study.best_trial
    assert 1e-4 <= best.params["optimizer.lr"] <= 1e-2
    assert "test_acc" in best.user_attrs  # per-trial test ran
    # every trial reported intermediate values for pruning
    assert all(t.intermediate_values for t in study.trials)

    out = runner.save_best_config()
    assert out.exists()
    import yaml

    payload = yaml.safe_load(out.read_text())
    assert payload["params"] == best.params
    assert payload["config"]["optimizer"]["lr"] == best.params["optimizer.lr"]
