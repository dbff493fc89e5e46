"""optimize_hyperparams.py end-to-end through the CLI surface (tiny model,
generated config tree + search space, 2 trials on CPU)."""

import textwrap
from pathlib import Path

import flax.linen as nn
import pytest

from dlsc_tpu.data.synthetic import make_synthetic_dataset
from dlsc_tpu.hpo import TrialState


class OptTinyModel(nn.Module):
    num_classes: int = 10
    width: int = 8

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.width, (5, 5), (4, 4))(x[..., None])
        return nn.Dense(self.num_classes)(nn.relu(x).reshape(x.shape[0], -1))


@pytest.fixture(scope="module")
def cli_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("optcli")
    data = root / "data"
    make_synthetic_dataset(data, num_classes=10, clips_per_class_per_fold=2,
                           clip_samples=8000)

    def w(rel, text):
        p = root / "configs" / rel
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_text(textwrap.dedent(text))

    w("optimization.yaml", f"""
        seed: 0
        batch_size: 16
        num_workers: 0
        trainer:
          max_epochs: 2
          precision: 32
          enable_progress_bar: false
        dataset:
          _target_: dlsc_tpu.data.esc50.ESC50DataModule
          root: {data}
          num_classes: 10
          fold: 0
          val_split: 0.2
        model:
          _target_: tests.test_optimize_script.OptTinyModel
          num_classes: 10
          dataset_overrides:
            preprocessing_mode: ast
            is_spectrogram: true
        optimizer:
          _target_: dlsc_tpu.train.optim.adam
          lr: 1e-3
        loss:
          _target_: dlsc_tpu.train.losses.CrossEntropyLoss
        logging:
          experiment_name: optcli
        optuna:
          study_name: optcli_study
          direction: maximize
          storage_path: sqlite:///{root}/study.db
          n_trials: 2
          monitor: val/acc
          min_epochs: 0
          output_dir: {root}/outputs
          spaces_dir: {root}/spaces
          sampler: {{seed: 0}}
          pruner: {{min_resource: 1, max_resource: 2, reduction_factor: 2}}
    """)
    spaces = root / "spaces" / "models"
    spaces.mkdir(parents=True)
    (root / "spaces" / "training.yaml").write_text(
        "optimizer:\n  lr: {type: float, low: 1e-4, high: 1e-2, log: true}\n"
    )
    (root / "spaces" / "loss.yaml").write_text("")
    (spaces / "test_optimize_script.yaml").write_text(
        "model:\n  width: {type: categorical, choices: [4, 8]}\n"
    )
    return root


@pytest.mark.slow
def test_optimize_hyperparams_cli(cli_tree, monkeypatch):
    import scripts.optimize_hyperparams as O

    monkeypatch.setenv("DLSC_TRACKING_DIR", str(cli_tree / "runs"))
    runner = O.main([
        "--config-path", str(cli_tree / "configs"),
        "--config-name", "optimization",
    ])
    study = runner.study
    assert len(study.trials) == 2
    assert all(t.state in (TrialState.COMPLETE, TrialState.PRUNED)
               for t in study.trials)
    assert (cli_tree / "outputs" / "best_config.yaml").exists()
    # the model-specific space was picked up via the _target_ module name
    assert "model.width" in study.trials[0].params


@pytest.mark.slow
def test_optimize_vmapped_mesh_cli(cli_tree, monkeypatch):
    """optuna.vmapped.enabled + optuna.vmapped.mesh: K lockstep trials
    sharded over the 8-device mesh through the real CLI."""
    import jax

    if jax.device_count() < 8:
        pytest.skip("needs the 8-device virtual mesh")

    import scripts.optimize_hyperparams as O

    monkeypatch.setenv("DLSC_TRACKING_DIR", str(cli_tree / "runs"))
    study = O.main([
        "--config-path", str(cli_tree / "configs"),
        "--config-name", "optimization",
        "optuna.study_name=optcli_vmesh",
        "+optuna.vmapped.enabled=true",
        "+optuna.vmapped.mesh=true",
        "+optuna.vmapped.k=8",
        "optuna.n_trials=8",
    ])
    assert len(study.trials) == 8
    assert all(t.state in (TrialState.COMPLETE, TrialState.PRUNED)
               for t in study.trials)
    lrs = {round(t.params["optimizer.lr"], 10) for t in study.trials}
    assert len(lrs) == 8
