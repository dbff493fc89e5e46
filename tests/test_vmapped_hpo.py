"""Vmapped multi-trial HPO: K lockstep trials must match sequential-trial
semantics (per-trial hyperparams actually take effect, study gets per-epoch
reports, pruning marks slots)."""

import numpy as np
import pytest

import flax.linen as nn
import jax.numpy as jnp

from dlsc_tpu.data import ESC50DataModule
from dlsc_tpu.data.synthetic import make_synthetic_dataset
from dlsc_tpu.hpo import Study, TPESampler, TrialState
from dlsc_tpu.hpo.hyperband import HyperbandPruner
from dlsc_tpu.hpo.vmapped import VmappedTrialRunner


class VTiny(nn.Module):
    num_classes: int = 10

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x[..., None]
        x = nn.Conv(8, (5, 5), (4, 4))(x)
        x = nn.relu(x)
        return nn.Dense(self.num_classes)(x.reshape(x.shape[0], -1))


@pytest.fixture(scope="module")
def dm(tmp_path_factory):
    root = tmp_path_factory.mktemp("vsynth")
    make_synthetic_dataset(root, num_classes=10, clips_per_class_per_fold=2,
                           clip_samples=8000)
    return ESC50DataModule(
        root=str(root), num_classes=10, fold=0, val_split=0.2, batch_size=16,
        preprocessing_mode="ast", is_spectrogram=True,
    )


@pytest.mark.slow
def test_vmapped_batch_runs_and_reports(dm, tmp_path):
    study = Study("vmap_hpo", tmp_path / "v.db", "maximize",
                  sampler=TPESampler(seed=0))
    runner = VmappedTrialRunner(
        study, VTiny(), dm.pipeline, dm, epochs=3, seed=0,
        lr_space={"type": "float", "low": 1e-4, "high": 1e-2, "log": True},
    )
    result = runner.run_batch(k=4)
    assert len(result.trial_numbers) == 4
    trials = study.trials
    assert len(trials) == 4
    # every trial got per-epoch reports and a terminal state
    for t in trials:
        assert len(t.intermediate_values) >= 1
        assert t.state in (TrialState.COMPLETE, TrialState.PRUNED)
    done = study.trials_by_state(TrialState.COMPLETE)
    assert done
    # different lrs were actually used
    lrs = {round(t.params["optimizer.lr"], 8) for t in trials}
    assert len(lrs) == 4


@pytest.mark.slow
def test_vmapped_lr_effect_is_per_trial(dm, tmp_path):
    """A near-zero-lr slot must learn less than a sensible-lr slot — proves
    hyperparameters ride per-slot through inject_hyperparams."""
    study = Study("vmap_fx", tmp_path / "v2.db", "maximize",
                  sampler=TPESampler(seed=0))
    runner = VmappedTrialRunner(
        study, VTiny(), dm.pipeline, dm, epochs=4, seed=0,
    )
    # monkeypatch the ask to force controlled lrs
    trials_lrs = [1e-9, 5e-3]

    def fixed_ask(k):
        ts, lrs, wds, lss = [], [], [], []
        for i in range(k):
            t = study.ask()
            t.params["optimizer.lr"] = trials_lrs[i]
            t.params["optimizer.weight_decay"] = 1e-6
            ts.append(t)
            lrs.append(trials_lrs[i]); wds.append(1e-6); lss.append(0.0)
        return (ts, np.asarray(lrs), np.asarray(wds), np.asarray(lss),
                np.zeros(k), np.ones(k))

    runner._ask_batch = fixed_ask
    result = runner.run_batch(k=2)
    frozen_curve = [h["train_acc"][0] for h in result.history]
    live_curve = [h["train_acc"][1] for h in result.history]
    assert live_curve[-1] > frozen_curve[-1] + 0.1, (frozen_curve, live_curve)


@pytest.mark.slow
def test_vmapped_with_hyperband_pruning(dm, tmp_path):
    study = Study("vmap_hb", tmp_path / "v3.db", "maximize",
                  sampler=TPESampler(seed=1),
                  pruner=HyperbandPruner(min_resource=1, max_resource=3,
                                         reduction_factor=2))
    runner = VmappedTrialRunner(study, VTiny(), dm.pipeline, dm, epochs=3,
                                seed=1)
    runner.run_batch(k=4)
    states = {t.state for t in study.trials}
    assert states <= {TrialState.COMPLETE, TrialState.PRUNED}


@pytest.mark.slow
def test_run_continuous_slot_recycling(dm, tmp_path):
    """8 trials through 4 always-busy slots: every trial terminal, recycled
    slots get fresh hyperparameters, study sees per-epoch reports."""
    study = Study("vmap_cont", tmp_path / "vc.db", "maximize",
                  sampler=TPESampler(seed=2),
                  pruner=HyperbandPruner(min_resource=1, max_resource=2,
                                         reduction_factor=2))
    runner = VmappedTrialRunner(study, VTiny(), dm.pipeline, dm, epochs=2,
                                seed=2)
    finished = runner.run_continuous(k=4, total_trials=8)
    assert len(finished) == 8
    assert len(study.trials) == 8
    for t in study.trials:
        assert t.state in (TrialState.COMPLETE, TrialState.PRUNED)
        assert t.intermediate_values
    lrs = {round(t.params["optimizer.lr"], 10) for t in study.trials}
    assert len(lrs) == 8  # recycled slots received fresh suggestions


@pytest.mark.slow
def test_vmapped_mesh_sharded_trials_match(dm, tmp_path):
    """Trial parallelism over the mesh (plan=make_plan(8)): 8 lockstep
    trials sharded one-per-device must reproduce the single-device vmapped
    run — same TPE suggestions (same sampler seed), same per-epoch
    accuracies; the stacked state must be genuinely sharded over 'data'."""
    import jax

    from dlsc_tpu.parallel import make_plan

    if jax.device_count() < 8:
        pytest.skip("needs the 8-device virtual mesh")

    def run(plan):
        study = Study("vmap_mesh" + ("_p" if plan else ""),
                      tmp_path / f"vm{bool(plan)}.db", "maximize",
                      sampler=TPESampler(seed=0))
        runner = VmappedTrialRunner(
            study, VTiny(), dm.pipeline, dm, epochs=2, seed=0, plan=plan,
        )
        return runner.run_batch(k=8)

    r1 = run(None)
    r8 = run(make_plan(8))
    for h1, h8 in zip(r1.history, r8.history):
        np.testing.assert_allclose(h1["val_acc"], h8["val_acc"], atol=1e-9)
        np.testing.assert_allclose(h1["train_acc"], h8["train_acc"], atol=1e-9)
    # the trial axis actually lives sharded over 'data'
    leaf = jax.tree_util.tree_leaves(r8.states.params)[0]
    assert "data" in str(leaf.sharding.spec)
    assert leaf.addressable_shards[0].data.shape[0] == 1  # 8 trials / 8 chips


def _tiny_vit(dropout=0.5):
    from dlsc_tpu.models.vit import ASTViT

    return ASTViT(num_classes=10, emb_dim=32, depth=2, num_heads=2,
                  patch_size=16, patch_stride=16, overlap=0, dropout=dropout,
                  dtype=jnp.float32, use_flash=False, scan_blocks=True)


def test_do_space_requires_hyper_dropout_hook(dm, tmp_path):
    study = Study("vmap_doerr", tmp_path / "de.db", "maximize",
                  sampler=TPESampler(seed=0))
    with pytest.raises(ValueError, match="hyper_dropout"):
        VmappedTrialRunner(study, VTiny(), dm.pipeline, dm,
                           do_space={"low": 0.0, "high": 0.5})


@pytest.mark.slow
def test_vmapped_dropout_effect_is_per_trial(dm, tmp_path):
    """model.dropout fans out across lockstep slots (VERDICT r2 #8): with
    identical lr/wd, a 0.95-MLP-dropout slot must train dramatically worse
    than a 0.0-dropout slot — proving the per-trial rate rides the 'hyper'
    collection into the compiled program — and the stacked state must hold
    the per-slot rates."""
    import jax

    study = Study("vmap_do", tmp_path / "vdo.db", "maximize",
                  sampler=TPESampler(seed=0))
    runner = VmappedTrialRunner(
        study, _tiny_vit(), dm.pipeline, dm, epochs=4, seed=0,
        do_space={"low": 0.0, "high": 0.95},
    )
    trial_dos = [0.0, 0.95]

    def fixed_ask(k):
        ts, lrs, wds, lss, dos = [], [], [], [], []
        for i in range(k):
            t = study.ask()
            t.params["optimizer.lr"] = 5e-3
            t.params["optimizer.weight_decay"] = 1e-6
            t.params["model.dropout"] = trial_dos[i]
            ts.append(t)
            lrs.append(5e-3); wds.append(1e-6); lss.append(0.0)
            dos.append(trial_dos[i])
        return (ts, np.asarray(lrs), np.asarray(wds), np.asarray(lss),
                np.asarray(dos), np.ones(k))

    runner._ask_batch = fixed_ask
    result = runner.run_batch(k=2)
    # the stacked state's hyper rates are genuinely per-slot
    rates = np.asarray(jax.tree_util.tree_leaves(result.states.hyper)[0])
    assert rates.shape[0] == 2
    np.testing.assert_allclose(rates[0], 0.0)
    np.testing.assert_allclose(rates[1], 0.95)
    # per-slot regularization actually differs: 95% MLP dropout cripples
    # training relative to 0%
    acc0 = result.history[-1]["train_acc"][0]
    acc1 = result.history[-1]["train_acc"][1]
    assert acc0 > acc1 + 0.1, (acc0, acc1)


def _mixup_pipeline(dm):
    import dataclasses

    from dlsc_tpu.data.pipeline import DevicePipeline

    return DevicePipeline(dataclasses.replace(dm.pipeline.cfg,
                                              enable_mixup=True))


def test_ma_space_requires_mixup_enabled(dm, tmp_path):
    study = Study("vmap_maerr", tmp_path / "me.db", "maximize",
                  sampler=TPESampler(seed=0))
    with pytest.raises(ValueError, match="enable_mixup"):
        VmappedTrialRunner(study, VTiny(), dm.pipeline, dm,
                           ma_space={"low": 0.1, "high": 2.0})
    with pytest.raises(ValueError, match="must be > 0"):
        VmappedTrialRunner(study, VTiny(), _mixup_pipeline(dm), dm,
                           ma_space={"low": 0.0, "high": 2.0})


def test_mixup_alpha_traces_and_vmaps():
    """A traced per-slot Beta α must actually change the mixing: vmapping
    mixup over alpha with a shared key produces different mixed batches for
    α=0.05 (λ near 0/1) vs α=50 (λ near 0.5)."""
    import jax

    from dlsc_tpu.ops import augment as A

    key = jax.random.key(3)
    spec = jnp.tile(jnp.arange(16.0)[:, None, None], (1, 8, 8))
    labels = jax.nn.one_hot(jnp.arange(16) % 4, 4)
    mix = jax.jit(jax.vmap(
        lambda a: A.mixup(spec, labels, key, a, prob=1.0)))
    xs, ys = mix(jnp.asarray([0.05, 50.0]))
    assert not np.allclose(np.asarray(xs[0]), np.asarray(xs[1]))
    # α=50 ⇒ λ≈0.5: soft labels far from one-hot; α=0.05 ⇒ λ≈0 or 1: near
    # one-hot. Compare max-prob mass per row.
    top0 = float(np.asarray(ys[0]).max(-1).mean())
    top1 = float(np.asarray(ys[1]).max(-1).mean())
    assert top0 > top1 + 0.2, (top0, top1)


def test_pipeline_mixup_alpha_override_requires_enable(dm):
    import jax

    with pytest.raises(ValueError, match="enable_mixup"):
        dm.pipeline.train_batch(
            jnp.zeros((2, 8000), jnp.float32), jnp.zeros((2,), jnp.int32),
            jax.random.key(0), mixup_alpha=0.5)


@pytest.mark.slow
def test_vmapped_mixup_alpha_is_per_trial(dm, tmp_path):
    """dataset.mixup_alpha fans out across lockstep slots (VERDICT r2 #8
    optional half): the runner records a distinct suggested α per trial and
    the run completes with the traced α threaded through the pipeline."""
    study = Study("vmap_ma", tmp_path / "vma.db", "maximize",
                  sampler=TPESampler(seed=3))
    runner = VmappedTrialRunner(
        study, VTiny(), _mixup_pipeline(dm), dm, epochs=2, seed=3,
        ma_space={"low": 0.1, "high": 5.0, "log": True},
    )
    result = runner.run_batch(k=4)
    assert len(result.trial_numbers) == 4
    alphas = {round(t.params["dataset.mixup_alpha"], 8) for t in study.trials}
    assert len(alphas) == 4  # distinct per-slot α suggested and recorded
    for t in study.trials:
        assert t.params["dataset.mixup_alpha"] > 0
        assert t.state in (TrialState.COMPLETE, TrialState.PRUNED)


def test_vmapped_mesh_k_divisibility(dm, tmp_path):
    from dlsc_tpu.parallel import make_plan

    study = Study("vmap_div", tmp_path / "vd.db", "maximize",
                  sampler=TPESampler(seed=0))
    runner = VmappedTrialRunner(study, VTiny(), dm.pipeline, dm, epochs=1,
                                plan=make_plan(8))
    with pytest.raises(ValueError, match="multiple of the mesh data axis"):
        runner.run_batch(k=3)
