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
        ts = []
        for i in range(k):
            t = study.ask()
            t.params["optimizer.lr"] = trials_lrs[i]
            t.params["optimizer.weight_decay"] = 1e-6
            ts.append(t)
        return ts, {
            "lr": np.asarray(trials_lrs[:k], np.float32),
            "wd": np.full(k, 1e-6, np.float32), "ls": np.zeros(k, np.float32),
            "do": np.zeros(k, np.float32), "ma": np.ones(k, np.float32),
            "tm": np.zeros(k, np.float32), "wu": np.zeros(k, np.float32),
        }

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
        ts = []
        for i in range(k):
            t = study.ask()
            t.params["optimizer.lr"] = 5e-3
            t.params["optimizer.weight_decay"] = 1e-6
            t.params["model.dropout"] = trial_dos[i]
            ts.append(t)
        return ts, {
            "lr": np.full(k, 5e-3, np.float32),
            "wd": np.full(k, 1e-6, np.float32), "ls": np.zeros(k, np.float32),
            "do": np.asarray(trial_dos[:k], np.float32),
            "ma": np.ones(k, np.float32),
            "tm": np.zeros(k, np.float32), "wu": np.zeros(k, np.float32),
        }

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


def test_schedule_factor_shapes():
    """Warmup+cosine schedule math (hpo/vmapped.schedule_factor): linear
    ramp over warmup, cosine 1->0 over the rest, T_max=0 => constant."""
    from dlsc_tpu.hpo.vmapped import schedule_factor

    f = lambda c, t, w: float(schedule_factor(c, t, w))
    # no schedule
    assert f(0, 0, 0) == 1.0 and f(500, 0, 0) == 1.0
    # pure cosine (no warmup): 1 at 0, 0.5 at T/2, ~0 at T, floor 0 past T
    assert f(0, 100, 0) == 1.0
    np.testing.assert_allclose(f(50, 100, 0), 0.5, atol=1e-6)
    np.testing.assert_allclose(f(100, 100, 0), 0.0, atol=1e-6)
    np.testing.assert_allclose(f(150, 100, 0), 0.0, atol=1e-6)
    # warmup ramp: 0 at step 0, linear to 1 at warmup end
    assert f(0, 100, 10) == 0.0
    np.testing.assert_allclose(f(5, 100, 10), 0.5, atol=1e-6)
    np.testing.assert_allclose(f(10, 100, 10), 1.0, atol=1e-6)
    # cosine resumes after warmup: midpoint of [10, 100] is 0.5
    np.testing.assert_allclose(f(55, 100, 10), 0.5, atol=1e-6)


def test_schedule_factor_vmaps_per_slot():
    """Per-slot T_max/warmup produce genuinely different LR curves inside
    one vmapped program (VERDICT r3 #5 'assert per-slot LR curves actually
    differ')."""
    import jax

    from dlsc_tpu.hpo.vmapped import schedule_factor

    tms = jnp.asarray([0.0, 100.0, 100.0, 400.0])
    wus = jnp.asarray([0.0, 0.0, 40.0, 0.0])
    counts = jnp.arange(0, 120, 10, dtype=jnp.float32)
    curves = np.asarray(jax.jit(jax.vmap(
        lambda t, w: jax.vmap(lambda c: schedule_factor(c, t, w))(counts)
    ))(tms, wus))
    assert curves.shape == (4, 12)
    # all four curves pairwise distinct
    for i in range(4):
        for j in range(i + 1, 4):
            assert not np.allclose(curves[i], curves[j]), (i, j)
    np.testing.assert_allclose(curves[0], 1.0)  # schedule off


@pytest.mark.slow
def test_vmapped_schedule_shape_is_per_trial(dm, tmp_path):
    """scheduler.T_max / warmup_frac fan out across lockstep slots: the
    per-slot schedule parameters land in the stacked optimizer state, are
    recorded on the trials, and a slot whose entire budget is warmup from
    lr~0 must train worse than a no-schedule slot at the same lr."""
    import jax

    study = Study("vmap_sched", tmp_path / "vs.db", "maximize",
                  sampler=TPESampler(seed=0))
    runner = VmappedTrialRunner(
        study, VTiny(), dm.pipeline, dm, epochs=4, seed=0,
        tmax_space={"low": 1, "high": 50},
        wu_space={"low": 0.0, "high": 1.0},
    )
    spe = dm.steps_per_epoch
    # slot 0: no schedule; slot 1: warmup spans the whole run (lr ramps from
    # ~0 and never gets anywhere near lr0 x a useful factor for long)
    tms = [0.0, float(1000 * spe)]
    wus = [0.0, float(1000 * spe)]

    def fixed_ask(k):
        ts = []
        for i in range(k):
            t = study.ask()
            t.params["optimizer.lr"] = 5e-3
            t.params["optimizer.weight_decay"] = 1e-6
            t.params["scheduler.T_max"] = int(tms[i] // max(spe, 1))
            t.params["scheduler.warmup_frac"] = 1.0 if i else 0.0
            ts.append(t)
        return ts, {
            "lr": np.full(k, 5e-3, np.float32),
            "wd": np.full(k, 1e-6, np.float32), "ls": np.zeros(k, np.float32),
            "do": np.zeros(k, np.float32), "ma": np.ones(k, np.float32),
            "tm": np.asarray(tms[:k], np.float32),
            "wu": np.asarray(wus[:k], np.float32),
        }

    runner._ask_batch = fixed_ask
    result = runner.run_batch(k=2)
    # per-slot schedule params are genuinely in the stacked optimizer state
    hp = result.states.opt_state.hyperparams
    np.testing.assert_allclose(np.asarray(hp["t_max_steps"]), tms)
    np.testing.assert_allclose(np.asarray(hp["warmup_steps"]), wus)
    # the all-warmup slot learned measurably less
    acc0 = result.history[-1]["train_acc"][0]
    acc1 = result.history[-1]["train_acc"][1]
    assert acc0 > acc1 + 0.1, (acc0, acc1)


@pytest.mark.slow
def test_vmapped_schedule_suggested_and_recorded(dm, tmp_path):
    """End-to-end: tmax/wu spaces suggested per trial, recorded in the
    study, run completes."""
    study = Study("vmap_sched2", tmp_path / "vs2.db", "maximize",
                  sampler=TPESampler(seed=5))
    runner = VmappedTrialRunner(
        study, VTiny(), dm.pipeline, dm, epochs=2, seed=5,
        tmax_space={"low": 1, "high": 30},
        wu_space={"low": 0.0, "high": 0.3},
    )
    result = runner.run_batch(k=4)
    assert len(result.trial_numbers) == 4
    for t in study.trials:
        assert 1 <= t.params["scheduler.T_max"] <= 30
        assert 0.0 <= t.params["scheduler.warmup_frac"] <= 0.3
        assert t.state in (TrialState.COMPLETE, TrialState.PRUNED)


def test_wu_space_requires_tmax_space(dm, tmp_path):
    study = Study("vmap_wuerr", tmp_path / "we.db", "maximize",
                  sampler=TPESampler(seed=0))
    with pytest.raises(ValueError, match="tmax_space"):
        VmappedTrialRunner(study, VTiny(), dm.pipeline, dm,
                           wu_space={"low": 0.0, "high": 0.3})
