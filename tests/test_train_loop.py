"""Training-loop integration tests on the virtual 8-device CPU mesh.

Covers: fit/val/test phases, metric names, checkpointing + resume, early
stopping, soft-label losses, overfit-one-batch learnability (SURVEY.md §4
levels 3-5). Uses a small Flax model so CPU CI stays fast; the real model
families are exercised per-model in test_models.py and on TPU by bench.py.
"""

import numpy as np
import pytest

import flax.linen as nn
import jax
import jax.numpy as jnp

from dlsc_tpu.data import ESC50DataModule
from dlsc_tpu.data.synthetic import make_synthetic_dataset
from dlsc_tpu.tracking import Tracker
from dlsc_tpu.train import CrossEntropyLoss, KLDivLoss, Trainer
from dlsc_tpu.train.optim import adam, cosine_annealing


class TinyModel(nn.Module):
    """Small conv+BN+dropout classifier over AST features (exercises
    batch_stats and dropout plumbing without heavyweight compute)."""

    num_classes: int = 10

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: (B, F, T) log-mel
        x = x[..., None]
        x = nn.Conv(8, (5, 5), (3, 3))(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
        x = nn.relu(x)
        x = x.reshape(x.shape[0], -1)
        x = nn.Dropout(0.1, deterministic=not train)(x)
        return nn.Dense(self.num_classes)(x)


@pytest.fixture(scope="module")
def dm_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("synthtrain")
    make_synthetic_dataset(root, num_classes=10, clips_per_class_per_fold=4,
                           clip_samples=8000)
    return root


def _dm(root, **kw):
    kw.setdefault("val_split", 0.2)
    kw.setdefault("batch_size", 16)
    kw.setdefault("preprocessing_mode", "ast")
    kw.setdefault("is_spectrogram", True)
    kw.setdefault("preprocessing_config", {"n_mels": 128})
    # NB: the pipeline auto-selects the pure-JAX mel path on CPU backends
    return ESC50DataModule(root=str(root), num_classes=10, fold=0, **kw)


def test_fit_val_test_cycle(dm_root, tmp_path):
    dm = _dm(dm_root)
    trainer = Trainer(
        max_epochs=8, enable_progress_bar=False,
        checkpoint_dir=tmp_path / "ckpts", seed=0,
    )
    tracker = Tracker("test_exp", root=tmp_path / "runs")
    model = TinyModel()
    state = trainer.fit(
        model, dm, adam(lr=3e-3), cosine_annealing(T_max=8),
        criterion=CrossEntropyLoss(),
        tracker=tracker,
        checkpoint_cfg={"monitor": "val/acc", "mode": "max", "save_top_k": 1},
    )
    m = trainer.logged_metrics
    assert {"train/acc", "train/loss", "val/acc", "val/loss", "lr"} <= set(m)
    assert m["train/acc"] > 0.5, f"failed to learn separable data: {m}"
    assert trainer.ckpt_manager.best_path is not None

    results = trainer.test(dm, tracker=tracker)
    assert {"test/acc", "test/f1", "test/auroc", "test/loss"} <= set(results)
    assert results["confmat"].shape == (10, 10)
    assert results["per_class_acc"].shape == (10,)
    assert results["test/acc"] > 0.3
    # artifacts rendered
    arts = {p.name for p in tracker.artifacts_dir.iterdir()}
    assert {"confmat.png", "per_class_accuracy.png", "test_confmat.npy"} <= arts
    tracker.finish()


def test_checkpointing_disabled_with_save_top_k_zero(tmp_path):
    """save_top_k: 0 must no-op instead of crashing on the empty best-list
    (regression: min() over no saved checkpoints)."""
    from dlsc_tpu.train.checkpoint import CheckpointManager

    mgr = CheckpointManager(tmp_path / "ck", monitor="val/acc", mode="max",
                            save_top_k=0)
    assert mgr.save(None, 0, {"val/acc": 0.5}) is None
    assert mgr.best_path is None
    assert not any((tmp_path / "ck").iterdir())


def test_checkpoint_filename_template(tmp_path):
    """Lightning-style filename template from the reference config
    (base_training.yaml: "epoch-{epoch:02d}-val_acc-{val/acc:.3f}") —
    metric keys may contain '/', which str.format can't address."""
    from dlsc_tpu.train.checkpoint import CheckpointManager, _sanitize

    mgr = CheckpointManager(
        tmp_path / "ck", monitor="val/acc", mode="max", save_top_k=1,
        filename="epoch-{epoch:02d}-val_acc-{val/acc:.3f}")
    name = mgr._format_name(epoch=7, metrics={"val/acc": 0.83456}, value=0.83456)
    assert name == "epoch-07-val_acc-0.835"
    assert _sanitize(name) == "epoch-07-val_acc-0.835"
    # unknown placeholders survive verbatim rather than crashing
    mgr.filename = "e{epoch}-{unknown/metric}"
    assert mgr._format_name(1, {}, 0.0) == "e1-{unknown/metric}"
    # default (filename=None) keeps the derived reference-shaped name
    mgr.filename = None
    assert mgr._format_name(3, {}, 0.25) == "epoch-03-val_acc-0.250"


@pytest.mark.parametrize("impl", [None, "rbg"])
def test_checkpoint_roundtrips_rng_impl(tmp_path, impl):
    """save/restore must round-trip non-default PRNG impls
    ($DLSC_RNG_IMPL=rbg keys are 4×uint32; wrap_key_data defaults to
    threefry and would reject them without the impl= passthrough)."""
    import optax

    from dlsc_tpu.train.checkpoint import CheckpointManager
    from dlsc_tpu.train.state import TrainState

    key = jax.random.key(3, impl=impl) if impl else jax.random.key(3)
    params = {"w": jnp.ones((4, 4))}
    tx = optax.adam(1e-3)
    state = TrainState.create(
        apply_fn=lambda *a, **k: None, params=params, batch_stats=None,
        tx=tx, rng=key)
    state = state.replace(rng=jax.random.fold_in(state.rng, 11))

    mgr = CheckpointManager(tmp_path / "ck", monitor="val/acc", save_top_k=1)
    path = mgr.save(state, epoch=0, metrics={"val/acc": 0.5})
    fresh = TrainState.create(
        apply_fn=lambda *a, **k: None, params=params, batch_stats=None,
        tx=tx, rng=jax.random.key(0, impl=impl) if impl else jax.random.key(0))
    restored = mgr.restore(path, fresh)
    assert str(jax.random.key_impl(restored.rng)) == str(jax.random.key_impl(key))
    np.testing.assert_array_equal(
        jax.random.key_data(restored.rng), jax.random.key_data(state.rng))


@pytest.mark.slow
def test_resume_from_checkpoint(dm_root, tmp_path):
    dm = _dm(dm_root)
    t1 = Trainer(max_epochs=2, enable_progress_bar=False,
                 checkpoint_dir=tmp_path / "c1", seed=0)
    model = TinyModel()
    t1.fit(model, dm, adam(lr=1e-3),
           checkpoint_cfg={"monitor": "val/acc", "mode": "max"})
    best = t1.ckpt_manager.best_path
    assert best is not None

    t2 = Trainer(max_epochs=3, enable_progress_bar=False,
                 checkpoint_dir=tmp_path / "c2", seed=0)
    state = t2.fit(model, dm, adam(lr=1e-3), ckpt_path=str(best))
    # resumed from epoch >= 1 and advanced
    assert int(state.step) > int(2 * dm.steps_per_epoch * 0.9)


def test_early_stopping(dm_root, tmp_path):
    dm = _dm(dm_root)
    trainer = Trainer(max_epochs=50, enable_progress_bar=False,
                      enable_checkpointing=False, seed=0)
    trainer.fit(
        model=TinyModel(), datamodule=dm,
        optim_spec=adam(lr=0.0),  # frozen → no improvement
        early_stop_cfg={"monitor": "val/acc", "mode": "max",
                        "patience": 2, "min_delta": 0.0},
    )
    assert trainer.history[-1]["epoch"] < 49


def test_kldiv_loss_with_bc_mode(dm_root):
    """BC mixing path (waveform mode) with KLDivLoss — the reference's
    recommended pairing (base_training.yaml:75-77)."""
    dm = ESC50DataModule(
        root=str(dm_root), num_classes=10, fold=0, val_split=0.2,
        batch_size=16, preprocessing_mode="envnet_v2", is_spectrogram=False,
        enable_bc_mixing=True,
        preprocessing_config={"window_length": 0.1},
    )

    class WaveNet(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool = False):
            x = x[..., None]
            x = nn.Conv(8, (64,), (16,))(x)
            x = nn.relu(x)
            return nn.Dense(10)(x.mean(axis=1))

    trainer = Trainer(max_epochs=2, enable_progress_bar=False,
                      enable_checkpointing=False, seed=0)
    trainer.fit(WaveNet(), dm, adam(lr=1e-3), criterion=KLDivLoss())
    assert "val/acc" in trainer.logged_metrics


def test_callbacks_and_should_stop(dm_root):
    dm = _dm(dm_root)

    class StopAt1:
        def on_validation_epoch_end(self, trainer, epoch, metrics):
            if epoch >= 1:
                trainer.should_stop = True

    trainer = Trainer(max_epochs=10, enable_progress_bar=False,
                      enable_checkpointing=False, seed=0)
    trainer.fit(TinyModel(), dm, adam(lr=1e-3), callbacks=[StopAt1()])
    assert trainer.history[-1]["epoch"] == 1


@pytest.mark.slow
def test_swa_averaging(dm_root):
    dm = _dm(dm_root)
    trainer = Trainer(max_epochs=4, enable_progress_bar=False,
                      enable_checkpointing=False, seed=0)
    state = trainer.fit(
        TinyModel(), dm, adam(lr=3e-3),
        swa_cfg={"swa_epoch_start": 0.5},
    )
    # SWA averaged the tail epochs and the model still evaluates
    results = trainer.test(dm, state=state, ckpt=None)
    assert 0.0 <= results["test/acc"] <= 1.0


def test_swa_lr_schedule(dm_root):
    """swa_lrs config must shape the LR (VERDICT r1 missing #5): cosine-anneal
    from the scheduled LR at SWA start down to swa_lrs, then hold (reference:
    callbacks.py:71-79 → Lightning SWALR)."""
    import jax.numpy as jnp

    from dlsc_tpu.train.optim import (adam, build_optimizer,
                                      cosine_annealing, swa_lr_wrap)

    spe = 10
    tx, lr_fn = build_optimizer(
        adam(lr=1e-2), cosine_annealing(T_max=20), spe, None,
        swa={"swa_lr": 1e-4, "start_epoch": 10, "annealing_epochs": 5},
    )
    base_tx, base_fn = build_optimizer(
        adam(lr=1e-2), cosine_annealing(T_max=20), spe, None)
    # before SWA start: untouched
    for step in (0, 5 * spe, 9 * spe):
        assert lr_fn(step) == base_fn(step)
    # annealing phase: strictly between swa_lr and the start LR, decreasing
    lr_vals = [lr_fn(e * spe) for e in range(10, 16)]
    assert all(a >= b for a, b in zip(lr_vals, lr_vals[1:]))
    # after annealing completes: holds swa_lr
    assert abs(lr_fn(16 * spe) - 1e-4) < 1e-9
    assert abs(lr_fn(19 * spe) - 1e-4) < 1e-9
    # traced (jnp) variant agrees with the python one
    py_fn, jax_fn = swa_lr_wrap(
        base_fn, lambda s: jnp.asarray(base_fn(int(s))),
        swa_lr=1e-4, start_epoch=10, annealing_epochs=5, steps_per_epoch=spe)
    for step in (0, 95, 105, 130, 190):
        np.testing.assert_allclose(float(jax_fn(step)), py_fn(step), rtol=1e-6)


@pytest.mark.slow
def test_swa_with_lrs_trains(dm_root):
    dm = _dm(dm_root)
    trainer = Trainer(max_epochs=4, enable_progress_bar=False,
                      enable_checkpointing=False, seed=0)
    state = trainer.fit(
        TinyModel(), dm, adam(lr=3e-3),
        swa_cfg={"swa_epoch_start": 0.5, "swa_lrs": 1e-4,
                 "annealing_epochs": 1},
    )
    results = trainer.test(dm, state=state, ckpt=None)
    assert 0.0 <= results["test/acc"] <= 1.0


@pytest.mark.slow
def test_full_fit_sharded_matches_single_device(dm_root):
    """Trainer.fit end-to-end on the 8-device mesh ≡ single device (VERDICT
    r1 #9): guards the loop's sharded _put/donation paths, not just the step
    functions (which test_parallel.py covers)."""
    import jax as _jax

    if _jax.device_count() < 8:
        pytest.skip("needs the 8-device virtual mesh")

    def run(devices):
        dm = _dm(dm_root)
        trainer = Trainer(max_epochs=2, enable_progress_bar=False,
                          enable_checkpointing=False, seed=0, devices=devices)
        trainer.fit(TinyModel(), dm, adam(lr=1e-3))
        return trainer.history

    hist1 = run(1)
    hist8 = run("auto")  # picks the full 8-device mesh
    assert len(hist1) == len(hist8) == 2
    # accuracies must agree exactly; losses to ~1e-3 (Adam's m̂/√v̂ is
    # sign-of-gradient shaped, so cross-device float-reduction reordering
    # compounds slightly over epochs — same rationale as test_parallel.py)
    for h1, h8 in zip(hist1, hist8):
        assert h1["train/acc"] == h8["train/acc"]
        np.testing.assert_allclose(h1["train/loss"], h8["train/loss"],
                                   rtol=1e-3)
        np.testing.assert_allclose(h1["val/acc"], h8["val/acc"], atol=1e-9)
        np.testing.assert_allclose(h1["val/loss"], h8["val/loss"], rtol=1e-3)


@pytest.mark.slow
def test_full_fit_fsdp_matches_single_device(dm_root):
    """Trainer(fsdp=True): ZeRO-3 param+optimizer sharding over the 8-device
    mesh must not change training numerics (GSPMD all-gather/reduce-scatter
    is a layout detail), and big leaves must come out of fit() genuinely
    sharded over 'data'."""
    import jax as _jax

    if _jax.device_count() < 8:
        pytest.skip("needs the 8-device virtual mesh")

    def run(devices, fsdp=False):
        dm = _dm(dm_root)
        trainer = Trainer(max_epochs=2, enable_progress_bar=False,
                          enable_checkpointing=False, seed=0, devices=devices,
                          fsdp=fsdp)
        state = trainer.fit(TinyModel(), dm, adam(lr=1e-3))
        return trainer.history, state

    hist1, _ = run(1)
    hist8, state = run("auto", fsdp=True)
    assert len(hist1) == len(hist8) == 2
    for h1, h8 in zip(hist1, hist8):
        assert h1["train/acc"] == h8["train/acc"]
        np.testing.assert_allclose(h1["train/loss"], h8["train/loss"],
                                   rtol=1e-3)
        np.testing.assert_allclose(h1["val/loss"], h8["val/loss"], rtol=1e-3)
    sharded = [
        l for l in jax.tree_util.tree_leaves(state.params)
        if hasattr(l, "sharding") and "data" in str(l.sharding.spec)
    ]
    assert sharded, "no parameter leaf was FSDP-sharded over 'data'"


@pytest.mark.slow
def test_device_resident_matches_host_path(dm_root):
    """The device-resident dataset mode (pool in device memory, per-step
    index gather) must produce identical training to the host wave-transfer
    path — same batch composition (shared _iter_index) and same math."""

    def run(device_data):
        dm = _dm(dm_root)
        trainer = Trainer(max_epochs=1, enable_progress_bar=False,
                          enable_checkpointing=False, seed=0, devices=1,
                          device_data=device_data)
        trainer.fit(TinyModel(), dm, adam(lr=1e-3))
        assert trainer._use_device_data is bool(device_data)
        return trainer.history[-1]

    h_host = run(False)
    h_dev = run("auto")
    assert h_host["train/acc"] == h_dev["train/acc"]
    np.testing.assert_allclose(h_host["train/loss"], h_dev["train/loss"],
                               rtol=1e-5)
    np.testing.assert_allclose(h_host["val/loss"], h_dev["val/loss"],
                               rtol=1e-5)


@pytest.mark.slow
def test_preflight_hbm_fallback(dm_root, monkeypatch):
    """When the device-resident train step fails the preflight compile with
    an HBM-capacity error, the Trainer must drop the pool, recompile the
    host-streamed step, and complete training (SURVEY §5.3 graceful
    degradation; observed on TPU: AST-Base @ b64 fp32 + ESC-50 pool)."""
    orig = Trainer._compile_steps

    def patched(self, pipeline, criterion, state=None):
        orig(self, pipeline, criterion, state)
        if getattr(self, "_use_device_data", False):
            real = self._train_step

            class _OOMOnLower:
                def lower(self, *a, **k):
                    raise RuntimeError(
                        "XLA:TPU compile permanent error. Ran out of memory "
                        "in memory space hbm. Used 16.99G of 15.75G hbm.")

                def __call__(self, *a, **k):
                    return real(*a, **k)

            self._train_step = _OOMOnLower()

    monkeypatch.setattr(Trainer, "_compile_steps", patched)
    dm = _dm(dm_root)
    trainer = Trainer(max_epochs=1, enable_progress_bar=False,
                      enable_checkpointing=False, seed=0, devices=1,
                      device_data=True)
    trainer.fit(TinyModel(), dm, adam(lr=1e-3))
    assert trainer._use_device_data is False
    assert trainer._pool_dev is None
    assert "train/acc" in trainer.logged_metrics


@pytest.mark.slow
def test_device_resident_pool_cap(dm_root):
    """'auto' must fall back to the host path when the pool exceeds the cap."""
    dm = _dm(dm_root)
    trainer = Trainer(max_epochs=1, enable_progress_bar=False,
                      enable_checkpointing=False, seed=0, devices=1,
                      device_data="auto", device_data_max_bytes=1000)
    trainer.fit(TinyModel(), dm, adam(lr=1e-3))
    assert trainer._use_device_data is False


def test_mean_loss_sample_weighted():
    """mean_loss must weight batches by their valid-sample count (VERDICT r1
    weak #7): a ragged final eval batch must not count like a full one."""
    import jax.numpy as jnp

    from dlsc_tpu.train import metrics as MT

    ms = MT.MetricState.create(3)
    logits = jnp.zeros((4, 3))
    labels = jnp.zeros((4,), jnp.int32)
    ms = ms.update(logits, labels, jnp.asarray(2.0))  # full batch: 4 valid
    mask = jnp.array([True, False, False, False])
    ms = ms.update(logits, labels, jnp.asarray(10.0), mask=mask)  # 1 valid
    # (2·4 + 10·1) / 5 = 3.6, not the batch-mean-of-means (2+10)/2 = 6
    np.testing.assert_allclose(float(MT.mean_loss(ms)), 3.6, rtol=1e-6)


def test_pad_or_trim_op():
    import jax.numpy as jnp
    from dlsc_tpu.ops.augment import pad_or_trim

    x = jnp.arange(10.0)[None]
    short = pad_or_trim(x, 25)
    assert short.shape == (1, 25)
    np.testing.assert_array_equal(np.asarray(short[0, 10:20]), np.arange(10.0))
    long = pad_or_trim(x, 4)
    np.testing.assert_array_equal(np.asarray(long[0]), [3.0, 4.0, 5.0, 6.0])


def test_grad_accum_matches_single_step():
    """accum=4 (lax.scan micro-batching) must reproduce the accum=1 step
    exactly on a deterministic path (no BN/dropout, no augmentation): mean
    of micro-batch gradients == full-batch gradient for mean losses."""
    from dlsc_tpu.data.pipeline import DevicePipeline, PipelineConfig
    from dlsc_tpu.train.metrics import MetricState
    from dlsc_tpu.train.optim import build_optimizer, sgd
    from dlsc_tpu.train.state import TrainState
    from dlsc_tpu.train.steps import make_train_step

    class Plain(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool = False):
            x = x.reshape(x.shape[0], -1)
            return nn.Dense(10)(x)

    pipe = DevicePipeline(PipelineConfig(mode="ast", num_classes=10,
                                         use_pallas=False,
                                         time_mask=0, freq_mask=0))
    model = Plain()
    rng = np.random.default_rng(0)
    wave = jnp.asarray(rng.standard_normal((8, 4000)).astype(np.float32) * 0.3)
    labels = jnp.asarray((np.arange(8) % 10).astype(np.int32))
    feats, _ = jax.jit(pipe.train_batch)(wave[:2], labels[:2], jax.random.key(0))
    v = model.init(jax.random.key(0), feats, train=False)

    def state():
        tx, _ = build_optimizer(sgd(lr=1e-2), None, 4)
        return TrainState.create(apply_fn=model.apply, params=v["params"],
                                 batch_stats=None, tx=tx,
                                 rng=jax.random.key(0))

    crit = CrossEntropyLoss()
    s1, m1, l1 = jax.jit(make_train_step(pipe, crit))(
        state(), MetricState.create(10), wave, labels)
    s4, m4, l4 = jax.jit(make_train_step(pipe, crit, accum=4))(
        state(), MetricState.create(10), wave, labels)
    np.testing.assert_allclose(float(l1), float(l4), rtol=1e-6)
    assert int(m1.count) == int(m4.count) == 8
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s4.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_grad_accum_batch_divisibility():
    from dlsc_tpu.data.pipeline import DevicePipeline, PipelineConfig
    from dlsc_tpu.train.steps import make_train_step

    pipe = DevicePipeline(PipelineConfig(mode="ast", num_classes=10,
                                         use_pallas=False))
    step = make_train_step(pipe, CrossEntropyLoss(), accum=3)
    with pytest.raises(ValueError, match="not divisible"):
        step(None, None, jnp.zeros((8, 4000)), jnp.zeros((8,), jnp.int32))


@pytest.mark.slow
def test_trainer_grad_accum_fit(dm_root):
    """trainer.accumulate_grad_batches=2 end-to-end (incl. BN/dropout models
    and the device-resident indexed path): fits, evaluates, learns."""
    dm = _dm(dm_root)
    trainer = Trainer(max_epochs=2, enable_progress_bar=False,
                      enable_checkpointing=False, seed=0,
                      accumulate_grad_batches=2)
    state = trainer.fit(TinyModel(), dm, adam(lr=3e-3))
    assert int(state.step) == 2 * dm.steps_per_epoch  # one update per batch
    results = trainer.test(dm, state=state, ckpt=None)
    assert 0.0 <= results["test/acc"] <= 1.0


@pytest.mark.slow
def test_full_fit_pipeline_parallel_matches_gspmd(dm_root, tmp_path):
    """`+trainer.pipeline_parallel=S` is a product feature (VERDICT r2 #2):
    Trainer.fit routed through the GPipe pipeline (parallel/pp.py) on the
    8-device mesh must match the plain GSPMD data-parallel path metric for
    metric (dropout=0 → identical math), checkpoint the stage-sharded params,
    and restore them for test()."""
    import jax as _jax

    if _jax.device_count() < 8:
        pytest.skip("needs the 8-device virtual mesh")
    from dlsc_tpu.models.vit import ASTViT

    def vit():
        return ASTViT(num_classes=10, emb_dim=32, depth=4, num_heads=2,
                      patch_size=16, patch_stride=16, overlap=0,
                      dropout=0.0, dtype=jnp.float32, use_flash=False,
                      scan_blocks=True)

    def run(pp, ckdir):
        dm = _dm(dm_root)
        trainer = Trainer(max_epochs=2, enable_progress_bar=False,
                          seed=0, devices="auto", pipeline_parallel=pp,
                          checkpoint_dir=ckdir)
        state = trainer.fit(vit(), dm, adam(lr=1e-3))
        results = trainer.test(dm)  # restores best checkpoint
        return trainer.history, results, state

    hist_dp, res_dp, _ = run(1, tmp_path / "dp")
    hist_pp, res_pp, state = run(2, tmp_path / "pp")
    assert len(hist_dp) == len(hist_pp) == 2
    for h1, h2 in zip(hist_dp, hist_pp):
        assert h1["train/acc"] == h2["train/acc"]
        np.testing.assert_allclose(h1["train/loss"], h2["train/loss"], rtol=1e-3)
        np.testing.assert_allclose(h1["val/acc"], h2["val/acc"], atol=1e-9)
        np.testing.assert_allclose(h1["val/loss"], h2["val/loss"], rtol=1e-3)
    np.testing.assert_allclose(res_dp["test/acc"], res_pp["test/acc"], atol=1e-9)
    np.testing.assert_allclose(res_dp["test/loss"], res_pp["test/loss"], rtol=1e-3)
    # the stacked encoder blocks must actually live stage-sharded
    blk = state.params["blocks"]["block"]
    leaf = jax.tree_util.tree_leaves(blk)[0]
    assert "stage" in str(leaf.sharding.spec), leaf.sharding


def test_pipeline_parallel_knob_validation(dm_root):
    """Clear errors for the illegal PP configurations."""
    with pytest.raises(ValueError, match="expert_parallel"):
        Trainer(pipeline_parallel=2, expert_parallel=2)
    with pytest.raises(ValueError, match="fsdp"):
        Trainer(pipeline_parallel=2, fsdp=True)
    # non-ViT model
    trainer = Trainer(max_epochs=1, pipeline_parallel=2, devices="auto",
                      enable_progress_bar=False, enable_checkpointing=False)
    with pytest.raises(ValueError, match="ViT"):
        trainer.fit(TinyModel(), _dm(dm_root), adam(lr=1e-3))
    # batch divisibility: 8 devices / 2 stages → 4 data shards × 2 micro = 8
    trainer = Trainer(max_epochs=1, pipeline_parallel=2, devices="auto",
                      enable_progress_bar=False, enable_checkpointing=False)
    with pytest.raises(ValueError, match="divisible"):
        from dlsc_tpu.models.vit import ASTViT

        model = ASTViT(num_classes=10, emb_dim=32, depth=4, num_heads=2,
                       patch_size=16, patch_stride=16, overlap=0,
                       dropout=0.0, dtype=jnp.float32, use_flash=False)
        trainer.fit(model, _dm(dm_root, batch_size=12), adam(lr=1e-3))


def test_device_pool_budget_from_live_hbm(dm_root, monkeypatch):
    """device_data='auto' computes the pool budget from live HBM stats
    (VERDICT r2 #6): the same pool fits a roomy 16G part and is refused on
    a nearly-full 8G part — with the arithmetic logged, and the explicit
    cap still honored."""
    import dlsc_tpu.utils.profiling as prof

    def stats_16g():
        return {"dev0": {"bytes_limit": 16_000_000_000,
                         "bytes_in_use": 2_000_000_000,
                         "peak_bytes_in_use": 0}}

    def stats_8g_full():
        return {"dev0": {"bytes_limit": 8_000_000_000,
                         "bytes_in_use": 7_000_000_000,
                         "peak_bytes_in_use": 0}}

    def run(stats_fn):
        monkeypatch.setattr(prof, "device_memory_stats", stats_fn)
        dm = _dm(dm_root)
        trainer = Trainer(max_epochs=1, enable_progress_bar=False,
                          enable_checkpointing=False, seed=0, devices=1,
                          device_data="auto", limit_train_batches=1,
                          limit_val_batches=1)
        trainer.fit(TinyModel(), dm, adam(lr=1e-3))
        return trainer

    # 16G, 2G in use: budget = 14G − 7.2G reserve = 6.8G >> tiny pool → fits
    t = run(stats_16g)
    assert t._use_device_data is True
    b, why = t._device_pool_budget()
    assert b == 16_000_000_000 - 2_000_000_000 - int(0.45 * 16_000_000_000)
    assert "live HBM" in why
    # 8G with 7G in use: budget = 1G − 3.6G reserve → 0 → refuse any pool
    t = run(stats_8g_full)
    assert t._use_device_data is False
    b, _ = t._device_pool_budget()
    assert b == 0
    # explicit cap bypasses the live computation entirely
    trainer = Trainer(device_data_max_bytes=123)
    assert trainer._device_pool_budget() == (123, "explicit cap")


def test_auto_resume_continues_from_latest(dm_root, tmp_path):
    """trainer.auto_resume (§5.3 crash resume): a restarted Trainer discovers
    the newest checkpoint (save_last wins epoch ties), resumes the epoch
    counter/step/optimizer, continues the best-k ledger, and is a no-op on a
    fresh directory."""
    from dlsc_tpu.train.checkpoint import latest_checkpoint

    ckdir = tmp_path / "ck"
    ck_cfg = {"save_top_k": -1, "save_last": True}
    dm = _dm(dm_root)
    t1 = Trainer(max_epochs=2, enable_progress_bar=False, seed=0, devices=1,
                 checkpoint_dir=ckdir)
    s1 = t1.fit(TinyModel(), dm, adam(lr=1e-3), checkpoint_cfg=ck_cfg)
    steps = dm.steps_per_epoch
    assert int(s1.step) == 2 * steps
    assert (ckdir / "last").exists()
    assert latest_checkpoint(ckdir) == ckdir / "last"  # tie → 'last' wins

    # crash-restart: same config, fresh process-equivalent Trainer
    t2 = Trainer(max_epochs=4, enable_progress_bar=False, seed=0, devices=1,
                 checkpoint_dir=ckdir, auto_resume=True)
    s2 = t2.fit(TinyModel(), dm, adam(lr=1e-3), checkpoint_cfg=ck_cfg)
    assert int(s2.step) == 4 * steps
    assert [h["epoch"] for h in t2.history] == [2, 3]  # only the new epochs
    # best-k ledger spans both runs (save_top_k=-1 → 4 epoch dirs + last)
    epoch_dirs = [p for p in ckdir.iterdir()
                  if p.is_dir() and p.name != "last"]
    assert len(epoch_dirs) == 4
    assert t2.ckpt_manager.best_path is not None

    # fresh dir: auto_resume is a no-op
    t3 = Trainer(max_epochs=1, enable_progress_bar=False, seed=0, devices=1,
                 checkpoint_dir=tmp_path / "empty", auto_resume=True)
    t3.fit(TinyModel(), dm, adam(lr=1e-3), checkpoint_cfg=ck_cfg)
    assert [h["epoch"] for h in t3.history] == [0]
