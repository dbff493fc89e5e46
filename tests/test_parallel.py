"""SPMD correctness on the virtual 8-device mesh (SURVEY.md §7 step 4):
sharded training must match single-device numerics, BatchNorm must see the
global batch, runs must be deterministic."""

import numpy as np
import pytest

import flax.linen as nn
import jax
import jax.numpy as jnp

from dlsc_tpu.data.pipeline import DevicePipeline, PipelineConfig
from dlsc_tpu.parallel import MeshPlan, get_mesh, make_plan
from dlsc_tpu.train.losses import CrossEntropyLoss
from dlsc_tpu.train.metrics import MetricState
from dlsc_tpu.train.optim import adam, build_optimizer
from dlsc_tpu.train.state import TrainState
from dlsc_tpu.train.steps import make_train_step


class BNModel(nn.Module):
    num_classes: int = 10

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x[..., None]
        x = nn.Conv(8, (5, 5), (4, 4))(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
        x = nn.relu(x)
        return nn.Dense(self.num_classes)(x.reshape(x.shape[0], -1))


def _setup(plan=None):
    pipe = DevicePipeline(PipelineConfig(mode="ast", num_classes=10,
                                         use_pallas=False))
    model = BNModel()
    rng = np.random.default_rng(0)
    wave = jnp.asarray(rng.standard_normal((16, 8000)).astype(np.float32) * 0.3)
    labels = jnp.asarray((np.arange(16) % 10).astype(np.int32))
    feats, _ = jax.jit(pipe.train_batch)(wave[:2], labels[:2], jax.random.key(0))
    variables = model.init({"params": jax.random.key(0),
                            "dropout": jax.random.key(1)}, feats, train=False)
    tx, _ = build_optimizer(adam(lr=1e-3), None, 4, 1.0)
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        batch_stats=variables.get("batch_stats"), tx=tx, rng=jax.random.key(0),
    )
    ms = MetricState.create(10)
    step = make_train_step(pipe, CrossEntropyLoss())
    return step, state, ms, wave, labels


def test_sharded_matches_single_device():
    """Loss, gradients, and BN batch stats must agree between a single-device
    run and an 8-way data-parallel run of the same global batch.

    (Parameters after an Adam step are NOT compared: m̂/√v̂ is
    sign-of-gradient shaped, so float-reduction reordering across devices
    legitimately flips near-zero components.)"""
    step, state, ms, wave, labels = _setup()
    pipe = DevicePipeline(PipelineConfig(mode="ast", num_classes=10,
                                         use_pallas=False))
    crit = CrossEntropyLoss()

    def loss_and_grads(state, wave, labels):
        inputs, y = pipe.train_batch(wave, labels, jax.random.key(7))

        def loss_fn(params):
            out, mut = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                inputs, train=True, rngs={"dropout": jax.random.key(8)},
                mutable=["batch_stats"],
            )
            return crit(out, y), mut["batch_stats"]

        (loss, bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        return loss, grads, bs

    loss1, g1, bs1 = jax.jit(loss_and_grads)(state, wave, labels)

    plan = make_plan(8)
    rep, bat = plan.replicated, plan.batch
    sharded = jax.jit(loss_and_grads, in_shardings=(rep, bat, bat),
                      out_shardings=(rep, rep, rep))
    loss8, g8, bs8 = sharded(
        jax.device_put(state, rep),
        jax.device_put(wave, bat), jax.device_put(labels, bat),
    )
    assert np.allclose(float(loss1), float(loss8), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
    # BatchNorm stats match → statistics were computed over the global batch
    for a, b in zip(jax.tree_util.tree_leaves(bs1), jax.tree_util.tree_leaves(bs8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_deterministic_given_seed():
    step, state, ms, wave, labels = _setup()
    f = jax.jit(step)
    _, _, la = f(state, ms, wave, labels)
    step2, state2, ms2, _, _ = _setup()
    _, _, lb = f(state2, ms2, wave, labels)
    assert float(la) == float(lb)


def test_mesh_plan_shapes():
    plan = make_plan(8)
    assert plan.n_data == 8
    assert plan.mesh.shape["model"] == 1
    assert plan.pad_batch(13) == 16
    plan2 = MeshPlan(get_mesh(8, model_parallel=2))
    assert plan2.mesh.shape["data"] == 4 and plan2.mesh.shape["model"] == 2
    with pytest.raises(ValueError):
        get_mesh(8, model_parallel=3)


def test_multi_crop_eval_step():
    """10-crop test path: averaged logits over crops (engine.py:156-159)."""
    from dlsc_tpu.train.steps import make_eval_step

    pipe = DevicePipeline(PipelineConfig(
        mode="envnet_v2", num_classes=10, window_length=0.05,
        multi_crop_test=True, test_crops=10,
    ))

    class WaveNet(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool = False):
            x = nn.Conv(4, (16,), (8,))(x[..., None])
            return nn.Dense(10)(x.reshape(x.shape[0], -1).mean(-1, keepdims=True) * jnp.ones((1, 4)))

    model = WaveNet()
    wave = jax.random.normal(jax.random.key(0), (4, 8000))
    labels = jnp.arange(4) % 10
    crops, _ = pipe.eval_batch(wave, labels)
    assert crops.shape == (4, 10, 2205)
    v = model.init(jax.random.key(0), crops[:, 0], train=False)
    state = TrainState.create(
        apply_fn=model.apply, params=v["params"], batch_stats=None,
        tx=build_optimizer(adam(1e-3), None, 1)[0], rng=jax.random.key(0),
    )
    ms = MetricState.create(10)
    es = jax.jit(make_eval_step(pipe, CrossEntropyLoss()))
    ms, logits = es(state, ms, wave, labels, jnp.ones(4, bool))
    assert logits.shape == (4, 10)
    assert int(ms.count) == 4


@pytest.mark.slow
def test_dp_tp_dryrun():
    """Full dp x tp training step on the 8-device mesh (via __graft_entry__)."""
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


@pytest.mark.slow
def test_sp_tp_matches_single_device():
    """Sequence parallelism (token-sharded residual stream via
    ASTViT.token_sharding) composed with Megatron TP param shardings: one
    train step on a data=2 x model=4 mesh must reproduce single-device
    numerics — the with_sharding_constraint is a layout directive, not math."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from dlsc_tpu.models.vit import ASTViT
    from dlsc_tpu.parallel.tp import vit_param_shardings

    if jax.device_count() < 8:
        pytest.skip("needs the 8-device virtual mesh")

    pipe = DevicePipeline(PipelineConfig(mode="ast", num_classes=10,
                                         use_pallas=False))
    rng = np.random.default_rng(0)
    wave = jnp.asarray(rng.standard_normal((16, 8000)).astype(np.float32) * 0.3)
    labels = jnp.asarray((np.arange(16) % 10).astype(np.int32))

    def run(sp: bool) -> float:
        if sp:
            plan = MeshPlan(get_mesh(8, model_parallel=4))
            tok = NamedSharding(plan.mesh, P("data", "model", None))
        else:
            plan, tok = None, None
        model = ASTViT(num_classes=10, emb_dim=64, depth=2, num_heads=2,
                       patch_stride=16, overlap=0, dropout=0.0,
                       dtype=jnp.float32, token_sharding=tok)
        feats, _ = jax.jit(pipe.train_batch)(wave[:2], labels[:2],
                                             jax.random.key(0))
        variables = jax.jit(model.init, static_argnames=("train",))(
            {"params": jax.random.key(0), "dropout": jax.random.key(1)},
            feats, train=False)
        tx, _ = build_optimizer(adam(lr=1e-3), None, 4, 1.0)
        state = TrainState.create(
            apply_fn=model.apply, params=variables["params"],
            batch_stats=variables.get("batch_stats"), tx=tx,
            rng=jax.random.key(0))
        ms = MetricState.create(10)
        step = make_train_step(pipe, CrossEntropyLoss())
        if sp:
            param_sh = vit_param_shardings(state.params, plan.mesh)
            state = state.replace(params=jax.tree_util.tree_map(
                jax.device_put, state.params, param_sh))
            step = jax.jit(step, in_shardings=(
                None, plan.replicated, plan.batch, plan.batch))
            ms = jax.device_put(ms, plan.replicated)
            w, y = (jax.device_put(wave, plan.batch),
                    jax.device_put(labels, plan.batch))
        else:
            step, w, y = jax.jit(step), wave, labels
        state, ms, loss = step(state, ms, w, y)
        return float(loss)

    np.testing.assert_allclose(run(False), run(True), rtol=2e-5)


def test_tp_sharding_rules():
    from dlsc_tpu.models.vit import ASTViT
    from dlsc_tpu.parallel.tp import vit_param_shardings

    model = ASTViT(num_classes=5, emb_dim=32, depth=2, num_heads=2,
                   patch_stride=16, overlap=0, dtype=jnp.float32)
    v = model.init(jax.random.key(0), jnp.zeros((1, 128, 64)), train=False)
    mesh = get_mesh(8, model_parallel=2)
    sh = vit_param_shardings(v["params"], mesh)
    qkv = sh["blocks"]["block"]["attn"]["qkv"]["kernel"].spec
    assert "model" in str(qkv)
    fc2 = sh["blocks"]["block"]["mlp"]["fc2"]["kernel"].spec
    assert str(fc2).count("model") == 1
    # norms replicated
    assert str(sh["norm"]["scale"].spec) == "PartitionSpec()"


def _run_tp_attention(head_sharded: bool, interpret: bool,
                      monkeypatch) -> float:
    """One train-step loss for a small ASTViT, optionally with head-sharded
    TP attention (shard_map over the 'model' axis) and optionally with the
    real Pallas kernel path via the interpreter (use_flash=True 'works' on
    the CPU mesh only through DLSC_ATTN_INTERPRET)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from dlsc_tpu.models.vit import ASTViT
    from dlsc_tpu.parallel.tp import (
        head_activation_sharding, vit_param_shardings,
    )

    if interpret:
        monkeypatch.setenv("DLSC_ATTN_INTERPRET", "1")
    else:
        monkeypatch.delenv("DLSC_ATTN_INTERPRET", raising=False)

    pipe = DevicePipeline(PipelineConfig(mode="ast", num_classes=10,
                                         use_pallas=False))
    rng = np.random.default_rng(0)
    wave = jnp.asarray(rng.standard_normal((16, 8000)).astype(np.float32) * 0.3)
    labels = jnp.asarray((np.arange(16) % 10).astype(np.int32))

    if head_sharded:
        plan = MeshPlan(get_mesh(8, model_parallel=2))
        head_sh = head_activation_sharding(plan.mesh)
    else:
        plan, head_sh = None, None
    model = ASTViT(num_classes=10, emb_dim=64, depth=2, num_heads=2,
                   patch_stride=16, overlap=0, dropout=0.0,
                   dtype=jnp.float32, use_flash=True,
                   head_sharding=head_sh)
    feats, _ = jax.jit(pipe.train_batch)(wave[:2], labels[:2],
                                         jax.random.key(0))
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        feats, train=False)
    tx, _ = build_optimizer(adam(lr=1e-3), None, 4, 1.0)
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        batch_stats=variables.get("batch_stats"), tx=tx,
        rng=jax.random.key(0))
    ms = MetricState.create(10)
    step = make_train_step(pipe, CrossEntropyLoss())
    if head_sharded:
        param_sh = vit_param_shardings(state.params, plan.mesh)
        state = state.replace(params=jax.tree_util.tree_map(
            jax.device_put, state.params, param_sh))
        step = jax.jit(step, in_shardings=(
            None, plan.replicated, plan.batch, plan.batch))
        ms = jax.device_put(ms, plan.replicated)
        wave, labels = (jax.device_put(wave, plan.batch),
                        jax.device_put(labels, plan.batch))
    else:
        step = jax.jit(step)
    state, ms, loss = step(state, ms, wave, labels)
    return float(loss)


def test_head_sharded_tp_matches_single_device(monkeypatch):
    """TP=2 over attention heads (shard_map'd dense core on CPU) must
    reproduce single-device numerics — heads attend independently."""
    if jax.device_count() < 8:
        pytest.skip("needs the 8-device virtual mesh")
    base = _run_tp_attention(False, False, monkeypatch)
    tp = _run_tp_attention(True, False, monkeypatch)
    np.testing.assert_allclose(base, tp, rtol=2e-5)


@pytest.mark.slow
def test_head_sharded_tp_kernel_path_matches_dense(monkeypatch):
    """use_flash=True under TP=2: the REAL Pallas kernel path (fast fwd +
    fast bwd, ops/attn_fast.py) executes per-shard inside shard_map via the
    interpreter and must match the dense single-device numerics — the
    VERDICT r3 #3 'TP is legal with the kernels' guarantee."""
    if jax.device_count() < 8:
        pytest.skip("needs the 8-device virtual mesh")
    base = _run_tp_attention(False, False, monkeypatch)
    tp_kernel = _run_tp_attention(True, True, monkeypatch)
    np.testing.assert_allclose(base, tp_kernel, rtol=1e-4)
