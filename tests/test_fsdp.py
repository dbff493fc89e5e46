"""FSDP (ZeRO-3-style) sharding: layout rules + numeric parity on the
8-device virtual mesh. New capability beyond the single-device reference
(SURVEY.md §2.7) — GSPMD must make sharded-state training numerically a
layout detail."""

import numpy as np
import pytest

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from dlsc_tpu.parallel import get_mesh, make_plan
from dlsc_tpu.parallel.fsdp import (
    add_data_axis,
    fsdp_shardings,
    fsdp_state_shardings,
    shard_state_fsdp,
)
from dlsc_tpu.train.losses import CrossEntropyLoss
from dlsc_tpu.train.metrics import MetricState
from dlsc_tpu.train.optim import build_optimizer, sgd
from dlsc_tpu.train.state import TrainState


def test_add_data_axis_rules():
    # large divisible leaf: largest dim takes 'data'
    assert add_data_axis(None, (512, 128), 8) == P("data", None)
    # largest dim not divisible -> next one
    assert add_data_axis(None, (513, 256), 8) == P(None, "data")
    # small leaf stays replicated
    assert add_data_axis(None, (64,), 8) == P(None)
    # composes with an existing ('model') spec on a free dim
    assert add_data_axis(P(None, "model"), (512, 128), 8) == P("data", "model")
    # fully-occupied spec unchanged
    assert add_data_axis(P("model", "x"), (512, 128), 8) == P("model", "x")
    # nothing divisible -> replicated over data
    assert add_data_axis(None, (513, 129), 8) == P(None, None)


def test_fsdp_composes_with_tp():
    from dlsc_tpu.models.vit import ASTViT
    from dlsc_tpu.parallel.tp import vit_param_shardings

    model = ASTViT(num_classes=5, emb_dim=64, depth=2, num_heads=2,
                   patch_stride=16, overlap=0, dtype=jnp.float32)
    v = model.init(jax.random.key(0), jnp.zeros((1, 128, 64)), train=False)
    mesh = get_mesh(8, model_parallel=2)
    tp = vit_param_shardings(v["params"], mesh)
    sh = fsdp_shardings(v["params"], mesh, base=tp, min_size=1024)
    qkv = sh["blocks"]["block"]["attn"]["qkv"]["kernel"].spec
    assert "data" in str(qkv) and "model" in str(qkv)
    # small biases keep only their base spec
    small = sh["blocks"]["block"]["attn"]["proj"]["bias"].spec
    assert "data" not in str(small)


class MLP(nn.Module):
    num_classes: int = 10

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Dense(256)(x)
        x = nn.relu(x)
        return nn.Dense(self.num_classes)(x)


def _state():
    model = MLP()
    x0 = jnp.zeros((2, 512))
    v = model.init(jax.random.key(0), x0)
    # SGD: exact parity across layouts (Adam's m̂/√v̂ is reduction-order
    # sensitive near zero — see test_parallel.py)
    tx, _ = build_optimizer(sgd(lr=1e-2, momentum=0.9), None, 4)
    return TrainState.create(apply_fn=model.apply, params=v["params"],
                             batch_stats=None, tx=tx, rng=jax.random.key(0))


def _data():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((16, 512)).astype(np.float32))
    y = jnp.asarray((np.arange(16) % 10).astype(np.int32))
    return x, y


def test_fsdp_training_matches_single_device():
    """Two momentum-SGD steps with params+moments sharded over 8 devices
    reproduce the single-device run; the big leaves are genuinely sharded
    (1/8 addressable shards) and survive the step."""
    crit = CrossEntropyLoss()
    x, y = _data()

    def step(state, x, y):
        def loss_fn(params):
            logits = state.apply_fn({"params": params}, x)
            return crit(logits, jax.nn.one_hot(y, 10))

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads), loss

    s1 = _state()
    f1 = jax.jit(step)
    s1, la1 = f1(s1, x, y)
    s1, lb1 = f1(s1, x, y)

    plan = make_plan(8)
    s8 = _state()
    sh = fsdp_state_shardings(s8, plan.mesh)
    kern_sh = sh.params["Dense_0"]["kernel"]
    assert "data" in str(kern_sh.spec)
    s8 = shard_state_fsdp(s8, plan.mesh)
    shard_shape = s8.params["Dense_0"]["kernel"].addressable_shards[0].data.shape
    assert np.prod(shard_shape) == 512 * 256 // 8
    f8 = jax.jit(step, in_shardings=(sh, plan.batch, plan.batch),
                 out_shardings=(sh, plan.replicated))
    xb, yb = jax.device_put(x, plan.batch), jax.device_put(y, plan.batch)
    s8, la8 = f8(s8, xb, yb)
    s8, lb8 = f8(s8, xb, yb)
    # step-2 loss depends on the step-1 update: layout-independent numerics
    np.testing.assert_allclose(float(la1), float(la8), rtol=1e-5)
    np.testing.assert_allclose(float(lb1), float(lb8), rtol=1e-5)
    # params (and momentum, same shapes) still live in the FSDP layout
    out_kern = s8.params["Dense_0"]["kernel"]
    assert "data" in str(out_kern.sharding.spec)
    np.testing.assert_allclose(
        np.asarray(out_kern), np.asarray(s1.params["Dense_0"]["kernel"]),
        rtol=1e-5, atol=1e-6)
