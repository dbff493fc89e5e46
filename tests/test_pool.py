"""Argmax-capture max pooling (dlsc_tpu/ops/pool.py): forward parity with
nn.max_pool, gradient parity with XLA's select-and-scatter on unique-max
data, remainder handling, and the EnvNetV2 pool_impl A/B."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dlsc_tpu.ops.pool import axis_max_pool, max_pool_grab


def _x(shape, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).standard_normal(shape).astype(np.float32))


@pytest.mark.parametrize("shape,window", [
    ((2, 1, 130, 8), (1, 64)),    # EnvNet front-end shape class + remainder
    ((2, 64, 30, 4), (5, 3)),     # 2-D trunk pool
    ((3, 7, 12, 5), (1, 2)),
    ((2, 10, 9, 3), (2, 3)),
])
def test_forward_matches_nn_max_pool(shape, window):
    x = _x(shape)
    got = max_pool_grab(x, window)
    want = nn.max_pool(x, window, strides=window, padding="VALID")
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("shape,window", [
    ((2, 1, 130, 8), (1, 64)),
    ((2, 64, 30, 4), (5, 3)),
    ((2, 10, 9, 3), (2, 3)),
])
def test_gradient_matches_xla(shape, window):
    x = _x(shape, seed=1)  # random floats: maxima unique w.p. 1

    def loss_grab(x):
        return jnp.sum(max_pool_grab(x, window) ** 2)

    def loss_xla(x):
        return jnp.sum(
            nn.max_pool(x, window, strides=window, padding="VALID") ** 2)

    g1 = jax.grad(loss_grab)(x)
    g2 = jax.grad(loss_xla)(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-6)


def test_remainder_gets_zero_gradient():
    x = _x((1, 1, 10, 2), seed=2)  # window 4 -> 2 windows, 2-col remainder
    g = jax.grad(lambda x: jnp.sum(axis_max_pool(x, 4, 2)))(x)
    assert g.shape == x.shape
    np.testing.assert_array_equal(np.asarray(g[:, :, 8:]), 0.0)
    # each (window, channel) routed exactly one unit of gradient
    assert float(jnp.sum(g)) == 4.0


def test_tie_routes_to_first_max():
    x = jnp.asarray([[[[1.0], [3.0], [3.0], [0.0]]]])  # (1,1,4,1), window 4
    g = jax.grad(lambda x: jnp.sum(axis_max_pool(x, 4, 2)))(x)
    np.testing.assert_array_equal(
        np.asarray(g)[0, 0, :, 0], [0.0, 1.0, 0.0, 0.0])


def test_envnet_pool_impls_agree():
    from dlsc_tpu.models.envnet_v2 import EnvNetV2

    wave = _x((2, 33075), seed=3)  # 0.75 s — small but full layer stack
    grab = EnvNetV2(num_classes=5, pool_impl="grab")
    xla = EnvNetV2(num_classes=5, pool_impl="xla")
    v = grab.init({"params": jax.random.key(0)}, wave, train=False)
    out_g = grab.apply(v, wave, train=False)
    out_x = xla.apply(v, wave, train=False)
    np.testing.assert_allclose(np.asarray(out_g), np.asarray(out_x),
                               rtol=1e-5, atol=1e-5)

    def loss(variables, model):
        out, _ = model.apply(variables, wave, train=True, mutable=["batch_stats"],
                             rngs={"dropout": jax.random.key(1)})
        return jnp.sum(out ** 2)

    g_g = jax.grad(loss)(v, grab)
    g_x = jax.grad(loss)(v, xla)
    for a, b in zip(jax.tree_util.tree_leaves(g_g),
                    jax.tree_util.tree_leaves(g_x)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)
