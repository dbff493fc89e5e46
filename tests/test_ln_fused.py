"""Fused residual-add + LayerNorm kernel (ops/ln_fused.py) vs the jnp
oracle: forward values, all four gradients, and the flax param-shape
contract. Runs the real kernel through the Pallas interpreter on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dlsc_tpu.ops.ln_fused import fused_add_ln


def _oracle(x, delta, gamma, beta, eps=1e-6):
    r = (x + delta).astype(jnp.float32)
    mu = jnp.mean(r, axis=-1, keepdims=True)
    var = jnp.mean((r - mu) ** 2, axis=-1, keepdims=True)
    y = (r - mu) * jax.lax.rsqrt(var + eps) * gamma + beta
    return r.astype(x.dtype), y.astype(x.dtype)


@pytest.mark.parametrize("rows,d", [(64, 256), (48, 384)])
def test_forward_matches_oracle(rows, d):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((rows, d)), jnp.float32)
    delta = jnp.asarray(rng.standard_normal((rows, d)), jnp.float32)
    gamma = jnp.asarray(rng.standard_normal(d), jnp.float32)
    beta = jnp.asarray(rng.standard_normal(d), jnp.float32)
    r, y = fused_add_ln(x, delta, gamma, beta, interpret=True)
    r0, y0 = _oracle(x, delta, gamma, beta)
    np.testing.assert_allclose(r, r0, atol=1e-6)
    np.testing.assert_allclose(y, y0, atol=1e-4)


def test_gradients_match_oracle():
    rows, d = 64, 256
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((rows, d)), jnp.float32)
    delta = jnp.asarray(rng.standard_normal((rows, d)), jnp.float32)
    gamma = jnp.asarray(1 + 0.1 * rng.standard_normal(d), jnp.float32)
    beta = jnp.asarray(0.1 * rng.standard_normal(d), jnp.float32)
    # both outputs contribute to the loss (the residual stream r feeds the
    # next block AND y feeds the MLP — exactly the model's use)
    wr = jnp.asarray(rng.standard_normal((rows, d)), jnp.float32)
    wy = jnp.asarray(rng.standard_normal((rows, d)), jnp.float32)

    def loss_fused(x, delta, gamma, beta):
        r, y = fused_add_ln(x, delta, gamma, beta, interpret=True)
        return jnp.sum(r * wr) + jnp.sum(y * wy)

    def loss_oracle(x, delta, gamma, beta):
        r, y = _oracle(x, delta, gamma, beta)
        return jnp.sum(r * wr) + jnp.sum(y * wy)

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(x, delta, gamma, beta)
    g0 = jax.grad(loss_oracle, argnums=(0, 1, 2, 3))(x, delta, gamma, beta)
    for a, b, name in zip(g1, g0, ["dx", "ddelta", "dgamma", "dbeta"]):
        np.testing.assert_allclose(a, b, atol=2e-3, err_msg=name)


def test_batched_shape_and_bf16():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((4, 16, 256)), jnp.bfloat16)
    delta = jnp.asarray(rng.standard_normal((4, 16, 256)), jnp.bfloat16)
    gamma = jnp.ones(256, jnp.float32)
    beta = jnp.zeros(256, jnp.float32)
    r, y = fused_add_ln(x, delta, gamma, beta, interpret=True)
    assert r.shape == x.shape and y.shape == x.shape
    assert r.dtype == jnp.bfloat16 and y.dtype == jnp.bfloat16
    r0, y0 = _oracle(x, delta, gamma, beta)
    np.testing.assert_allclose(np.asarray(r, np.float32),
                               np.asarray(r0, np.float32), atol=3e-2)
    np.testing.assert_allclose(np.asarray(y, np.float32),
                               np.asarray(y0, np.float32), atol=3e-2)


def test_block_integration_parity(monkeypatch):
    """Block with DLSC_LN_FUSED=1 (fused kernel via interpreter) matches the
    unfused Block bitwise-identically in param tree and closely in values."""
    from dlsc_tpu.models.vit import Block

    B, N, D = 2, 64, 256
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((B, N, D)) * 0.5, jnp.float32)
    blk = Block(D, 4, use_flash=False)
    v = blk.init({"params": jax.random.key(0)}, x, train=False)
    y0 = blk.apply(v, x, train=False)

    monkeypatch.setenv("DLSC_LN_FUSED", "1")
    monkeypatch.setenv("DLSC_ATTN_INTERPRET", "1")
    v1 = blk.init({"params": jax.random.key(0)}, x, train=False)
    assert jax.tree_util.tree_structure(v1) == jax.tree_util.tree_structure(v)
    y1 = blk.apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), atol=1e-4)
