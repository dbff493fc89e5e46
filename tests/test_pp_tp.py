"""pp×tp (parallel/pp_tp.py): pipelined + tensor-parallel ViT ≡ sequential.

Runs on the 8-virtual-device CPU mesh as ('data', 'stage', 'model'). The
composition reorders compute (GPipe schedule) and splits it (Megatron
head/hidden sharding) but must not change the math: forward and gradients
must match the plain single-program model — including through the manual
cotangent plumbing (psum-backward g operator, replicated-grad division).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dlsc_tpu.models.vit import ASTViT
from dlsc_tpu.parallel.pp_tp import get_pp_tp_mesh, vit_apply_pp_tp


def _tiny_vit(depth=4, dropout=0.0, num_heads=2):
    return ASTViT(
        num_classes=7, emb_dim=32, depth=depth, num_heads=num_heads,
        patch_size=16, patch_stride=16, overlap=0,
        dropout=dropout, dtype=jnp.float32, use_flash=False,
        scan_blocks=True,
    )


def _init(model, x):
    return jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        x, train=False,
    )


@pytest.fixture(scope="module")
def setup():
    model = _tiny_vit()
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((8, 128, 64)).astype(np.float32)
    )
    variables = _init(model, x)
    return model, x, variables


@pytest.mark.parametrize("shape,n_micro", [((2, 2, 2), 2), ((1, 4, 2), 1),
                                           ((4, 1, 2), 2)])
def test_forward_matches_sequential(setup, shape, n_micro):
    model, x, variables = setup
    n_data, n_stages, n_tp = shape
    mesh = get_pp_tp_mesh(n_data * n_stages * n_tp, n_stages, n_tp)
    ref = model.apply(variables, x, train=False)
    out = jax.jit(
        lambda v, x: vit_apply_pp_tp(model, v, x, mesh=mesh, n_micro=n_micro)
    )(variables, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)


def test_forward_matches_sequential_bf16(setup):
    # the AST family trains in bf16; _ln's scale/bias arithmetic runs in the
    # model dtype to track flax's promotion — parity within bf16 tolerance
    _, x, variables = setup
    model = ASTViT(
        num_classes=7, emb_dim=32, depth=4, num_heads=2,
        patch_size=16, patch_stride=16, overlap=0,
        dropout=0.0, dtype=jnp.bfloat16, use_flash=False, scan_blocks=True,
    )
    mesh = get_pp_tp_mesh(8, 2, 2)
    ref = model.apply(variables, x, train=False)
    out = jax.jit(
        lambda v, x: vit_apply_pp_tp(model, v, x, mesh=mesh, n_micro=2)
    )(variables, x)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=0.05, atol=0.02,
    )


def test_grads_match_sequential(setup):
    model, x, variables = setup
    mesh = get_pp_tp_mesh(8, 2, 2)

    def loss_tp(params):
        out = vit_apply_pp_tp(model, {"params": params}, x, mesh=mesh,
                              n_micro=2)
        return jnp.sum(out**2)

    def loss_ref(params):
        out = model.apply({"params": params}, x, train=False)
        return jnp.sum(out**2)

    g_tp = jax.jit(jax.grad(loss_tp))(variables["params"])
    g_ref = jax.jit(jax.grad(loss_ref))(variables["params"])
    flat_ref = {jax.tree_util.keystr(p): v
                for p, v in jax.tree_util.tree_leaves_with_path(g_ref)}
    for path, v in jax.tree_util.tree_leaves_with_path(g_tp):
        r = flat_ref[jax.tree_util.keystr(path)]
        denom = np.maximum(np.abs(np.asarray(r)).max(), 1e-6)
        err = np.abs(np.asarray(v) - np.asarray(r)).max() / denom
        assert err < 2e-5, f"{jax.tree_util.keystr(path)}: rel err {err}"


def test_remat_matches_sequential(setup):
    _, x, variables = setup
    model = ASTViT(num_classes=7, emb_dim=32, depth=4, num_heads=2,
                   patch_size=16, patch_stride=16, overlap=0, dropout=0.0,
                   dtype=jnp.float32, use_flash=False, scan_blocks=True,
                   remat=True, remat_policy="attn_res")
    mesh = get_pp_tp_mesh(8, 2, 2)

    def loss_tp(params):
        out = vit_apply_pp_tp(model, {"params": params}, x, mesh=mesh,
                              n_micro=2, train=True)
        return jnp.sum(out**2)

    def loss_ref(params):
        out = model.apply({"params": params}, x, train=True,
                          rngs={"dropout": jax.random.key(9)})
        return jnp.sum(out**2)

    l_tp, g_tp = jax.jit(jax.value_and_grad(loss_tp))(variables["params"])
    l_ref, g_ref = jax.jit(jax.value_and_grad(loss_ref))(variables["params"])
    np.testing.assert_allclose(float(l_tp), float(l_ref), rtol=1e-6)
    for v, r in zip(jax.tree_util.tree_leaves(g_tp),
                    jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(v), np.asarray(r),
                                   rtol=2e-5, atol=1e-6)


def test_dropout_training_with_rng(setup):
    # deterministic per key, noise applied, grads flow; the stream differs
    # from both the sequential model's and plain pp's (hidden/head masks are
    # sharded over 'model'), so equality is only checked against itself
    _, x, variables = setup
    model = _tiny_vit(dropout=0.5)
    mesh = get_pp_tp_mesh(8, 2, 2)
    key = jax.random.key(3)

    fwd = jax.jit(lambda v, x, k: vit_apply_pp_tp(
        model, v, x, mesh=mesh, n_micro=2, train=True, rng=k))
    a = fwd(variables, x, key)
    b = fwd(variables, x, key)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = fwd(variables, x, jax.random.key(4))
    assert np.abs(np.asarray(a) - np.asarray(c)).max() > 1e-6

    def loss(params):
        out = vit_apply_pp_tp(model, {"params": params}, x, mesh=mesh,
                              n_micro=2, train=True, rng=key)
        return jnp.sum(out**2)

    g = jax.jit(jax.grad(loss))(variables["params"])
    assert all(np.isfinite(np.asarray(v)).all()
               for v in jax.tree_util.tree_leaves(g))


def test_validation_errors(setup):
    model, x, variables = setup
    mesh = get_pp_tp_mesh(8, 2, 2)
    # heads not divisible by tp
    model_h = _tiny_vit(num_heads=1)
    with pytest.raises(ValueError, match="num_heads"):
        vit_apply_pp_tp(model_h, variables, x, mesh=mesh, n_micro=2)
    # dropout training requires rng
    model_d = _tiny_vit(dropout=0.1)
    with pytest.raises(ValueError, match="requires rng"):
        vit_apply_pp_tp(model_d, variables, x, mesh=mesh, n_micro=2,
                        train=True)
    # unrolled layout rejected
    model_u = ASTViT(num_classes=7, emb_dim=32, depth=4, num_heads=2,
                     patch_size=16, patch_stride=16, overlap=0, dropout=0.0,
                     use_flash=False, scan_blocks=False)
    with pytest.raises(ValueError, match="scan_blocks"):
        vit_apply_pp_tp(model_u, variables, x, mesh=mesh, n_micro=2)
