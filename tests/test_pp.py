"""Pipeline parallelism (parallel/pp.py): pipelined ViT ≡ sequential ViT.

Runs on the 8-virtual-device CPU mesh (conftest). The pipelined forward and
its gradients must match the plain single-program forward exactly — GPipe
reorders the schedule, not the math.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dlsc_tpu.models.vit import ASTViT
from dlsc_tpu.parallel.pp import get_pp_mesh, pipeline_blocks, vit_apply_pp


def _tiny_vit(depth=4, dropout=0.0):
    return ASTViT(
        num_classes=7, emb_dim=32, depth=depth, num_heads=2,
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
    # (B, F, T) log-mel-shaped input; F=128 fixed by the model family
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((8, 128, 64)).astype(np.float32)
    )
    variables = _init(model, x)
    return model, x, variables


@pytest.mark.parametrize("n_stages,n_micro", [(4, 2), (2, 2), (4, 1)])
def test_forward_matches_sequential(setup, n_stages, n_micro):
    model, x, variables = setup
    mesh = get_pp_mesh(8, n_stages)
    ref = model.apply(variables, x, train=False)
    out = jax.jit(
        lambda v, x: vit_apply_pp(model, v, x, mesh=mesh, n_micro=n_micro)
    )(variables, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)


def test_grads_match_sequential(setup):
    model, x, variables = setup
    mesh = get_pp_mesh(8, 4)

    def loss_pp(params):
        out = vit_apply_pp(model, {"params": params}, x, mesh=mesh, n_micro=2)
        return jnp.sum(out**2)

    def loss_ref(params):
        out = model.apply({"params": params}, x, train=False)
        return jnp.sum(out**2)

    g_pp = jax.jit(jax.grad(loss_pp))(variables["params"])
    g_ref = jax.jit(jax.grad(loss_ref))(variables["params"])
    flat_pp = jax.tree_util.tree_leaves_with_path(g_pp)
    flat_ref = {jax.tree_util.keystr(p): v
                for p, v in jax.tree_util.tree_leaves_with_path(g_ref)}
    for path, v in flat_pp:
        r = flat_ref[jax.tree_util.keystr(path)]
        denom = np.maximum(np.abs(np.asarray(r)).max(), 1e-6)
        err = np.abs(np.asarray(v) - np.asarray(r)).max() / denom
        assert err < 1e-5, f"{jax.tree_util.keystr(path)}: rel err {err}"


def test_pipeline_blocks_plain_function():
    # pipeline an elementwise affine "block" stack: y = x*w + b per layer —
    # exact equality against the sequential loop
    mesh = get_pp_mesh(8, 4)
    depth, B, N, D = 8, 8, 4, 16
    rng = np.random.default_rng(1)
    params = {
        "w": jnp.asarray(rng.standard_normal((depth, D)).astype(np.float32)),
        "b": jnp.asarray(rng.standard_normal((depth, D)).astype(np.float32)),
    }
    x = jnp.asarray(rng.standard_normal((B, N, D)).astype(np.float32))

    def apply_block(p, h):
        return h * p["w"] + p["b"]

    y = pipeline_blocks(apply_block, params, x, mesh=mesh, n_micro=2)
    ref = x
    for i in range(depth):
        ref = ref * params["w"][i] + params["b"][i]
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_validation_errors(setup):
    model, x, variables = setup
    mesh = get_pp_mesh(8, 4)
    # depth 4 not divisible by 8 stages
    with pytest.raises(ValueError, match="divisible"):
        pipeline_blocks(
            lambda p, h: h, {"w": jnp.zeros((4, 3))},
            jnp.zeros((8, 4, 3)), mesh=get_pp_mesh(8, 8), n_micro=1,
        )
    # batch not divisible by data axis × n_micro
    with pytest.raises(ValueError, match="batch"):
        pipeline_blocks(
            lambda p, h: h, {"w": jnp.zeros((4, 3))},
            jnp.zeros((6, 4, 3)), mesh=mesh, n_micro=2,
        )
    # dropout > 0 in training requires an rng on the pipelined path
    model_d = _tiny_vit(dropout=0.1)
    with pytest.raises(ValueError, match="requires rng"):
        vit_apply_pp(model_d, variables, x, mesh=mesh, n_micro=2, train=True)
    # unrolled layout has no stacked params
    model_u = ASTViT(num_classes=7, emb_dim=32, depth=4, num_heads=2,
                     patch_size=16, patch_stride=16, overlap=0,
                     dropout=0.0, use_flash=False, scan_blocks=False)
    with pytest.raises(ValueError, match="scan_blocks"):
        vit_apply_pp(model_u, variables, x, mesh=mesh, n_micro=2)


def test_dropout_training_with_rng(setup):
    # pipelined training with dropout: deterministic per key, noise actually
    # applied, and grads flow. The stream is folded from (data shard,
    # microbatch, layer) so it is a different stream than the sequential
    # model's — equality is only checked against itself.
    _, x, variables = setup
    model = _tiny_vit(dropout=0.5)
    mesh = get_pp_mesh(8, 4)
    key = jax.random.key(3)

    fwd = jax.jit(lambda v, x, k: vit_apply_pp(
        model, v, x, mesh=mesh, n_micro=2, train=True, rng=k))
    a = fwd(variables, x, key)
    b = fwd(variables, x, key)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = fwd(variables, x, jax.random.key(4))
    assert np.abs(np.asarray(a) - np.asarray(c)).max() > 1e-6
    # eval path (no dropout) differs from the training forward
    ev = jax.jit(lambda v, x: vit_apply_pp(
        model, v, x, mesh=mesh, n_micro=2, train=False))(variables, x)
    assert np.abs(np.asarray(a) - np.asarray(ev)).max() > 1e-6

    def loss(params):
        out = vit_apply_pp(model, {"params": params}, x, mesh=mesh,
                           n_micro=2, train=True, rng=key)
        return jnp.sum(out**2)

    g = jax.jit(jax.grad(loss))(variables["params"])
    assert all(np.isfinite(np.asarray(v)).all()
               for v in jax.tree_util.tree_leaves(g))


def test_remat_model_matches_sequential(setup):
    # the pipelined path must honor the model's remat config (ast/ast_small
    # default remat=True); remat changes scheduling, not math
    _, x, variables = setup
    model = ASTViT(num_classes=7, emb_dim=32, depth=4, num_heads=2,
                   patch_size=16, patch_stride=16, overlap=0, dropout=0.0,
                   dtype=jnp.float32, use_flash=False, scan_blocks=True,
                   remat=True, remat_policy="attn_res")
    mesh = get_pp_mesh(8, 4)

    def loss_pp(params):
        out = vit_apply_pp(model, {"params": params}, x, mesh=mesh,
                           n_micro=2, train=True)
        return jnp.sum(out**2)

    def loss_ref(params):
        out = model.apply({"params": params}, x, train=True,
                          rngs={"dropout": jax.random.key(9)})
        return jnp.sum(out**2)

    (l_pp, g_pp) = jax.jit(jax.value_and_grad(loss_pp))(variables["params"])
    (l_ref, g_ref) = jax.jit(jax.value_and_grad(loss_ref))(variables["params"])
    np.testing.assert_allclose(float(l_pp), float(l_ref), rtol=1e-6)
    leaves_pp = jax.tree_util.tree_leaves(g_pp)
    leaves_ref = jax.tree_util.tree_leaves(g_ref)
    for v, r in zip(leaves_pp, leaves_ref):
        np.testing.assert_allclose(np.asarray(v), np.asarray(r),
                                   rtol=2e-5, atol=1e-6)


def test_embed_finalize_parts_consistent(setup):
    # the part= plumbing must compose back to the full forward
    model, x, variables = setup
    tokens, n_real = model.apply(variables, x, part="embed")
    assert n_real is None  # CPU backend: no encoder padding
    h = tokens
    from dlsc_tpu.models.vit import Block

    blk = Block(model.emb_dim, model.num_heads, dropout=0.0,
                dtype=jnp.float32, use_flash=False)
    stacked = variables["params"]["blocks"]["block"]
    for i in range(model.depth):
        p = jax.tree_util.tree_map(lambda a: a[i], stacked)
        h = blk.apply({"params": p}, h, False)
    out = model.apply(variables, h, part="finalize")
    ref = model.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)
