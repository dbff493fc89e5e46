"""Model shape/contract tests (SURVEY.md §4 test pyramid, level 2).

Uses reduced input sizes where the architecture allows it to keep CPU CI
fast; full-size contracts (5 s → EnvNet trunk (10, 33)) are asserted via
the flatten dimension.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dlsc_tpu.models import (
    ASTMiniViT,
    ASTViTSmall,
    CNN_ESC50,
    EnvNetV2,
    LeafModel,
)


@pytest.fixture(scope="module")
def key():
    return jax.random.key(0)


@pytest.mark.slow
def test_envnet_v2_contract(key):
    """5 s @ 44.1 kHz → (B, C) logits; trunk must produce 256*10*33 features
    (reference: src/models/envnet_v2.py:49-52)."""
    model = EnvNetV2(num_classes=50)
    x = jnp.zeros((2, 220500))
    vars_ = model.init(key, x, train=False)
    # first classifier Dense must consume 256*10*33 = 84480 features
    dense_in = vars_["params"]["Dense_0"]["kernel"].shape[0]
    assert dense_in == 256 * 10 * 33
    out = model.apply(vars_, x, train=False)
    assert out.shape == (2, 50)
    assert out.dtype == jnp.float32


@pytest.mark.slow
def test_envnet_v2_train_mode_updates_batch_stats(key):
    model = EnvNetV2(num_classes=10)
    x = jax.random.normal(key, (2, 220500)) * 0.1
    vars_ = model.init(key, x, train=False)
    out, mutated = model.apply(
        vars_, x, train=True,
        rngs={"dropout": key}, mutable=["batch_stats"],
    )
    assert out.shape == (2, 10)
    before = vars_["batch_stats"]["_ConvBNRelu_0"]["BatchNorm_0"]["mean"]
    after = mutated["batch_stats"]["_ConvBNRelu_0"]["BatchNorm_0"]["mean"]
    assert not np.allclose(np.asarray(before), np.asarray(after))


@pytest.mark.parametrize("factory,emb", [(ASTViTSmall, 384), (ASTMiniViT, 192)])
def test_ast_from_scratch_contract(key, factory, emb):
    model = factory(num_classes=50, dtype=jnp.float32)
    x = jnp.zeros((2, 128, 128))  # short clip: 128 frames
    vars_ = model.init(key, x, train=False)
    out = model.apply(vars_, x, train=False)
    assert out.shape == (2, 50)
    probs = np.asarray(out)
    assert (probs >= 0).all() and (probs <= 1).all()  # sigmoid head quirk
    assert vars_["params"]["cls_token"].shape == (1, 1, emb)


@pytest.mark.parametrize("factory", [ASTViTSmall, ASTMiniViT])
def test_ast_attention_dropout_zero_keeps_flash_eligible(factory):
    """Training-mode attention must stay on the flash path (VERDICT r1 weak
    #5): attention-weight dropout is 0 (flash has none); regularization comes
    from MLP dropout only. Deviation from reference ast_small.py:22
    documented in models/vit.py."""
    model = factory(num_classes=10)
    assert model.attn_dropout == 0.0
    assert model.dropout == 0.1  # MLP dropout kept


def test_ast_pos_embed_sized_for_10s(key):
    """pos_embed table uses the 10-s t_dim (reference: src/models/ast.py:16)
    and is sliced to the actual token count (:59)."""
    # config values: patch_stride=16, overlap=0 (configs/model/ast_small.yaml)
    model = ASTViTSmall(num_classes=5, patch_stride=16, overlap=0, dtype=jnp.float32)
    x = jnp.zeros((1, 128, 256))
    vars_ = model.init(key, x, train=False)
    n_table = vars_["params"]["pos_embed"].shape[1]
    grid_f = (128 - 16) // 16 + 1
    grid_t = (int(44100 * 10 / 160) + 1 - 16) // 16 + 1
    assert n_table == 1 + grid_f * grid_t
    # shorter input still works (prefix slice)
    out = model.apply(vars_, x, train=False)
    assert out.shape == (1, 5)


def test_gabor_streamed_pool_matches_monolithic(key):
    """GaborConv1d's chunked conv+pool path (pool_stride>0) is numerically
    the monolithic conv → nn.avg_pool composition (the streamed path exists
    because the full-length energy tensor OOMs the training backward on
    TPU at batch 32)."""
    import flax.linen as nn

    from dlsc_tpu.models.leaf import GaborConv1d

    x = jax.random.normal(key, (2, 4000)) * 0.1
    mono = GaborConv1d(n_filters=12, kernel_size=101, pool_stride=0)
    v = mono.init(key, x)
    ref = nn.avg_pool(mono.apply(v, x), (160,), strides=(160,))
    streamed = GaborConv1d(n_filters=12, kernel_size=101, pool_stride=160,
                           chunk_size=800)
    out = streamed.apply(v, x)
    assert out.shape == ref.shape
    assert float(jnp.abs(out - ref).max()) < 1e-5

    # T=4150: (T mod pool) = 150 > half = 50, so n_chunks*chunk < T and the
    # naive right-pad width goes negative (regression: jnp.pad ValueError)
    x2 = jax.random.normal(key, (2, 4150)) * 0.1
    ref2 = nn.avg_pool(mono.apply(v, x2), (160,), strides=(160,))
    out2 = streamed.apply(v, x2)
    assert out2.shape == ref2.shape
    assert float(jnp.abs(out2 - ref2).max()) < 1e-5


def test_leaf_contract(key):
    model = LeafModel(n_filters=32, kernel_size=101, num_classes=50)
    x = jax.random.normal(key, (2, 44100)) * 0.1
    vars_ = model.init(key, x, train=False)
    out = model.apply(vars_, x, train=False)
    assert out.shape == (2, 50)
    # alpha exists as a parameter (state parity quirk) …
    assert "alpha" in vars_["params"]["PCEN_0"]
    # … but is not used: gradient through it must be zero
    def loss(p):
        return model.apply({**vars_, "params": p}, x, train=False).sum()
    g = jax.grad(loss)(vars_["params"])
    assert float(jnp.abs(g["PCEN_0"]["alpha"]).max()) == 0.0
    assert float(jnp.abs(g["PCEN_0"]["delta"]).max()) > 0.0


def test_cnn_esc50_contract(key):
    model = CNN_ESC50(num_classes=50)
    x = jax.random.normal(key, (2, 224, 224))
    vars_ = model.init(key, x, train=False)
    out = model.apply(vars_, x, train=False)
    assert out.shape == (2, 50)


def test_gabor_filters_follow_params(key):
    """Gabor filterbank is rebuilt from parameters inside the jitted graph:
    changing bandwidths must change the output (reference rebuilds filters
    per forward, src/models/leaf.py:20-29). center_freqs have a vanishing
    effect by construction — a reference parameterization quirk (phase
    ≤ ~0.01 rad, see models/leaf.py docstring) — so bandwidths are the
    observable knob."""
    model = LeafModel(n_filters=8, kernel_size=51, num_classes=4)
    x = jax.random.normal(key, (1, 8000)) * 0.1
    vars_ = model.init(key, x, train=False)
    out1 = model.apply(vars_, x, train=False)
    p2 = jax.tree_util.tree_map(lambda a: a, vars_["params"])
    p2["GaborConv1d_0"]["bandwidths"] = p2["GaborConv1d_0"]["bandwidths"] * 0.3
    out2 = model.apply({**vars_, "params": p2}, x, train=False)
    assert not np.allclose(np.asarray(out1), np.asarray(out2))


def test_ast_pretrained_model_sets_trunk_dims():
    """The deit variant name selects trunk capacity, mirroring the reference
    where pretrained_model is the timm model id (src/models/ast.py:19) and an
    HPO dimension (hyperparameter_spaces/models/ast.yaml)."""
    from dlsc_tpu.models.ast import ASTModel

    dims = {
        "deit_tiny_patch16_224": (192, 12, 3),
        "deit_small_patch16_224": (384, 12, 6),
        "deit_base_patch16_224": (768, 12, 12),
        "deit_base_patch16_384": (768, 12, 12),
    }
    for name, (emb, depth, heads) in dims.items():
        m = ASTModel(num_classes=5, pretrained_model=name)
        assert (m.emb_dim, m.depth, m.num_heads) == (emb, depth, heads), name
    # explicit dims override the variant table
    m = ASTModel(num_classes=5, emb_dim=64, depth=2, num_heads=2)
    assert (m.emb_dim, m.depth, m.num_heads) == (64, 2, 2)
    with pytest.raises(ValueError, match="unknown pretrained_model"):
        ASTModel(num_classes=5, pretrained_model="vit_base_patch32_224")


def test_hyper_dropout_rate_override(key):
    """HyperDropout (models/vit.py): with hyper_dropout=True the MLP dropout
    rate is read from the 'hyper' collection at apply time — rate 0 must
    bit-match the deterministic forward, the static-attribute rate must
    bit-match the hyper_dropout=False model, and a high rate must change the
    output (the vmapped HPO per-trial dropout mechanism)."""
    from dlsc_tpu.models.vit import ASTViT

    kw = dict(num_classes=10, emb_dim=32, depth=2, num_heads=2,
              patch_size=16, patch_stride=16, overlap=0, dropout=0.5,
              dtype=jnp.float32, use_flash=False, scan_blocks=True)
    model = ASTViT(hyper_dropout=True, **kw)
    x = jax.random.normal(key, (2, 128, 128)) * 0.3
    variables = model.init(key, x, train=False)
    assert "hyper" in variables
    rates = variables["hyper"]

    def run(rate, train=True):
        hyper = jax.tree_util.tree_map(
            lambda v: jnp.full(v.shape, rate, v.dtype), rates)
        return model.apply({**variables, "hyper": hyper}, x, train=train,
                           rngs={"dropout": jax.random.key(7)})

    out_eval = model.apply(variables, x, train=False)
    # rate 0 under train == deterministic forward (dropout is this model's
    # only train-mode behavior)
    np.testing.assert_array_equal(np.asarray(run(0.0)), np.asarray(out_eval))
    # the collection rate equals the static attribute → bit-match the
    # plain (hyper_dropout=False) model under the same dropout rng
    plain = ASTViT(hyper_dropout=False, **kw)
    out_plain = plain.apply({"params": variables["params"]}, x, train=True,
                            rngs={"dropout": jax.random.key(7)})
    np.testing.assert_array_equal(np.asarray(run(0.5)), np.asarray(out_plain))
    # a high rate actually drops
    assert not np.allclose(np.asarray(run(0.9)), np.asarray(out_eval))


def test_mlp_slice_matches_dense_on_real_rows(key):
    """Block.mlp_slice (VERDICT r2 #5): running LN2+MLP on only the first
    round128(n_real) rows must leave the real-token outputs unchanged — pad
    rows are masked as attention keys and never reach the head, so only
    their own (unused) values differ."""
    from dlsc_tpu.models.vit import Block

    D, H, N, n_real = 32, 2, 384, 130
    x = jax.random.normal(key, (2, N, D)) * 0.5
    blk = Block(D, H, n_real=n_real, use_flash=False, dropout=0.0)
    blk_s = Block(D, H, n_real=n_real, use_flash=False, dropout=0.0,
                  mlp_slice=True)
    v = blk.init(key, x, train=False)
    out = blk.apply(v, x, False)
    out_s = blk_s.apply(v, x, False)
    rows = -(-n_real // 128) * 128
    assert rows < N  # the slice actually engages
    np.testing.assert_allclose(np.asarray(out_s[:, :n_real]),
                               np.asarray(out[:, :n_real]), atol=1e-6)
    # pad rows got no MLP contribution (zero-padded back)
    assert not np.allclose(np.asarray(out_s[:, rows:]),
                           np.asarray(out[:, rows:]))


def test_remat_policy_variants_match_gradients(key):
    """The named-save remat policies (attn_res_qkv / attn_res_fc1) change
    only what is rematerialized, never the math: gradients must match the
    'full' policy exactly."""
    from dlsc_tpu.models.vit import ASTViT

    kw = dict(num_classes=10, emb_dim=32, depth=2, num_heads=2,
              patch_size=16, patch_stride=16, overlap=0, dropout=0.0,
              dtype=jnp.float32, use_flash=False, scan_blocks=True,
              remat=True)
    x = jax.random.normal(key, (2, 128, 128)) * 0.3
    base = ASTViT(remat_policy="full", **kw)
    variables = base.init(key, x, train=False)

    def grads(model):
        def loss(p):
            out = model.apply({"params": p}, x, train=True,
                              rngs={"dropout": jax.random.key(3)})
            return jnp.sum(out.astype(jnp.float32) ** 2)

        return jax.grad(loss)(variables["params"])

    g_full = grads(base)
    for pol in ("attn_res_qkv", "attn_res_fc1"):
        g = grads(ASTViT(remat_policy=pol, **kw))
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6),
            g_full, g)


def test_envnet_bn_barrier_batch_gate():
    """The conv→BN optimization barrier (round-5 bf16-b64 cliff fix) is
    batch- AND train-gated: present in the train jaxpr at b64, absent at
    b32 (which keeps the round-4 graphs bit-identically) and absent in
    EVERY eval graph (running-stats BN has no reduction to protect, and
    the barrier costs ~3-4 ms of eval forward — measured)."""
    import jax
    import jax.numpy as jnp

    from dlsc_tpu.models.envnet_v2 import EnvNetV2

    def jaxpr_for(batch, train=True, **kw):
        m = EnvNetV2(num_classes=5, **kw)
        x = jnp.zeros((batch, 220500))
        v = m.init({"params": jax.random.key(0), "dropout": jax.random.key(1)},
                   x, train=False)
        def apply(p, xx):
            out = m.apply({"params": p, **{k: v[k] for k in v
                                           if k != "params"}},
                          xx, train=train,
                          rngs={"dropout": jax.random.key(2)} if train else {},
                          mutable=["batch_stats"] if train else [])
            return out
        return str(jax.make_jaxpr(apply)(v["params"], x))

    assert "optimization_barrier" in jaxpr_for(64)
    assert "optimization_barrier" not in jaxpr_for(32)
    assert "optimization_barrier" not in jaxpr_for(64, train=False)
    assert "optimization_barrier" in jaxpr_for(32, bn_barrier=True)
    assert "optimization_barrier" not in jaxpr_for(64, bn_barrier=False)
