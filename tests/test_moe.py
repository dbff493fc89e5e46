"""MoE blocks + expert parallelism (models/moe.py, parallel/ep.py).

Beyond-reference capability (SURVEY.md §2.7 audit: "Expert parallelism
(EP) / MoE: absent" in the reference) — these tests pin the routing
semantics (top-k, static capacity, token dropping), the aux-loss plumbing
through the train step, and that EP sharding is numerically a layout
detail on the 8-device virtual mesh."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from dlsc_tpu.models.moe import MoeMlp, MoeSpec, as_moe_spec, collect_moe_aux
from dlsc_tpu.models.vit import ASTViT


def _tokens(B=2, N=16, D=32, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).standard_normal((B, N, D)).astype(np.float32)
    )


def test_moe_mlp_shapes_and_finite():
    x = _tokens()
    m = MoeMlp(32, MoeSpec(n_experts=4, top_k=2))
    v = m.init(jax.random.key(0), x, train=False)
    y = m.apply(v, x, train=False)
    assert y.shape == x.shape
    assert np.all(np.isfinite(np.asarray(y)))


def test_spec_validation_and_dict_normalization():
    with pytest.raises(ValueError):
        MoeSpec(n_experts=2, top_k=3)
    spec = as_moe_spec({"n_experts": 4, "top_k": 1})
    assert isinstance(spec, MoeSpec) and spec.top_k == 1
    assert as_moe_spec(spec) is spec
    assert as_moe_spec(None) is None


def test_identical_experts_match_dense_ffn():
    """With every expert identical and capacity ample, the normalized top-k
    mixture must equal the plain FFN — routing becomes unobservable."""
    B, N, D, F, E = 2, 16, 32, 64, 4
    x = _tokens(B, N, D)
    m = MoeMlp(32, MoeSpec(n_experts=E, top_k=2, capacity_factor=float(E)),
               ratio=2.0)
    v = m.init(jax.random.key(0), x, train=False)
    p = v["params"]
    w1 = np.asarray(p["wi"][0])
    b1 = np.asarray(p["bi"][0])
    w2 = np.asarray(p["wo"][0])
    b2 = np.asarray(p["bo"][0])
    p = dict(p)
    p["wi"] = jnp.asarray(np.tile(w1[None], (E, 1, 1)))
    p["bi"] = jnp.asarray(np.tile(b1[None], (E, 1)))
    p["wo"] = jnp.asarray(np.tile(w2[None], (E, 1, 1)))
    p["bo"] = jnp.asarray(np.tile(b2[None], (E, 1)))
    y = m.apply({"params": p}, x, train=False)
    import flax.linen as nn

    ref = nn.gelu(x @ w1 + b1, approximate=False) @ w2 + b2
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=2e-5)


def test_capacity_drops_tokens_to_zero():
    """Over-capacity tokens get no expert and a zero block output (the Block
    residual passes them through) — the standard Switch drop behavior."""
    B, N, D, E = 1, 16, 32, 2
    x = _tokens(B, N, D)
    # capacity_factor chosen so C == 1: at most E*C = 2 tokens survive
    m = MoeMlp(32, MoeSpec(n_experts=E, top_k=1, capacity_factor=E / N))
    v = m.init(jax.random.key(0), x, train=False)
    y = np.asarray(m.apply(v, x, train=False))
    zero_rows = np.sum(np.all(y == 0.0, axis=-1))
    assert zero_rows >= N - E  # >= N - E*C
    assert zero_rows < N  # but something was routed


def test_pad_tokens_not_routed():
    """Under encoder-wide padding (vit.py n_real), pad tokens must get no
    expert (zero output), steal no capacity, and leave real-token routing
    identical to the unpadded run."""
    B, R, D = 2, 12, 32
    N = 16  # 4 pad tokens
    x = _tokens(B, N, D)
    spec = MoeSpec(n_experts=2, top_k=2, capacity_factor=1.0)
    m_pad = MoeMlp(32, spec, n_real=R)
    m_ref = MoeMlp(32, spec)
    v = m_pad.init(jax.random.key(0), x, train=False)  # shapes are N-free
    y_pad, mut_pad = m_pad.apply(v, x, train=False,
                                 mutable=["intermediates"])
    y_ref, mut_ref = m_ref.apply(v, x[:, :R], train=False,
                                 mutable=["intermediates"])
    # pad rows: exactly zero
    assert np.all(np.asarray(y_pad[:, R:]) == 0.0)
    # real rows: identical routing/outputs to the unpadded run
    np.testing.assert_allclose(np.asarray(y_pad[:, :R]), np.asarray(y_ref),
                               atol=1e-6)
    # aux statistics identical (pad tokens excluded from the means)
    np.testing.assert_allclose(float(collect_moe_aux(mut_pad["intermediates"])),
                               float(collect_moe_aux(mut_ref["intermediates"])),
                               rtol=1e-6)


def test_fsdp_ep_state_shardings_cover_moments():
    """ZeRO + EP: the Adam moments mirroring the expert weights must carry
    the expert-axis sharding too (params and moments: identical decisions)."""
    from dlsc_tpu.parallel import get_mesh
    from dlsc_tpu.parallel.ep import fsdp_ep_state_shardings
    from dlsc_tpu.train.optim import adam, build_optimizer
    from dlsc_tpu.train.state import TrainState

    model = ASTViT(num_classes=5, emb_dim=64, depth=2, num_heads=2,
                   patch_stride=16, overlap=0, dtype=jnp.float32,
                   moe={"n_experts": 4, "top_k": 1}, scan_blocks=True)
    v = model.init(jax.random.key(0), jnp.zeros((1, 128, 64)), train=False)
    tx, _ = build_optimizer(adam(lr=1e-3), None, 1, None)
    state = TrainState.create(apply_fn=model.apply, params=v["params"],
                              batch_stats=None, tx=tx, rng=jax.random.key(0))
    mesh = get_mesh(8, model_parallel=2)
    sh = fsdp_ep_state_shardings(state, mesh)
    wi_p = sh.params["blocks"]["block"]["moe"]["wi"].spec
    assert "model" in str(wi_p) and "data" in str(wi_p)
    # find the Adam mu leaf for the same param and assert the same layout
    found = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(sh.opt_state)[0]:
        keys = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
        if "wi" in keys and "moe" in keys:
            found.append(leaf.spec)
    assert found, "no expert-weight moments found in opt_state"
    assert all("model" in str(s) for s in found), found


def test_dispatch_modes_agree():
    """'scatter' and 'einsum' dispatch share identical routing decisions —
    outputs and gradients must match to fp tolerance, grouped or not."""
    B, N, D = 2, 32, 16
    x = _tokens(B, N, D, seed=5)
    for gs in (32, 8):  # single group and 4 groups
        ms_ = MoeSpec(n_experts=4, top_k=2, capacity_factor=1.1,
                      dispatch="scatter", group_size=gs)
        me = dataclasses.replace(ms_, dispatch="einsum")
        a = MoeMlp(D, ms_, ratio=2.0)
        b = MoeMlp(D, me, ratio=2.0)
        v = a.init(jax.random.key(1), x, train=False)

        def loss(m):
            def f(p):
                return jnp.sum(m.apply({"params": p}, x, train=False) ** 2)
            return jax.value_and_grad(f)(v["params"])

        la, ga = loss(a)
        lb, gb = loss(b)
        np.testing.assert_allclose(float(la), float(lb), rtol=1e-5)
        for pa, pb in zip(jax.tree_util.tree_leaves(ga),
                          jax.tree_util.tree_leaves(gb)):
            np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                                       rtol=2e-4, atol=1e-5)


def test_grouped_capacity_is_per_group():
    """group_size splits routing into independent groups: a group whose
    tokens all pick one expert can only keep C of them, even if other
    groups leave that expert idle."""
    B, N, D, E = 1, 16, 32, 2
    x = _tokens(B, N, D, seed=9)
    # 4 groups of 4, C = ceil(1*4*0.5/2) = 1 → ≤ E*C = 2 tokens per group
    m = MoeMlp(32, MoeSpec(n_experts=E, top_k=1, capacity_factor=0.5,
                           group_size=4))
    v = m.init(jax.random.key(0), x, train=False)
    y = np.asarray(m.apply(v, x, train=False))
    for g in range(4):
        rows = y[0, g * 4:(g + 1) * 4]
        nz = np.sum(~np.all(rows == 0.0, axis=-1))
        assert nz <= 2, f"group {g} kept {nz} tokens (> E*C)"


def test_dispatch_spec_validation():
    with pytest.raises(ValueError, match="dispatch"):
        MoeSpec(n_experts=2, dispatch="magic")
    with pytest.raises(ValueError, match="group_size"):
        MoeSpec(n_experts=2, group_size=0)
    with pytest.raises(ValueError, match="router"):
        MoeSpec(n_experts=2, router="oracle")


def test_expert_choice_equals_dense_at_full_capacity():
    """With C == S (capacity_factor = E/K) every expert takes every token;
    identical experts + gates summing to 1 ⇒ output == plain FFN."""
    B, N, D, E, K = 2, 16, 32, 4, 2
    x = _tokens(B, N, D, seed=11)
    m = MoeMlp(32, MoeSpec(n_experts=E, top_k=K, capacity_factor=E / K,
                           router="expert"), ratio=2.0)
    v = m.init(jax.random.key(0), x, train=False)
    p = dict(v["params"])
    w1, b1 = np.asarray(p["wi"][0]), np.asarray(p["bi"][0])
    w2, b2 = np.asarray(p["wo"][0]), np.asarray(p["bo"][0])
    p["wi"] = jnp.asarray(np.tile(w1[None], (E, 1, 1)))
    p["bi"] = jnp.asarray(np.tile(b1[None], (E, 1)))
    p["wo"] = jnp.asarray(np.tile(w2[None], (E, 1, 1)))
    p["bo"] = jnp.asarray(np.tile(b2[None], (E, 1)))
    y = m.apply({"params": p}, x, train=False)
    import flax.linen as nn

    ref = nn.gelu(x @ w1 + b1, approximate=False) @ w2 + b2
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=2e-5)


def test_expert_choice_pad_exclusion():
    """Expert-choice never picks encoder pad tokens (they rank below every
    real gate), and real-token routing matches the unpadded run."""
    B, R, D = 2, 12, 32
    N = 16
    x = _tokens(B, N, D, seed=13)
    spec = MoeSpec(n_experts=2, top_k=2, capacity_factor=0.5, router="expert")
    m_pad = MoeMlp(32, spec, n_real=R)
    m_ref = MoeMlp(32, spec)
    v = m_pad.init(jax.random.key(0), x, train=False)
    y_pad = m_pad.apply(v, x, train=False)
    y_ref = m_ref.apply(v, x[:, :R], train=False)
    assert np.all(np.asarray(y_pad[:, R:]) == 0.0)
    np.testing.assert_allclose(np.asarray(y_pad[:, :R]), np.asarray(y_ref),
                               atol=1e-6)


def test_expert_choice_router_grad_and_aux():
    x = _tokens()
    m = MoeMlp(32, MoeSpec(n_experts=4, top_k=2, router="expert"))
    v = m.init(jax.random.key(0), x, train=False)

    def loss(params):
        y, mut = m.apply({"params": params}, x, train=False,
                         mutable=["intermediates"])
        return jnp.sum(y**2) + collect_moe_aux(mut["intermediates"])

    g = jax.grad(loss)(v["params"])
    assert float(jnp.sum(jnp.abs(g["router"]["kernel"]))) > 0.0
    # aux is the z-loss only (no balance term): small and positive
    _, mut = m.apply(v, x, train=False, mutable=["intermediates"])
    aux = float(collect_moe_aux(mut["intermediates"]))
    assert 0.0 < aux < 1.0


def test_astvit_expert_choice_integration():
    model = ASTViT(num_classes=5, emb_dim=32, depth=2, num_heads=2,
                   patch_stride=16, overlap=0, dtype=jnp.float32,
                   moe={"n_experts": 2, "top_k": 1, "router": "expert"})
    x = jnp.zeros((2, 128, 32))
    v = model.init(jax.random.key(0), x, train=False)
    out = model.apply(v, x, train=False)
    assert out.shape == (2, 5)
    assert np.all(np.isfinite(np.asarray(out)))


def test_router_gradient_flows():
    x = _tokens()
    m = MoeMlp(32, MoeSpec(n_experts=4, top_k=2))
    v = m.init(jax.random.key(0), x, train=False)

    def loss(params):
        y, mut = m.apply({"params": params}, x, train=False,
                         mutable=["intermediates"])
        return jnp.sum(y**2) + collect_moe_aux(mut["intermediates"])

    g = jax.grad(loss)(v["params"])
    assert float(jnp.sum(jnp.abs(g["router"]["kernel"]))) > 0.0
    assert float(jnp.sum(jnp.abs(g["wi"]))) > 0.0


def test_aux_loss_sown_and_collected_under_scan():
    model = ASTViT(num_classes=5, emb_dim=32, depth=3, num_heads=2,
                   patch_stride=16, overlap=0, dtype=jnp.float32,
                   moe={"n_experts": 4, "top_k": 1}, scan_blocks=True)
    x = jnp.zeros((2, 128, 32))
    v = model.init(jax.random.key(0), x, train=False)
    _, mut = model.apply(v, x, train=False, mutable=["intermediates"])
    aux = collect_moe_aux(mut["intermediates"])
    # load-balance loss is >= aux_weight * 1.0 by Cauchy-Schwarz (E*sum(f*p)
    # >= 1 when f == p is uniform it equals 1), z-loss >= 0
    assert float(aux) > 0.0
    # sown leaf is stacked along depth by the scan
    leaves = jax.tree_util.tree_leaves(mut["intermediates"])
    assert any(l.shape[0] == 3 for l in leaves)
    # eval-style apply without mutable works (sow is a no-op)
    out = model.apply(v, x, train=False)
    assert out.shape == (2, 5)


def test_quant_rejects_moe():
    model = ASTViT(num_classes=5, emb_dim=32, depth=1, num_heads=2,
                   patch_stride=16, overlap=0, quant="w8a8",
                   moe={"n_experts": 2})
    with pytest.raises(ValueError, match="MoE"):
        model.init(jax.random.key(0), jnp.zeros((1, 128, 32)), train=False)


def test_ep_sharding_rules():
    from dlsc_tpu.parallel import get_mesh
    from dlsc_tpu.parallel.ep import moe_param_shardings
    from dlsc_tpu.parallel.tp import vit_param_shardings

    model = ASTViT(num_classes=5, emb_dim=64, depth=2, num_heads=2,
                   patch_stride=16, overlap=0, dtype=jnp.float32,
                   moe={"n_experts": 4, "top_k": 1}, scan_blocks=True)
    v = model.init(jax.random.key(0), jnp.zeros((1, 128, 64)), train=False)
    mesh = get_mesh(8, model_parallel=2)
    base = vit_param_shardings(v["params"], mesh)
    sh = moe_param_shardings(v["params"], mesh, base=base)
    blk = sh["blocks"]["block"]
    # scan-stacked expert kernels: (L, E, D, F) -> expert dim 1 on 'model'
    assert blk["moe"]["wi"].spec == P(None, "model", None, None)
    assert blk["moe"]["wo"].spec == P(None, "model", None, None)
    assert blk["moe"]["bi"].spec == P(None, "model", None)
    # router replicated
    assert blk["moe"]["router"]["kernel"].spec == P()
    # base (TP) shardings preserved for non-MoE leaves
    assert "model" in str(blk["attn"]["qkv"]["kernel"].spec)


def test_ep_train_step_matches_replicated():
    """A full train step with experts sharded over 'model' must match the
    same step with everything replicated — EP is a layout detail."""
    from dlsc_tpu.data.pipeline import DevicePipeline, PipelineConfig
    from dlsc_tpu.parallel import MeshPlan, get_mesh
    from dlsc_tpu.parallel.ep import expert_sharding, moe_param_shardings
    from dlsc_tpu.train.losses import CrossEntropyLoss
    from dlsc_tpu.train.metrics import MetricState
    from dlsc_tpu.train.optim import adam, build_optimizer, cosine_annealing
    from dlsc_tpu.train.state import TrainState
    from dlsc_tpu.train.steps import make_train_step

    plan = MeshPlan(get_mesh(8, model_parallel=2))
    pipe = DevicePipeline(PipelineConfig(mode="ast", num_classes=10,
                                         use_pallas=False))
    B = 8
    wave = jnp.asarray(
        np.random.default_rng(0).standard_normal((B, 8000)).astype(np.float32))
    labels = jnp.arange(B, dtype=jnp.int32) % 10

    def build(ep: bool):
        model = ASTViT(
            num_classes=10, emb_dim=64, depth=2, num_heads=2,
            patch_stride=16, overlap=0, dtype=jnp.float32, dropout=0.0,
            moe={"n_experts": 4, "top_k": 2},
            expert_sharding=expert_sharding(plan.mesh) if ep else None,
        )
        feats, _ = jax.jit(pipe.train_batch)(wave[:2], labels[:2],
                                             jax.random.key(0))
        v = jax.jit(model.init, static_argnames=("train",))(
            {"params": jax.random.key(0), "dropout": jax.random.key(1)},
            feats, train=False)
        tx, _ = build_optimizer(adam(lr=1e-3), cosine_annealing(T_max=5), 2,
                                None)
        return TrainState.create(apply_fn=model.apply, params=v["params"],
                                 batch_stats=None, tx=tx,
                                 rng=jax.random.key(0))

    # replicated run
    state_r = build(ep=False)
    step_r = jax.jit(make_train_step(pipe, CrossEntropyLoss()))
    _, _, loss_r = step_r(state_r, MetricState.create(10), wave, labels)

    # EP run: experts over 'model', batch over 'data'
    state_e = build(ep=True)
    param_sh = moe_param_shardings(state_e.params, plan.mesh)
    state_e = state_e.replace(params=jax.tree_util.tree_map(
        jax.device_put, state_e.params, param_sh))
    rep, bat = plan.replicated, plan.batch
    step_e = jax.jit(make_train_step(pipe, CrossEntropyLoss()),
                     in_shardings=(None, rep, bat, bat))
    new_state, _, loss_e = step_e(
        state_e, jax.device_put(MetricState.create(10), rep),
        jax.device_put(wave, bat), jax.device_put(labels, bat))
    np.testing.assert_allclose(float(loss_r), float(loss_e), rtol=1e-5)
    # expert layout survived the update
    wi = new_state.params["blocks"]["block"]["moe"]["wi"]
    assert "model" in str(wi.sharding.spec)
    # router moved (aux loss reached the optimizer)
    rk0 = np.asarray(state_r.params["blocks"]["block"]["moe"]["router"]["kernel"])
    rk1 = np.asarray(new_state.params["blocks"]["block"]["moe"]["router"]["kernel"])
    assert not np.allclose(rk0, rk1)


def test_moe_learns_routing():
    """Two input clusters with different target linear maps: a top-1
    2-expert MoE can only fit both by learning to route — the router is a
    single linear gate, so the mixture must specialize."""
    import optax

    rng = np.random.default_rng(7)
    D, N = 8, 256
    half = N // 2
    xa = rng.standard_normal((half, D)) + 3.0   # cluster A (shifted)
    xb = rng.standard_normal((half, D)) - 3.0   # cluster B
    Wa = rng.standard_normal((D, D)) * 0.5
    Wb = -Wa                                    # opposite map
    x = jnp.asarray(np.concatenate([xa, xb])[None].astype(np.float32))
    y = jnp.asarray(
        np.concatenate([xa @ Wa, xb @ Wb])[None].astype(np.float32))

    m = MoeMlp(D, MoeSpec(n_experts=2, top_k=1, capacity_factor=2.0,
                          aux_weight=1e-2), ratio=2.0)
    params = m.init(jax.random.key(0), x, train=False)["params"]
    tx = optax.adam(1e-2)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            out, mut = m.apply({"params": p}, x, train=False,
                               mutable=["intermediates"])
            return (jnp.mean((out - y) ** 2)
                    + collect_moe_aux(mut["intermediates"]))

        loss, g = jax.value_and_grad(loss_fn)(params)
        up, opt = tx.update(g, opt)
        return optax.apply_updates(params, up), opt, loss

    params, opt, loss0 = step(params, opt)
    for _ in range(300):
        params, opt, loss = step(params, opt)
    assert float(loss) < 0.25 * float(loss0), (float(loss0), float(loss))


def _moe_pp_fixture(depth=4, top_k=1, batch=8, remat=False):
    from dlsc_tpu.models.moe import collect_moe_aux

    model = ASTViT(num_classes=10, emb_dim=32, depth=depth, num_heads=2,
                   patch_size=16, patch_stride=16, overlap=0,
                   dropout=0.0, dtype=jnp.float32, use_flash=False,
                   scan_blocks=True, remat=remat,
                   moe={"n_experts": 2, "top_k": top_k})
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((batch, 128, 32)).astype(np.float32))
    y = jax.nn.one_hot(jnp.arange(batch) % 10, 10)
    v = model.init(jax.random.key(0), x, train=False)

    def seq_loss(params):
        logits, mut = model.apply(
            {"params": params}, x, train=True, mutable=["intermediates"])
        ce = -jnp.mean(jnp.sum(y * jax.nn.log_softmax(logits), axis=-1))
        return ce + collect_moe_aux(mut.get("intermediates"))

    return model, x, y, v, seq_loss


def test_pp_moe_inference_matches_sequential():
    """MoE blocks ride the GPipe pipeline for inference (self-contained block
    math)."""
    from dlsc_tpu.parallel.pp import get_pp_mesh, vit_apply_pp

    if jax.device_count() < 8:
        pytest.skip("needs the 8-device virtual mesh")
    model, x, _, v, _ = _moe_pp_fixture()
    seq = model.apply(v, x, train=False)
    mesh = get_pp_mesh(8, 2)
    pp = vit_apply_pp(model, v, x, mesh=mesh, n_micro=2, train=False)
    np.testing.assert_allclose(np.asarray(pp), np.asarray(seq), atol=1e-5)


def test_pp_tp_moe_matches_sequential():
    """MoE under pp×tp: the expert hidden dim is the Megatron split (wi/bi
    column-, wo row-parallel, router replicated — parallel/pp_tp.py). On
    (data=1, stage=2, model=2, n_micro=1) inference output, training loss
    and the full gradient tree are exactly the sequential model's."""
    from dlsc_tpu.parallel.pp_tp import get_pp_tp_mesh, vit_apply_pp_tp

    if jax.device_count() < 4:
        pytest.skip("needs >= 4 devices")
    model, x, y, v, seq_loss = _moe_pp_fixture(top_k=2)
    mesh = get_pp_tp_mesh(4, 2, 2)

    seq = model.apply(v, x, train=False)
    out = vit_apply_pp_tp(model, v, x, mesh=mesh, n_micro=1, train=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(seq), atol=1e-5)

    def pp_loss(params):
        logits, aux = vit_apply_pp_tp(
            model, {"params": params}, x, mesh=mesh, n_micro=1, train=True)
        ce = -jnp.mean(jnp.sum(y * jax.nn.log_softmax(logits), axis=-1))
        return ce + aux

    ls, gs = jax.value_and_grad(seq_loss)(v["params"])
    lp, gp = jax.value_and_grad(pp_loss)(v["params"])
    np.testing.assert_allclose(float(lp), float(ls), rtol=2e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5),
        gp, gs)


def test_pp_moe_train_exact_parity_single_shard():
    """MoE TRAINING through the pipeline: with one data shard and one
    microbatch the (logits, aux) pair and the full gradient tree are exactly
    the sequential model's (routing is per-sample; the aux token means see
    the whole batch)."""
    from dlsc_tpu.parallel.pp import get_pp_mesh, vit_apply_pp

    if jax.device_count() < 2:
        pytest.skip("needs >= 2 devices")
    model, x, y, v, seq_loss = _moe_pp_fixture()
    mesh = get_pp_mesh(2, 2)  # data=1, stage=2

    def pp_loss(params):
        logits, aux = vit_apply_pp(
            model, {"params": params}, x, mesh=mesh, n_micro=1, train=True)
        ce = -jnp.mean(jnp.sum(y * jax.nn.log_softmax(logits), axis=-1))
        return ce + aux

    ls, gs = jax.value_and_grad(seq_loss)(v["params"])
    lp, gp = jax.value_and_grad(pp_loss)(v["params"])
    np.testing.assert_allclose(float(lp), float(ls), rtol=2e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5),
        gp, gs)


def test_pp_moe_train_microbatched():
    """Microbatched + data-sharded MoE pp-training: the aux estimator is the
    mean of per-(microbatch, shard) terms — finite, positive (z-loss > 0 for
    any router), with gradient flowing into the router and experts."""
    from dlsc_tpu.parallel.mesh import path_keys
    from dlsc_tpu.parallel.pp import get_pp_mesh, vit_apply_pp

    if jax.device_count() < 8:
        pytest.skip("needs the 8-device virtual mesh")
    # remat=True covers the nn.remat(Block) + mutable-intermediates apply
    # inside the pipeline's shard_map (the ast_moe default config)
    model, x, y, v, seq_loss = _moe_pp_fixture(top_k=2, remat=True)
    mesh = get_pp_mesh(8, 2)  # data=4, stage=2

    def pp_loss(params):
        logits, aux = vit_apply_pp(
            model, {"params": params}, x, mesh=mesh, n_micro=2, train=True)
        ce = -jnp.mean(jnp.sum(y * jax.nn.log_softmax(logits), axis=-1))
        return ce + aux, aux

    (loss, aux), grads = jax.value_and_grad(pp_loss, has_aux=True)(
        v["params"])
    assert np.isfinite(float(loss)) and np.isfinite(float(aux))
    assert float(aux) > 0.0
    # the estimator stays close to the sequential full-batch loss (same
    # z-loss exactly; balance term differs only via mean-of-products)
    ls = seq_loss(v["params"])
    assert abs(float(loss) - float(ls)) / float(ls) < 0.05
    seen = {"router": 0.0, "wi": 0.0, "wo": 0.0}
    for path, g in jax.tree_util.tree_flatten_with_path(grads)[0]:
        for k in path_keys(path):
            if k in seen:
                seen[k] += float(jnp.sum(jnp.abs(g)))
    for k, s in seen.items():
        assert s > 0.0, f"no gradient reached MoE param group {k!r}"


def test_serving_export_roundtrip_moe(tmp_path):
    """jax.export of the MoE inference path (top-k + scatter/gather dispatch
    lower to StableHLO) round-trips through load_exported."""
    from dlsc_tpu.data.pipeline import DevicePipeline, PipelineConfig
    from dlsc_tpu.serving import export_model, load_exported, make_infer

    CLIP = 8000
    model = ASTViT(num_classes=7, emb_dim=32, depth=2, num_heads=2,
                   patch_size=16, patch_stride=16, overlap=0,
                   dropout=0.0, dtype=jnp.float32, use_flash=False,
                   moe={"n_experts": 2, "top_k": 2})
    pipe = DevicePipeline(PipelineConfig(mode="ast", num_classes=7))
    wave = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, CLIP)).astype(np.float32))
    feats, _ = jax.jit(pipe.eval_batch)(
        wave, jnp.zeros((wave.shape[0],), jnp.int32))
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        feats, train=False)
    direct = jax.jit(make_infer(model, pipe))(variables, wave)
    art = export_model(model, pipe, variables, tmp_path / "art",
                       batch=2, clip_samples=CLIP, platforms=("cpu",))
    probs = load_exported(art)(wave)
    np.testing.assert_allclose(np.asarray(probs), np.asarray(direct),
                               rtol=1e-6, atol=1e-7)


def test_hpo_space_loads_for_ast_moe():
    """models/ast_moe.yaml resolves from the model _target_ and carries the
    routing hyperparameters."""
    from pathlib import Path

    from dlsc_tpu.config import compose
    from dlsc_tpu.hpo.space import HyperparameterSpace

    root = Path(__file__).resolve().parent.parent
    cfg = compose(root / "configs", "optimization", ["model=ast_moe"])
    space = HyperparameterSpace.from_model_config(
        cfg, root / "configs/optimization/hyperparameter_spaces")
    assert "model.n_experts" in space.space
    assert "model.top_k" in space.space
    assert space.space["model.aux_weight"]["type"] == "float"


@pytest.mark.slow
def test_trainer_expert_parallel_fit(tmp_path):
    """`+trainer.expert_parallel=2` end-to-end: Trainer builds the
    ('data','model') mesh, injects the dispatch-buffer sharding, and fit()
    leaves the stacked expert weights genuinely sharded over 'model'."""
    from dlsc_tpu.data import ESC50DataModule
    from dlsc_tpu.data.synthetic import make_synthetic_dataset
    from dlsc_tpu.train import Trainer
    from dlsc_tpu.train.optim import adam

    if jax.device_count() < 8:
        pytest.skip("needs the 8-device virtual mesh")
    root = tmp_path / "synth"
    make_synthetic_dataset(root, num_classes=10, clips_per_class_per_fold=2,
                           clip_samples=8000)
    dm = ESC50DataModule(root=str(root), num_classes=10, fold=0,
                         val_split=0.2, batch_size=8,
                         preprocessing_mode="ast", is_spectrogram=True,
                         preprocessing_config={"n_mels": 128})
    model = ASTViT(num_classes=10, emb_dim=32, depth=2, num_heads=2,
                   patch_stride=16, overlap=0, dtype=jnp.float32,
                   moe={"n_experts": 2, "top_k": 1})
    trainer = Trainer(max_epochs=1, enable_progress_bar=False,
                      enable_checkpointing=False, seed=0,
                      expert_parallel=2)
    state = trainer.fit(model, dm, adam(lr=1e-3))
    wi = state.params["blocks"]["block"]["moe"]["wi"]
    assert "model" in str(wi.sharding.spec), wi.sharding
    assert np.isfinite(trainer.logged_metrics["train/loss"])

    # non-MoE model: loud error instead of a silent no-op
    from tests.test_train_loop import TinyModel

    with pytest.raises(ValueError, match="MoE"):
        Trainer(max_epochs=1, expert_parallel=2,
                enable_progress_bar=False,
                enable_checkpointing=False).fit(TinyModel(), dm, adam(lr=1e-3))

    # indivisible expert count: loud error instead of silent GSPMD padding
    odd = model.clone(moe={"n_experts": 3, "top_k": 1})
    with pytest.raises(ValueError, match="divisible"):
        Trainer(max_epochs=1, expert_parallel=2,
                enable_progress_bar=False,
                enable_checkpointing=False).fit(odd, dm, adam(lr=1e-3))


@pytest.mark.slow
def test_vmapped_hpo_with_moe(tmp_path):
    """MoE under vmap (the lockstep multi-trial runner): top-k / cumsum /
    scatter dispatch / aux-loss collection must all vmap over the trial
    axis."""
    from dlsc_tpu.data import ESC50DataModule
    from dlsc_tpu.data.synthetic import make_synthetic_dataset
    from dlsc_tpu.hpo import Study, TPESampler, TrialState
    from dlsc_tpu.hpo.vmapped import VmappedTrialRunner

    root = tmp_path / "vsynth"
    make_synthetic_dataset(root, num_classes=10, clips_per_class_per_fold=2,
                           clip_samples=8000)
    dm = ESC50DataModule(root=str(root), num_classes=10, fold=0,
                         val_split=0.2, batch_size=16,
                         preprocessing_mode="ast", is_spectrogram=True)
    model = ASTViT(num_classes=10, emb_dim=32, depth=2, num_heads=2,
                   patch_stride=16, overlap=0, dtype=jnp.float32,
                   moe={"n_experts": 2, "top_k": 1})
    study = Study("vmap_moe", tmp_path / "v.db", "maximize",
                  sampler=TPESampler(seed=0))
    runner = VmappedTrialRunner(
        study, model, dm.pipeline, dm, epochs=2, seed=0,
        lr_space={"type": "float", "low": 1e-4, "high": 1e-2, "log": True},
    )
    result = runner.run_batch(k=2)
    assert len(result.trial_numbers) == 2
    assert all(t.state in (TrialState.COMPLETE, TrialState.PRUNED)
               for t in study.trials)


@pytest.mark.slow
def test_trainer_fsdp_expert_parallel_fit(tmp_path):
    """Trainer(fsdp=True, expert_parallel=2): ZeRO+EP through the real fit
    loop — expert weights AND their Adam moments come out sharded on both
    'model' (expert dim) and 'data' (ZeRO)."""
    from dlsc_tpu.data import ESC50DataModule
    from dlsc_tpu.data.synthetic import make_synthetic_dataset
    from dlsc_tpu.train import Trainer
    from dlsc_tpu.train.optim import adam

    if jax.device_count() < 8:
        pytest.skip("needs the 8-device virtual mesh")
    root = tmp_path / "synth"
    make_synthetic_dataset(root, num_classes=10, clips_per_class_per_fold=2,
                           clip_samples=8000)
    dm = ESC50DataModule(root=str(root), num_classes=10, fold=0,
                         val_split=0.2, batch_size=8,
                         preprocessing_mode="ast", is_spectrogram=True,
                         preprocessing_config={"n_mels": 128})
    # wi is (depth, 4, 32, 128) = 32768 floats ≥ the FSDP size gate
    model = ASTViT(num_classes=10, emb_dim=32, depth=2, num_heads=2,
                   patch_stride=16, overlap=0, dtype=jnp.float32,
                   moe={"n_experts": 4, "top_k": 1})
    trainer = Trainer(max_epochs=1, enable_progress_bar=False,
                      enable_checkpointing=False, seed=0,
                      fsdp=True, expert_parallel=2)
    state = trainer.fit(model, dm, adam(lr=1e-3))
    wi = state.params["blocks"]["block"]["moe"]["wi"]
    assert "model" in str(wi.sharding.spec) and "data" in str(wi.sharding.spec)
    moments = [
        leaf.sharding.spec
        for path, leaf in jax.tree_util.tree_flatten_with_path(state.opt_state)[0]
        if "wi" in [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
    ]
    assert moments and all("model" in str(s) for s in moments), moments
    assert np.isfinite(trainer.logged_metrics["train/loss"])


def test_moe_stats_sown_and_collected():
    """MoE observability: MoeMlp sows a 'moe_stats' (drop_frac, util) pair;
    collect_moe_stats averages them. Ample capacity → drop_frac 0; a
    starved capacity → drop_frac > 0; util in (0, 1]."""
    from dlsc_tpu.models.moe import collect_moe_stats

    x = _tokens(B=2, N=16, D=32)

    def stats_for(spec):
        m = MoeMlp(32, spec)
        v = m.init(jax.random.key(0), x, train=False)
        _, mut = m.apply(v, x, train=False, mutable=["intermediates"])
        s = collect_moe_stats(mut["intermediates"])
        assert set(s) == {"moe/drop_frac", "moe/util"}
        return {k: float(v_) for k, v_ in s.items()}

    ample = stats_for(MoeSpec(n_experts=4, top_k=2, capacity_factor=4.0))
    assert ample["moe/drop_frac"] == pytest.approx(0.0, abs=1e-6)
    assert 0.0 < ample["moe/util"] <= 1.0 + 1e-6

    starved = stats_for(MoeSpec(n_experts=4, top_k=1, capacity_factor=4 / 16))
    assert starved["moe/drop_frac"] > 0.1

    # expert-choice: 'dropped' = untaken tokens; load is balanced by
    # construction → util ≈ 1
    ec = stats_for(MoeSpec(n_experts=4, top_k=2, capacity_factor=0.5,
                           router="expert"))
    assert ec["moe/drop_frac"] >= 0.0
    assert ec["moe/util"] == pytest.approx(1.0, abs=1e-3)

    # dense / empty intermediates → statically empty
    assert collect_moe_stats({}) == {}
    assert collect_moe_stats(None) == {}


def test_trainer_logs_moe_metrics(tmp_path):
    """Trainer surfaces moe/drop_frac + moe/util as train metrics for MoE
    models (streamed through MetricState extras)."""
    from dlsc_tpu.data import ESC50DataModule
    from dlsc_tpu.data.synthetic import make_synthetic_dataset
    from dlsc_tpu.train import Trainer
    from dlsc_tpu.train.optim import adam

    root = tmp_path / "synth"
    make_synthetic_dataset(root, num_classes=10, clips_per_class_per_fold=2,
                           clip_samples=8000)
    dm = ESC50DataModule(root=str(root), num_classes=10, fold=0,
                         val_split=0.2, batch_size=8,
                         preprocessing_mode="ast", is_spectrogram=True,
                         preprocessing_config={"n_mels": 128})
    model = ASTViT(num_classes=10, emb_dim=32, depth=2, num_heads=2,
                   patch_size=16, patch_stride=16, overlap=0, dropout=0.0,
                   dtype=jnp.float32, use_flash=False, scan_blocks=True,
                   moe={"n_experts": 2, "top_k": 1, "capacity_factor": 1.0})
    trainer = Trainer(max_epochs=1, enable_progress_bar=False, seed=0,
                      devices=1, enable_checkpointing=False,
                      limit_train_batches=2, limit_val_batches=1)
    trainer.fit(model, dm, adam(lr=1e-3))
    m = trainer.logged_metrics
    assert 0.0 <= m["moe/drop_frac"] <= 1.0
    assert 0.0 < m["moe/util"] <= 1.0 + 1e-6


# ---------------------------------------------------------------------------
# dispatch='ragged' — dropless grouped-matmul dispatch (VERDICT r4 #1)
# ---------------------------------------------------------------------------


def test_ragged_matches_einsum_when_nothing_drops():
    """Dropless ragged dispatch must agree with the einsum lowering whenever
    capacity drops nothing (capacity_factor = E ⇒ C = K·S): same values,
    same aux loss, same gradients (incl. router)."""
    B, N, D, E, K = 2, 16, 8, 4, 2
    x = _tokens(B, N, D, seed=21)
    se = MoeSpec(n_experts=E, top_k=K, capacity_factor=float(E),
                 dispatch="einsum", group_size=8)
    sr = dataclasses.replace(se, dispatch="ragged")
    me, mr = MoeMlp(D, se, ratio=2.0), MoeMlp(D, sr, ratio=2.0)
    v = me.init(jax.random.key(3), x, train=False)
    assert (jax.tree_util.tree_structure(v)
            == jax.tree_util.tree_structure(
                mr.init(jax.random.key(3), x, train=False)))

    def loss(m):
        def f(p):
            out, mut = m.apply({"params": p}, x, train=False,
                               mutable=["intermediates"])
            return jnp.sum(out ** 2) + collect_moe_aux(mut["intermediates"])
        return jax.value_and_grad(f)(v["params"])

    la, ga = loss(me)
    lb, gb = loss(mr)
    np.testing.assert_allclose(float(la), float(lb), rtol=1e-5)
    for pa, pb in zip(jax.tree_util.tree_leaves(ga),
                      jax.tree_util.tree_leaves(gb)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                                   rtol=2e-4, atol=1e-5)


def test_ragged_is_dropless():
    """At a capacity factor that forces the einsum path to drop tokens, the
    ragged path keeps them all: zero-output rows only at pads, and the sown
    drop_frac stat is exactly 0."""
    B, N, D, E = 1, 16, 32, 2
    x = _tokens(B, N, D, seed=9)
    sr = MoeSpec(n_experts=E, top_k=1, capacity_factor=0.5,
                 dispatch="ragged")
    m = MoeMlp(D, sr)
    v = m.init(jax.random.key(0), x, train=False)
    y, mut = m.apply(v, x, train=False, mutable=["intermediates"])
    nz = np.sum(~np.all(np.asarray(y[0]) == 0.0, axis=-1))
    assert nz == N, f"ragged dropped tokens: {nz} < {N}"
    from dlsc_tpu.models.moe import collect_moe_stats

    stats = collect_moe_stats(mut["intermediates"])
    assert float(stats["moe/drop_frac"]) == 0.0


def test_ragged_pad_tokens_masked():
    """Pad tokens (>= n_real) still occupy sorted rows but must combine to
    zero output and contribute zero gradient."""
    B, N, D, E = 2, 16, 8, 4
    n_real = 11
    x = _tokens(B, N, D, seed=13)
    m = MoeMlp(D, MoeSpec(n_experts=E, top_k=2, dispatch="ragged"),
               ratio=2.0, n_real=n_real)
    v = m.init(jax.random.key(1), x, train=False)
    y = np.asarray(m.apply(v, x, train=False))
    assert np.all(y[:, n_real:] == 0.0)

    # grads: perturbing pad-token inputs must not change the loss
    def f(xx):
        return jnp.sum(m.apply(v, xx, train=False) ** 2)

    g = np.asarray(jax.grad(f)(x))
    assert np.all(g[:, n_real:] == 0.0)


def test_ragged_rejects_expert_choice_router():
    with pytest.raises(ValueError, match="dropless token-choice"):
        MoeSpec(n_experts=4, dispatch="ragged", router="expert")


def test_ragged_with_expert_sharding_falls_back_to_einsum():
    """EP shards the (B,E,C,D) capacity buffers, which ragged never builds —
    the combination must run (on the einsum lowering) and agree with plain
    einsum dispatch."""
    B, N, D, E = 2, 16, 8, 4
    x = _tokens(B, N, D, seed=17)
    mesh = jax.sharding.Mesh(np.array(jax.devices()).reshape(4, 2),
                             ("data", "model"))
    sh = NamedSharding(mesh, P(None, "model", None, None))
    se = MoeSpec(n_experts=E, top_k=2, dispatch="einsum", group_size=16)
    sr = dataclasses.replace(se, dispatch="ragged")
    me = MoeMlp(D, se, ratio=2.0)
    mr = MoeMlp(D, sr, ratio=2.0, expert_sharding=sh)
    v = me.init(jax.random.key(0), x, train=False)
    ye = me.apply(v, x, train=False)
    yr = mr.apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(ye), np.asarray(yr),
                               rtol=1e-5, atol=1e-6)


def test_ragged_gmm_pallas_interpret_matches_xla(monkeypatch):
    """The megablox Pallas grouped matmul (TPU lowering) must agree with the
    lax.ragged_dot path — run in interpret mode on CPU."""
    from dlsc_tpu.models import moe as moe_mod

    M, D, F, E = 64, 16, 24, 4
    rng = np.random.default_rng(0)
    lhs = jnp.asarray(rng.standard_normal((M, D)).astype(np.float32))
    rhs = jnp.asarray(rng.standard_normal((E, D, F)).astype(np.float32))
    gs = jnp.asarray([16, 8, 24, 16], jnp.int32)

    monkeypatch.setenv("DLSC_MOE_GMM", "xla")
    ref = moe_mod._grouped_matmul(lhs, rhs, gs)

    from jax.experimental.pallas.ops.tpu.megablox import ops as mb
    out = mb.gmm(lhs, rhs, gs, jnp.float32, (8, 8, 8), None, None, False,
                 True)  # interpret=True
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_ragged_matches_einsum_with_pads():
    """Same agreement under encoder-wide padding (n_real < N): the ragged
    path statically slices pad rows out of the grouped matmuls; values and
    gradients must still match the einsum lowering at no-drop capacity."""
    B, N, D, E, K, n_real = 2, 16, 8, 4, 2, 11
    x = _tokens(B, N, D, seed=31)
    se = MoeSpec(n_experts=E, top_k=K, capacity_factor=float(E),
                 dispatch="einsum", group_size=16)
    sr = dataclasses.replace(se, dispatch="ragged")
    me = MoeMlp(D, se, ratio=2.0, n_real=n_real)
    mr = MoeMlp(D, sr, ratio=2.0, n_real=n_real)
    v = me.init(jax.random.key(7), x, train=False)

    def loss(m):
        def f(p, xx):
            out, mut = m.apply({"params": p}, xx, train=False,
                               mutable=["intermediates"])
            return jnp.sum(out ** 2) + collect_moe_aux(mut["intermediates"])
        return jax.value_and_grad(f, argnums=(0, 1))(v["params"], x)

    la, ga = loss(me)
    lb, gb = loss(mr)
    np.testing.assert_allclose(float(la), float(lb), rtol=1e-5)
    for pa, pb in zip(jax.tree_util.tree_leaves(ga),
                      jax.tree_util.tree_leaves(gb)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                                   rtol=2e-4, atol=1e-5)


def test_ragged_attn_res_moe_remat_matches_attn_res():
    """The 'attn_res_moe' remat policy only changes WHAT is saved — values
    and gradients must equal the default 'attn_res' policy exactly (guards
    the checkpoint_name plumbing in moe._ragged)."""
    from dlsc_tpu.models.ast_moe import ASTMoE

    def run(policy):
        m = ASTMoE(num_classes=5, emb_dim=64, depth=2, num_heads=2,
                   n_experts=4, dispatch="ragged", remat_policy=policy,
                   dtype=jnp.float32, attn_impl="dense")
        x = jnp.asarray(np.random.default_rng(3).standard_normal(
            (2, 128, 64)).astype(np.float32) * 0.1)
        v = m.init({"params": jax.random.key(0), "dropout": jax.random.key(1)},
                   x, train=False)

        def f(p):
            out = m.apply(
                {"params": p, **{k: v[k] for k in v if k != "params"}},
                x, train=True, rngs={"dropout": jax.random.key(2)})
            return jnp.sum(out ** 2)

        return jax.value_and_grad(f)(v["params"])

    la, ga = run("attn_res")
    lb, gb = run("attn_res_moe")
    np.testing.assert_allclose(float(la), float(lb), rtol=1e-6)
    for pa, pb in zip(jax.tree_util.tree_leaves(ga),
                      jax.tree_util.tree_leaves(gb)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                                   rtol=1e-5, atol=1e-6)
