"""Int8 w8a8 serving quantization (dlsc_tpu/ops/quant.py + models/vit.py).

Covers: per-channel weight quantization error bounds, the int8 matmul
helper vs the float reference, the quantized ViT forward vs the f32
forward (both block layouts, scan and unrolled), the inference-only guard,
and the serving-export roundtrip of a quantized artifact.

reference: none — the reference ships no quantized inference; this is a
TPU-native serving capability beyond parity (tested on CPU, measured on
TPU via scripts/bench_infer.py ast_int8_* variants).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dlsc_tpu.models.vit import ASTViT
from dlsc_tpu.ops.quant import int8_dot, materialize, quantize_act, quantize_weight


def test_quantize_weight_error_bound():
    w = jnp.asarray(
        np.random.default_rng(0).standard_normal((24, 40)).astype(np.float32))
    w_q, scale = quantize_weight(w)
    assert w_q.dtype == jnp.int8 and scale.shape == (40,)
    deq = w_q.astype(jnp.float32) * scale[None, :]
    # symmetric round-to-nearest: error <= scale/2 per column
    assert (jnp.abs(deq - w) <= scale[None, :] / 2 + 1e-7).all()


def test_quantize_weight_multi_axis_output():
    w = jnp.asarray(
        np.random.default_rng(1).standard_normal((16, 3, 4, 8)).astype(np.float32))
    w_q, scale = quantize_weight(w)
    assert scale.shape == (3, 4, 8)
    deq = w_q.astype(jnp.float32) * scale[None]
    assert float(jnp.abs(deq - w).max()) <= float(scale.max()) / 2 + 1e-7


def test_quantize_act_per_row():
    x = jnp.asarray(
        np.random.default_rng(2).standard_normal((5, 7, 33)).astype(np.float32))
    x_q, s = quantize_act(x)
    assert x_q.dtype == jnp.int8 and s.shape == (5, 7, 1)
    # each row's max maps to +/-127
    assert int(jnp.abs(x_q).max(axis=-1).min()) == 127


@pytest.mark.parametrize("w_shape", [(32, 48), (32, 3, 4, 8)])
def test_int8_dot_close_to_float(w_shape):
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((6, 32)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal(w_shape).astype(np.float32))
    w_q, scale = quantize_weight(w)
    out = int8_dot(x, w_q, scale, jnp.float32)
    ref = jnp.tensordot(x, w, axes=([1], [0]))
    assert out.shape == ref.shape
    # w8a8 with per-row/per-channel scales: ~1% relative error on random data
    rel = float(jnp.abs(out - ref).max() / jnp.abs(ref).max())
    assert rel < 0.02, rel


_VIT_KW = dict(num_classes=7, emb_dim=64, depth=2, num_heads=4,
               patch_size=16, patch_stride=10, overlap=6, sample_rate=4410,
               f_dim=64, dropout=0.0, dtype=jnp.float32)


def _mel_input(batch=2):
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.standard_normal((batch, 64, 276)).astype(np.float32))


@pytest.mark.parametrize("scan_blocks", [True, False])
def test_quantized_vit_matches_f32(scan_blocks):
    x = _mel_input()
    model = ASTViT(**_VIT_KW, scan_blocks=scan_blocks)
    model_q = ASTViT(**_VIT_KW, scan_blocks=scan_blocks, quant="w8a8")
    variables = model.init({"params": jax.random.key(0)}, x, train=False)
    ref = model.apply(variables, x, train=False)

    vq = materialize(model_q, variables, x)
    assert "quant" in vq
    leaves = jax.tree_util.tree_leaves(vq["quant"])
    assert any(l.dtype == jnp.int8 for l in leaves)
    if scan_blocks:  # depth-stacked quant variables under nn.scan
        assert all(l.shape[0] == _VIT_KW["depth"] for l in leaves)

    out = model_q.apply(vq, x, train=False)
    assert float(jnp.abs(out - ref).max()) < 0.05  # sigmoid-prob scale
    assert (out.argmax(-1) == ref.argmax(-1)).all()


def test_quant_collection_is_deterministic_in_params():
    x = _mel_input()
    model_q = ASTViT(**_VIT_KW, quant="w8a8")
    model = ASTViT(**_VIT_KW)
    variables = model.init({"params": jax.random.key(1)}, x, train=False)
    v1 = materialize(model_q, variables, x)
    v2 = materialize(model_q, variables, jnp.zeros_like(x))  # input-independent
    for a, b in zip(jax.tree_util.tree_leaves(v1["quant"]),
                    jax.tree_util.tree_leaves(v2["quant"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_quant_rejects_training():
    x = _mel_input()
    model_q = ASTViT(**_VIT_KW, quant="w8a8")
    model = ASTViT(**_VIT_KW)
    variables = model.init({"params": jax.random.key(0)}, x, train=False)
    vq = materialize(model_q, variables, x)
    with pytest.raises(ValueError, match="inference-only"):
        model_q.apply(vq, x, train=True, rngs={"dropout": jax.random.key(0)})


def test_unknown_quant_mode_fails_loudly():
    x = _mel_input()
    model_bad = ASTViT(**_VIT_KW, quant="int8")  # typo for 'w8a8'
    with pytest.raises(ValueError, match="unknown quant mode"):
        model_bad.init({"params": jax.random.key(0)}, x, train=False)
    # materialize on a model that never produces a quant collection
    model = ASTViT(**_VIT_KW)
    variables = model.init({"params": jax.random.key(0)}, x, train=False)
    with pytest.raises(ValueError, match="no 'quant' collection"):
        materialize(model, variables, x)


def test_quantized_sharded_export_matches_single_device(tmp_path):
    # quant x SPMD serving: batch sharded over the 8-virtual-device mesh,
    # params + int8 quant collection replicated; must equal the unsharded
    # quantized program
    from jax.sharding import NamedSharding, PartitionSpec as P

    from dlsc_tpu.data.pipeline import DevicePipeline, PipelineConfig
    from dlsc_tpu.parallel import get_mesh
    from dlsc_tpu.serving import export_model, load_exported, make_infer

    if jax.device_count() < 8:
        pytest.skip("needs the 8-device virtual mesh")
    clip = 44_100
    kw = dict(num_classes=7, emb_dim=32, depth=2, num_heads=2, patch_size=16,
              patch_stride=16, overlap=0, dropout=0.0, dtype=jnp.float32,
              use_flash=False)
    model_q = ASTViT(**kw, quant="w8a8")
    pipe = DevicePipeline(PipelineConfig(mode="ast", num_classes=7))
    wave = jnp.asarray(
        np.random.default_rng(7).standard_normal((8, clip)).astype(np.float32))
    feats, _ = jax.jit(pipe.eval_batch)(wave, jnp.zeros((8,), jnp.int32))
    variables = jax.jit(ASTViT(**kw).init, static_argnames=("train",))(
        {"params": jax.random.key(0)}, feats, train=False)
    vq = materialize(model_q, variables, feats)

    direct = jax.device_get(jax.jit(make_infer(model_q, pipe))(vq, wave))
    mesh = get_mesh()
    art = export_model(model_q, pipe, vq, tmp_path / "art", batch=8,
                       clip_samples=clip, mesh=mesh, meta={"quant": "w8a8"})
    serve = load_exported(art)
    wave_sharded = jax.device_put(wave, NamedSharding(mesh, P("data")))
    served = jax.device_get(serve(wave_sharded))
    np.testing.assert_allclose(served, direct, rtol=2e-5, atol=1e-6)


def test_quantized_export_roundtrip(tmp_path):
    from dlsc_tpu.data.pipeline import DevicePipeline, PipelineConfig
    from dlsc_tpu.serving import export_model, load_exported, make_infer

    clip = 44_100
    kw = dict(num_classes=7, emb_dim=32, depth=2, num_heads=2, patch_size=16,
              patch_stride=16, overlap=0, dropout=0.0, dtype=jnp.float32,
              use_flash=False)
    model = ASTViT(**kw)
    model_q = ASTViT(**kw, quant="w8a8")
    pipe = DevicePipeline(PipelineConfig(mode="ast", num_classes=7))
    wave = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, clip)).astype(np.float32))
    feats, _ = jax.jit(pipe.eval_batch)(wave, jnp.zeros((2,), jnp.int32))
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.key(0)}, feats, train=False)
    vq = materialize(model_q, variables, feats)

    direct = jax.device_get(make_infer(model_q, pipe)(vq, wave))
    art = export_model(model_q, pipe, vq, tmp_path / "art", batch=2,
                       clip_samples=clip, meta={"quant": "w8a8"})
    serve = load_exported(art)
    assert serve.manifest["quant"] == "w8a8"
    served = jax.device_get(serve(wave))
    np.testing.assert_allclose(served, direct, atol=1e-6)


def test_w8_dot_close_to_float():
    from dlsc_tpu.ops.quant import w8_dot

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((6, 32)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((32, 3, 4, 8)).astype(np.float32))
    w_q, scale = quantize_weight(w)
    out = w8_dot(x, w_q, scale, jnp.float32)
    ref = jnp.tensordot(x, w, axes=([1], [0]))
    assert out.shape == ref.shape
    # weight-only: tighter than w8a8 (activations exact)
    rel = float(jnp.abs(out - ref).max() / jnp.abs(ref).max())
    assert rel < 0.01, rel


@pytest.mark.parametrize("scan_blocks", [True, False])
def test_w8_vit_matches_f32(scan_blocks):
    """Weight-only int8 ('w8') ViT forward tracks the f32 forward at least
    as tightly as w8a8 (no activation quantization error)."""
    from dlsc_tpu.ops.quant import materialize

    x = _mel_input()
    model = ASTViT(**_VIT_KW, scan_blocks=scan_blocks)
    model_q = ASTViT(**_VIT_KW, scan_blocks=scan_blocks, quant="w8")
    variables = model.init({"params": jax.random.key(0)}, x, train=False)
    ref = model.apply(variables, x, train=False)
    qvars = materialize(model_q, variables, x)
    assert "quant" in qvars
    got = model_q.apply(qvars, x, train=False)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=0.06)
    # probabilities stay ordered the same on most rows
    assert (np.asarray(got).argmax(-1) == np.asarray(ref).argmax(-1)).mean() >= 0.5
