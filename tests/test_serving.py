"""Serving export/load (dlsc_tpu/serving.py): StableHLO roundtrip ≡ direct.

Exports the compiled inference path (eval pipeline + forward + softmax) on
the CPU backend, reloads it through load_exported — which uses only the
artifact dir, no model classes — and checks the served probabilities match
a direct make_infer call bit-for-bit-ish.
"""

import jax
import jax.numpy as jnp
import numpy as np

from dlsc_tpu.data.pipeline import DevicePipeline, PipelineConfig
from dlsc_tpu.models.vit import ASTViT
from dlsc_tpu.serving import export_model, load_exported, make_infer

CLIP = 44_100  # 1-s clips keep the CPU forward cheap


def _tiny_ast():
    model = ASTViT(num_classes=7, emb_dim=32, depth=2, num_heads=2,
                   patch_size=16, patch_stride=16, overlap=0,
                   dropout=0.0, dtype=jnp.float32, use_flash=False)
    pipe = DevicePipeline(PipelineConfig(mode="ast", num_classes=7))
    return model, pipe


def _init(model, pipe, wave):
    feats, _ = jax.jit(pipe.eval_batch)(
        wave, jnp.zeros((wave.shape[0],), jnp.int32))
    return jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        feats, train=False,
    )


def test_predict_windows_long_audio(tmp_path):
    """predict.py long-audio handling: half-overlapping windows cover the
    whole file (no silent truncation) and probabilities average per file."""
    import scripts.predict as P

    clip = 1000
    # short: padded to one window
    w = P._windows(np.ones(600, np.float32), clip, "avg")
    assert len(w) == 1 and w[0].shape == (clip,) and w[0][700] == 0.0
    # long: half-overlap hops + right-aligned tail window
    x = np.arange(2600, dtype=np.float32)
    w = P._windows(x, clip, "avg")
    starts = [int(win[0]) for win in w]
    assert starts == [0, 500, 1000, 1500, 1600]  # tail right-aligned
    assert all(win.shape == (clip,) for win in w)
    # truncate mode: head window only
    assert len(P._windows(x, clip, "truncate")) == 1
    # per-file averaging
    probs = np.array([[1.0, 0.0], [0.0, 1.0], [0.5, 0.5]])
    avg = P._avg_by_file(probs, [2, 1])
    np.testing.assert_allclose(avg, [[0.5, 0.5], [0.5, 0.5]])


def test_predict_artifact_long_file(tmp_path):
    """End-to-end: a file 2.5x the clip length classifies via the artifact
    path by window-averaging, and matches the hand-averaged windows."""
    import scripts.predict as P
    from dlsc_tpu.data import wav as W

    model, pipe = _tiny_ast()
    wave = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, CLIP)).astype(np.float32))
    variables = _init(model, pipe, wave)
    art = export_model(model, pipe, variables, tmp_path / "art",
                       batch=2, clip_samples=CLIP, platforms=("cpu",),
                       meta={"sample_rate": 44_100})
    rng = np.random.default_rng(1)
    long_wav = tmp_path / "long.wav"
    W.write_wav(long_wav, rng.standard_normal(int(2.5 * CLIP)) * 0.3, 44_100)
    results = P.predict_from_artifact(str(art), [str(long_wav)], top_k=3)
    assert len(results) == 1 and len(results[0]["top_k"]) == 3
    # manual check: same windows through the raw serving fn
    serve = load_exported(art)
    x = W.standardize(long_wav, 44_100)
    wins = np.stack(P._windows(x, CLIP, "avg"))
    probs = []
    for i in range(0, len(wins), 2):
        chunk = wins[i:i + 2]
        n = chunk.shape[0]
        if n < 2:
            chunk = np.pad(chunk, ((0, 2 - n), (0, 0)))
        probs.append(np.asarray(serve(chunk))[:n])
    manual = np.concatenate(probs).mean(axis=0)
    top = results[0]["top_k"][0]
    assert top[0] == int(np.argmax(manual))
    np.testing.assert_allclose(top[1], float(manual.max()), rtol=1e-5)


def test_roundtrip_matches_direct(tmp_path):
    model, pipe = _tiny_ast()
    wave = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, CLIP)).astype(np.float32)
    )
    variables = _init(model, pipe, wave)
    direct = jax.jit(make_infer(model, pipe))(variables, wave)

    art = export_model(model, pipe, variables, tmp_path / "art",
                       batch=2, clip_samples=CLIP, platforms=("cpu",))
    serve = load_exported(art)
    probs = serve(wave)
    np.testing.assert_allclose(np.asarray(probs), np.asarray(direct),
                               rtol=1e-6, atol=1e-7)
    assert serve.manifest["batch"] == 2
    assert serve.manifest["clip_samples"] == CLIP
    assert serve.manifest["num_classes"] == 7
    # probabilities: rows sum to 1
    np.testing.assert_allclose(np.asarray(probs).sum(-1), 1.0, rtol=1e-5)


def test_roundtrip_with_batch_stats(tmp_path):
    # CNN_ESC50 carries BatchNorm batch_stats — the full-variables flow
    from dlsc_tpu.models.cnn_esc50 import CNN_ESC50

    model = CNN_ESC50(num_classes=5)
    pipe = DevicePipeline(PipelineConfig(mode="cnn_esc50", num_classes=5))
    wave = jnp.asarray(
        np.random.default_rng(1).standard_normal((2, CLIP)).astype(np.float32)
    )
    variables = _init(model, pipe, wave)
    assert "batch_stats" in variables
    direct = jax.jit(make_infer(model, pipe))(variables, wave)

    art = export_model(model, pipe, variables, tmp_path / "art",
                       batch=2, clip_samples=CLIP, platforms=("cpu",))
    probs = load_exported(art)(wave)
    np.testing.assert_allclose(np.asarray(probs), np.asarray(direct),
                               rtol=1e-6, atol=1e-7)


def test_sharded_export_matches_single_device(tmp_path):
    # multi-chip serving: export the DP-sharded inference program over the
    # 8-virtual-device mesh; loading + serving must equal the single-device
    # program's output (variables replicated, batch sharded over 'data')
    from jax.sharding import NamedSharding, PartitionSpec as P

    from dlsc_tpu.parallel import get_mesh

    model, pipe = _tiny_ast()
    wave = jnp.asarray(
        np.random.default_rng(3).standard_normal((8, CLIP)).astype(np.float32)
    )
    variables = _init(model, pipe, wave)
    direct = jax.jit(make_infer(model, pipe))(variables, wave)

    mesh = get_mesh()
    art = export_model(model, pipe, variables, tmp_path / "art",
                       batch=8, clip_samples=CLIP, platforms=("cpu",),
                       mesh=mesh)
    serve = load_exported(art)
    assert serve.manifest["mesh"] == dict(mesh.shape)
    wave_sharded = jax.device_put(wave, NamedSharding(mesh, P("data")))
    probs = serve(wave_sharded)
    np.testing.assert_allclose(np.asarray(probs), np.asarray(direct),
                               rtol=2e-5, atol=1e-6)
    # batch must divide the data axis
    import pytest

    with pytest.raises(ValueError, match="divisible"):
        export_model(model, pipe, variables, tmp_path / "bad",
                     batch=3, clip_samples=CLIP, platforms=("cpu",),
                     mesh=mesh)


def test_predict_from_artifact_cli(tmp_path):
    # deployment entry: scripts/predict.py +artifact=<dir> serves WAV files
    # through the exported program with no model code / checkpoint plumbing.
    # 3 files against a batch-2 artifact exercises the ragged-chunk padding.
    from dlsc_tpu.data import wav as W
    from scripts.predict import main as predict_main

    model, pipe = _tiny_ast()
    wave = jnp.asarray(
        np.random.default_rng(4).standard_normal((2, CLIP)).astype(np.float32)
    )
    variables = _init(model, pipe, wave)
    art = export_model(model, pipe, variables, tmp_path / "art",
                       batch=2, clip_samples=CLIP, platforms=("cpu",),
                       meta={"sample_rate": 44_100})

    rng = np.random.default_rng(5)
    files = []
    for i in range(3):
        x = (rng.standard_normal(CLIP) * 0.3).astype(np.float32)
        p = tmp_path / f"clip{i}.wav"
        W.write_wav(p, x, 44_100)
        files.append(str(p))

    results = predict_main(
        [f"+artifact={tmp_path / 'art'}", f"+files=[{','.join(files)}]",
         "+top_k=3"])
    assert [r["file"] for r in results] == files
    for r in results:
        classes = [c for c, _ in r["top_k"]]
        probs = [v for _, v in r["top_k"]]
        assert len(classes) == 3 and all(0 <= c < 7 for c in classes)
        assert probs == sorted(probs, reverse=True)

    # chunked CLI results must agree with serving the standardized waves
    # directly (validates padding/slicing of the ragged final chunk)
    serve = load_exported(tmp_path / "art")
    std = np.stack([W.standardize(f, 44_100)[:CLIP] for f in files])
    direct = np.concatenate([
        np.asarray(serve(np.pad(std[i:i + 2].astype(np.float32),
                                ((0, 2 - len(std[i:i + 2])), (0, 0)))))
        [:len(std[i:i + 2])]
        for i in range(0, 3, 2)
    ])
    for r, p in zip(results, direct):
        assert r["top_k"][0][0] == int(np.argmax(p))


def test_multicrop_infer_path():
    # the 10-crop eval protocol goes through make_infer's crop-mean branch;
    # use a tiny raw-wave model (a Dense head over the crop) to keep it cheap
    import flax.linen as nn

    class TinyRaw(nn.Module):
        num_classes: int = 4

        @nn.compact
        def __call__(self, x, train: bool = False):
            feats = jnp.stack([x.mean(-1), x.std(-1)], axis=-1)
            return nn.Dense(self.num_classes)(feats)

    model = TinyRaw()
    pipe = DevicePipeline(PipelineConfig(
        mode="envnet_v2", num_classes=4, window_length=0.5,
        padding_ratio=0.5, multi_crop_test=True, test_crops=4,
    ))
    wave = jnp.asarray(
        np.random.default_rng(2).standard_normal((3, CLIP)).astype(np.float32)
    )
    variables = jax.jit(model.init)(jax.random.key(0), jnp.zeros((2, 22_050)))
    probs = jax.jit(make_infer(model, pipe))(variables, wave)
    assert probs.shape == (3, 4)
    np.testing.assert_allclose(np.asarray(probs).sum(-1), 1.0, rtol=1e-5)
