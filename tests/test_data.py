"""Data layer tests: wav IO, prep shards, datamodule splits, device pipelines."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dlsc_tpu.data import ESC50DataModule
from dlsc_tpu.data import wav as W
from dlsc_tpu.data.pipeline import PipelineConfig, DevicePipeline, pipeline_from_dataset_config
from dlsc_tpu.data.synthetic import make_synthetic_dataset


@pytest.fixture(scope="module")
def dataset_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth")
    make_synthetic_dataset(root, num_classes=10, clips_per_class_per_fold=2,
                           clip_samples=8000)
    return root


def test_wav_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    x = np.clip(rng.standard_normal((2, 4000)) * 0.2, -0.99, 0.99).astype(np.float32)
    W.write_wav(tmp_path / "t.wav", x, 22050)
    y, sr = W.read_wav(tmp_path / "t.wav")
    assert sr == 22050 and y.shape == (2, 4000)
    np.testing.assert_allclose(y, x, atol=1e-4)


def test_standardize_resamples_and_normalizes(tmp_path):
    t = np.arange(8000) / 22050
    x = 0.25 * np.sin(2 * np.pi * 440 * t).astype(np.float32)
    W.write_wav(tmp_path / "t.wav", x[None], 22050)
    y = W.standardize(tmp_path / "t.wav", 44100)
    assert abs(len(y) - 16000) <= 2
    assert abs(np.abs(y).max() - 1.0) < 1e-3  # peak-normalized


def test_datamodule_split_semantics(dataset_root):
    dm = ESC50DataModule(
        root=str(dataset_root), num_classes=10, fold=2, val_split=0.2,
        batch_size=8, preprocessing_mode="envnet_v2", is_spectrogram=False,
    )
    sizes = dm.setup_sizes()
    assert sizes["test"] == 20                      # the held-out fold
    assert sizes["train"] + sizes["val"] == 80      # remaining 4 folds
    assert sizes["val"] == 16                       # 20% stratified

    # deterministic: same split on re-instantiation (seed 42)
    dm2 = ESC50DataModule(
        root=str(dataset_root), num_classes=10, fold=2, val_split=0.2,
        batch_size=8, preprocessing_mode="envnet_v2", is_spectrogram=False,
    )
    dm2.setup()
    np.testing.assert_array_equal(dm._val, dm2._val)


def test_constraint_validation(dataset_root):
    with pytest.raises(ValueError, match="BC mixing"):
        ESC50DataModule(
            root=str(dataset_root), num_classes=10, preprocessing_mode="ast",
            is_spectrogram=True, enable_bc_mixing=True,
        )
    with pytest.raises(ValueError, match="Mixup"):
        ESC50DataModule(
            root=str(dataset_root), num_classes=10,
            preprocessing_mode="envnet_v2", is_spectrogram=False,
            enable_mixup=True,
        )
    with pytest.raises(ValueError, match="Unknown preprocessing_mode"):
        ESC50DataModule(
            root=str(dataset_root), num_classes=10, preprocessing_mode="bogus",
        )
    with pytest.raises(ValueError, match="fold"):
        ESC50DataModule(root=str(dataset_root), num_classes=10, fold=7)


def test_train_batches_shapes_and_shuffle(dataset_root):
    dm = ESC50DataModule(
        root=str(dataset_root), num_classes=10, fold=0, batch_size=16,
        val_split=0.2, preprocessing_mode="envnet_v2", is_spectrogram=False,
    )
    b0 = list(dm.train_batches(epoch=0))
    b1 = list(dm.train_batches(epoch=1))
    assert all(b.wave.shape == (16, 8000) for b in b0)
    assert len(b0) == dm.steps_per_epoch
    assert not np.array_equal(b0[0].label, b1[0].label)  # reshuffled per epoch
    # eval batches pad the tail and mask it
    last = list(dm.test_batches())[-1]
    assert last.wave.shape[0] == 16
    assert last.mask.sum() == 20 % 16 or last.mask.all()


def test_envnet_pipeline_shapes(dataset_root):
    cfg = PipelineConfig(mode="envnet_v2", num_classes=10, window_length=0.1,
                         sample_rate=44100, enable_bc_mixing=True)
    pipe = DevicePipeline(cfg)
    wave = jnp.zeros((4, 8000))
    labels = jnp.arange(4)
    x, y = pipe.train_batch(wave, labels, jax.random.key(0))
    assert x.shape == (4, 4410)
    assert y.shape == (4, 10)
    xe, ye = pipe.eval_batch(wave, labels)
    assert xe.shape == (4, 4410)
    # multi-crop
    cfg_mc = PipelineConfig(mode="envnet_v2", num_classes=10, window_length=0.1,
                            multi_crop_test=True, test_crops=10)
    xm, _ = DevicePipeline(cfg_mc).eval_batch(wave, labels)
    assert xm.shape == (4, 10, 4410)


def test_ast_pipeline_shapes():
    cfg = PipelineConfig(mode="ast", num_classes=10, enable_mixup=True,
                         use_pallas=False)
    pipe = DevicePipeline(cfg)
    wave = jax.random.normal(jax.random.key(1), (2, 8000)) * 0.1
    x, y = pipe.train_batch(wave, jnp.arange(2), jax.random.key(0))
    assert x.shape == (2, 128, 51)  # 8000 // 160 + 1
    # eval features are normalized per clip
    xe, _ = pipe.eval_batch(wave, jnp.arange(2))
    m = np.asarray(xe).reshape(2, -1)
    assert abs(m.mean(1)).max() < 1e-2
    assert abs(m.std(1) - 0.5).max() < 1e-2


def test_cnn_pipeline_shapes():
    cfg = PipelineConfig(mode="cnn_esc50", num_classes=10, use_pallas=False)
    pipe = DevicePipeline(cfg)
    wave = jax.random.normal(jax.random.key(1), (2, 8000)) * 0.1
    x, y = pipe.train_batch(wave, jnp.arange(2), jax.random.key(0))
    assert x.shape == (2, 224, 224)
    xe, _ = pipe.eval_batch(wave, jnp.arange(2))
    assert xe.shape == (2, 224, 224)


def test_pipeline_from_dataset_config_matches_reference_yaml():
    ds = {
        "preprocessing_mode": "envnet_v2",
        "enable_bc_mixing": True,
        "num_classes": 50,
        "augment": {"time_mask": False, "freq_mask": False},
        "preprocessing_config": {
            "window_length": 5.0, "padding_ratio": 0.5,
            "multi_crop_test": False, "test_crops": 10,
            "augment": {"time_stretch": None, "gain_shift": None},
        },
    }
    pipe = pipeline_from_dataset_config(ds)
    assert pipe.cfg.window_samples == 220500
    assert pipe.cfg.padding_samples == 110250
    assert pipe.cfg.enable_bc_mixing and pipe.cfg.time_stretch is None


def test_train_partial_batch_pads_with_real_samples(dataset_root):
    dm = ESC50DataModule(
        root=str(dataset_root), num_classes=10, fold=0, val_split=0.2,
        batch_size=24, preprocessing_mode="envnet_v2", is_spectrogram=False,
        drop_last_train=False,
    )
    batches = list(dm.train_batches(epoch=0))
    last = batches[-1]
    assert last.wave.shape[0] == 24
    # no silent zero rows in train batches
    assert (np.abs(last.wave).max(axis=1) > 0).all()
    assert last.mask.all()


def test_int16_shards_roundtrip(tmp_path):
    """Default int16 shard format: half the bytes, ~-90 dB quantization."""
    from dlsc_tpu.data.prepare import write_fold_shards

    rng = np.random.default_rng(0)
    x = np.clip(rng.standard_normal(4000) * 0.3, -1, 1).astype(np.float32)
    write_fold_shards(tmp_path, {0: [(x, 1, "a.wav", 4000)],
                                 1: [(x, 2, "b.wav", 4000)]})
    waves = np.load(tmp_path / "fold_0" / "waves.npy", mmap_mode="r")
    assert waves.dtype == np.int16

    dm = ESC50DataModule(
        root=str(tmp_path), num_classes=3, fold=1, val_split=0.0,
        batch_size=1, preprocessing_mode="raw", is_spectrogram=False,
    )
    dm.n_folds = 2
    batch = next(iter(dm.train_batches()))
    assert batch.wave.dtype == np.int16  # int16 stays on the wire
    pipe = dm.pipeline
    out, _ = pipe.eval_batch(jnp.asarray(batch.wave), jnp.asarray(batch.label))
    np.testing.assert_allclose(np.asarray(out[0]), x, atol=1e-4)  # ~-86 dB quantization
