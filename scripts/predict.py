#!/usr/bin/env python
"""Classify audio files with a trained checkpoint (inference entry).

Usage:
    python scripts/predict.py model=ast +ckpt_path=outputs/.../checkpoints/epoch-... \
        +files=[clip1.wav,clip2.wav] [+top_k=5]

    # deployment mode — serve from a `scripts/export.py` artifact (no model
    # code, config tree, or checkpoint plumbing involved):
    python scripts/predict.py +artifact=exports/ast_mini \
        +files=[clip1.wav,clip2.wav] [+top_k=5]

Loads each WAV (any rate/channels — standardized like training data), runs
the model's eval pipeline + forward on device, and prints top-k class
indices with probabilities.
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import scripts.train as train_script
from dlsc_tpu.config import compose
from dlsc_tpu.data import wav as W
from dlsc_tpu.train import Trainer, build_from_cfg


def _print_results(files, probs, top_k: int) -> list[dict]:
    results = []
    for f, p in zip(files, probs):
        order = np.argsort(p)[::-1][:top_k]
        entry = {"file": str(f),
                 "top_k": [(int(c), float(p[c])) for c in order]}
        results.append(entry)
        pretty = ", ".join(f"class {c}: {v:.3f}" for c, v in entry["top_k"])
        print(f"{f}: {pretty}")
    return results


def predict_from_artifact(artifact: str, files: list, top_k: int) -> list[dict]:
    """Deployment path: classify via a `scripts/export.py` artifact.

    The exported program has a static batch size; requests are padded to it
    and served in chunks. Sample rate / clip length come from the manifest.
    """
    from dlsc_tpu.serving import load_exported

    serve = load_exported(artifact)
    man = serve.manifest
    batch, clip_len = int(man["batch"]), int(man["clip_samples"])
    sr = int(man.get("sample_rate", 44_100))

    waves = []
    for f in files:
        x = W.standardize(f, sr)
        waves.append(np.pad(x, (0, max(clip_len - len(x), 0)))[:clip_len])
    wave = np.stack(waves).astype(np.float32)

    probs = []
    for i in range(0, len(files), batch):
        chunk = wave[i:i + batch]
        n = chunk.shape[0]
        if n < batch:  # pad the ragged final chunk to the exported batch
            chunk = np.pad(chunk, ((0, batch - n), (0, 0)))
        probs.append(np.asarray(serve(chunk))[:n])
    return _print_results(files, np.concatenate(probs), top_k)


def main(argv: list[str] | None = None) -> list[dict]:
    config_path, config_name, overrides = train_script.parse_cli(
        list(argv if argv is not None else sys.argv[1:])
    )
    cfg = compose(config_path, config_name, overrides)
    files = cfg.select("files", default=None)
    ckpt = cfg.select("ckpt_path", default=None)
    artifact = cfg.select("artifact", default=None)
    if not files or not (ckpt or artifact):
        raise SystemExit(
            "pass +files=[a.wav,...] and +ckpt_path=<dir> (or +artifact=<dir>)")
    top_k = int(cfg.select("top_k", default=5))
    if artifact:
        return predict_from_artifact(str(artifact), list(files), top_k)
    sr = int(cfg.select("dataset.sample_rate", default=44_100))

    import jax
    import jax.numpy as jnp

    datamodule = train_script.build_datamodule(cfg)
    built = build_from_cfg(cfg)
    trainer = Trainer(**cfg.trainer.to_dict(), enable_checkpointing=False)
    state = trainer.init_state(built["model"], datamodule,
                               built["optim_spec"], built["sched_spec"])
    from dlsc_tpu.train.checkpoint import restore_state

    state = restore_state(ckpt, state)
    pipe = datamodule.pipeline

    # standardize + pad/trim to the training clip length
    datamodule.setup()
    clip_len = datamodule._pool.shape[1]
    waves = []
    for f in files:
        x = W.standardize(f, sr)
        x = np.pad(x, (0, max(clip_len - len(x), 0)))[:clip_len]
        waves.append(x)
    wave = jnp.asarray(np.stack(waves), jnp.float32)

    @jax.jit
    def forward(state, wave):
        inputs, _ = pipe.eval_batch(wave, jnp.zeros(wave.shape[0], jnp.int32))
        variables = {"params": state.params}
        if state.batch_stats is not None:
            variables["batch_stats"] = state.batch_stats
        out = state.apply_fn(variables, inputs, train=False)
        return jax.nn.softmax(out, axis=-1)

    probs = np.asarray(jax.device_get(forward(state, wave)))
    return _print_results(files, probs, top_k)


if __name__ == "__main__":
    main()
