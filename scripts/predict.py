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

Files longer than the training clip length are classified by sliding
half-overlapping windows across the clip and averaging the window
probabilities (`+long_audio=avg`, the default; `+long_audio=truncate`
restores plain head-truncation). Short files are zero-padded.
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


def _windows(x: np.ndarray, clip_len: int, mode: str) -> list[np.ndarray]:
    """Split one standardized waveform into clip_len windows.

    'avg': half-overlapping sliding windows covering the whole file (the
    last window is right-aligned so no tail is dropped); 'truncate': a
    single head window. Short inputs zero-pad to one window either way.
    """
    if len(x) <= clip_len:
        return [np.pad(x, (0, clip_len - len(x)))]
    if mode == "truncate":
        return [x[:clip_len]]
    hop = max(clip_len // 2, 1)
    starts = list(range(0, len(x) - clip_len + 1, hop))
    if starts[-1] != len(x) - clip_len:
        starts.append(len(x) - clip_len)
    return [x[s:s + clip_len] for s in starts]


def _file_windows(files, sr: int, clip_len: int, mode: str):
    """standardize each file → window stack (W_total, clip_len) + per-file
    window counts."""
    wins, counts = [], []
    for f in files:
        w = _windows(W.standardize(f, sr), clip_len, mode)
        wins.extend(w)
        counts.append(len(w))
    return np.stack(wins).astype(np.float32), counts


def _avg_by_file(win_probs: np.ndarray, counts: list[int]) -> np.ndarray:
    """Mean window probabilities per file."""
    out, i = [], 0
    for n in counts:
        out.append(win_probs[i:i + n].mean(axis=0))
        i += n
    return np.stack(out)


def predict_from_artifact(artifact: str, files: list, top_k: int,
                          long_audio: str = "avg") -> list[dict]:
    """Deployment path: classify via a `scripts/export.py` artifact.

    The exported program has a static batch size; windows are padded to it
    and served in chunks. Sample rate / clip length come from the manifest.
    """
    from dlsc_tpu.serving import load_exported

    serve = load_exported(artifact)
    man = serve.manifest
    batch, clip_len = int(man["batch"]), int(man["clip_samples"])
    sr = int(man.get("sample_rate", 44_100))

    wave, counts = _file_windows(files, sr, clip_len, long_audio)
    probs = []
    for i in range(0, wave.shape[0], batch):
        chunk = wave[i:i + batch]
        n = chunk.shape[0]
        if n < batch:  # pad the ragged final chunk to the exported batch
            chunk = np.pad(chunk, ((0, batch - n), (0, 0)))
        probs.append(np.asarray(serve(chunk))[:n])
    return _print_results(files, _avg_by_file(np.concatenate(probs), counts),
                          top_k)


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
    long_audio = str(cfg.select("long_audio", default="avg"))
    if long_audio not in ("avg", "truncate"):
        raise SystemExit(f"long_audio={long_audio!r} must be avg|truncate")
    if artifact:
        return predict_from_artifact(str(artifact), list(files), top_k,
                                     long_audio)
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

    # standardize + window to the training clip length
    datamodule.setup()
    clip_len = datamodule._pool.shape[1]
    wave_np, counts = _file_windows(files, sr, clip_len, long_audio)
    wave = jnp.asarray(wave_np, jnp.float32)

    @jax.jit
    def forward(state, wave):
        inputs, _ = pipe.eval_batch(wave, jnp.zeros(wave.shape[0], jnp.int32))
        variables = {"params": state.params}
        if state.batch_stats is not None:
            variables["batch_stats"] = state.batch_stats
        out = state.apply_fn(variables, inputs, train=False)
        return jax.nn.softmax(out, axis=-1)

    win_probs = np.asarray(jax.device_get(forward(state, wave)))
    return _print_results(files, _avg_by_file(win_probs, counts), top_k)


if __name__ == "__main__":
    main()
