"""Orbax checkpointing with the reference's best-k policy.

Mirrors Lightning ModelCheckpoint semantics (reference:
src/training/callbacks.py:32-56, configs/base_training.yaml:109-114):
monitor a metric (default ``val/acc``), keep the top-k checkpoints, name
directories ``epoch-XX-val_acc-Y.YYY``, and support resume
(``trainer.fit(ckpt_path=...)``, reference: scripts/train.py:199-200).
"""

from __future__ import annotations

import json
import re
import shutil
from pathlib import Path
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


def _sanitize(name: str) -> str:
    return re.sub(r"[^A-Za-z0-9_.-]", "_", name)


class CheckpointManager:
    def __init__(
        self,
        dirpath: str | Path,
        monitor: str = "val/acc",
        mode: str = "max",
        save_top_k: int = 1,
        filename: str | None = None,
        save_last: bool = False,
        resume: bool = False,
    ):
        self.dirpath = Path(dirpath).absolute()
        self.dirpath.mkdir(parents=True, exist_ok=True)
        self.monitor = monitor
        self.mode = mode
        self.save_top_k = save_top_k
        # Lightning-style name template, e.g. the reference default
        # "epoch-{epoch:02d}-val_acc-{val/acc:.3f}"
        # (configs/base_training.yaml:114). None → same pattern derived
        # from the monitored metric.
        self.filename = filename
        # Lightning ModelCheckpoint(save_last=True): additionally overwrite a
        # 'last' checkpoint every validated epoch — the crash-resume anchor
        # (trainer.auto_resume / +ckpt_path=.../last)
        self.save_last = save_last
        self._saved: list[tuple[float, Path]] = []
        self._ckpt = ocp.StandardCheckpointer()
        if resume:
            # continue the best-k ledger across a resumed run: re-read every
            # on-disk checkpoint's ckpt_meta.json (excluding 'last')
            for meta in sorted(self.dirpath.glob("*/ckpt_meta.json")):
                if meta.parent.name == "last":
                    continue
                try:
                    v = json.loads(meta.read_text()).get(self.monitor)
                except (OSError, json.JSONDecodeError):
                    continue
                if v is not None:
                    self._saved.append((float(v), meta.parent))
            self._saved.sort(key=lambda t: t[0], reverse=(self.mode == "max"))

    def _format_name(self, epoch: int, metrics: dict, value: float) -> str:
        if not self.filename:
            return f"epoch-{epoch:02d}-{self.monitor.replace('/', '_')}-{value:.3f}"

        # Expand "{key}" / "{key:fmt}" where key is "epoch" or a metric name
        # (metric names may contain "/", which str.format can't address).
        def repl(m: re.Match) -> str:
            key, fmt = m.group(1), m.group(2) or ""
            if key == "epoch":
                v: Any = epoch
            elif key in metrics:
                v = metrics[key]
            elif key == self.monitor:
                v = value
            else:
                return m.group(0)
            return format(v, fmt)

        return re.sub(r"\{([^{}:]+)(?::([^{}]*))?\}", repl, self.filename)

    # -- save ---------------------------------------------------------------
    def _state_to_pytree(self, state, to_host: bool = False) -> dict:
        tree = {
            "step": state.step,
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "rng": jax.random.key_data(state.rng),
        }
        if to_host:
            # pull to host numpy first: tensorstore's direct device
            # serialization is unreliable on remote-tunnel TPU backends
            tree = jax.tree_util.tree_map(lambda x: np.asarray(jax.device_get(x)), tree)
        return tree

    def save(self, state, epoch: int, metrics: dict) -> Path | None:
        if self.save_top_k == 0:  # checkpointing disabled (save_top_k: 0)
            return None
        value = float(metrics.get(self.monitor, float("nan")))
        if np.isnan(value):
            return None
        # Lightning semantics: save_top_k=-1 keeps every checkpoint
        better = (
            self.save_top_k < 0
            or len(self._saved) < self.save_top_k
            or (self.mode == "max" and value > min(v for v, _ in self._saved))
            or (self.mode == "min" and value < max(v for v, _ in self._saved))
        )
        if not better:
            return None
        name = _sanitize(self._format_name(epoch, metrics, value))
        path = self.dirpath / name
        if path.exists():
            shutil.rmtree(path)
        self._ckpt.save(path, self._state_to_pytree(state, to_host=True))
        self._ckpt.wait_until_finished()
        (path / "ckpt_meta.json").write_text(
            json.dumps({"epoch": epoch, self.monitor: value})
        )
        self._saved.append((value, path))
        self._saved.sort(key=lambda t: t[0], reverse=(self.mode == "max"))
        while self.save_top_k > 0 and len(self._saved) > self.save_top_k:
            _, worst = self._saved.pop()
            shutil.rmtree(worst, ignore_errors=True)
        return path

    def save_last_ckpt(self, state, epoch: int, metrics: dict) -> Path:
        """Overwrite the ``last`` checkpoint (Lightning ``save_last``
        semantics): always the newest state regardless of the monitored
        metric — what ``trainer.auto_resume`` restores after a crash."""
        path = self.dirpath / "last"
        if path.exists():
            shutil.rmtree(path)
        self._ckpt.save(path, self._state_to_pytree(state, to_host=True))
        self._ckpt.wait_until_finished()
        value = metrics.get(self.monitor)
        meta = {"epoch": epoch}
        if value is not None:
            meta[self.monitor] = float(value)
        (path / "ckpt_meta.json").write_text(json.dumps(meta))
        return path

    @property
    def best_path(self) -> Path | None:
        return self._saved[0][1] if self._saved else None

    @property
    def best_value(self) -> float | None:
        return self._saved[0][0] if self._saved else None

    # -- restore --------------------------------------------------------------
    def restore(self, path: str | Path, state):
        """Restore a TrainState from a checkpoint dir (abstract-shape guided)."""
        template = self._state_to_pytree(state)
        abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, template)
        restored = self._ckpt.restore(Path(path).absolute(), abstract)
        return state.replace(
            step=restored["step"],
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
            # impl from the live key: wrap_key_data defaults to threefry,
            # which breaks restore under $DLSC_RNG_IMPL=rbg/unsafe_rbg
            rng=jax.random.wrap_key_data(
                restored["rng"], impl=jax.random.key_impl(state.rng)
            ),
        )


def restore_state(path: str | Path, state):
    """Module-level resume helper (``+ckpt_path=...`` flow)."""
    mgr = CheckpointManager(Path(path).parent if Path(path).name else path)
    return mgr.restore(path, state)


def latest_checkpoint(dirpath: str | Path) -> Path | None:
    """Newest checkpoint under ``dirpath`` by saved epoch (``ckpt_meta.json``)
    — the ``trainer.auto_resume`` discovery. A ``last`` checkpoint
    (``save_last``) at the same epoch wins ties, so crash-resume prefers the
    true latest state over the same-epoch best-k snapshot."""
    best, best_key = None, (-1, 0)
    for meta in Path(dirpath).glob("*/ckpt_meta.json"):
        try:
            epoch = int(json.loads(meta.read_text()).get("epoch", -1))
        except (OSError, json.JSONDecodeError, TypeError, ValueError):
            continue
        key = (epoch, 1 if meta.parent.name == "last" else 0)
        if key > best_key:
            best_key, best = key, meta.parent
    return best


def save_params(path: str | Path, params, meta: dict | None = None) -> Path:
    """Save a params-only orbax checkpoint (pretrained-weight artifact,
    e.g. from scripts/import_vit.py)."""
    path = Path(path).absolute()
    if path.exists():
        shutil.rmtree(path)
    ckpt = ocp.StandardCheckpointer()
    host = jax.tree_util.tree_map(lambda x: np.asarray(jax.device_get(x)), dict(params))
    ckpt.save(path, {"params": host})
    ckpt.wait_until_finished()
    if meta is not None:
        (path / "ckpt_meta.json").write_text(json.dumps(meta))
    return path


def load_params(path: str | Path, params_template):
    """Load a params-only checkpoint (the ``+pretrained_path=...`` warm-start
    flow — fresh optimizer state, imported weights; mirrors the reference's
    pretrained-trunk init at src/models/ast.py:19)."""
    abstract = jax.tree_util.tree_map(
        ocp.utils.to_shape_dtype_struct, {"params": params_template}
    )
    restored = ocp.StandardCheckpointer().restore(Path(path).absolute(), abstract)
    return restored["params"]
