"""Fold-based datamodules for ESC-50 and UrbanSound8K.

Reproduces the reference's split semantics exactly
(reference: src/datasets/esc50.py:335-592):

- one held-out test fold, remaining folds form the train pool,
- stratified validation split from the train pool via sklearn
  ``StratifiedShuffleSplit(n_splits=1, test_size=val_split, random_state=42)``
  (:532-541) — seed 42 is load-bearing for fold-accuracy parity,
- a train/val leakage assertion (:544-546),
- config-constraint validation: BC mixing only with waveform modes, Mixup
  only with spectrogram modes (:437-476).

Unlike the reference (per-item torch.load + host DSP in worker processes),
batches here are raw waveform slices of an mmap'd fold shard; all DSP and
augmentation happens on device via ``DevicePipeline``.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Iterator

import numpy as np

from dlsc_tpu.data.pipeline import DevicePipeline, pipeline_from_dataset_config

_SPECTROGRAM_MODES = {"ast", "cnn_esc50"}
_WAVEFORM_MODES = {"envnet_v2", "raw"}
_KNOWN_MODES = _SPECTROGRAM_MODES | _WAVEFORM_MODES


class Batch(dict):
    """dict with attribute access: keys wave (B,T) f32, label (B,) i32,
    mask (B,) bool (False for padding rows in the final eval batch)."""

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError:
            # AttributeError keeps getattr(b, k, default)/hasattr working
            raise AttributeError(name) from None


class FoldDataModule:
    n_folds: int = 5

    def __init__(
        self,
        root: str,
        num_classes: int,
        fold: int = 0,
        val_split: float = 0.1,
        sample_rate: int = 44_100,
        batch_size: int = 64,
        num_workers: int = 0,           # accepted for config parity; host side is mmap slicing
        pin_memory: bool = True,        # parity no-ops
        persistent_workers: bool = True,
        preprocessing_mode: str = "raw",
        is_spectrogram: bool = False,
        enable_mixup: bool = False,
        mixup_alpha: float = 0.5,
        enable_bc_mixing: bool = False,
        augment: dict | None = None,
        preprocessing_config: dict | None = None,
        drop_last_train: bool = True,
        **extra,
    ):
        if not 0 <= fold < self.n_folds:
            raise ValueError(f"fold must be in [0, {self.n_folds}), got {fold}")
        self.root = Path(root)
        self.num_classes = num_classes
        self.fold = fold
        self.val_split = val_split
        self.sample_rate = sample_rate
        self.batch_size = batch_size
        self.drop_last_train = drop_last_train
        self.dataset_cfg = {
            "preprocessing_mode": preprocessing_mode,
            "is_spectrogram": is_spectrogram,
            "enable_mixup": enable_mixup,
            "mixup_alpha": mixup_alpha,
            "enable_bc_mixing": enable_bc_mixing,
            "augment": augment or {},
            "preprocessing_config": preprocessing_config or {},
            "num_classes": num_classes,
            "sample_rate": sample_rate,
        }
        self._validate_config_constraints()
        self._train = self._val = self._test = None

    # -- constraint validation (reference: esc50.py:437-476) -----------------
    def _validate_config_constraints(self) -> None:
        cfg = self.dataset_cfg
        mode = cfg["preprocessing_mode"]
        if mode not in _KNOWN_MODES:
            raise ValueError(f"Unknown preprocessing_mode {mode!r}; known: {_KNOWN_MODES}")
        if cfg["enable_bc_mixing"] and mode in _SPECTROGRAM_MODES:
            raise ValueError("BC mixing requires a waveform preprocessing mode")
        if cfg["enable_mixup"] and mode not in _SPECTROGRAM_MODES:
            raise ValueError("Mixup requires a spectrogram preprocessing mode")
        if cfg["is_spectrogram"] != (mode in _SPECTROGRAM_MODES):
            raise ValueError(
                f"is_spectrogram={cfg['is_spectrogram']} inconsistent with mode {mode!r}"
            )

    # -- setup ----------------------------------------------------------------
    def setup(self) -> None:
        if self._train is not None:
            return
        folds = {}
        for k in range(self.n_folds):
            d = self.root / f"fold_{k}"
            if not d.exists():
                raise FileNotFoundError(
                    f"{d} missing — run scripts/prepare_*.py (or synthetic gen) first"
                )
            folds[k] = {
                "waves": np.load(d / "waves.npy", mmap_mode="r"),
                "labels": np.load(d / "labels.npy"),
                "names": json.loads((d / "names.json").read_text()),
            }
        test = folds[self.fold]
        train_folds = [folds[k] for k in range(self.n_folds) if k != self.fold]
        waves = [f["waves"] for f in train_folds]
        labels = np.concatenate([f["labels"] for f in train_folds])
        names = [n for f in train_folds for n in f["names"]]

        # stratified val split, seed 42 (reference: esc50.py:532-541)
        idx = np.arange(len(labels))
        if self.val_split > 0:
            from sklearn.model_selection import StratifiedShuffleSplit

            splitter = StratifiedShuffleSplit(
                n_splits=1, test_size=self.val_split, random_state=42
            )
            train_idx, val_idx = next(splitter.split(idx, labels))
        else:
            train_idx, val_idx = idx, np.array([], dtype=int)

        # leakage assert (reference: esc50.py:544-546)
        assert not set(train_idx) & set(val_idx), "train/val overlap detected"

        self._pool = _ConcatWaves(waves)
        self._pool_labels = labels
        self._pool_names = names
        self._train = np.sort(train_idx)
        self._val = np.sort(val_idx)
        self._test = test

    # -- iteration --------------------------------------------------------------
    def _iter_index(
        self, order: np.ndarray, *, drop_last: bool, training: bool = False,
    ) -> Iterator[tuple[np.ndarray, np.ndarray]]:
        """Yield (sel, mask) index batches — the single source of batch
        composition for both the host path and the device-resident path, so
        sample order is identical between them."""
        B = self.batch_size
        n = len(order)
        end = (n // B) * B if drop_last else n
        for s in range(0, end, B):
            sel = order[s : s + B]
            if len(sel) < B and training:
                # train steps carry no mask: pad with *real* samples (wrapped
                # repeats) rather than zero waveforms labeled class 0
                reps = -(-B // len(sel))
                sel = np.tile(sel, reps)[:B]
            mask = np.ones(len(sel), dtype=bool)
            if len(sel) < B:  # pad final eval batch to the static shape
                pad = B - len(sel)
                sel = np.concatenate([sel, np.zeros(pad, sel.dtype)])
                mask = np.concatenate([mask, np.zeros(pad, dtype=bool)])
            yield sel.astype(np.int32), mask

    def _iter_split(
        self, waves, labels, order: np.ndarray, *, drop_last: bool,
        training: bool = False,
    ) -> Iterator[Batch]:
        for sel, mask in self._iter_index(order, drop_last=drop_last,
                                          training=training):
            w = waves[sel]
            y = labels[sel]
            w = np.where(mask[(...,) + (None,) * (w.ndim - 1)], w, 0)
            y = np.where(mask, y, 0)
            # int16 shards stay int16 on the wire (half the host→device
            # bytes); the device pipeline rescales to float on chip
            yield Batch(
                wave=np.ascontiguousarray(w),
                label=y.astype(np.int32),
                mask=mask,
            )

    def train_batches(self, epoch: int = 0, seed: int = 42) -> Iterator[Batch]:
        self.setup()
        order = self._train_order(epoch, seed)
        return self._iter_split(
            self._pool, self._pool_labels, order,
            drop_last=self.drop_last_train, training=True,
        )

    def val_batches(self) -> Iterator[Batch]:
        self.setup()
        return self._iter_split(self._pool, self._pool_labels, self._val, drop_last=False)

    def test_batches(self) -> Iterator[Batch]:
        self.setup()
        t = self._test
        order = np.arange(len(t["labels"]))
        return self._iter_split(t["waves"], t["labels"], order, drop_last=False)

    def _train_order(self, epoch: int, seed: int) -> np.ndarray:
        rng = np.random.default_rng(seed + epoch)
        return self._train[rng.permutation(len(self._train))]

    # -- device-resident path (TPU-native: the dataset lives in HBM) ----------
    #
    # The reference pre-loads all waveforms into host RAM when the dataset is
    # small (esc50.py:167-191); the TPU-native equivalent uploads the fold
    # pools to device memory ONCE and the jitted step gathers rows by index
    # on chip — the per-step host→device traffic drops from the waveform
    # batch (tens of MB) to a (B,) int32 index + (B,) label array.

    @property
    def pool_nbytes(self) -> int:
        """Bytes of the train+val pool plus the test fold (wire dtype)."""
        self.setup()
        itemsize = self._pool.arrays[0].dtype.itemsize
        n = self._pool.shape[0] + len(self._test["labels"])
        return int(n * int(np.prod(self._pool.shape[1:])) * itemsize)

    def pool_parts(self) -> tuple[list[np.ndarray], np.ndarray, np.ndarray, np.ndarray]:
        """(train-pool per-fold arrays, pool labels, test waves, test labels)
        for one-time device upload. Per-fold parts avoid a host-RAM concat."""
        self.setup()
        return (list(self._pool.arrays), self._pool_labels,
                self._test["waves"], self._test["labels"])

    def train_index_batches(self, epoch: int = 0, seed: int = 42):
        """(idx, label, mask) batches over the device-resident train pool —
        identical composition to train_batches (shared _iter_index)."""
        self.setup()
        order = self._train_order(epoch, seed)
        for sel, mask in self._iter_index(order, drop_last=self.drop_last_train,
                                          training=True):
            yield Batch(idx=sel, label=self._pool_labels[sel].astype(np.int32),
                        mask=mask)

    def val_index_batches(self):
        self.setup()
        for sel, mask in self._iter_index(self._val, drop_last=False):
            y = np.where(mask, self._pool_labels[sel], 0)
            yield Batch(idx=sel, label=y.astype(np.int32), mask=mask)

    def test_index_batches(self):
        self.setup()
        t = self._test
        order = np.arange(len(t["labels"]))
        for sel, mask in self._iter_index(order, drop_last=False):
            y = np.where(mask, t["labels"][sel], 0)
            yield Batch(idx=sel, label=y.astype(np.int32), mask=mask,
                        split="test")

    # -- sizes / metadata ---------------------------------------------------------
    def setup_sizes(self) -> dict:
        self.setup()
        return {
            "train": len(self._train),
            "val": len(self._val),
            "test": len(self._test["labels"]),
        }

    @property
    def steps_per_epoch(self) -> int:
        self.setup()
        n = len(self._train)
        return n // self.batch_size if self.drop_last_train else -(-n // self.batch_size)

    @property
    def pipeline(self) -> DevicePipeline:
        return pipeline_from_dataset_config(self.dataset_cfg)

    def summary(self) -> str:
        sizes = self.setup_sizes()
        cfg = self.dataset_cfg
        return (
            f"{type(self).__name__}(root={self.root}, fold={self.fold}, "
            f"mode={cfg['preprocessing_mode']}, mixup={cfg['enable_mixup']}, "
            f"bc={cfg['enable_bc_mixing']}, sizes={sizes})"
        )


class _ConcatWaves:
    """Lazy concat view over per-fold mmap'd (N_k, T) arrays with fancy
    indexing — avoids copying the training pool into RAM."""

    def __init__(self, arrays):
        self.arrays = arrays
        self.offsets = np.cumsum([0] + [len(a) for a in arrays])
        self.shape = (int(self.offsets[-1]),) + arrays[0].shape[1:]

    def __len__(self):
        return self.shape[0]

    def __getitem__(self, idx):
        idx = np.asarray(idx)
        scalar = idx.ndim == 0
        idx = np.atleast_1d(idx)
        out = np.empty((len(idx),) + self.shape[1:], dtype=self.arrays[0].dtype)
        which = np.searchsorted(self.offsets, idx, side="right") - 1
        for k, a in enumerate(self.arrays):
            sel = which == k
            if sel.any():
                out[sel] = a[idx[sel] - self.offsets[k]]
        return out[0] if scalar else out


class ESC50DataModule(FoldDataModule):
    """ESC-50: 5 official folds (reference: src/datasets/esc50.py:335)."""

    n_folds = 5


class US8KDataModule(FoldDataModule):
    """UrbanSound8K: 10 official folds. Capability-parity extension — the
    reference references `dataset=urbansound8k` (README.md:69) but ships no
    DataModule for it (SURVEY.md §7 gap note)."""

    n_folds = 10
