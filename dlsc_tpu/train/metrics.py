"""Streaming classification metrics as a jit-friendly pytree.

The reference uses torchmetrics (reference: src/training/engine.py:104-111,
188-196): Accuracy (micro top-1) for train/val/test, MulticlassF1Score
(macro), MulticlassAUROC (macro, one-vs-rest), MulticlassConfusionMatrix and
per-class accuracy for the test report. Here accuracy/F1/confmat/per-class
stream through a single (C, C) confusion-matrix accumulator updated on
device; AUROC needs full score distributions, so eval collects
(probs, labels) on host (test sets are small: 400×50 for ESC-50).

Metric names are load-bearing strings (checkpoint monitor / early stop /
pruning keys — reference: configs/base_training.yaml:110,120): ``train/acc``,
``val/acc``, ``val/loss``, ``test/acc``, ``test/f1``, ``test/auroc``.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np


@flax.struct.dataclass
class MetricState:
    confmat: jax.Array     # (C, C) int32: [true, pred]
    loss_sum: jax.Array    # f32
    count: jax.Array       # i32 (samples)
    batches: jax.Array     # i32
    #: optional streaming per-batch-mean sums of auxiliary scalars (e.g. MoE
    #: drop fraction / expert utilization): {name: f32 sum over batches}.
    #: None for ordinary runs — the pytree structure must be fixed at
    #: creation (a mid-run None→dict change would retrace the step), so
    #: callers that want extras pass their names to ``create``.
    extra_sums: Any = None

    @classmethod
    def create(cls, num_classes: int,
               extras: tuple[str, ...] = ()) -> "MetricState":
        return cls(
            confmat=jnp.zeros((num_classes, num_classes), jnp.int32),
            loss_sum=jnp.zeros((), jnp.float32),
            count=jnp.zeros((), jnp.int32),
            batches=jnp.zeros((), jnp.int32),
            extra_sums=(
                {k: jnp.zeros((), jnp.float32) for k in extras}
                if extras else None),
        )

    def add_extras(self, values: dict) -> "MetricState":
        """Accumulate auxiliary per-batch scalars (no-op unless this state
        was created with matching ``extras`` names)."""
        if self.extra_sums is None or not values:
            return self
        sums = {k: self.extra_sums[k] + values[k]
                for k in self.extra_sums if k in values}
        missing = {k: v for k, v in self.extra_sums.items() if k not in values}
        return self.replace(extra_sums={**sums, **missing})

    def extra_means(self) -> dict:
        """Per-batch means of the accumulated auxiliary scalars."""
        if self.extra_sums is None:
            return {}
        b = jnp.maximum(self.batches, 1)
        return {k: v / b for k, v in self.extra_sums.items()}

    def update(
        self,
        logits: jax.Array,
        hard_labels: jax.Array,
        loss: jax.Array,
        mask: jax.Array | None = None,
    ) -> "MetricState":
        preds = jnp.argmax(logits, axis=-1)
        C = self.confmat.shape[0]
        if mask is None:
            mask = jnp.ones_like(hard_labels, dtype=bool)
        idx = hard_labels * C + preds
        upd = jnp.zeros(C * C, jnp.int32).at[idx].add(mask.astype(jnp.int32))
        n_valid = jnp.sum(mask.astype(jnp.int32))
        # loss is the per-batch mean over valid samples; weight it by the
        # valid count so mean_loss is sample-exact even with a ragged final
        # batch (not mean-of-batch-means).
        return self.replace(
            confmat=self.confmat + upd.reshape(C, C),
            loss_sum=self.loss_sum + loss * n_valid,
            count=self.count + n_valid,
            batches=self.batches + 1,
        )


def accuracy(ms: MetricState) -> jax.Array:
    """Micro top-1 (torchmetrics Accuracy(task='multiclass') default)."""
    return jnp.trace(ms.confmat) / jnp.maximum(jnp.sum(ms.confmat), 1)


def mean_loss(ms: MetricState) -> jax.Array:
    """Sample-weighted mean loss (exact under ragged final eval batches)."""
    return ms.loss_sum / jnp.maximum(ms.count, 1)


def per_class_accuracy(ms: MetricState) -> jax.Array:
    """Recall per class (torchmetrics MulticlassAccuracy(average=None))."""
    support = jnp.sum(ms.confmat, axis=1)
    return jnp.where(support > 0, jnp.diag(ms.confmat) / jnp.maximum(support, 1), 0.0)


def macro_f1(ms: MetricState) -> jax.Array:
    """MulticlassF1Score default (macro over classes)."""
    tp = jnp.diag(ms.confmat).astype(jnp.float32)
    fp = jnp.sum(ms.confmat, axis=0) - tp
    fn = jnp.sum(ms.confmat, axis=1) - tp
    f1 = 2 * tp / jnp.maximum(2 * tp + fp + fn, 1e-9)
    present = (tp + fn) > 0  # torchmetrics averages over all classes w/ support
    return jnp.sum(jnp.where(present, f1, 0.0)) / jnp.maximum(jnp.sum(present), 1)


def macro_auroc(probs: np.ndarray, labels: np.ndarray, num_classes: int) -> float:
    """One-vs-rest macro AUROC from collected scores (host-side numpy;
    matches torchmetrics MulticlassAUROC default)."""
    aucs = []
    for c in range(num_classes):
        pos = labels == c
        n_pos, n_neg = int(pos.sum()), int((~pos).sum())
        if n_pos == 0 or n_neg == 0:
            continue
        order = np.argsort(probs[:, c], kind="mergesort")
        ranks = np.empty(len(order), dtype=np.float64)
        # average ranks for ties
        sorted_scores = probs[order, c]
        ranks_sorted = np.arange(1, len(order) + 1, dtype=np.float64)
        i = 0
        while i < len(order):
            j = i
            while j + 1 < len(order) and sorted_scores[j + 1] == sorted_scores[i]:
                j += 1
            ranks_sorted[i : j + 1] = 0.5 * (i + 1 + j + 1)
            i = j + 1
        ranks[order] = ranks_sorted
        auc = (ranks[pos].sum() - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg)
        aucs.append(auc)
    return float(np.mean(aucs)) if aucs else 0.0


class Accuracy:
    """Config-compat shim: ``torchmetrics.classification.Accuracy`` targets
    resolve here (reference: configs/base_training.yaml:92-96). Holds only
    metadata — streaming happens through MetricState."""

    def __init__(self, task: str = "multiclass", num_classes: int | None = None, **_: Any):
        self.task = task
        self.num_classes = num_classes
