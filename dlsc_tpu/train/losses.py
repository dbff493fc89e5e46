"""Loss functions matching the reference's soft-label dispatch.

The reference always feeds soft labels (one-hot or mixed) and branches on
the criterion class (reference: src/training/engine.py:163-183):

- CrossEntropyLoss → manual soft cross-entropy
  ``-Σ y·log(softmax(logits) + 1e-8)`` averaged over the batch (:176-178),
- KLDivLoss(reduction='batchmean') → ``Σ y·(log y − log_softmax(logits))/B``
  (:167-173).

Note the AST models output sigmoid probabilities, not logits
(src/models/ast.py:63); these losses treat them as logits exactly like the
reference does — quirk preserved.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


def _smooth(targets: jax.Array, label_smoothing: float) -> jax.Array:
    if label_smoothing <= 0:
        return targets
    C = targets.shape[-1]
    return targets * (1.0 - label_smoothing) + label_smoothing / C


@dataclasses.dataclass(frozen=True)
class CrossEntropyLoss:
    """Soft cross-entropy with optional label smoothing
    (reference config: configs/base_training.yaml:84-86)."""

    label_smoothing: float = 0.0
    reduction: str = "mean"

    def __call__(self, logits: jax.Array, targets: jax.Array,
                 mask: jax.Array | None = None) -> jax.Array:
        y = _smooth(targets, self.label_smoothing)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        per = -jnp.sum(y * jnp.log(probs + 1e-8), axis=-1)
        return _reduce(per, mask, self.reduction)


@dataclasses.dataclass(frozen=True)
class KLDivLoss:
    """torch.nn.KLDivLoss(log_probs, probs) with batchmean reduction —
    the BC-mixing loss option (reference: base_training.yaml:75-77)."""

    reduction: str = "batchmean"
    label_smoothing: float = 0.0  # accepted for config interchangeability

    def __call__(self, logits: jax.Array, targets: jax.Array,
                 mask: jax.Array | None = None) -> jax.Array:
        y = _smooth(targets, self.label_smoothing)
        log_q = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        # xlogy semantics: 0·log(0) = 0
        per = jnp.sum(jnp.where(y > 0, y * (jnp.log(jnp.where(y > 0, y, 1.0)) - log_q), 0.0), axis=-1)
        if self.reduction == "batchmean":
            if mask is not None:
                return jnp.sum(per * mask) / jnp.maximum(jnp.sum(mask), 1)
            return jnp.mean(per)
        if self.reduction == "mean":
            # torch KLDivLoss 'mean' divides by element count (B*C)
            C = targets.shape[-1]
            return _reduce(per, mask, "mean") / C
        return _reduce(per, mask, self.reduction)


def _reduce(per: jax.Array, mask: jax.Array | None, reduction: str) -> jax.Array:
    if mask is not None:
        per = per * mask
        n = jnp.maximum(jnp.sum(mask), 1)
    else:
        n = per.shape[0]
    if reduction == "mean":
        return jnp.sum(per) / n
    if reduction == "sum":
        return jnp.sum(per)
    return per
