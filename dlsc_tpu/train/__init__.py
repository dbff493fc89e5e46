"""Training engine: pure-function train/eval steps over a TrainState pytree,
a fit/eval loop with checkpointing and early stopping, losses, optimizers,
and jit-friendly metrics. Functional replacement for the reference's
LightningModule stack (reference: src/training/engine.py)."""

from dlsc_tpu.train.losses import CrossEntropyLoss, KLDivLoss
from dlsc_tpu.train.state import TrainState
from dlsc_tpu.train.loop import Trainer, build_from_cfg

__all__ = ["CrossEntropyLoss", "KLDivLoss", "TrainState", "Trainer", "build_from_cfg"]
