"""Optimizer/scheduler factories with torch semantics over optax.

The reference instantiates ``torch.optim.*`` / ``torch.optim.lr_scheduler.*``
from config (reference: configs/base_training.yaml:57-67,
src/training/engine.py:299-310); our config aliases map those targets here.
Factories return declarative specs; ``build_optimizer`` lowers a
(optimizer spec, scheduler spec) pair to an optax GradientTransformation
with a per-step learning-rate schedule. Torch schedulers step per *epoch*,
so schedules take ``steps_per_epoch`` and floor-divide the step count.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable

import optax


@dataclasses.dataclass(frozen=True)
class OptimizerSpec:
    name: str
    lr: float
    weight_decay: float = 0.0
    betas: tuple[float, float] = (0.9, 0.999)
    eps: float = 1e-8
    momentum: float = 0.0


@dataclasses.dataclass(frozen=True)
class SchedulerSpec:
    name: str
    T_max: int = 100
    eta_min: float = 0.0
    step_size: int = 30
    gamma: float = 0.1


def adam(lr: float = 1e-3, weight_decay: float = 0.0, betas=(0.9, 0.999),
         eps: float = 1e-8, **_) -> OptimizerSpec:
    return OptimizerSpec("adam", float(lr), float(weight_decay), tuple(betas), float(eps))


def adamw(lr: float = 1e-3, weight_decay: float = 1e-2, betas=(0.9, 0.999),
          eps: float = 1e-8, **_) -> OptimizerSpec:
    return OptimizerSpec("adamw", float(lr), float(weight_decay), tuple(betas), float(eps))


def sgd(lr: float = 1e-2, momentum: float = 0.0, weight_decay: float = 0.0, **_) -> OptimizerSpec:
    return OptimizerSpec("sgd", float(lr), float(weight_decay), momentum=float(momentum))


def cosine_annealing(T_max: int, eta_min: float = 0.0, **_) -> SchedulerSpec:
    return SchedulerSpec("cosine", T_max=int(T_max), eta_min=float(eta_min))


def step_lr(step_size: int = 30, gamma: float = 0.1, **_) -> SchedulerSpec:
    return SchedulerSpec("step", step_size=int(step_size), gamma=float(gamma))


def lr_schedule(
    optim: OptimizerSpec, sched: SchedulerSpec | None, steps_per_epoch: int
) -> Callable[[int], float]:
    """Per-step LR function; epoch-granular like torch schedulers."""
    base = optim.lr

    def fn(step):
        epoch = step // max(steps_per_epoch, 1)
        if sched is None:
            return base
        if sched.name == "cosine":
            # torch CosineAnnealingLR closed form
            return sched.eta_min + (base - sched.eta_min) * 0.5 * (
                1.0 + math.cos(math.pi * epoch / sched.T_max)
            )
        if sched.name == "step":
            return base * (sched.gamma ** (epoch // sched.step_size))
        raise ValueError(f"Unknown scheduler {sched.name}")

    return fn


def swa_lr_wrap(
    base_py: Callable[[int], float],
    base_jax,
    *,
    swa_lr: float,
    start_epoch: int,
    annealing_epochs: int,
    steps_per_epoch: int,
):
    """SWA learning-rate schedule (reference: src/training/callbacks.py:71-79
    passes ``swa_lrs`` to Lightning's StochasticWeightAveraging, which uses
    torch SWALR): from ``start_epoch`` the LR cosine-anneals from the
    scheduled value at SWA start down to ``swa_lr`` over ``annealing_epochs``
    epochs, then holds ``swa_lr``."""
    spe = max(steps_per_epoch, 1)
    lr0 = float(base_py(start_epoch * spe))
    ann = max(int(annealing_epochs), 1)

    def py_fn(step):
        epoch = step // spe
        if epoch < start_epoch:
            return base_py(step)
        t = min(1.0, (epoch - start_epoch + 1) / ann)
        return swa_lr + (lr0 - swa_lr) * 0.5 * (1.0 + math.cos(math.pi * t))

    def jax_fn(step):
        import jax.numpy as jnp

        epoch = step // spe
        t = jnp.minimum(1.0, (epoch - start_epoch + 1) / ann)
        swa_val = swa_lr + (lr0 - swa_lr) * 0.5 * (1.0 + jnp.cos(jnp.pi * t))
        return jnp.where(epoch < start_epoch, base_jax(step), swa_val)

    return py_fn, jax_fn


def build_optimizer(
    optim: OptimizerSpec,
    sched: SchedulerSpec | None,
    steps_per_epoch: int,
    gradient_clip_val: float | None = None,
    swa: dict | None = None,
) -> tuple[optax.GradientTransformation, Callable[[int], float]]:
    """Lower specs to optax. Torch-Adam weight decay is L2 added to the
    gradient *before* the moment updates (not decoupled) — modeled with
    add_decayed_weights ahead of scale_by_adam.

    ``swa``: optional {"swa_lr", "start_epoch", "annealing_epochs"} — bakes
    the SWA learning-rate phase into the schedule (see swa_lr_wrap)."""
    schedule = lr_schedule(optim, sched, steps_per_epoch)
    traced_schedule = schedule_jax(optim, sched, steps_per_epoch)
    if swa and swa.get("swa_lr") is not None:
        schedule, traced_schedule = swa_lr_wrap(
            schedule, traced_schedule,
            swa_lr=float(swa["swa_lr"]),
            start_epoch=int(swa["start_epoch"]),
            annealing_epochs=int(swa.get("annealing_epochs", 10)),
            steps_per_epoch=steps_per_epoch,
        )
    parts = []
    if gradient_clip_val:
        parts.append(optax.clip_by_global_norm(float(gradient_clip_val)))
    if optim.name == "adam":
        if optim.weight_decay:
            parts.append(optax.add_decayed_weights(optim.weight_decay))
        parts.append(optax.scale_by_adam(b1=optim.betas[0], b2=optim.betas[1], eps=optim.eps))
    elif optim.name == "adamw":
        parts.append(optax.scale_by_adam(b1=optim.betas[0], b2=optim.betas[1], eps=optim.eps))
        if optim.weight_decay:
            parts.append(optax.add_decayed_weights(optim.weight_decay))
    elif optim.name == "sgd":
        if optim.weight_decay:
            parts.append(optax.add_decayed_weights(optim.weight_decay))
        if optim.momentum:
            parts.append(optax.trace(decay=optim.momentum))
    else:
        raise ValueError(f"Unknown optimizer {optim.name}")
    parts.append(optax.scale_by_schedule(lambda s: -traced_schedule(s)))
    return optax.chain(*parts), schedule


def schedule_jax(optim: OptimizerSpec, sched: SchedulerSpec | None, steps_per_epoch: int):
    """jnp-traceable version of lr_schedule (step may be a traced array)."""
    import jax.numpy as jnp

    base = optim.lr

    def fn(step):
        epoch = step // max(steps_per_epoch, 1)
        if sched is None:
            return jnp.asarray(base, jnp.float32)
        if sched.name == "cosine":
            return sched.eta_min + (base - sched.eta_min) * 0.5 * (
                1.0 + jnp.cos(jnp.pi * epoch / sched.T_max)
            )
        if sched.name == "step":
            return base * (sched.gamma ** (epoch // sched.step_size))
        raise ValueError(f"Unknown scheduler {sched.name}")

    return fn
