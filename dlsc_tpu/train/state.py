"""TrainState pytree: params + batch stats + optimizer state + step + RNG.

The functional replacement for the reference's LightningModule instance
state (reference: src/training/engine.py:49-111). Checkpointable with Orbax
as a plain pytree.
"""

from __future__ import annotations

from typing import Any, Callable

import flax.struct
import jax
import optax


@flax.struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    rng: jax.Array
    apply_fn: Callable = flax.struct.field(pytree_node=False)
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)
    #: optional extra variable collection merged into every apply as 'hyper'
    #: — per-state (and under vmap per-trial) hyperparameters read by the
    #: model at trace time, e.g. HyperDropout rates (hpo/vmapped.py). None
    #: for every ordinary model (a None pytree leaf is empty, so checkpoints
    #: and shardings are unaffected).
    hyper: Any = None

    @classmethod
    def create(cls, *, apply_fn, params, batch_stats, tx, rng,
               hyper=None) -> "TrainState":
        import jax.numpy as jnp

        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=tx.init(params),
            rng=rng,
            apply_fn=apply_fn,
            tx=tx,
            hyper=hyper,
        )

    def apply_gradients(self, grads) -> "TrainState":
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            opt_state=new_opt,
        )
