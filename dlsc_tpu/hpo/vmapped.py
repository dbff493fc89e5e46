"""Vmapped multi-trial HPO: train K hyperparameter trials in lockstep on one
chip (or mesh) as a single jitted program.

The reference runs Optuna trials strictly sequentially
(reference: src/optimization/optuna_trainer.py:94-99); on TPU, trials of the
*same architecture* that differ only in continuous hyperparameters
(learning rate, weight decay, label smoothing, dropout rate) can share every
forward/backward as a vmapped batch — one compilation, K× the arithmetic intensity,
no per-trial dispatch overhead. This is the BASELINE.json "vmapped
multi-trial search across the TPU mesh" capability.

Mechanics:

- per-trial optimizer hyperparameters ride inside the optimizer state via
  ``optax.inject_hyperparams`` so a single GradientTransformation works
  under vmap with per-trial values,
- per-trial parameter inits and RNG streams (different seeds),
- the data stream is shared across trials (lockstep epochs),
- per-epoch validation accuracies are reported to the Study so TPE/Hyperband
  see the same evidence as sequential trials.

Two execution modes:

- ``run_batch(k)``: one fixed batch of K trials for ``epochs`` epochs.
  Pruned trials keep computing (their slots are marked).
- ``run_continuous(k, total_trials)``: **slot recycling** — when a trial is
  pruned or finishes its epoch budget, its slot is immediately re-initialized
  with a fresh TPE suggestion (per-slot scatter into the stacked state; no
  recompilation since K stays constant). This realizes Hyperband's
  resource-efficiency in lockstep form: pruned trials stop consuming compute
  because their slot is handed to a new candidate.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dlsc_tpu.hpo.study import Study, Trial, TrialState
from dlsc_tpu.train.metrics import MetricState, accuracy
from dlsc_tpu.train.state import TrainState

VMAPPABLE = ("optimizer.lr", "optimizer.weight_decay", "loss.label_smoothing",
             "model.dropout", "dataset.mixup_alpha",
             "scheduler.T_max", "scheduler.warmup_frac")
# THE vmapped-HPO frontier (VERDICT r3 #5 asked for it in one place).
# What fans out across lockstep slots:
# - optimizer.lr / optimizer.weight_decay ride in the optimizer state
#   (inject_hyperparams),
# - loss.label_smoothing is a traced scalar in the loss closure,
# - model.dropout rides in the TrainState's 'hyper' collection, read by
#   HyperDropout at trace time (models/vit.py) — the Bernoulli threshold and
#   1/keep rescale become per-trial traced values. Requires a model exposing
#   `hyper_dropout` (the ViT family).
# - dataset.mixup_alpha is a traced Beta parameter threaded through
#   DevicePipeline.train_batch(mixup_alpha=...) into ops.augment.mixup —
#   jax.random.beta takes array a/b, so per-slot α vmaps cleanly. Requires
#   the pipeline to have enable_mixup=True (α > 0 everywhere in the space).
# - scheduler.T_max (cosine period, epochs) / scheduler.warmup_frac: the LR
#   schedule VALUE is a scalar function of the adam step count, so its shape
#   parameters ride in the optimizer state like lr does
#   (schedule_factor below; T_max=0 ⇒ constant lr).
# What CANNOT fan out — anything that changes the traced *program* rather
# than a value in it: the optimizer family (adam vs sgd is different state
# structure), the scheduler FAMILY (cosine vs step vs plateau is different
# control flow; only the cosine+warmup shape is parameterized here),
# categorical/architecture dims (emb_dim, depth, attention impl, batch
# size), and preprocessing mode. Those dimensions go through the sequential
# runner (hpo/runner.py), which shares the same Study so TPE/Hyperband see
# all evidence.


def schedule_factor(count, t_max_steps, warmup_steps):
    """Warmup + cosine LR multiplier at adam step ``count`` (all traced).

    linear 0→1 over ``warmup_steps``, then cosine 1→0 over the remaining
    ``t_max_steps - warmup_steps``; ``t_max_steps == 0`` means no schedule
    (constant 1.0). Mirrors train/optim.py cosine_annealing + warmup but as
    a pure function of per-trial scalars, so K vmapped trials each get
    their own schedule shape inside one compiled program.
    """
    c = jnp.asarray(count, jnp.float32)
    t_max = jnp.asarray(t_max_steps, jnp.float32)
    warm = jnp.asarray(warmup_steps, jnp.float32)
    warm_f = jnp.where(warm > 0, jnp.minimum(c / jnp.maximum(warm, 1.0), 1.0),
                       1.0)
    prog = jnp.clip((c - warm) / jnp.maximum(t_max - warm, 1.0), 0.0, 1.0)
    cos = 0.5 * (1.0 + jnp.cos(jnp.pi * prog))
    return jnp.where(t_max > 0, warm_f * cos, 1.0)


def _adam_count(state):
    """The ScaleByAdamState step counter inside an (injected) optax state."""
    found = []

    def visit(s):
        if isinstance(s, optax.ScaleByAdamState):
            found.append(s.count)
            return True
        return False

    jax.tree_util.tree_leaves(state, is_leaf=visit)
    if not found:
        raise ValueError("no ScaleByAdamState in optimizer state")
    return found[0]


def _make_injected_tx(gradient_clip_val: float | None):
    """Adam whose lr / weight decay / schedule shape live in the optimizer
    *state* (inject_hyperparams), so one GradientTransformation serves K
    vmapped trials with per-slot values.

    ``t_max_steps`` / ``warmup_steps`` parameterize a per-trial
    warmup+cosine schedule evaluated from the adam step count
    (schedule_factor); 0 disables it (constant lr).
    """

    def wrapped(learning_rate, weight_decay, t_max_steps=0.0,
                warmup_steps=0.0):
        parts = []
        if gradient_clip_val:
            parts.append(optax.clip_by_global_norm(float(gradient_clip_val)))
        parts.append(optax.add_decayed_weights(weight_decay))
        parts.append(optax.scale_by_adam())
        parts.append(optax.scale(-1.0))
        inner = optax.chain(*parts)

        def update(grads, state, params=None):
            lr = learning_rate * schedule_factor(
                _adam_count(state), t_max_steps, warmup_steps)
            updates, new_state = inner.update(grads, state, params)
            updates = jax.tree_util.tree_map(lambda u: u * lr, updates)
            return updates, new_state

        return optax.GradientTransformation(inner.init, update)

    return optax.inject_hyperparams(wrapped)


class _AlphaPipe:
    """Pipeline view that threads a (possibly traced) per-trial mixup α into
    every train_batch call; everything else delegates to the wrapped
    DevicePipeline."""

    def __init__(self, pipe, alpha):
        self._pipe = pipe
        self._alpha = alpha

    def train_batch(self, wave, labels, key):
        return self._pipe.train_batch(wave, labels, key,
                                      mixup_alpha=self._alpha)

    def __getattr__(self, name):
        return getattr(self._pipe, name)


@dataclasses.dataclass
class VmappedResult:
    trial_numbers: list[int]
    values: list[float]
    states: Any  # stacked TrainState (leading axis K)
    history: list[dict]


class VmappedTrialRunner:
    def __init__(
        self,
        study: Study,
        model,
        pipeline,
        datamodule,
        *,
        epochs: int = 10,
        lr_space: dict | None = None,
        wd_space: dict | None = None,
        ls_space: dict | None = None,
        do_space: dict | None = None,  # model.dropout search space — needs a
                                       # model with the hyper_dropout hook
        ma_space: dict | None = None,  # dataset.mixup_alpha search space —
                                       # needs a pipeline with enable_mixup
        tmax_space: dict | None = None,  # scheduler.T_max (cosine period,
                                         # EPOCHS; int) — converted to steps
                                         # via datamodule.steps_per_epoch and
                                         # threaded into the per-trial
                                         # warmup+cosine schedule_factor
        wu_space: dict | None = None,    # scheduler.warmup_frac (fraction of
                                         # T_max spent in linear warmup)
        gradient_clip_val: float | None = 1.0,
        min_epochs: int = 0,
        seed: int = 0,
        plan=None,  # MeshPlan: shard the trial axis over the mesh 'data'
                    # axis — K lockstep trials spread across the chips
                    # (K % n_data == 0), data batch replicated. Each chip
                    # trains K/n_data trials; no cross-trial collectives
                    # exist, so scaling is embarrassingly parallel.
    ):
        self.study = study
        if do_space is not None:
            if not hasattr(model, "hyper_dropout"):
                raise ValueError(
                    "do_space (per-trial dropout) needs a model with the "
                    f"hyper_dropout hook (the ViT family); "
                    f"{type(model).__name__} has none")
            model = model.clone(hyper_dropout=True)
        if ma_space is not None:
            if not pipeline.cfg.enable_mixup:
                raise ValueError(
                    "ma_space (per-trial mixup alpha) needs a pipeline with "
                    "enable_mixup=True")
            if float(ma_space["low"]) <= 0:
                raise ValueError(
                    "ma_space.low must be > 0: a traced Beta alpha cannot "
                    "take the alpha<=0 'mixup off' escape (ops/augment.mixup)")
        if wu_space is not None and tmax_space is None:
            raise ValueError(
                "wu_space (warmup fraction) needs tmax_space: warmup is a "
                "fraction of the cosine period")
        self.model = model
        self.pipeline = pipeline
        self.datamodule = datamodule
        self.epochs = epochs
        self.lr_space = lr_space or {"type": "float", "low": 1e-5, "high": 1e-2,
                                     "log": True}
        self.wd_space = wd_space or {"type": "float", "low": 1e-6, "high": 1e-2,
                                     "log": True}
        self.ls_space = ls_space  # None → label smoothing not searched
        self.do_space = do_space  # None → dropout not searched
        self.ma_space = ma_space  # None → mixup alpha not searched
        self.tmax_space = tmax_space  # None → no schedule (constant lr)
        self.wu_space = wu_space      # None → no warmup
        self.gradient_clip_val = gradient_clip_val
        self.min_epochs = min_epochs
        self.seed = seed
        self.plan = plan

    # -- trial batch construction ------------------------------------------------
    def _ask_batch(self, k: int) -> tuple[list[Trial], dict[str, np.ndarray]]:
        """Ask K trials; returns the per-slot hyperparameter arrays keyed
        'lr', 'wd', 'ls', 'do', 'ma', 'tm' (T_max, steps), 'wu' (warmup,
        steps)."""
        spe = self.datamodule.steps_per_epoch
        trials = []
        cols: dict[str, list] = {n: [] for n in
                                 ("lr", "wd", "ls", "do", "ma", "tm", "wu")}
        for _ in range(k):
            t = self.study.ask()
            cols["lr"].append(
                t.suggest_float("optimizer.lr", self.lr_space["low"],
                                self.lr_space["high"],
                                log=self.lr_space.get("log", True)))
            cols["wd"].append(
                t.suggest_float("optimizer.weight_decay",
                                self.wd_space["low"], self.wd_space["high"],
                                log=self.wd_space.get("log", True)))
            cols["ls"].append(
                t.suggest_float("loss.label_smoothing", self.ls_space["low"],
                                self.ls_space["high"])
                if self.ls_space else 0.0)
            cols["do"].append(
                t.suggest_float("model.dropout", self.do_space["low"],
                                self.do_space["high"])
                if self.do_space else 0.0)
            cols["ma"].append(
                t.suggest_float("dataset.mixup_alpha", self.ma_space["low"],
                                self.ma_space["high"],
                                log=self.ma_space.get("log", False))
                if self.ma_space else 1.0)  # unused when not searched (> 0)
            if self.tmax_space:
                tm_epochs = t.suggest_int(
                    "scheduler.T_max", int(self.tmax_space["low"]),
                    int(self.tmax_space["high"]))
                tm = float(tm_epochs * spe)
                wu = (t.suggest_float("scheduler.warmup_frac",
                                      self.wu_space["low"],
                                      self.wu_space["high"]) * tm
                      if self.wu_space else 0.0)
            else:
                tm, wu = 0.0, 0.0  # schedule off (constant lr)
            cols["tm"].append(tm)
            cols["wu"].append(wu)
            trials.append(t)
        return trials, {n: np.asarray(v, np.float32)
                        for n, v in cols.items()}

    # -- shared execution machinery ---------------------------------------------
    def _build_exec(self):
        """Compile the vmapped init/train/eval functions (K-agnostic)."""
        from dlsc_tpu.train.losses import CrossEntropyLoss

        dm = self.datamodule
        dm.setup()
        pipe = self.pipeline
        tx = _make_injected_tx(self.gradient_clip_val)(
            learning_rate=1e-3, weight_decay=0.0, t_max_steps=0.0,
            warmup_steps=0.0,
        )
        sample = next(iter(dm.train_batches(epoch=0)))
        wave0 = jnp.asarray(sample["wave"][:2])
        lab0 = jnp.asarray(sample["label"][:2])
        feats0, _ = jax.jit(pipe.train_batch)(wave0, lab0, jax.random.key(0))

        def init_one(key, lr, wd, do, tm, wu):
            variables = self.model.init(
                {"params": key, "dropout": jax.random.fold_in(key, 1)},
                feats0, train=False,
            )
            opt_state = tx.init(variables["params"])
            opt_state = opt_state._replace(hyperparams={
                "learning_rate": jnp.asarray(lr, jnp.float32),
                "weight_decay": jnp.asarray(wd, jnp.float32),
                "t_max_steps": jnp.asarray(tm, jnp.float32),
                "warmup_steps": jnp.asarray(wu, jnp.float32),
            })
            # per-trial dropout: overwrite every HyperDropout 'rate' scalar
            # (stacked (depth,) under scan_blocks) with this trial's value
            hyper = None
            if "hyper" in variables:
                hyper = jax.tree_util.tree_map(
                    lambda v: jnp.full(v.shape, do, v.dtype),
                    variables["hyper"])
            return TrainState(
                step=jnp.zeros((), jnp.int32),
                params=variables["params"],
                batch_stats=variables.get("batch_stats"),
                opt_state=opt_state,
                rng=jax.random.fold_in(key, 2),
                apply_fn=self.model.apply,
                tx=tx,
                hyper=hyper,
            )

        search_alpha = self.ma_space is not None

        def train_step_one(state, ms, ls, ma, wave, labels):
            from dlsc_tpu.train.steps import make_train_step

            crit = CrossEntropyLoss()  # smoothing applied via targets below

            def criterion(logits, y, mask=None):
                C = y.shape[-1]
                y_s = y * (1.0 - ls) + ls / C
                return crit(logits, y_s, mask=mask)

            # per-trial mixup alpha: hand make_train_step a pipeline view
            # whose train_batch threads this slot's traced α into the Beta
            pipe_t = _AlphaPipe(pipe, ma) if search_alpha else pipe
            return make_train_step(pipe_t, criterion)(state, ms, wave, labels)

        def eval_step_one(state, ms, wave, labels, mask):
            from dlsc_tpu.train.steps import make_eval_step

            return make_eval_step(pipe, CrossEntropyLoss())(
                state, ms, wave, labels, mask
            )

        v_train = jax.vmap(train_step_one, in_axes=(0, 0, 0, 0, None, None))
        v_eval = jax.vmap(eval_step_one, in_axes=(0, 0, None, None, None))
        if self.plan is not None and self.plan.mesh.size > 1:
            # trial parallelism over the mesh: the stacked (K, ...) trial
            # state is sharded on its leading axis over 'data' (a sharding
            # per jit argument is a pytree prefix — it applies to every
            # leaf), the data batch is replicated. GSPMD needs no
            # collectives: trials are independent programs in lockstep.
            from jax.sharding import NamedSharding, PartitionSpec as P

            tsh = NamedSharding(self.plan.mesh, P("data"))
            rep = self.plan.replicated
            return {
                "init_one": jax.jit(init_one),
                "init_v": jax.jit(jax.vmap(init_one), out_shardings=tsh),
                "train": jax.jit(v_train, donate_argnums=(0, 1),
                                 in_shardings=(tsh, tsh, tsh, tsh, rep, rep),
                                 out_shardings=(tsh, tsh, tsh)),
                "eval": jax.jit(v_eval, donate_argnums=(1,),
                                in_shardings=(tsh, tsh, rep, rep, rep),
                                out_shardings=(tsh, tsh)),
                "acc": jax.jit(jax.vmap(accuracy)),
            }
        return {
            "init_one": jax.jit(init_one),
            "init_v": jax.jit(jax.vmap(init_one)),
            "train": jax.jit(v_train, donate_argnums=(0, 1)),
            "eval": jax.jit(v_eval, donate_argnums=(1,)),
            "acc": jax.jit(jax.vmap(accuracy)),
        }

    def _check_k(self, k: int) -> None:
        if self.plan is not None and k % max(self.plan.n_data, 1):
            raise ValueError(
                f"k={k} trials must be a multiple of the mesh data axis "
                f"({self.plan.n_data}) for mesh-sharded trial parallelism"
            )

    @staticmethod
    def _scatter_slot(states, new_state, i: int):
        """Write a freshly initialized trial into slot i of the stacked state."""
        return jax.tree_util.tree_map(
            lambda s, n: s.at[i].set(n), states, new_state
        )

    # -- lockstep training ------------------------------------------------------
    def run_batch(self, k: int = 8) -> VmappedResult:
        self._check_k(k)
        dm = self.datamodule
        num_classes = dm.num_classes
        fns = self._build_exec()
        trials, hp = self._ask_batch(k)

        keys = jax.random.split(jax.random.key(self.seed), k)
        states = fns["init_v"](
            keys, jnp.asarray(hp["lr"]), jnp.asarray(hp["wd"]),
            jnp.asarray(hp["do"]), jnp.asarray(hp["tm"]), jnp.asarray(hp["wu"])
        )
        ls_arr = jnp.asarray(hp["ls"])
        ma_arr = jnp.asarray(hp["ma"])
        v_train, v_eval, v_acc = fns["train"], fns["eval"], fns["acc"]

        pruned = [False] * k
        history = []
        for epoch in range(self.epochs):
            ms = jax.vmap(lambda _: MetricState.create(num_classes))(jnp.arange(k))
            for batch in dm.train_batches(epoch=epoch, seed=self.seed):
                states, ms, _ = v_train(
                    states, ms, ls_arr, ma_arr,
                    jnp.asarray(batch["wave"]), jnp.asarray(batch["label"]),
                )
            vms = jax.vmap(lambda _: MetricState.create(num_classes))(jnp.arange(k))
            for batch in dm.val_batches():
                vms, _ = v_eval(
                    states, vms, jnp.asarray(batch["wave"]),
                    jnp.asarray(batch["label"]), jnp.asarray(batch["mask"]),
                )
            val_accs = np.asarray(v_acc(vms))
            train_accs = np.asarray(v_acc(ms))
            history.append({"epoch": epoch, "val_acc": val_accs.tolist(),
                            "train_acc": train_accs.tolist()})
            for i, t in enumerate(trials):
                if pruned[i]:
                    continue
                t.report(float(val_accs[i]), epoch)
                if epoch >= self.min_epochs and t.should_prune():
                    pruned[i] = True  # lockstep: slot keeps computing

        values = []
        for i, t in enumerate(trials):
            final = float(history[-1]["val_acc"][i]) if history else None
            if pruned[i]:
                self.study.tell(t, t.intermediate_values.get(t.last_step),
                                TrialState.PRUNED)
                values.append(float("nan"))
            else:
                self.study.tell(t, final, TrialState.COMPLETE)
                values.append(final)
        return VmappedResult(
            trial_numbers=[t.number for t in trials],
            values=values, states=states, history=history,
        )

    # -- slot recycling ------------------------------------------------------------
    def run_continuous(self, k: int = 8, total_trials: int = 16) -> list[Trial]:
        """Process ``total_trials`` trials through K always-busy slots.

        A slot's trial trains until it is pruned (Hyperband) or reaches the
        ``epochs`` budget; the slot is then immediately re-initialized with a
        fresh suggestion. K stays constant so nothing recompiles.
        """
        self._check_k(k)
        dm = self.datamodule
        num_classes = dm.num_classes
        fns = self._build_exec()
        trials, hp = self._ask_batch(k)
        asked = k

        keys = jax.random.split(jax.random.key(self.seed), k)
        states = fns["init_v"](
            keys, jnp.asarray(hp["lr"]), jnp.asarray(hp["wd"]),
            jnp.asarray(hp["do"]), jnp.asarray(hp["tm"]), jnp.asarray(hp["wu"])
        )
        ls_arr = jnp.asarray(hp["ls"])
        ma_arr = jnp.asarray(hp["ma"])
        slot_epoch = [0] * k
        active = [True] * k
        finished: list[Trial] = []
        global_epoch = 0

        while any(active):
            ms = jax.vmap(lambda _: MetricState.create(num_classes))(jnp.arange(k))
            for batch in dm.train_batches(epoch=global_epoch, seed=self.seed):
                states, ms, _ = fns["train"](
                    states, ms, ls_arr, ma_arr,
                    jnp.asarray(batch["wave"]), jnp.asarray(batch["label"]),
                )
            vms = jax.vmap(lambda _: MetricState.create(num_classes))(jnp.arange(k))
            for batch in dm.val_batches():
                vms, _ = fns["eval"](
                    states, vms, jnp.asarray(batch["wave"]),
                    jnp.asarray(batch["label"]), jnp.asarray(batch["mask"]),
                )
            val_accs = np.asarray(fns["acc"](vms))
            global_epoch += 1

            for i in range(k):
                if not active[i]:
                    continue
                t = trials[i]
                t.report(float(val_accs[i]), slot_epoch[i])
                done = slot_epoch[i] + 1 >= self.epochs
                pruned = slot_epoch[i] >= self.min_epochs and t.should_prune()
                if not (done or pruned):
                    slot_epoch[i] += 1
                    continue
                self.study.tell(
                    t,
                    float(val_accs[i]),
                    TrialState.PRUNED if pruned and not done else TrialState.COMPLETE,
                )
                finished.append(t)
                if asked < total_trials:
                    # recycle the slot with a fresh suggestion
                    new_trials, nhp = self._ask_batch(1)
                    trials[i] = new_trials[0]
                    asked += 1
                    new_state = fns["init_one"](
                        jax.random.fold_in(jax.random.key(self.seed), 1000 + asked),
                        jnp.asarray(nhp["lr"][0]), jnp.asarray(nhp["wd"][0]),
                        jnp.asarray(nhp["do"][0]), jnp.asarray(nhp["tm"][0]),
                        jnp.asarray(nhp["wu"][0]),
                    )
                    states = self._scatter_slot(states, new_state, i)
                    ls_arr = ls_arr.at[i].set(float(nhp["ls"][0]))
                    ma_arr = ma_arr.at[i].set(float(nhp["ma"][0]))
                    slot_epoch[i] = 0
                else:
                    active[i] = False
        return finished
