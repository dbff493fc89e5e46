"""Fit/validate/test loop — the functional replacement for Lightning's
Trainer + LitClassifier (reference: src/training/engine.py, scripts/train.py).

Responsibilities mirrored from the reference:

- epoch loop with train/val phases, metric names ``train/acc``, ``val/acc``,
  ``val/loss`` etc. (load-bearing monitor keys, engine.py:209-221),
- ModelCheckpoint on ``val/acc`` (save_top_k, resume via ckpt_path),
  EarlyStopping (patience/min_delta), LR monitoring per epoch
  (src/training/callbacks.py:32-68),
- ``limit_train_batches`` / ``limit_val_batches`` smoke-run caps
  (TRAINING.md smoke recipe),
- test phase with multi-crop averaging and the full metric suite
  (acc/F1/AUROC/confusion matrix/per-class accuracy) plus rendered figures
  (engine.py:223-297),
- a clips/sec/chip throughput meter per epoch (the BASELINE.json metric;
  new — the reference has no profiling, SURVEY.md §5.1).

TPU-first: one fused jitted step (pipeline + fwd + bwd + update + metrics),
donated state, batch sharded over the mesh 'data' axis.
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from dlsc_tpu.parallel import MeshPlan, make_plan
from dlsc_tpu.train import metrics as MT
from dlsc_tpu.train.checkpoint import CheckpointManager
from dlsc_tpu.train.losses import CrossEntropyLoss
from dlsc_tpu.train.optim import OptimizerSpec, SchedulerSpec, build_optimizer
from dlsc_tpu.train.state import TrainState
from dlsc_tpu.train.steps import make_eval_step, make_train_step
from dlsc_tpu.utils.runtime import rng_key


def _is_oom(e: Exception) -> bool:
    """True if a (possibly remote-helper-wrapped) compile error is an HBM
    *capacity* failure. Match the specific texts — the axon helper's dump
    says 'Ran out of memory in memory space hbm' / 'Exceeded hbm capacity';
    direct PJRT raises RESOURCE_EXHAUSTED. A bare substring like 'memory'
    would misroute non-capacity kernel errors (e.g. Mosaic scoped-VMEM
    overflows) into the degrade path and mask the real bug."""
    msg = str(e)
    return ("memory space hbm" in msg
            or "Exceeded hbm capacity" in msg
            or "RESOURCE_EXHAUSTED" in msg)


class EarlyStopping:
    """val-metric early stop (reference: callbacks.py:59-63)."""

    def __init__(self, monitor="val/acc", mode="max", patience=40, min_delta=0.001):
        self.monitor, self.mode = monitor, mode
        self.patience, self.min_delta = patience, min_delta
        self.best = -np.inf if mode == "max" else np.inf
        self.bad_epochs = 0

    def update(self, metrics: dict) -> bool:
        v = metrics.get(self.monitor)
        if v is None:
            return False
        improved = (
            v > self.best + self.min_delta
            if self.mode == "max"
            else v < self.best - self.min_delta
        )
        if improved:
            self.best, self.bad_epochs = v, 0
        else:
            self.bad_epochs += 1
        return self.bad_epochs >= self.patience


class _SWA:
    """Stochastic Weight Averaging (reference: src/training/callbacks.py:71-79,
    Lightning's optional SWA callback): average parameter snapshots from
    ``swa_epoch_start`` onward; at fit end the average replaces the weights
    and BatchNorm statistics are refreshed with one training-data pass.
    ``swa_lrs`` (Lightning's SWALR phase) is honored by baking the SWA
    annealing into the LR schedule (train/optim.py swa_lr_wrap)."""

    def __init__(self, swa_epoch_start: float | int = 0.8, max_epochs: int = 100,
                 swa_lrs: float | None = None, annealing_epochs: int = 10,
                 **_):
        if isinstance(swa_epoch_start, float) and swa_epoch_start <= 1.0:
            self.start_epoch = int(swa_epoch_start * max_epochs)
        else:
            self.start_epoch = int(swa_epoch_start)
        self.swa_lrs = None if swa_lrs is None else float(swa_lrs)
        self.annealing_epochs = int(annealing_epochs)
        self.avg_params = None
        self.n_models = 0

    @property
    def lr_cfg(self) -> dict | None:
        if self.swa_lrs is None:
            return None
        return {"swa_lr": self.swa_lrs, "start_epoch": self.start_epoch,
                "annealing_epochs": self.annealing_epochs}

    def update(self, epoch: int, state) -> None:
        if epoch < self.start_epoch:
            return
        n = self.n_models
        if self.avg_params is None:
            # deep copy: the next donated train step deletes these buffers
            self.avg_params = jax.tree_util.tree_map(
                lambda p: p + 0, state.params
            )
        else:
            self.avg_params = jax.tree_util.tree_map(
                lambda avg, p: (avg * n + p) / (n + 1), self.avg_params, state.params
            )
        self.n_models = n + 1


class _SingleDevicePlan:
    """Mesh-free stand-in for MeshPlan on a single chip."""

    class _M:
        size = 1
        shape = {"data": 1, "model": 1}

    mesh = _M()
    n_data = 1

    def pad_batch(self, n: int) -> int:
        return n


class Trainer:
    def __init__(
        self,
        max_epochs: int = 250,
        precision: str | int = 32,
        gradient_clip_val: float | None = None,
        log_every_n_steps: int | None = None,
        limit_train_batches: int | None = None,
        limit_val_batches: int | None = None,
        check_val_every_n_epoch: int = 1,
        enable_progress_bar: bool = True,
        enable_checkpointing: bool = True,
        checkpoint_dir: str | Path = "checkpoints",
        auto_resume: bool = False,  # crash resume (§5.3): discover the newest
                             # checkpoint in checkpoint_dir (by saved epoch;
                             # a save_last 'last' dir wins ties) and continue
                             # from it — epochs, optimizer moments, RNG and
                             # the best-k ledger all resume. No-op on a fresh
                             # dir. `+trainer.auto_resume=true`; combine with
                             # `checkpoint.save_last=true` to lose at most
                             # one epoch.
        debug_nans: bool = False,
        devices: int | str = "auto",
        accelerator: str = "auto",
        seed: int = 42,
        plan: MeshPlan | None = None,
        profile_dir: str | Path | None = None,  # jax.profiler trace of epoch 0
        device_data: bool | str = "auto",   # dataset-in-HBM mode ('auto':
                                            # on when the pool fits the budget)
        device_data_max_bytes: int | None = None,  # explicit pool-byte cap;
                                            # None = compute the budget from
                                            # live HBM stats (see
                                            # _device_pool_budget), falling
                                            # back to 6 GB when the backend
                                            # exposes no memory stats
        fsdp: bool = False,  # ZeRO-3-style param+optimizer sharding over the
                             # mesh 'data' axis (parallel/fsdp.py); no-op on a
                             # single chip. `+trainer.fsdp=true`
        expert_parallel: int = 1,  # EP degree for MoE models (model=ast_moe):
                             # builds a ('data', 'model') mesh with this many
                             # devices on 'model', shards the stacked expert
                             # weights + dispatch buffers over it
                             # (parallel/ep.py). `+trainer.expert_parallel=2`
        pipeline_parallel: int = 1,  # GPipe pipeline parallelism for the ViT
                             # family: shards the depth-stacked encoder blocks
                             # over this many 'stage' devices and streams
                             # microbatches through with ppermute hops
                             # (parallel/pp.py). Forces scan_blocks=True.
                             # `+trainer.pipeline_parallel=2`
        pp_microbatches: int | None = None,  # GPipe microbatches per step
                             # (default: = pipeline_parallel; more microbatches
                             # → smaller bubble (S-1)/(M+S-1) but smaller
                             # per-tick matmuls). batch_size must be divisible
                             # by n_data × pp_microbatches.
        accumulate_grad_batches: int = 1,  # split each batch into M
                             # sequential micro-batches under lax.scan inside
                             # the jitted step (~M× lower activation memory,
                             # one optimizer update per batch). NB: subdivides
                             # the wire batch — for Lightning's
                             # accumulate-M-loader-batches semantics, multiply
                             # batch_size by M. See steps.make_train_step.
        **_: Any,
    ):
        self.profile_dir = profile_dir
        self.max_epochs = max_epochs
        self.precision = str(precision)
        self.gradient_clip_val = gradient_clip_val
        self.log_every_n_steps = log_every_n_steps
        self.limit_train_batches = limit_train_batches
        self.limit_val_batches = limit_val_batches
        self.check_val_every_n_epoch = check_val_every_n_epoch
        self.enable_progress_bar = enable_progress_bar
        self.enable_checkpointing = enable_checkpointing
        self.checkpoint_dir = Path(checkpoint_dir)
        self.auto_resume = bool(auto_resume)
        self.seed = seed
        if debug_nans:
            jax.config.update("jax_debug_nans", True)  # sanitizer toggle (§5.2)
        n_dev = None if devices in ("auto", None) else int(devices)
        self.expert_parallel = int(expert_parallel)
        self.pipeline_parallel = int(pipeline_parallel)
        self.pp_microbatches = (int(pp_microbatches) if pp_microbatches
                                else self.pipeline_parallel)
        if self.pipeline_parallel > 1:
            if self.expert_parallel > 1:
                raise ValueError(
                    "pipeline_parallel does not compose with expert_parallel "
                    "(GSPMD expert shardings cannot appear inside the "
                    "pipeline's shard_map; see parallel/pp.py design notes) — "
                    "MoE models still run under PP, with experts local to "
                    "each stage")
            if fsdp:
                raise ValueError(
                    "pipeline_parallel does not compose with fsdp: stage "
                    "sharding already partitions the encoder params (the "
                    "dominant memory); pick one")
            if (n_dev or jax.device_count()) < self.pipeline_parallel:
                raise ValueError(
                    f"pipeline_parallel={self.pipeline_parallel} needs at "
                    f"least that many devices (have "
                    f"{n_dev or jax.device_count()})")
            from dlsc_tpu.parallel.pp import get_pp_mesh

            plan = plan or MeshPlan(
                get_pp_mesh(n_dev, self.pipeline_parallel))
        if self.expert_parallel > 1:
            if (n_dev or jax.device_count()) < self.expert_parallel:
                raise ValueError(
                    f"expert_parallel={self.expert_parallel} needs at least "
                    f"that many devices (have {n_dev or jax.device_count()})")
            plan = plan or make_plan(n_dev,
                                     model_parallel=self.expert_parallel)
        if plan is None and (n_dev or jax.device_count()) == 1:
            plan = _SingleDevicePlan()  # no mesh on a single chip
        self.plan = plan or make_plan(n_dev)
        self.device_data = device_data
        self.device_data_max_bytes = device_data_max_bytes
        self.fsdp = fsdp
        self.accumulate_grad_batches = int(accumulate_grad_batches)
        self.state: TrainState | None = None
        self.ckpt_manager: CheckpointManager | None = None
        self.logged_metrics: dict[str, float] = {}
        self.should_stop = False

    # -- state init -------------------------------------------------------------
    def init_state(self, model, datamodule, optim_spec, sched_spec,
                   swa_lr_cfg: dict | None = None,
                   apply_fn=None) -> TrainState:
        pipeline = datamodule.pipeline
        sample = next(iter(datamodule.train_batches(epoch=0)))
        wave = jnp.asarray(sample["wave"][:2])
        labels = jnp.asarray(sample["label"][:2])
        # jit both init-time computations: eager op-by-op dispatch is
        # pathologically slow on remote-compile TPU backends.
        inputs, _ = jax.jit(pipeline.train_batch)(wave, labels, jax.random.key(0))
        variables = jax.jit(model.init, static_argnames=("train",))(
            {"params": jax.random.key(self.seed), "dropout": jax.random.key(1)},
            inputs, train=False,
        )
        tx, self._lr_fn = build_optimizer(
            optim_spec, sched_spec, max(datamodule.steps_per_epoch, 1),
            self.gradient_clip_val, swa=swa_lr_cfg,
        )
        return TrainState.create(
            apply_fn=apply_fn or model.apply,
            params=variables["params"],
            batch_stats=variables.get("batch_stats"),
            tx=tx,
            # honors $DLSC_RNG_IMPL (rbg = TPU hardware RNG for dropout masks)
            rng=rng_key(self.seed),
        )

    def _compile_steps(self, pipeline, criterion, state=None):
        from dlsc_tpu.train.steps import (make_eval_step_indexed,
                                          make_train_step_indexed)

        plan = self.plan
        indexed = getattr(self, "_use_device_data", False)
        train = (make_train_step_indexed if indexed else make_train_step)(
            pipeline, criterion, self.accumulate_grad_batches)
        evals = (make_eval_step_indexed if indexed else make_eval_step)(
            pipeline, criterion)
        if plan.mesh.size == 1:
            # single chip: sharding annotations are no-ops; skip them (the
            # GSPMD pass is expensive on remote-compile backends)
            self._train_step = jax.jit(train, donate_argnums=(0, 1))
            self._eval_step = jax.jit(evals, donate_argnums=(1,))
            self._sharded = False
        else:
            rep, bat = plan.replicated, plan.batch
            st = rep
            ep_on = self.expert_parallel > 1 and state is not None
            if self.pipeline_parallel > 1 and state is not None:
                # stage-sharded stacked block params (+ their Adam moments);
                # the pipelined forward itself lives in state.apply_fn
                from dlsc_tpu.parallel.pp import pp_state_shardings

                st = pp_state_shardings(state, plan.mesh)
            elif self.fsdp and state is not None:
                # ZeRO-3: params + optimizer moments sharded over 'data'
                # (small leaves stay replicated); jit lays the incoming
                # replicated state out on first call, GSPMD inserts the
                # per-layer all-gathers + gradient reduce-scatters.
                if ep_on:
                    # ZeRO + EP: expert dim on 'model' for the expert weights
                    # AND their moments, 'data' on the largest free dim
                    from dlsc_tpu.parallel.ep import fsdp_ep_state_shardings

                    st = fsdp_ep_state_shardings(state, plan.mesh)
                else:
                    from dlsc_tpu.parallel.fsdp import fsdp_state_shardings

                    st = fsdp_state_shardings(state, plan.mesh)
            elif ep_on:
                # EP: stacked expert weights (+ their Adam moments) sharded
                # over 'model'; jit lays the state out on first call and
                # GSPMD inserts the dispatch/combine all-to-alls.
                from dlsc_tpu.parallel.ep import ep_state_shardings

                st = ep_state_shardings(state, plan.mesh)
            # indexed steps take the replicated pool before the batch args
            t_in = (st, rep, rep, bat, bat) if indexed else (st, rep, bat, bat)
            e_in = (st, rep, rep, bat, bat, bat) if indexed else (st, rep, bat, bat, bat)
            self._train_step = jax.jit(
                train, donate_argnums=(0, 1),
                in_shardings=t_in,
                out_shardings=(st, rep, rep),
            )
            self._eval_step = jax.jit(
                evals, donate_argnums=(1,),
                in_shardings=e_in,
                out_shardings=(rep, bat),
            )
            self._sharded = True

    def _put(self, arr):
        arr = np.asarray(arr)
        if getattr(self, "_sharded", False):
            return jax.device_put(arr, self.plan.batch)
        return jax.device_put(arr, jax.devices()[0])

    # -- device-resident dataset (VERDICT r1 #2: the TPU-native equivalent of
    # the reference's host-RAM pre-load, esc50.py:167-191) --------------------
    #: fraction of total HBM reserved for the train step's own temporaries
    #: (activations/backward temps — only knowable exactly from the compiled
    #: step, so the AOT preflight below stays the precise backstop). Sized
    #: from the largest measured step: AST-Base b64 bf16 uses ≈7 GB of
    #: weights+moments+temps ≈ 45% of a v5e's 15.75 GB (BASELINE.md).
    POOL_HBM_RESERVE_FRAC = 0.45
    POOL_FALLBACK_CAP = 6_000_000_000  # no memory stats → round-2 static cap

    def _device_pool_budget(self) -> tuple[int, str]:
        """(pool byte budget, human-readable arithmetic) for device_data
        'auto' (VERDICT r2 #6: computed from live HBM, not a magic constant).

        Budget = min over devices of (bytes_limit − bytes_in_use) − the
        step-temporary reserve. At call time the TrainState already lives on
        device, so bytes_in_use covers params + optimizer moments; the
        reserve covers what only the compiled step knows (activations),
        and the AOT preflight catches any remaining over-commitment.
        """
        if self.device_data_max_bytes is not None:
            return int(self.device_data_max_bytes), "explicit cap"
        from dlsc_tpu.utils.profiling import device_memory_stats

        stats = device_memory_stats()
        usable = [
            s["bytes_limit"] - s["bytes_in_use"]
            - int(self.POOL_HBM_RESERVE_FRAC * s["bytes_limit"])
            for s in stats.values()
            if s.get("bytes_limit") and s.get("bytes_in_use") is not None
        ]
        if not usable:
            return self.POOL_FALLBACK_CAP, "fallback cap (no HBM stats)"
        budget = max(0, min(usable))
        s = next(iter(stats.values()))
        why = (f"live HBM: limit {s['bytes_limit'] / 1e9:.1f} GB − in-use "
               f"{s['bytes_in_use'] / 1e9:.1f} GB − step reserve "
               f"{self.POOL_HBM_RESERVE_FRAC * s['bytes_limit'] / 1e9:.1f} GB")
        return budget, why

    def _setup_device_data(self, datamodule) -> None:
        """Decide on + perform the one-time pool upload (idempotent)."""
        if getattr(self, "_dd_ready", False):
            return
        self._dd_ready = True
        self._use_device_data = False
        if not self.device_data or not hasattr(datamodule, "pool_parts"):
            return
        datamodule.setup()
        nbytes = datamodule.pool_nbytes
        budget, why = self._device_pool_budget()
        if nbytes > budget:
            # explicit True requests warn loudly; 'auto' logs the arithmetic
            print(f"[data] device-resident pool disabled: pool "
                  f"{nbytes / 1e9:.2f} GB exceeds budget {budget / 1e9:.2f} GB "
                  f"({why})")
            return
        t0 = time.time()
        parts, pool_labels, test_w, test_y = datamodule.pool_parts()
        if getattr(self, "_sharded", False) or self.plan.mesh.size > 1:
            put = lambda a: jax.device_put(np.asarray(a), self.plan.replicated)
        else:
            put = lambda a: jax.device_put(np.asarray(a), jax.devices()[0])
        # Upload in ~64 MB chunks: the axon relay has a size cliff — a single
        # 441 MB device_put transfers at ~2 MB/s while 55 MB chunks sustain
        # ~48 MB/s (measured). Device-side concat of the chunks is one small
        # cached program.
        def put_chunked(arrs) -> jnp.ndarray:
            # accepts the per-fold parts directly: each (mmap'd) part is
            # sliced and uploaded chunk by chunk, so the full pool is never
            # materialized in host RAM (the single device-side concat below
            # is one small cached program)
            chunks = []
            for arr in arrs:
                rows = max(1, (64 << 20) // max(arr[0:1].nbytes, 1))
                chunks += [put(arr[i:i + rows]) for i in range(0, len(arr), rows)]
            return chunks[0] if len(chunks) == 1 else jnp.concatenate(chunks, 0)

        self._pool_dev = put_chunked(parts)
        self._test_pool_dev = put_chunked([test_w])
        # NO blocking sync here: the transfers overlap the first epoch's
        # compile + steps (the relay's host->device rate is variable,
        # 2-48 MB/s measured — waiting up front would serialize it).
        self._use_device_data = True
        print(f"[data] device-resident pool: {nbytes / 1e6:.0f} MB dispatched "
              f"in {time.time() - t0:.1f}s, transfer completes asynchronously "
              "(per-step wire traffic: indices only)")

    def _setup_pipeline_parallel(self, model, datamodule):
        """Prepare a model + apply_fn for `+trainer.pipeline_parallel=S`.

        Clones the model into the PP-compatible configuration (scan_blocks
        stacked layout; GSPMD token/expert shardings off — they cannot appear
        inside the pipeline's shard_map, parallel/pp.py design notes) and
        returns the pipelined apply_fn the train/eval steps call. Validates
        the GPipe divisibility constraint up front with an actionable error.
        """
        from dlsc_tpu.parallel.pp import make_pp_apply_fn

        if not hasattr(model, "scan_blocks"):
            raise ValueError(
                "trainer.pipeline_parallel supports the ViT (AST) model "
                "family — the encoder block stack is what gets staged; "
                f"{type(model).__name__} has no block stack")
        S = self.pipeline_parallel
        if model.depth % S:
            raise ValueError(
                f"model depth {model.depth} not divisible by "
                f"pipeline_parallel={S}")
        n_micro = self.pp_microbatches
        bs = datamodule.batch_size
        denom = self.plan.n_data * n_micro
        if bs % denom:
            raise ValueError(
                f"batch_size={bs} must be divisible by data-parallel degree "
                f"({self.plan.n_data}) × pp_microbatches ({n_micro}) = {denom}")
        updates = {}
        if not model.scan_blocks:
            updates["scan_blocks"] = True  # PP needs depth-stacked params
        if getattr(model, "token_sharding", None) is not None:
            updates["token_sharding"] = None
        if getattr(model, "expert_sharding", None) is not None:
            updates["expert_sharding"] = None
        if updates:
            model = model.clone(**updates)
        print(f"[pp] pipeline parallelism: {S} stages × "
              f"{self.plan.n_data} data shards, {n_micro} microbatches "
              f"(bubble {(S - 1) / (n_micro + S - 1):.0%})")
        return model, make_pp_apply_fn(model, self.plan.mesh, n_micro)

    def _step_args(self, batch, *, train: bool):
        """Map a host batch onto the compiled step's tail arguments."""
        if getattr(self, "_use_device_data", False):
            pool = self._test_pool_dev if batch.get("split") == "test" else self._pool_dev
            args = (pool, self._put(batch["idx"]), self._put(batch["label"]))
        else:
            args = (self._put(batch["wave"]), self._put(batch["label"]))
        if not train:
            args = args + (self._put(batch["mask"]),)
        return args

    def _preflight_train_step(self, state, datamodule, pipeline, criterion):
        """AOT-compile the train step before the epoch loop (no execution, no
        state mutation) so HBM-capacity failures surface before work starts.

        Two-stage degrade (SURVEY §5.3 failure tolerance): the resident pool
        competes with model+activations for HBM — e.g. AST-Base @ b64 fp32 +
        the 1.06 GB ESC-50 pool exceeds a v5e's 15.75 GB. On a capacity
        failure drop the pool and retry host-streamed; if even that exceeds
        HBM, raise with the actionable fixes (bf16-mixed / smaller batch)
        instead of the remote helper's opaque first-step error. Only runs when
        a device pool is active; the persistent compilation cache (enabled by
        scripts/train.py) makes the successful probe's re-compile on the first
        real step a cache hit.
        """
        if not self._use_device_data:
            return
        bs = datamodule.batch_size
        ms = MT.MetricState.create(datamodule.num_classes,
                                   extras=getattr(self, "_train_extras", ()))
        labels = np.zeros((bs,), np.int32)
        # the host-streamed probe must match the real wire signature: shards
        # stream in their storage dtype (int16 by default — pipeline.py:86)
        clip_t = int(self._pool_dev.shape[1])
        wire_dtype = np.dtype(self._pool_dev.dtype)
        try:
            self._train_step.lower(
                state, ms, self._pool_dev, np.zeros((bs,), np.int32), labels,
            ).compile()
            return
        except Exception as e:  # noqa: BLE001 — classify and degrade below
            if not _is_oom(e):
                raise
        print("[data] device-resident pool + model exceed HBM; "
              "falling back to host-streamed batches")
        self._pool_dev = None
        self._test_pool_dev = None
        self._use_device_data = False
        self._compile_steps(pipeline, criterion, state)
        try:
            self._train_step.lower(
                state, ms, np.zeros((bs, clip_t), wire_dtype), labels,
            ).compile()
        except Exception as e:  # noqa: BLE001
            if not _is_oom(e):
                raise
            hint = (
                "Reduce batch_size."
                if self.precision != "32"
                else "Reduce batch_size or use trainer.precision=bf16-mixed "
                     "(the reference's own guidance for AST-class models, "
                     "base_training.yaml:48)."
            )
            raise RuntimeError(
                f"train step exceeds device HBM even without the "
                f"device-resident pool (batch_size={bs}, "
                f"precision={self.precision}). {hint}"
            ) from e

    # -- fit -------------------------------------------------------------------
    def fit(
        self,
        model,
        datamodule,
        optim_spec: OptimizerSpec,
        sched_spec: SchedulerSpec | None = None,
        criterion: Callable | None = None,
        tracker=None,
        checkpoint_cfg: dict | None = None,
        early_stop_cfg: dict | None = None,
        ckpt_path: str | None = None,
        callbacks: Sequence[Any] = (),
        swa_cfg: dict | None = None,
        pretrained_path: str | None = None,
    ) -> TrainState:
        criterion = criterion or CrossEntropyLoss()
        datamodule.setup()
        pipeline = datamodule.pipeline
        num_classes = datamodule.num_classes

        pp_apply_fn = None
        if self.pipeline_parallel > 1:
            model, pp_apply_fn = self._setup_pipeline_parallel(
                model, datamodule)

        if self.expert_parallel > 1:
            if getattr(model, "moe", None) is None:
                raise ValueError(
                    "trainer.expert_parallel requires a MoE model "
                    "(e.g. model=ast_moe)")
            from dlsc_tpu.models.moe import as_moe_spec

            n_exp = as_moe_spec(model.moe).n_experts
            if n_exp % self.expert_parallel:
                # uneven expert sharding would silently pad: half-idle chips
                raise ValueError(
                    f"model.n_experts={n_exp} must be divisible by "
                    f"trainer.expert_parallel={self.expert_parallel}")
            from dlsc_tpu.parallel.ep import expert_sharding

            # constrain the (B, E, C, D) dispatch buffers onto the mesh so
            # expert compute stays local (captured in state.apply_fn)
            model = model.clone(
                expert_sharding=expert_sharding(self.plan.mesh))

        import logging

        log = logging.getLogger("dlsc_tpu.train")
        swa = _SWA(**swa_cfg, max_epochs=self.max_epochs) if swa_cfg else None
        log.info("initializing state (pipeline + model init compiles)…")
        state = self.init_state(model, datamodule, optim_spec, sched_spec,
                                swa_lr_cfg=swa.lr_cfg if swa else None,
                                apply_fn=pp_apply_fn)
        log.info("state ready; compiling steps on first batch…")
        if pretrained_path:
            from dlsc_tpu.train.checkpoint import load_params

            state = state.replace(params=load_params(pretrained_path, state.params))
            print(f"Warm start: params loaded from {pretrained_path}")
        ckpt_cfg = dict(checkpoint_cfg or {})
        dirpath = ckpt_cfg.pop("dirpath", self.checkpoint_dir)
        resumed = False
        if self.auto_resume and not ckpt_path:
            from dlsc_tpu.train.checkpoint import latest_checkpoint

            found = latest_checkpoint(dirpath)
            if found is not None:
                ckpt_path = found
                print(f"[auto-resume] newest checkpoint: {found}")
        if ckpt_path:
            from dlsc_tpu.train.checkpoint import restore_state

            state = restore_state(ckpt_path, state)
            resumed = True
            print(f"Resumed from {ckpt_path} at step {int(state.step)}")
        # MoE observability: stream drop-fraction / load-balance scalars
        # through the train MetricState (the PP path cannot surface them —
        # intermediates do not cross the pipeline shard_map). Decided before
        # the preflight so its AOT compile matches the real step signature.
        self._train_extras: tuple = ()
        if (getattr(model, "moe", None) is not None
                and self.pipeline_parallel == 1):
            from dlsc_tpu.models.moe import MOE_METRICS

            self._train_extras = MOE_METRICS
        self._setup_device_data(datamodule)
        self._compile_steps(pipeline, criterion, state)
        self._preflight_train_step(state, datamodule, pipeline, criterion)

        self.ckpt_manager = (
            CheckpointManager(dirpath, resume=resumed,
                              **{k: ckpt_cfg[k] for k in
                                 ("monitor", "mode", "save_top_k",
                                  "filename", "save_last")
                                 if k in ckpt_cfg})
            if self.enable_checkpointing else None
        )
        stopper = EarlyStopping(**early_stop_cfg) if early_stop_cfg else None

        log_every = self.log_every_n_steps or max(datamodule.steps_per_epoch, 1)
        history: list[dict] = []
        epoch0 = int(state.step) // max(datamodule.steps_per_epoch, 1)

        for epoch in range(epoch0, self.max_epochs):
            # ---- train ----
            ms = MT.MetricState.create(num_classes, extras=self._train_extras)
            t0 = time.time()
            n_clips = 0
            it = (datamodule.train_index_batches(epoch=epoch, seed=self.seed)
                  if self._use_device_data
                  else datamodule.train_batches(epoch=epoch, seed=self.seed))
            if self.enable_progress_bar:
                from tqdm import tqdm

                it = tqdm(it, total=datamodule.steps_per_epoch,
                          desc=f"epoch {epoch}", leave=False)
            import contextlib

            prof_ctx = contextlib.nullcontext()
            if self.profile_dir and epoch == epoch0:
                from dlsc_tpu.utils.profiling import trace

                prof_ctx = trace(self.profile_dir)
            from dlsc_tpu.data.loader import prefetch

            def to_device(batch):
                return self._step_args(batch, train=True), len(batch["label"])

            with prof_ctx:
                for i, (args, n) in enumerate(prefetch(it, to_device, size=2)):
                    if self.limit_train_batches and i >= self.limit_train_batches:
                        break
                    state, ms, loss = self._train_step(state, ms, *args)
                    n_clips += n
                    if tracker and (i + 1) % log_every == 0:
                        tracker.log_metric("train/loss_step", float(loss),
                                           int(state.step))
            jax.block_until_ready(state.params)
            dt = time.time() - t0
            metrics = {
                "train/acc": float(MT.accuracy(ms)),
                "train/loss": float(MT.mean_loss(ms)),
                "lr": float(self._lr_fn(int(state.step))),
                "perf/clips_per_sec_per_chip": n_clips / dt / max(self.plan.n_data, 1),
            }
            metrics.update(
                {k: float(v) for k, v in ms.extra_means().items()})

            # ---- validate ----
            if (epoch + 1) % self.check_val_every_n_epoch == 0:
                vms = MT.MetricState.create(num_classes)
                vit = (datamodule.val_index_batches() if self._use_device_data
                       else datamodule.val_batches())
                for i, batch in enumerate(vit):
                    if self.limit_val_batches and i >= self.limit_val_batches:
                        break
                    vms, _ = self._eval_step(
                        state, vms, *self._step_args(batch, train=False))
                if int(vms.count) > 0:
                    metrics["val/acc"] = float(MT.accuracy(vms))
                    metrics["val/loss"] = float(MT.mean_loss(vms))

            self.logged_metrics = metrics
            history.append({"epoch": epoch, **metrics})
            if tracker:
                tracker.log_metrics(metrics, step=epoch)
            msg = " ".join(f"{k}={v:.4f}" for k, v in metrics.items())
            print(f"[epoch {epoch}] {msg}", flush=True)

            if self.ckpt_manager and "val/acc" in metrics:
                self.ckpt_manager.save(state, epoch, metrics)
                if self.ckpt_manager.save_last:
                    self.ckpt_manager.save_last_ckpt(state, epoch, metrics)
            for cb in callbacks:
                hook = getattr(cb, "on_validation_epoch_end", None)
                if hook:
                    hook(self, epoch, metrics)
            if swa:
                swa.update(epoch, state)
            if stopper and stopper.update(metrics):
                print(f"Early stopping at epoch {epoch} "
                      f"(best {stopper.monitor}={stopper.best:.4f})")
                break
            if self.should_stop:
                break

        if swa and swa.avg_params is not None:
            state = state.replace(params=swa.avg_params)
            state = self._refresh_batch_stats(state, datamodule)
            print(f"SWA: averaged {swa.n_models} snapshots into final weights")

        self.state = state
        self.history = history
        if tracker and history:
            self._plot_curves(tracker, history)
        return state

    def _refresh_batch_stats(self, state: TrainState, datamodule) -> TrainState:
        """One pass over train data in train mode to re-estimate BatchNorm
        statistics for SWA-averaged weights (no parameter updates)."""
        if state.batch_stats is None:
            return state
        pipeline = datamodule.pipeline

        @jax.jit
        def bn_step(state, wave, labels):
            rng, k_pipe, k_drop = jax.random.split(state.rng, 3)
            inputs, _ = pipeline.train_batch(wave, labels, k_pipe)
            _, mut = state.apply_fn(
                {"params": state.params, "batch_stats": state.batch_stats},
                inputs, train=True, rngs={"dropout": k_drop},
                mutable=["batch_stats"],
            )
            return state.replace(rng=rng, batch_stats=mut["batch_stats"])

        for i, batch in enumerate(datamodule.train_batches(epoch=0, seed=self.seed)):
            if self.limit_train_batches and i >= self.limit_train_batches:
                break
            state = bn_step(state, self._put(batch["wave"]), self._put(batch["label"]))
        return state

    # -- test ---------------------------------------------------------------------
    def test(
        self,
        datamodule,
        state: TrainState | None = None,
        ckpt: str | Path | None = "best",
        criterion: Callable | None = None,
        tracker=None,
    ) -> dict:
        criterion = criterion or CrossEntropyLoss()
        state = state or self.state
        assert state is not None, "call fit() first or pass a state"
        if ckpt == "best" and self.ckpt_manager and self.ckpt_manager.best_path:
            state = self.ckpt_manager.restore(self.ckpt_manager.best_path, state)
        elif ckpt and ckpt != "best":
            from dlsc_tpu.train.checkpoint import restore_state

            state = restore_state(ckpt, state)

        datamodule.setup()
        pipeline = datamodule.pipeline
        self._setup_device_data(datamodule)
        if not hasattr(self, "_eval_step"):
            self._compile_steps(pipeline, criterion, state)
        num_classes = datamodule.num_classes
        ms = MT.MetricState.create(num_classes)
        all_probs, all_labels = [], []
        tit = (datamodule.test_index_batches() if self._use_device_data
               else datamodule.test_batches())
        for batch in tit:
            ms, logits = self._eval_step(
                state, ms, *self._step_args(batch, train=False))
            p = jax.nn.softmax(jnp.asarray(logits), axis=-1)
            keep = batch["mask"]
            all_probs.append(np.asarray(p)[keep])
            all_labels.append(batch["label"][keep])

        probs = np.concatenate(all_probs)
        labels = np.concatenate(all_labels)
        confmat = np.asarray(ms.confmat)
        results = {
            "test/acc": float(MT.accuracy(ms)),
            "test/loss": float(MT.mean_loss(ms)),
            "test/f1": float(MT.macro_f1(ms)),
            "test/auroc": MT.macro_auroc(probs, labels, num_classes),
        }
        per_class = np.asarray(MT.per_class_accuracy(ms))
        if tracker:
            tracker.log_metrics(results)
            tracker.log_array(confmat, "test_confmat.npy")
            tracker.log_array(per_class, "test_class_acc.npy")
            self._plot_test_figures(tracker, confmat, per_class)
        results["confmat"] = confmat
        results["per_class_acc"] = per_class
        return results

    # -- figures (reference: engine.py:232-297) -------------------------------
    def _plot_test_figures(self, tracker, confmat, per_class) -> None:
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except Exception:
            return
        fig, ax = plt.subplots(figsize=(10, 10))
        ax.imshow(confmat, cmap="viridis")
        ax.set_xlabel("Predicted"); ax.set_ylabel("True"); ax.set_title("Confusion Matrix")
        tracker.log_figure(fig, "confmat.png"); plt.close(fig)

        fig, ax = plt.subplots(figsize=(12, 6))
        ax.bar(range(len(per_class)), per_class)
        ax.set_xlabel("Class Index"); ax.set_ylabel("Accuracy")
        ax.set_title("Per-Class Accuracy"); ax.set_ylim(0, 1)
        tracker.log_figure(fig, "per_class_accuracy.png"); plt.close(fig)

    def _plot_curves(self, tracker, history) -> None:
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except Exception:
            return
        fig, ax = plt.subplots(figsize=(10, 6))
        epochs = [h["epoch"] for h in history]
        ax.plot(epochs, [h.get("train/acc") for h in history], label="Train Acc")
        if any("val/acc" in h for h in history):
            ax.plot(epochs, [h.get("val/acc") for h in history], label="Val Acc")
        ax.set_xlabel("Epoch"); ax.set_ylabel("Accuracy"); ax.set_ylim(0, 1)
        ax.set_title("Train/Val Accuracy per Epoch"); ax.legend()
        tracker.log_figure(fig, "train_val_accuracy.png"); plt.close(fig)


def build_from_cfg(cfg) -> dict:
    """cfg → {model, criterion, optim_spec, sched_spec} (the reference's
    build_from_cfg, engine.py:313-325). Maps trainer.precision to the model
    compute dtype (32 → f32; 16-mixed/bf16-mixed → bf16 — fp16 doesn't exist
    on TPU)."""
    from dlsc_tpu.config import instantiate

    precision = str(cfg.select("trainer.precision", default="32"))
    dtype = jnp.float32 if precision == "32" else jnp.bfloat16

    model_cfg = cfg.model.to_dict()
    model_cfg.pop("dataset_overrides", None)
    try:
        model = instantiate({**model_cfg, "dtype": dtype})
    except TypeError:  # model doesn't take a dtype knob
        model = instantiate(model_cfg)
    criterion = instantiate(cfg.loss.to_dict()) if "loss" in cfg else CrossEntropyLoss()
    optim_spec = instantiate(cfg.optimizer.to_dict())
    sched_spec = instantiate(cfg.scheduler.to_dict()) if "scheduler" in cfg else None
    return {
        "model": model,
        "criterion": criterion,
        "optim_spec": optim_spec,
        "sched_spec": sched_spec,
    }
