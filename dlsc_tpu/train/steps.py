"""jit/pjit-compiled train and eval steps.

One fused device program per step: device pipeline (crop/mel/augment/mix) →
model forward → soft-label loss → backward → optimizer update → metric
update, donated TrainState. The reference splits this across DataLoader
worker processes and Lightning hooks (SURVEY.md §3.1); fusing it removes the
host from the hot loop entirely — the only host→device transfer is the raw
waveform batch.

Multi-chip: steps are jitted with NamedShardings from dlsc_tpu.parallel —
batch sharded over the 'data' mesh axis, state replicated. XLA (GSPMD)
inserts the gradient all-reduce over ICI; BatchNorm statistics are global
because reductions see the full logical batch.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from dlsc_tpu.data.pipeline import DevicePipeline
from dlsc_tpu.models.moe import collect_moe_aux, collect_moe_stats
from dlsc_tpu.train.metrics import MetricState
from dlsc_tpu.train.state import TrainState


def make_train_step(
    pipeline: DevicePipeline, criterion: Callable, accum: int = 1
) -> Callable:
    """Returns train_step(state, metric_state, wave, labels) → (state, ms, loss).

    ``accum`` > 1 enables gradient accumulation the TPU way: the batch is
    split into ``accum`` sequential micro-batches under ``lax.scan`` inside
    the same jitted program — activation memory drops ~accum× (only one
    micro-batch's activations live at a time) while the optimizer still
    updates once per batch with the mean gradient. NB the wire batch is the
    *global* batch here (the device subdivides it); to reproduce Lightning's
    ``accumulate_grad_batches=M`` over loader batches, multiply batch_size
    by M. Micro-batch-scoped semantics (standard grad-accum caveats):
    BatchNorm statistics and in-batch Mixup/BC partner pools see the
    micro-batch, and pipeline/dropout RNG streams differ from the accum=1
    program's."""
    if accum > 1:
        return _make_train_step_accum(pipeline, criterion, accum)

    def train_step(state: TrainState, ms: MetricState, wave, labels):
        rng, k_pipe, k_drop = jax.random.split(state.rng, 3)
        inputs, y = pipeline.train_batch(wave, labels, k_pipe)
        inputs = jax.lax.stop_gradient(inputs)
        y = jax.lax.stop_gradient(y)

        def loss_fn(params):
            variables = {"params": params}
            # 'intermediates' is always mutable so MoE blocks can sow their
            # (pre-weighted) aux losses; models that sow nothing return an
            # empty dict at zero cost.
            mutable = ["intermediates"]
            if state.batch_stats is not None:
                variables["batch_stats"] = state.batch_stats
                mutable.append("batch_stats")
            if state.hyper is not None:
                variables["hyper"] = state.hyper
            logits, mut = state.apply_fn(
                variables, inputs, train=True,
                rngs={"dropout": k_drop}, mutable=mutable,
            )
            loss = criterion(logits, y) + collect_moe_aux(
                mut.get("intermediates"))
            # MoE observability scalars (drop fraction / load balance) —
            # streamed into the MetricState when it was created with extras
            stats = collect_moe_stats(mut.get("intermediates"))
            return loss, (logits, mut.get("batch_stats"), stats)

        (loss, (logits, new_bs, stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads).replace(
            rng=rng,
            batch_stats=new_bs if new_bs is not None else state.batch_stats,
        )
        hard = jnp.argmax(y, axis=-1)
        ms = ms.update(logits, hard, loss).add_extras(stats)
        return new_state, ms, loss

    return train_step


def _make_train_step_accum(
    pipeline: DevicePipeline, criterion: Callable, accum: int
) -> Callable:
    """Gradient-accumulation variant of make_train_step (see its docstring)."""

    def train_step(state: TrainState, ms: MetricState, wave, labels):
        B = wave.shape[0]
        if B % accum:
            raise ValueError(
                f"batch size {B} not divisible by accumulate_grad_batches="
                f"{accum}")
        mb = B // accum
        rng, k_base = jax.random.split(state.rng)
        mwave = wave.reshape(accum, mb, *wave.shape[1:])
        mlab = labels.reshape(accum, mb, *labels.shape[1:])

        def loss_fn(params, bs, w, l, k_pipe, k_drop):
            inputs, y = pipeline.train_batch(w, l, k_pipe)
            inputs = jax.lax.stop_gradient(inputs)
            y = jax.lax.stop_gradient(y)
            variables = {"params": params}
            mutable = ["intermediates"]
            if bs is not None:
                variables["batch_stats"] = bs
                mutable.append("batch_stats")
            if state.hyper is not None:
                variables["hyper"] = state.hyper
            logits, mut = state.apply_fn(
                variables, inputs, train=True,
                rngs={"dropout": k_drop}, mutable=mutable,
            )
            loss = criterion(logits, y) + collect_moe_aux(
                mut.get("intermediates"))
            stats = collect_moe_stats(mut.get("intermediates"))
            return loss, (logits, y, mut.get("batch_stats"), stats)

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

        def micro(carry, xs):
            g_acc, bs, ms, loss_acc = carry
            w, l, i = xs
            k = jax.random.fold_in(k_base, i)
            k_pipe, k_drop = jax.random.split(k)
            (loss, (logits, y, nbs, stats)), g = grad_fn(
                state.params, bs, w, l, k_pipe, k_drop)
            g_acc = jax.tree_util.tree_map(jnp.add, g_acc, g)
            ms = ms.update(logits, jnp.argmax(y, axis=-1), loss).add_extras(stats)
            return (g_acc, nbs if nbs is not None else bs, ms,
                    loss_acc + loss), None

        g0 = jax.tree_util.tree_map(jnp.zeros_like, state.params)
        (g, new_bs, ms, loss_sum), _ = jax.lax.scan(
            micro, (g0, state.batch_stats, ms, jnp.zeros((), jnp.float32)),
            (mwave, mlab, jnp.arange(accum)),
        )
        grads = jax.tree_util.tree_map(lambda x: x / accum, g)
        new_state = state.apply_gradients(grads).replace(
            rng=rng, batch_stats=new_bs,
        )
        return new_state, ms, loss_sum / accum

    return train_step


def make_train_step_indexed(
    pipeline: DevicePipeline, criterion: Callable, accum: int = 1
) -> Callable:
    """Device-resident-dataset train step: the waveform pool lives in HBM and
    the step gathers its batch by index on chip (the TPU-native equivalent of
    the reference's host-RAM pre-load, esc50.py:167-191). Signature:
    train_step(state, ms, pool, idx, labels) → (state, ms, loss)."""
    base = make_train_step(pipeline, criterion, accum)

    def train_step(state: TrainState, ms: MetricState, pool, idx, labels):
        wave = jnp.take(pool, idx, axis=0)
        return base(state, ms, wave, labels)

    return train_step


def make_eval_step_indexed(
    pipeline: DevicePipeline, criterion: Callable
) -> Callable:
    """eval_step(state, ms, pool, idx, labels, mask) → (ms, logits)."""
    base = make_eval_step(pipeline, criterion)

    def eval_step(state: TrainState, ms: MetricState, pool, idx, labels, mask):
        wave = jnp.take(pool, idx, axis=0)
        return base(state, ms, wave, labels, mask)

    return eval_step


def make_eval_step(pipeline: DevicePipeline, criterion: Callable) -> Callable:
    """Returns eval_step(state, metric_state, wave, labels, mask) →
    (ms, logits). Handles the multi-crop test path: (B, n_crops, W) inputs
    are evaluated per crop and the outputs averaged — exactly the
    reference's mean over stacked crop logits (engine.py:156-159)."""

    def eval_step(state: TrainState, ms: MetricState, wave, labels, mask):
        inputs, y = pipeline.eval_batch(wave, labels)
        variables = {"params": state.params}
        if state.batch_stats is not None:
            variables["batch_stats"] = state.batch_stats
        if state.hyper is not None:
            variables["hyper"] = state.hyper

        if inputs.ndim == 3 and pipeline.cfg.mode == "envnet_v2" and (
            pipeline.cfg.multi_crop_test
        ):
            B, n_crops, W = inputs.shape
            flat = inputs.reshape(B * n_crops, W)
            out = state.apply_fn(variables, flat, train=False)
            logits = out.reshape(B, n_crops, -1).mean(axis=1)
        else:
            logits = state.apply_fn(variables, inputs, train=False)
        loss = criterion(logits, y, mask=mask.astype(jnp.float32))
        hard = jnp.argmax(y, axis=-1)
        ms = ms.update(logits, hard, loss, mask=mask)
        return ms, logits

    return eval_step
