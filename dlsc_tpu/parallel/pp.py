"""Pipeline parallelism for the ViT encoder (GPipe-style, shard_map + ppermute).

The reference has no distributed layer at all (SURVEY.md §2.7); dp/tp/sp live
in dlsc_tpu.parallel.{mesh,tp}. This module adds the remaining classic
parallelism axis: the depth-stacked encoder blocks (the scan layout,
models/vit.py ``scan_blocks=True`` — every block param carries a leading
depth axis) are sharded over a 'stage' mesh axis and microbatches stream
through the stages with ``jax.lax.ppermute`` hops over ICI.

Design (hybrid GSPMD + manual SPMD):

- embed (patch conv + pos embed) and finalize (norm + head) are tiny; they
  run *outside* the pipeline as ordinary GSPMD code — replicated over
  'stage', batch-sharded over 'data'.
- the block stack runs inside one ``shard_map``: each stage holds
  ``depth / n_stages`` blocks' params (leading depth dim sharded with
  ``P('stage')``) and applies them with ``lax.scan``; activations hop
  stage→stage via ``ppermute``. The schedule is plain GPipe over
  ``n_micro + n_stages - 1`` ticks — during fill/drain every stage still
  computes (SPMD requires it) and the garbage results are masked at the
  output buffer. Bubble fraction = (S-1)/(n_micro+S-1).
- the last stage's collected outputs are replicated with one ``psum`` over
  'stage' (valid-stage-masked), so callers see an ordinary (B, N, D) array.

Differentiable end-to-end: ppermute/psum/scan all transpose cleanly, so
``jax.grad`` through the pipelined forward yields exactly the sequential
gradients (asserted in tests/test_pp.py on the 8-device CPU mesh).

Composes with data parallelism on a ('data', 'stage') mesh. GSPMD-based
TP/SP (parallel/tp.py) cannot appear inside the shard_map body; the pp×tp
composition instead writes the within-block tensor parallelism manually
(explicit psum collectives over a third 'model' axis) — see
parallel/pp_tp.py.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.8 exports shard_map at top level
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

# the replication-check kwarg was renamed (check_rep → check_vma) across jax
# versions; the pipeline's masked-psum output pattern needs it off either way
import inspect as _inspect

_SM_PARAMS = _inspect.signature(shard_map).parameters
_SM_KW = (
    {"check_rep": False} if "check_rep" in _SM_PARAMS
    # default to check_vma even if the signature hides it (e.g. a *args
    # wrapper): passing it raises loudly on an incompatible version instead
    # of silently leaving the replication check ON, which the pipeline's
    # masked-psum output pattern cannot pass
    else {"check_vma": False}
)


def _mesh_from_axes(
    axes: list[tuple[str, int]], n_devices: int | None = None, devices=None
) -> Mesh:
    """Mesh with a leading 'data' axis absorbing the devices the named
    trailing axes don't use. Shared by get_pp_mesh / get_pp_tp_mesh."""
    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    tail = int(np.prod([s for _, s in axes]))
    if n % tail:
        names = "*".join(f"{a}={s}" for a, s in axes)
        raise ValueError(f"{n} devices not divisible by {names}")
    arr = np.asarray(devices).reshape(n // tail, *(s for _, s in axes))
    return Mesh(arr, ("data", *(a for a, _ in axes)))


def get_pp_mesh(
    n_devices: int | None = None, n_stages: int = 2, devices=None
) -> Mesh:
    """('data', 'stage') mesh: batch axis × pipeline axis."""
    return _mesh_from_axes([("stage", n_stages)], n_devices, devices)


def pipeline_blocks(
    apply_block: Callable[..., jax.Array],
    stacked_params: Any,
    x: jax.Array,
    *,
    mesh: Mesh,
    n_micro: int,
    axis: str = "stage",
    data_axis: str = "data",
    rng: jax.Array | None = None,
    param_specs: Any | None = None,
    with_aux: bool = False,
) -> jax.Array:
    """Apply ``depth`` stacked blocks to ``x`` pipelined over ``axis``.

    apply_block(params_one_layer, h) -> h applies a single block; it runs
    inside shard_map, so it must not itself use GSPMD shardings.
    stacked_params: pytree whose leaves have a leading ``depth`` axis (the
    nn.scan layout). x: (B, N, D) with B sharded over ``data_axis``.

    ``with_aux``: apply_block additionally returns a scalar auxiliary loss
    (MoE load-balance/z losses) and pipeline_blocks returns ``(y, aux)``.
    Fill/drain garbage ticks are masked out of the accumulation; the result
    is summed over stages (each stage holds distinct layers), averaged over
    microbatches and over the 'data' axis — i.e. the per-layer token-mean
    convention of models/moe.py, estimated per microbatch (see
    vit_apply_pp for the exact-vs-estimator caveat).

    ``rng``: optional PRNG key enabling stochastic blocks (dropout). When
    given, apply_block is called as ``apply_block(params, h, key)`` with a
    key folded from (data shard, microbatch, global layer index) — i.e. the
    noise stream is a pure function of which sample block is being processed,
    independent of the pipeline schedule.

    ``param_specs``: optional PartitionSpec pytree for ``stacked_params``
    overriding the default ``P(axis)`` (depth-only sharding) — used by the
    pp×tp composition (parallel/pp_tp.py) to additionally shard within-block
    dims over a 'model' axis; apply_block then sees *local* parameter shards
    and is responsible for its own cross-shard collectives.
    """
    n_stages = int(mesh.shape[axis])
    n_data = int(mesh.shape[data_axis])
    depth = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
    if depth % n_stages:
        raise ValueError(f"depth {depth} not divisible by {n_stages} stages")
    layers_per_stage = depth // n_stages
    B = x.shape[0]
    if B % (n_data * n_micro):
        raise ValueError(
            f"batch {B} must be divisible by data axis ({n_data}) × "
            f"n_micro ({n_micro})"
        )

    param_spec = (
        param_specs if param_specs is not None
        else jax.tree_util.tree_map(lambda _: P(axis), stacked_params)
    )
    x_spec = P(data_axis)  # batch over 'data', replicated over 'stage'

    def body(params_local, x_local, key):
        S = n_stages
        stage = jax.lax.axis_index(axis)
        Bl = x_local.shape[0]
        mb = Bl // n_micro
        xm = x_local.reshape(n_micro, mb, *x_local.shape[1:])
        if key is not None:
            key = jax.random.fold_in(key, jax.lax.axis_index(data_axis))

        def run_stage(h, m):
            # m: microbatch id this stage processes this tick (clipped;
            # fill/drain garbage is masked at the output buffer)
            layer_ids = stage * layers_per_stage + jnp.arange(layers_per_stage)

            def one(h, pl):
                p, lid = pl
                if key is None:
                    out = apply_block(p, h)
                else:
                    k = jax.random.fold_in(jax.random.fold_in(key, m), lid)
                    out = apply_block(p, h, k)
                if with_aux:
                    h, a = out
                    return h, jnp.asarray(a, jnp.float32)
                return out, jnp.float32(0.0)

            h, auxs = jax.lax.scan(one, h, (params_local, layer_ids))
            return h, jnp.sum(auxs)

        perm = [(i, (i + 1) % S) for i in range(S)]

        def tick(carry, t):
            recv, ybuf, aux_acc = carry
            # stage 0 feeds fresh microbatches (clipped re-reads during
            # drain are computed and discarded); later stages consume the
            # previous tick's ppermute.
            first = jax.lax.dynamic_index_in_dim(
                xm, jnp.clip(t, 0, n_micro - 1), 0, keepdims=False
            )
            inp = jnp.where(stage == 0, first, recv)
            # stage s works on microbatch t - s (by pipeline induction)
            out, aux = run_stage(inp, jnp.clip(t - stage, 0, n_micro - 1))
            # a tick is real work for stage s iff 0 <= t - s < n_micro;
            # fill/drain garbage must not pollute the aux accumulation
            real = jnp.logical_and(t - stage >= 0, t - stage < n_micro)
            aux_acc = aux_acc + jnp.where(real, aux, 0.0)
            # the last stage finishes microbatch m = t - (S-1) at tick t;
            # fill ticks (m < 0) rewrite the existing slot with itself.
            m = t - (S - 1)
            mclip = jnp.clip(m, 0, n_micro - 1)
            prev = jax.lax.dynamic_index_in_dim(ybuf, mclip, 0, keepdims=False)
            write = jnp.where(m >= 0, out, prev)
            ybuf = jax.lax.dynamic_update_index_in_dim(ybuf, write, mclip, 0)
            recv = jax.lax.ppermute(out, axis, perm)
            return (recv, ybuf, aux_acc), None

        carry = (jnp.zeros_like(xm[0]), jnp.zeros_like(xm), jnp.float32(0.0))
        (recv, ybuf, aux_acc), _ = jax.lax.scan(
            tick, carry, jnp.arange(n_micro + S - 1)
        )
        # only the last stage holds real outputs → mask + psum replicates
        y = jnp.where(stage == S - 1, ybuf, jnp.zeros_like(ybuf))
        y = jax.lax.psum(y, axis)
        y = y.reshape(Bl, *x_local.shape[1:])
        # stages hold distinct layers → psum over 'stage' sums all layers;
        # mean over microbatches and data shards restores the per-layer
        # full-batch token-mean scale of the sequential model
        aux = jax.lax.psum(aux_acc, axis) / n_micro
        aux = jax.lax.pmean(aux, data_axis)
        return y, aux

    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(param_spec, x_spec, P()),
        out_specs=(x_spec, P()),
        **_SM_KW,
    )
    y, aux = fn(stacked_params, x, rng)
    return (y, aux) if with_aux else y


def make_pp_apply_fn(model, mesh: Mesh, n_micro: int):
    """``state.apply_fn``-compatible wrapper around :func:`vit_apply_pp`.

    This is what makes PP a product feature rather than a library call
    (`+trainer.pipeline_parallel=S`): the standard train/eval steps
    (train/steps.py) call ``apply_fn(variables, inputs, train=..., rngs=...,
    mutable=[...])``; this adapter routes that call through the pipelined
    forward. MoE aux losses — which ride the pipeline scan because flax
    intermediates cannot cross the shard_map boundary (vit_apply_pp) — are
    surfaced back through a synthetic ``intermediates`` collection under the
    ``moe_aux`` key, exactly where ``collect_moe_aux`` looks, so the train
    step needs no PP-specific code.
    """

    def apply_fn(variables, inputs, train=False, rngs=None, mutable=None):
        rng = (rngs or {}).get("dropout")
        out = vit_apply_pp(model, variables, inputs, mesh=mesh,
                           n_micro=n_micro, train=train, rng=rng)
        if mutable is None:
            return out
        if isinstance(out, tuple):  # MoE training: (logits, aux)
            logits, aux = out
            return logits, {"intermediates": {"moe_aux": (aux,)}}
        return out, {}

    return apply_fn


def pp_state_shardings(state: Any, mesh: Mesh, axis: str = "stage") -> Any:
    """TrainState-shaped pytree of NamedShardings for pipeline training.

    Every leaf whose tree path traverses the stacked encoder blocks
    (``blocks``/``block`` — the nn.scan layout, leading depth dim) is sharded
    ``P(axis)`` so each stage holds only its own layers' params; the Adam
    moments mirror the params tree, so the same path rule shards them
    identically. Everything else (embed/head params, step counter, rng,
    schedules) is replicated. Valid as jit in_/out_shardings for the train
    step: the optimizer update on stacked leaves is elementwise, so GSPMD
    keeps it stage-local.
    """
    from dlsc_tpu.parallel.mesh import path_keys

    def one(path, leaf):
        keys = path_keys(path)
        if "block" in keys or "blocks" in keys:
            return NamedSharding(mesh, P(axis))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(one, state)


def vit_apply_pp(
    model,
    variables: Any,
    x: jax.Array,
    *,
    mesh: Mesh,
    n_micro: int,
    train: bool = False,
    rng: jax.Array | None = None,
) -> jax.Array:
    """Full ASTViT forward with the encoder pipelined over the 'stage' axis.

    ``model`` must use the scan (stacked) block layout (``scan_blocks=True``)
    so block params carry the leading depth axis. Training with dropout > 0
    needs ``rng``: block dropout noise is folded from (data shard,
    microbatch, layer), so it is schedule-independent — but it is a
    *different* stream than the sequential model's, as with any scan/unroll
    layout change.

    MoE models: inference returns logits as usual; TRAINING returns
    ``(logits, moe_aux)`` — the router's pre-weighted load-balance + z
    losses, collected per block inside the pipeline (flax intermediates
    cannot cross the shard_map boundary, so each block apply runs with
    ``mutable=['intermediates']`` locally and the scalars ride the pipeline
    scan). Add ``moe_aux`` to the loss exactly as the sequential train step
    adds ``collect_moe_aux`` (train/steps.py). Scale caveat: the z-loss is
    a token mean (microbatch-exact); the load-balance term is a product of
    batch means, so under n_micro microbatches × n_data shards it is the
    mean of per-(microbatch, shard) products — the standard estimator every
    microbatched MoE trainer uses (identical at n_micro=1 on one data
    shard; test_pp.py asserts both regimes).
    """
    if not model.scan_blocks:
        raise ValueError("pipeline parallelism needs scan_blocks=True "
                         "(depth-stacked block params)")
    dropout_active = train and (model.dropout > 0 or model.attn_dropout > 0)
    if dropout_active and rng is None:
        raise ValueError(
            "training with dropout on the pipelined path requires rng="
        )
    if model.token_sharding is not None:
        raise ValueError(
            "pipeline parallelism does not compose with sequence parallelism "
            "(token_sharding uses GSPMD constraints, which cannot appear "
            "inside the pipeline's shard_map); build the model with "
            "token_sharding=None"
        )
    import flax.linen as nn

    from dlsc_tpu.models.moe import as_moe_spec
    from dlsc_tpu.models.vit import Block, remat_kwargs

    moe = as_moe_spec(getattr(model, "moe", None))
    if moe is not None and model.expert_sharding is not None:
        raise ValueError(
            "pipeline parallelism does not compose with expert_sharding "
            "(GSPMD constraints cannot appear inside the pipeline's "
            "shard_map); build the model with expert_sharding=None")
    moe_aux = moe is not None and train

    tokens, n_real = model.apply(variables, x, part="embed")
    # honor the model's remat config (ast_small/ast defaults rely on it —
    # without remat the per-microbatch saved activations on each stage can
    # OOM at exactly the scales PP targets)
    block_cls = (
        nn.remat(Block, **remat_kwargs(model.remat_policy))
        if model.remat else Block
    )
    blk = block_cls(
        model.emb_dim, model.num_heads, dropout=model.dropout,
        attn_dropout=model.attn_dropout, dtype=model.dtype,
        use_flash=model.use_flash, attn_impl=model.attn_impl, n_real=n_real,
        moe=moe,
    )

    from dlsc_tpu.models.moe import collect_moe_aux

    def apply_block(p, h, key=None):
        rngs = {"dropout": key} if key is not None else None
        if moe_aux:
            out, mut = blk.apply(
                {"params": p}, h, train, rngs=rngs, mutable=["intermediates"]
            )
            return out, collect_moe_aux(mut.get("intermediates"))
        return blk.apply({"params": p}, h, train, rngs=rngs)

    stacked = variables["params"]["blocks"]["block"]
    y = pipeline_blocks(
        apply_block, stacked, tokens, mesh=mesh, n_micro=n_micro,
        rng=rng if dropout_active else None, with_aux=moe_aux,
    )
    if moe_aux:
        y, aux = y
        return model.apply(variables, y, part="finalize"), aux
    return model.apply(variables, y, part="finalize")
