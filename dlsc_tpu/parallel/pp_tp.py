"""Pipeline × tensor parallelism for the ViT encoder (dp × pp × tp).

``parallel/pp.py`` pipelines whole encoder blocks over a 'stage' mesh axis;
``parallel/tp.py`` shards within-block matmuls over a 'model' axis via GSPMD
parameter shardings. Those two cannot compose directly — GSPMD sharding
constraints are not allowed inside the pipeline's ``shard_map`` body — so
this module implements the within-block tensor parallelism *manually*: the
block math is a pure function over head-/hidden-sharded local parameters
with explicit ``lax.psum`` collectives over 'model'. Megatron-style
column/row splits, the collectives written by hand instead of inserted by
the compiler:

- qkv: heads split over 'model' (each shard computes its own heads'
  attention — softmax is per-head, so no cross-shard comm inside attention),
- attention out-projection: row-parallel → partial sums, one psum,
- MLP fc1: column-parallel (hidden split); fc2: row-parallel → one psum,
- LayerNorms, biases of row-parallel layers, residual stream: replicated.

Two psums per block per microbatch ride ICI alongside the pipeline's
ppermute hops. Dropout under tp: the hidden/attention masks must be
*independent* per model shard (they mask disjoint slices of the hidden/head
dims) while the output-dropout mask must be *identical* across shards (it
masks the replicated residual contribution) — handled by folding the model
axis index into the former keys only.

The block math mirrors ``models/vit.py`` (timm pre-LN Block; reference:
src/models/ast_small.py:18-37) in plain jnp: exact-erf GELU, f32 softmax
and LayerNorm statistics. The reference has no distributed layer at all
(SURVEY.md §2.7) — this axis combination exists for scale headroom.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.ad_checkpoint  # checkpoint_name is not reachable as a lazy attr
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from dlsc_tpu.parallel.pp import _mesh_from_axes, pipeline_blocks


def get_pp_tp_mesh(
    n_devices: int | None = None,
    n_stages: int = 2,
    n_tp: int = 2,
    devices=None,
) -> Mesh:
    """('data', 'stage', 'model') mesh: batch × pipeline × tensor axes."""
    return _mesh_from_axes(
        [("stage", n_stages), ("model", n_tp)], n_devices, devices
    )


def _ln(x: jax.Array, scale: jax.Array, bias: jax.Array,
        eps: float = 1e-6) -> jax.Array:
    """LayerNorm matching flax.linen.LayerNorm semantics (f32 statistics,
    fast-variance formula) on the last axis."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean, 0.0
    )
    y = ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)
    # scale/bias arithmetic in the model dtype, matching flax's promotion
    return y * scale.astype(x.dtype) + bias.astype(x.dtype)


def _dropout(x: jax.Array, rate: float, key: jax.Array) -> jax.Array:
    """Inverted dropout matching flax.linen.Dropout."""
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, p=keep, shape=x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


def _block_tp(
    p: dict, h: jax.Array, *, dh: int, dropout: float, attn_dropout: float,
    dtype, train: bool, key: jax.Array | None, axis: str,
    n_real: int | None, use_flash: bool, attn_impl: str,
    moe=None, n_tp: int = 1,
) -> jax.Array:
    """One pre-LN encoder block over model-axis-local params.

    ``p`` leaves are this shard's slices: qkv kernel (D, 3, H_local, dh),
    proj kernel (H_local, dh, D), fc1 kernel (D, hid_local), fc2 kernel
    (hid_local, D); norms/biases of row-parallel layers are replicated.

    ``moe`` (MoeSpec): the MLP half is a routed expert mixture instead —
    implemented by applying models/moe.MoeMlp itself on this shard's
    F-sliced expert weights (wi/bi column-split, wo row-split, router
    replicated, bo pre-divided by n_tp so the psum restores it once). The
    router runs replicated, so every shard makes identical routing
    decisions and the (linear) combine can be psum'd after the module.
    Returns ``(x, aux)`` with the sown moe_aux scalar (replicated over
    'model'); the dense path returns ``(x, 0.0)``. Dropout caveat: the
    hidden expert-FFN mask uses the same key on every shard, so mask
    patterns repeat across the F slices (the output mask NEEDS identical
    keys for the psum to commute with it) — a documented noise-stream
    deviation, like every other layout change on the pipelined paths.
    """
    x = h
    y = _ln(x, p["norm1"]["scale"], p["norm1"]["bias"])

    if key is not None:
        k_attn, k_hid, k_out = jax.random.split(key, 3)
        idx = jax.lax.axis_index(axis)
        k_attn = jax.random.fold_in(k_attn, idx)  # local heads: independent
        k_hid = jax.random.fold_in(k_hid, idx)    # local hidden: independent
    else:
        k_attn = k_hid = k_out = None

    wq = p["qkv"]["kernel"].astype(dtype)   # (D, 3, Hl, dh)
    bq = p["qkv"]["bias"].astype(dtype)     # (3, Hl, dh)
    q = jnp.einsum("bnd,dhk->bhnk", y, wq[:, 0]) + bq[0][None, :, None, :]
    k = jnp.einsum("bnd,dhk->bhnk", y, wq[:, 1]) + bq[1][None, :, None, :]
    v = jnp.einsum("bnd,dhk->bhnk", y, wq[:, 2]) + bq[2][None, :, None, :]

    flash_ok = (
        use_flash
        and attn_impl != "dense"
        and jax.default_backend() == "tpu"
        and (attn_dropout == 0.0 or not train)
    )
    if flash_ok:
        from dlsc_tpu.models.vit import _flash_mha, _splash_mha

        mha = _splash_mha if attn_impl == "splash" else _flash_mha
        out = mha(q, k, v, sm_scale=dh**-0.5, n_real=n_real)
    else:
        attn = jnp.einsum("bhqd,bhkd->bhqk", q, k) * (dh**-0.5)
        N = attn.shape[-1]
        if n_real is not None and n_real < N:
            keep = jnp.arange(N) < n_real
            attn = jnp.where(keep[None, None, None, :], attn, -1e30)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(dtype)
        if train and attn_dropout > 0.0:
            attn = _dropout(attn, attn_dropout, k_attn)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)

    # name the attention output so remat_policy='attn_out' saves it here
    # exactly as models/vit.py Attention does
    out = jax.ad_checkpoint.checkpoint_name(out, "attn_out")
    wp = p["proj"]["kernel"].astype(dtype)  # (Hl, dh, D)
    a = jnp.einsum("bhnd,hdo->bno", out, wp)
    a = jax.lax.psum(a, axis) + p["proj"]["bias"].astype(dtype)
    x = x + a

    y = _ln(x, p["norm2"]["scale"], p["norm2"]["bias"])
    if moe is not None:
        from dlsc_tpu.models.moe import MoeMlp, collect_moe_aux

        D = y.shape[-1]
        Fl = p["wi"].shape[-1]  # this shard's expert-hidden slice
        # flax validates param shapes against the init's eval_shape, so the
        # module's F = int(dim * ratio) must equal Fl exactly; the +0.5
        # makes the float round-trip land on Fl regardless of ulp error
        mod = MoeMlp(D, moe, ratio=(Fl + 0.5) / D, dropout=dropout,
                     dtype=dtype, n_real=n_real)
        local = {
            "router": p["router"],
            "wi": p["wi"], "bi": p["bi"], "wo": p["wo"],
            # replicated in specs; pre-divide so the psum adds it once
            "bo": p["bo"] / n_tp,
        }
        # k_out (NOT axis-folded): the output-dropout mask must be identical
        # on every shard for psum∘dropout == dropout∘psum; the hidden mask
        # inherits the same key (see docstring)
        rngs = {"dropout": k_out} if (train and dropout > 0.0) else None
        o, mut = mod.apply({"params": local}, y, train, rngs=rngs,
                           mutable=["intermediates"])
        o = jax.lax.psum(o, axis)
        aux = collect_moe_aux(mut.get("intermediates"))  # replicated
        return x + o, jnp.asarray(aux, jnp.float32)
    mid = y @ p["fc1"]["kernel"].astype(dtype) + p["fc1"]["bias"].astype(dtype)
    mid = jax.nn.gelu(mid, approximate=False)
    if train and dropout > 0.0:
        mid = _dropout(mid, dropout, k_hid)
    o = mid @ p["fc2"]["kernel"].astype(dtype)
    o = jax.lax.psum(o, axis) + p["fc2"]["bias"].astype(dtype)
    if train and dropout > 0.0:
        o = _dropout(o, dropout, k_out)  # same mask on every model shard
    return x + o, jnp.float32(0.0)


def _tp_layout(stacked: dict, num_heads: int) -> tuple[dict, Any]:
    """Reshape the scan-stacked flax block params into the head-/hidden-split
    layout _block_tp consumes, plus the matching PartitionSpec tree (depth
    over 'stage', head/hidden dims over 'model').

    MoE blocks ('moe' instead of 'mlp' in the stacked tree): the expert
    hidden dim F is the TP split — wi (depth,E,D,F) and bi (depth,E,F)
    column-parallel, wo (depth,E,F,D) row-parallel; router kernel and bo
    replicated (every shard routes identically; see _block_tp).
    """
    depth, D, _ = stacked["attn"]["qkv"]["kernel"].shape
    dh = D // num_heads
    params = {
        "norm1": stacked["norm1"],
        "norm2": stacked["norm2"],
        "qkv": {
            "kernel": stacked["attn"]["qkv"]["kernel"].reshape(
                depth, D, 3, num_heads, dh),
            "bias": stacked["attn"]["qkv"]["bias"].reshape(
                depth, 3, num_heads, dh),
        },
        "proj": {
            "kernel": stacked["attn"]["proj"]["kernel"].reshape(
                depth, num_heads, dh, D),
            "bias": stacked["attn"]["proj"]["bias"],
        },
    }
    S, M = "stage", "model"
    specs = {
        "norm1": {"scale": P(S, None), "bias": P(S, None)},
        "norm2": {"scale": P(S, None), "bias": P(S, None)},
        "qkv": {"kernel": P(S, None, None, M, None),
                "bias": P(S, None, M, None)},
        "proj": {"kernel": P(S, M, None, None), "bias": P(S, None)},
    }
    if "moe" in stacked:
        moe = stacked["moe"]
        params.update({
            "router": moe["router"],
            "wi": moe["wi"], "bi": moe["bi"],
            "wo": moe["wo"], "bo": moe["bo"],
        })
        specs.update({
            "router": {"kernel": P(S, None, None)},
            "wi": P(S, None, None, M), "bi": P(S, None, M),
            "wo": P(S, None, M, None), "bo": P(S, None, None),
        })
    else:
        params.update({"fc1": stacked["mlp"]["fc1"],
                       "fc2": stacked["mlp"]["fc2"]})
        specs.update({
            "fc1": {"kernel": P(S, None, M), "bias": P(S, M)},
            "fc2": {"kernel": P(S, M, None), "bias": P(S, None)},
        })
    return params, specs


def vit_apply_pp_tp(
    model,
    variables: Any,
    x: jax.Array,
    *,
    mesh: Mesh,
    n_micro: int,
    train: bool = False,
    rng: jax.Array | None = None,
) -> jax.Array:
    """Full ASTViT forward with the encoder pipelined over 'stage' AND
    tensor-parallel over 'model' (manual Megatron splits, see module doc).

    Same contract as ``pp.vit_apply_pp``: needs ``scan_blocks=True``,
    ``token_sharding=None``; training with dropout needs ``rng``. Requires
    ``num_heads`` divisible by the 'model' axis size.

    MoE models: the expert hidden dim F is the TP split (see _block_tp /
    _tp_layout); F must divide the 'model' axis size. As on the pp path,
    TRAINING returns ``(logits, moe_aux)`` — add the aux to the loss like
    train/steps.py does; ``expert_sharding`` (GSPMD EP) cannot appear
    inside the shard_map and must be None.
    """
    from dlsc_tpu.models.moe import as_moe_spec

    if not model.scan_blocks:
        raise ValueError("pp×tp needs scan_blocks=True "
                         "(depth-stacked block params)")
    moe = as_moe_spec(getattr(model, "moe", None))
    if moe is not None and model.expert_sharding is not None:
        raise ValueError(
            "pp×tp does not compose with expert_sharding (GSPMD constraints "
            "cannot appear inside the pipeline's shard_map); build the model "
            "with expert_sharding=None")
    tp = int(mesh.shape["model"])
    if model.num_heads % tp:
        raise ValueError(
            f"num_heads {model.num_heads} not divisible by model axis {tp}"
        )
    blocks_p = variables["params"]["blocks"]["block"]
    hidden = (blocks_p["moe"]["wi"] if moe is not None
              else blocks_p["mlp"]["fc1"]["kernel"]).shape[-1]
    if hidden % tp:
        raise ValueError(
            f"{'expert' if moe is not None else 'MLP'} hidden {hidden} "
            f"not divisible by model axis {tp}"
        )
    dropout_active = train and (model.dropout > 0 or model.attn_dropout > 0)
    if dropout_active and rng is None:
        raise ValueError(
            "training with dropout on the pipelined path requires rng="
        )
    if model.token_sharding is not None:
        raise ValueError(
            "pp×tp does not compose with sequence parallelism; build the "
            "model with token_sharding=None"
        )

    tokens, n_real = model.apply(variables, x, part="embed")
    tp_params, specs = _tp_layout(blocks_p, model.num_heads)
    dh = model.emb_dim // model.num_heads
    moe_aux = moe is not None and train

    def block_fn(p, h, key):
        return _block_tp(
            p, h, dh=dh, dropout=model.dropout,
            attn_dropout=model.attn_dropout, dtype=model.dtype, train=train,
            key=key, axis="model", n_real=n_real, use_flash=model.use_flash,
            attn_impl=model.attn_impl, moe=moe, n_tp=tp,
        )

    if model.remat:
        from dlsc_tpu.models.vit import remat_kwargs

        kw = remat_kwargs(model.remat_policy)
        kw.pop("static_argnums", None)  # train is closed over here
        block_fn = jax.checkpoint(block_fn, **kw)

    def apply_block(p, h, key=None):
        out = block_fn(p, h, key)
        return out if moe_aux else out[0]

    y = pipeline_blocks(
        apply_block, tp_params, tokens, mesh=mesh, n_micro=n_micro,
        rng=rng if dropout_active else None, param_specs=specs,
        with_aux=moe_aux,
    )
    if moe_aux:
        y, aux = y
        return model.apply(variables, y, part="finalize"), aux
    return model.apply(variables, y, part="finalize")
