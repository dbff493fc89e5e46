"""Shape-specialized flash-attention forward for the AST family.

Measured at AST-Base shapes ((64, 12, 1792, 64) bf16, boundary 1645,
pre-padded inputs): fwd 14.7 ms vs 16.1 for the generic splash forward,
fwd+bwd 34.6 vs 36.9 — ~28 ms/step across the 12 encoder blocks. The
generic forward pays for online-softmax rescaling passes and per-tile mask
application it does not need at this shape. This kernel exploits two
static facts:

- the whole kv row (1792 x 64 bf16 per head = 229 KB) plus one f32
  (block_q, 1792) logits tile fit comfortably in VMEM, so each q block does
  a SINGLE flat softmax — one exp per element, one max pass, one sum pass,
  no online rescaling;
- the real/pad column boundary (``n_real``) is known at trace time, so
  masking is one static iota-compare on the logits tile instead of the
  generic mask/segment-id machinery.

The backward (``bwd_impl='fast'``, the default) is the matching
shape-specialized kernel. Given the residuals ``out`` and ``logsumexp``
(splash's exact convention: natural log, pre-scaled q) it exploits the same
static facts plus two backward-only ones:

- ``p = exp(s - lse)`` needs NO max or sum passes — the forward's lse
  already contains both — so the score recompute costs one exp per element
  (vs the library's full online-softmax replay);
- masked kv columns have p = 0 and therefore provably contribute nothing
  to dk/dv, so the whole backward runs on only the first
  ``round128(n_real)`` columns (1664 vs 1792 at AST-Base shapes — a 7%
  FLOP/VPU cut the library's block machinery cannot express), with one
  static iota-compare masking the sub-128 remainder;
- dk/dv accumulate in f32 VMEM scratch across q blocks (sequential TPU
  grid), written back once per head.

The library's fused splash dkv kernel remains available as
``bwd_impl='library'`` (env: ``DLSC_ATTN_BWD``) for A/B. Residuals are
tagged with ``checkpoint_name('attn_res')`` so the `attn_res` remat policy
keeps them and the remat'd backward skips the forward recompute.

reference: behavioral equivalent of torch.nn.MultiheadAttention used by
src/models/ast_small.py:22 (full bidirectional MHA); numerics validated
against the dense oracle in scripts/bench_probe.py:check_splash_correctness.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=8)
def make_fast_mha(
    num_heads: int,
    seq_len: int,
    head_dim: int,
    n_real: int,
    block_q: int,
    block_kv_dkv: int,
    block_kv_dkv_compute: int,
    dtype_name: str,
    n_split: int = 1,
    interpret: bool = False,
    bwd_impl: str = "fast",
    bq_bwd: int = 0,
    n_split_bwd: int = 0,
    use_exp2: bool = False,
):
    """Build the (H, N, dh) single-batch fast-MHA callable (vmap over B).

    ``q`` must be pre-scaled by sm_scale (splash convention). Tokens at
    positions >= n_real are masked as keys; pad q-rows produce finite
    garbage the caller ignores.

    ``n_split``: split each q block into sub-rows and unroll — all qk
    matmuls issued first, then per-chunk softmax→pv — giving Mosaic's
    scheduler the dependency freedom to overlap chunk j's pv matmul (MXU)
    with chunk j+1's softmax (VPU). Identical math (softmax is per-row).

    ``bwd_impl``: 'fast' (the shape-specialized backward kernel below) or
    'library' (splash's fused dkv kernel). ``bq_bwd`` / ``n_split_bwd``:
    q-block width and sub-chunk count for the fast backward (0 → same as
    the forward's ``block_q`` / ``n_split``).
    """
    from jax.ad_checkpoint import checkpoint_name
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from jax.experimental.pallas.ops.tpu.splash_attention import (
        splash_attention_kernel as splash,
    )
    from jax.experimental.pallas.ops.tpu.splash_attention import (
        splash_attention_mask as splash_mask,
    )
    from jax.experimental.pallas.ops.tpu.splash_attention import (
        splash_attention_mask_info as mask_info_lib,
    )

    H, N, dh, bq = num_heads, seq_len, head_dim, block_q
    assert N % bq == 0, (N, bq)
    assert bq % 128 == 0, bq  # lse output block: lane dim must be 128-aligned
    while block_kv_dkv % block_kv_dkv_compute:  # dkv kernel constraint
        block_kv_dkv_compute -= 128
    dtype = jnp.dtype(dtype_name)
    mask_value = splash.DEFAULT_MASK_VALUE

    ns = max(1, n_split)
    while bq % ns or (bq // ns) % 8:
        ns -= 1
    sub = bq // ns

    # base-2 softmax experiment (DLSC_ATTN_EXP2=1, fast bwd only): fold
    # log2(e) into the k operand of the score matmul so the big (sub, N)
    # exponential tile is a bare exp2 with no multiply pass; mathematically
    # equivalent (2^(c(s-m)) = e^(s-m)) but only numerically near-identical
    # in finite precision — multiplying k by the rounded log2(e) constant
    # perturbs the scores (test tolerances: 1e-5 fwd / 2e-4 grads vs the
    # exp path; ADVICE r4). The saved lse switches to base 2 consistently
    # between this fwd and the fast bwd. Gradient formulas consume only p,
    # so dq/dk/dv use the unscaled operands.
    assert not (use_exp2 and bwd_impl != "fast")
    c2 = 1.4426950408889634  # log2(e)
    _exp = jnp.exp2 if use_exp2 else jnp.exp
    _log = jnp.log2 if use_exp2 else jnp.log

    def fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref):
        k = k_ref[0]  # (N, dh)
        if use_exp2:
            k = k * c2  # (N, dh) — 26x smaller than the logits tile
        v = v_ref[0]
        # stage 1: all qk matmuls (MXU) up front
        ss = []
        for j in range(ns):
            q = q_ref[0][j * sub:(j + 1) * sub]  # (sub, dh)
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (sub, N)
            if n_real < N:  # static boundary -> one iota compare
                col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                s = jnp.where(col < n_real, s, mask_value)
            ss.append(s)
        # stage 2: per-chunk flat softmax (VPU) -> pv matmul (MXU); chunks
        # are independent, so the scheduler may overlap units across chunks.
        # Outputs are written per chunk (static ref slices) — no concats,
        # which Mosaic rejects here.
        for j, s in enumerate(ss):
            m = jnp.max(s, axis=-1, keepdims=True)
            p = _exp(s - m)
            l = jnp.sum(p, axis=-1, keepdims=True)
            o = jax.lax.dot_general(
                p.astype(dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (sub, dh)
            o_ref[0, j * sub:(j + 1) * sub, :] = (o / l).astype(o_ref.dtype)
            # lse emitted with an 8-sublane broadcast dim (TPU block tiling
            # needs the second-to-last block dim divisible by 8); caller
            # slices row 0
            lse_ref[0, :, j * sub:(j + 1) * sub] = jnp.broadcast_to(
                (m + _log(l))[:, 0][None, :], (8, sub)
            )

    grid = (H, N // bq)
    fwd_call = pl.pallas_call(
        fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, dh), lambda h, i: (h, i, 0)),
            pl.BlockSpec((1, N, dh), lambda h, i: (h, 0, 0)),
            pl.BlockSpec((1, N, dh), lambda h, i: (h, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, dh), lambda h, i: (h, i, 0)),
            pl.BlockSpec((1, 8, bq), lambda h, i: (h, 0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((H, N, dh), dtype),
            jax.ShapeDtypeStruct((H, 8, N), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * N * N * dh * H,
            bytes_accessed=(3 * N * dh * 2 + N * N * 4) * H,
            transcendentals=N * N * H,
        ),
        interpret=interpret,
    )

    # ---- backward: shape-specialized dq/dk/dv kernel (bwd_impl='fast') ----
    # Same static facts as the forward, plus: p recomputes as one
    # exp(s - lse) (no max/sum passes), and masked kv columns (p = 0)
    # provably contribute nothing to any gradient, so all five matmuls run
    # on only the first round128(n_real) columns. dk/dv accumulate in f32
    # VMEM scratch across the (sequential) q-block grid steps.
    bq_b = bq_bwd or bq
    assert N % bq_b == 0, (N, bq_b)
    nblk_b = N // bq_b
    n_cols = min(-(-n_real // 128) * 128, N)
    ns_b = max(1, n_split_bwd or n_split)
    while bq_b % ns_b or (bq_b // ns_b) % 8:
        ns_b -= 1
    sub_b = bq_b // ns_b

    def bwd_kernel(q_ref, k_ref, v_ref, do_ref, o_ref, lse_ref,
                   dq_ref, dk_ref, dv_ref, dk_acc, dv_acc):
        i = pl.program_id(1)
        kc = k_ref[0][:n_cols]  # (n_cols, dh)
        kc_s = kc * c2 if use_exp2 else kc  # scores operand (base-2 fold)
        vc = v_ref[0][:n_cols]
        dk_new = None
        dv_new = None
        for j in range(ns_b):
            sl = slice(j * sub_b, (j + 1) * sub_b)
            qj = q_ref[0][sl]                       # (sub, dh)
            doj = do_ref[0][sl]
            oj = o_ref[0][sl]
            lsej = lse_ref[0, 0, sl]                # (sub,) f32
            s = jax.lax.dot_general(                # recompute scores (MXU)
                qj, kc_s, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                       # (sub, n_cols) f32
            if n_real < n_cols:  # mask the sub-128 remainder columns
                col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                s = jnp.where(col < n_real, s, mask_value)
            p = _exp(s - lsej[:, None])             # softmax via saved lse
            dpj = jax.lax.dot_general(              # dP = dO V^T (MXU)
                doj, vc, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dij = jnp.sum(                          # D_i = rowsum(dO*O)
                doj.astype(jnp.float32) * oj.astype(jnp.float32),
                axis=-1,
            )
            ds = (p * (dpj - dij[:, None])).astype(dtype)
            pb = p.astype(dtype)
            dqj = jax.lax.dot_general(              # dQ = dS K
                ds, kc, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dq_ref[0, sl, :] = dqj.astype(dq_ref.dtype)
            dvj = jax.lax.dot_general(              # dV += P^T dO
                pb, doj, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                       # (n_cols, dh) f32
            dkj = jax.lax.dot_general(              # dK += dS^T Q
                ds, qj, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dv_new = dvj if dv_new is None else dv_new + dvj
            dk_new = dkj if dk_new is None else dk_new + dkj

        @pl.when(i == 0)
        def _init():
            if n_cols < N:  # zero the pad-column tail once
                dk_acc[n_cols:] = jnp.zeros((N - n_cols, dh), jnp.float32)
                dv_acc[n_cols:] = jnp.zeros((N - n_cols, dh), jnp.float32)
            dk_acc[:n_cols] = dk_new
            dv_acc[:n_cols] = dv_new

        @pl.when(i > 0)
        def _accum():
            dk_acc[:n_cols] += dk_new
            dv_acc[:n_cols] += dv_new

        @pl.when(i == nblk_b - 1)
        def _flush():
            dk_ref[0] = dk_acc[...].astype(dk_ref.dtype)
            dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)

    bwd_call = pl.pallas_call(
        bwd_kernel,
        grid=(H, nblk_b),
        in_specs=[
            pl.BlockSpec((1, bq_b, dh), lambda h, i: (h, i, 0)),  # q
            pl.BlockSpec((1, N, dh), lambda h, i: (h, 0, 0)),     # k
            pl.BlockSpec((1, N, dh), lambda h, i: (h, 0, 0)),     # v
            pl.BlockSpec((1, bq_b, dh), lambda h, i: (h, i, 0)),  # do
            pl.BlockSpec((1, bq_b, dh), lambda h, i: (h, i, 0)),  # out
            pl.BlockSpec((1, 8, bq_b), lambda h, i: (h, 0, i)),   # lse8
        ],
        out_specs=[
            pl.BlockSpec((1, bq_b, dh), lambda h, i: (h, i, 0)),  # dq
            pl.BlockSpec((1, N, dh), lambda h, i: (h, 0, 0)),     # dk
            pl.BlockSpec((1, N, dh), lambda h, i: (h, 0, 0)),     # dv
        ],
        out_shape=[
            jax.ShapeDtypeStruct((H, N, dh), dtype),
            jax.ShapeDtypeStruct((H, N, dh), dtype),
            jax.ShapeDtypeStruct((H, N, dh), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((N, dh), jnp.float32),  # dk accumulator
            pltpu.VMEM((N, dh), jnp.float32),  # dv accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=10 * N * n_cols * dh * H,
            bytes_accessed=8 * N * dh * 2 * H,
            transcendentals=N * n_cols * H,
        ),
        interpret=interpret,
    )

    if bwd_impl == "library":
        # dkv-grid mask info for the library fused backward (mirrors what
        # make_splash_mha builds; fused kernel -> shrink_grid=False)
        if n_real < N:
            head_mask = _column_mask(splash_mask, (N, N), n_real)
        else:
            head_mask = splash_mask.FullMask((N, N))
        mask = splash_mask.MultiHeadMask([head_mask for _ in range(H)])
        dkv_mask_info, mask_function_dkv = mask_info_lib.process_mask_dkv(
            mask,
            (bq, block_kv_dkv),
            downcast_smem_data=True,
            head_shards=1,
            q_seq_shards=1,
            shrink_grid=False,
        )
        # NB: keep MaskInfo leaves as numpy — this factory is lru_cached and
        # may be first called inside a trace; jnp constants created there
        # would leak tracers into later traces. Closed-over numpy embeds
        # per-trace instead.
    elif bwd_impl != "fast":
        raise ValueError(f"unknown bwd_impl {bwd_impl!r}")

    @jax.custom_vjp
    def fast_mha(q, k, v):
        out, _ = fwd_call(q, k, v)
        return out

    def fast_mha_fwd(q, k, v):
        out, lse8 = fwd_call(q, k, v)
        out = checkpoint_name(out, "attn_res")
        lse8 = checkpoint_name(lse8, "attn_res")
        return out, (q, k, v, out, lse8)

    def fast_mha_bwd(res, do):
        q, k, v, out, lse8 = res
        if bwd_impl == "fast":
            return tuple(bwd_call(q, k, v, do, out, lse8))
        lse = lse8[:, 0, :]
        di = jnp.einsum(
            "hsd,hsd->hs", out.astype(jnp.float32), do.astype(jnp.float32)
        )
        dq, dk, dv = splash._splash_attention_bwd_dkv(
            q, k, v, None, None, lse, do, di,
            bq=bq,
            bkv=block_kv_dkv,
            bkv_compute=block_kv_dkv_compute,
            is_mqa=False,
            mask_info=dkv_mask_info,
            mask_value=mask_value,
            attn_logits_soft_cap=None,
            use_fused_bwd_kernel=True,
            q_layout=splash.QKVLayout.HEAD_DIM_MINOR,
            k_layout=splash.QKVLayout.HEAD_DIM_MINOR,
            v_layout=splash.QKVLayout.HEAD_DIM_MINOR,
            mask_function=mask_function_dkv,
            interpret=interpret,
        )
        return dq, dk, dv

    fast_mha.defvjp(fast_mha_fwd, fast_mha_bwd)
    return fast_mha


_COLUMN_MASK_CLS = None


def _column_mask(splash_mask_mod, shape: tuple[int, int], bound: int):
    """kv < bound computed mask (same class as dlsc_tpu.models.vit uses)."""
    global _COLUMN_MASK_CLS
    if _COLUMN_MASK_CLS is None:

        class ColumnMask(splash_mask_mod._ComputableMask):
            def __init__(self, shape, bound, shard_count=1):
                self.bound = bound

                def column_mask_function(q_ids, kv_ids):
                    return kv_ids < bound

                super().__init__(
                    shape=shape,
                    mask_function=column_mask_function,
                    shard_count=shard_count,
                )

            def __eq__(self, other):
                return (
                    isinstance(other, type(self))
                    and self.shape == other.shape
                    and self.bound == other.bound
                )

            def __hash__(self):
                return hash((type(self), self.shape, self.bound))

        _COLUMN_MASK_CLS = ColumnMask
    return _COLUMN_MASK_CLS(shape, bound)
