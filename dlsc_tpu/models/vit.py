"""Shared ViT encoder for the AST family.

Block structure mirrors timm's pre-LN ``Block`` (and the reference's
from-scratch encoder, src/models/ast_small.py:18-37): packed-QKV attention,
GELU MLP ×4, residuals around both. The packed QKV layout makes the
PyTorch→Flax weight importer (dlsc_tpu.models.torch_import) a pure
transpose/reshape mapping.

TPU notes: attention and MLP matmuls run in ``dtype`` (bf16 by default for
the AST family — transformers tolerate mixed precision, reference:
configs/base_training.yaml:9-16) with f32 params and f32 softmax.
"""

from __future__ import annotations

import functools
from typing import Any

import flax.linen as nn
import jax
import jax.ad_checkpoint  # checkpoint_name is not reachable as a lazy jax attr
import jax.numpy as jnp

trunc_normal_02 = nn.initializers.truncated_normal(stddev=0.02)


def _pad_grain() -> int:
    """Sequence-padding grain for the TPU attention kernels.

    Attention cost scales with n_pad² but legal block widths must divide
    n_pad. History: grain 256 (1645 real tokens → n_pad 1792) was the
    round-2 sweet spot for the LIBRARY splash kernel, whose efficiency is
    set by its kv-block width — 1664 = 13·128 (13 prime) admits only
    128-wide kv blocks there, 2.5× slower. The shape-specialized kernels
    (ops/attn_fast.py) removed that constraint: their kv extent is always
    the full row regardless of the q-block width, so the tightest 128-grain
    pad (1664) costs nothing in kernel efficiency and shrinks every
    token-row computation in the encoder — attention FLOPs ×(1664/1792)²,
    parameter-matmul/LN/dropout/residual rows ×(1664/1792) — with zero
    slice/pad copies (unlike mlp_slice, whose copies ate its savings;
    BASELINE.md round 3). Default 128 (measured round 4); DLSC_SPLASH_PAD
    overrides for generic-kernel probes (it also disables the fast path),
    DLSC_ATTN_FAST_PAD overrides while keeping the fast path.
    """
    import os

    v = os.environ.get("DLSC_ATTN_FAST_PAD") or os.environ.get(
        "DLSC_SPLASH_PAD")
    return int(v) if v else 128


def _attn_interpret() -> bool:
    """Test-only escape (``DLSC_ATTN_INTERPRET=1``): run the Pallas splash
    attention kernels through the interpreter so the kernel *path* (incl.
    head-sharded TP via shard_map) executes on the CPU mesh in CI. Only the
    splash impl supports it."""
    import os

    return os.environ.get("DLSC_ATTN_INTERPRET") == "1"


class Attention(nn.Module):
    """Multi-head self-attention with timm-style packed qkv.

    On TPU, when attention-weight dropout is inactive, uses the Pallas flash
    attention kernel (O(N) memory — AST's ~1650-token sequences would
    otherwise materialize (B, H, N, N) softmax buffers in fwd+bwd). Sequences
    are padded to the flash block size with segment-id masking so padding
    never attends to (or is attended by) real tokens.
    """

    dim: int
    num_heads: int
    dropout: float = 0.0
    dtype: Any = jnp.float32
    use_flash: bool = True
    attn_impl: str = "splash"  # 'splash' | 'flash' | 'dense' (TPU kernels
                               # need use_flash=True + TPU backend + no attn
                               # dropout; otherwise falls back to dense)
    n_real: int | None = None  # true token count when the caller already
                               # padded the sequence to the kernel grain
                               # (encoder-wide padding); kernels mask
                               # tokens >= n_real via segment ids
    quant: str | None = None   # 'w8a8': int8 serving quantization of the
                               # qkv/proj matmuls (ops/quant.py) — inference
                               # only; __call__ rejects train=True
    head_sharding: Any = None  # tensor parallelism over heads: a
                               # NamedSharding for the (B, H, N, dh) q/k/v
                               # activations, e.g. P(None, 'model', None,
                               # None). The attention core (Pallas kernel on
                               # TPU, dense otherwise) runs under shard_map
                               # over the head axis — heads attend
                               # independently, so each model shard computes
                               # its H/tp heads with zero collectives inside
                               # attention; the surrounding qkv/proj einsums
                               # stay GSPMD-partitioned (parallel/tp.py).

    @nn.compact
    def __call__(self, x, train: bool):
        if self.quant and train:
            raise ValueError("quant mode is inference-only (train=False)")
        B, N, D = x.shape
        H = self.num_heads
        dh = D // H
        # head-split einsums instead of Dense + reshape/transpose: the
        # (B,N,H,dh)<->(B,H,N,dh) transposes around the attention kernel cost
        # ~186 ms/step in the remat'd backward on AST-Base @ B=64 (measured,
        # bench_micro attn_ctx_grad: 748 -> 562 ms). Param tree is identical
        # to nn.Dense(3D, name='qkv') / nn.Dense(D, name='proj') so the timm
        # importer, TP shardings and checkpoints are unaffected.
        q, k, v = _PackedQKV(D, H, self.dtype, self.quant, name="qkv")(x)

        flash_ok = (
            self.use_flash
            and self.attn_impl != "dense"
            and (jax.default_backend() == "tpu"
                 or (_attn_interpret() and self.attn_impl == "splash"))
            and (self.dropout == 0.0 or not train)  # flash has no attn dropout
        )
        if self.head_sharding is not None and (self.dropout == 0.0
                                               or not train):
            out = _head_sharded_mha(
                q, k, v, sm_scale=dh**-0.5, n_real=self.n_real,
                sharding=self.head_sharding,
                impl=self.attn_impl if flash_ok else "dense")
        elif flash_ok and self.attn_impl == "splash":
            out = _splash_mha(q, k, v, sm_scale=dh**-0.5,
                              n_real=self.n_real)              # (B,H,N,dh)
        elif flash_ok:
            out = _flash_mha(q, k, v, sm_scale=dh**-0.5,
                             n_real=self.n_real)               # (B,H,N,dh)
        else:
            attn = jnp.einsum("bhqd,bhkd->bhqk", q, k) * (dh**-0.5)
            if self.n_real is not None and self.n_real < N:
                # encoder-wide padded input on the dense path: mask pad keys
                keep = jnp.arange(N) < self.n_real
                attn = jnp.where(keep[None, None, None, :], attn, -1e30)
            attn = nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
            attn = nn.Dropout(self.dropout, deterministic=not train)(attn)
            out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = jax.ad_checkpoint.checkpoint_name(out, "attn_out")
        return _HeadMergeProj(D, H, self.dtype, self.quant, name="proj")(out)


def _dense_mha(q, k, v, *, sm_scale: float, n_real: int | None = None):
    """Dense softmax attention on (B, H, N, dh) without dropout — the inner
    computation for the head-sharded path off-TPU (matches the Attention
    dense fallback's math, f32 softmax)."""
    N = q.shape[2]
    attn = jnp.einsum("bhqd,bhkd->bhqk", q, k) * sm_scale
    if n_real is not None and n_real < N:
        keep = jnp.arange(N) < n_real
        attn = jnp.where(keep[None, None, None, :], attn, -1e30)
    attn = nn.softmax(attn.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", attn, v)


def _head_sharded_mha(q, k, v, *, sm_scale: float, n_real: int | None,
                      sharding: Any, impl: str):
    """Attention core under ``shard_map`` over the head axis (TP).

    Heads attend independently, so sharding (B, H, N, dh) on H is
    embarrassingly parallel — each model shard runs the full kernel on its
    H/tp heads with no collectives. This is what makes ``use_flash=True``
    TP-legal: the Pallas splash/fast kernels are not GSPMD-partitionable,
    but per-shard invocation under manual partitioning is exactly their
    contract (the kernel grid is already per-head). VERDICT r3 #3; replaces
    the dense-attention fallback that measurably cannot compile for training
    at AST sequence lengths (BASELINE.md AST-Small dense rows).
    """
    from jax import shard_map

    mesh = sharding.mesh
    spec = sharding.spec
    axis = spec[1]
    if axis is None:
        raise ValueError(
            f"head_sharding spec {spec} must shard axis 1 (heads)")
    tp = mesh.shape[axis]
    H = q.shape[1]
    if H % tp:
        raise ValueError(f"num_heads={H} not divisible by |{axis}|={tp}")
    if impl == "splash":
        inner = functools.partial(_splash_mha, sm_scale=sm_scale,
                                  n_real=n_real)
    elif impl == "flash":
        inner = functools.partial(_flash_mha, sm_scale=sm_scale,
                                  n_real=n_real)
    else:
        inner = functools.partial(_dense_mha, sm_scale=sm_scale,
                                  n_real=n_real)
    return shard_map(
        inner, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    )(q, k, v)


class _PackedQKV(nn.Module):
    """timm-compatible packed qkv projection, head-split.

    Params are exactly ``nn.Dense(3*dim, name='qkv')``'s (``kernel`` (D, 3D)
    in [q|k|v] column order, ``bias`` (3D,)), but the matmuls are expressed as
    per-head einsums producing q, k, v directly in the attention kernels'
    (B, H, N, dh) layout — no materialized transposes in forward or backward.
    """

    dim: int
    num_heads: int
    dtype: Any = jnp.float32
    quant: str | None = None

    @nn.compact
    def __call__(self, x):
        D, H = self.dim, self.num_heads
        dh = D // H
        kernel = self.param("kernel", nn.initializers.lecun_normal(), (D, 3 * D))
        bias = self.param("bias", nn.initializers.zeros_init(), (3 * D,))
        b = bias.astype(self.dtype).reshape(3, H, dh)
        if self.quant:
            from dlsc_tpu.ops.quant import int8_dot, quantize_weight, w8_dot

            dot = int8_dot if self.quant == "w8a8" else w8_dot
            wq = self.variable(
                "quant", "kernel_q",
                lambda: quantize_weight(kernel)[0].reshape(D, 3, H, dh))
            ws = self.variable(
                "quant", "kernel_scale",
                lambda: quantize_weight(kernel)[1].reshape(3, H, dh))
            qkv = dot(x, wq.value, ws.value, self.dtype)  # (B,N,3,H,dh)
            qkv = qkv.transpose(2, 0, 3, 1, 4)                 # (3,B,H,N,dh)
            bb = b[:, None, :, None, :]
            return qkv[0] + bb[0], qkv[1] + bb[1], qkv[2] + bb[2]
        w = kernel.astype(self.dtype).reshape(D, 3, H, dh)
        q = jnp.einsum("bnd,dhk->bhnk", x, w[:, 0]) + b[0][None, :, None, :]
        k = jnp.einsum("bnd,dhk->bhnk", x, w[:, 1]) + b[1][None, :, None, :]
        v = jnp.einsum("bnd,dhk->bhnk", x, w[:, 2]) + b[2][None, :, None, :]
        # named for the 'attn_res_qkv' remat policy (remat_kwargs)
        name = jax.ad_checkpoint.checkpoint_name
        return name(q, "qkv"), name(k, "qkv"), name(v, "qkv")


class _HeadMergeProj(nn.Module):
    """timm-compatible output projection consuming (B, H, N, dh) directly:
    params are ``nn.Dense(dim, name='proj')``'s (``kernel`` (D, D) with rows
    in concatenated-head order, ``bias`` (D,)); the head merge is folded into
    the dot via a (H, dh, D) reshape of the kernel."""

    dim: int
    num_heads: int
    dtype: Any = jnp.float32
    quant: str | None = None

    @nn.compact
    def __call__(self, out):
        D, H = self.dim, self.num_heads
        dh = D // H
        kernel = self.param("kernel", nn.initializers.lecun_normal(), (D, D))
        bias = self.param("bias", nn.initializers.zeros_init(), (D,))
        if self.quant:
            from dlsc_tpu.ops.quant import int8_dot, quantize_weight, w8_dot

            dot = int8_dot if self.quant == "w8a8" else w8_dot
            wq = self.variable("quant", "kernel_q",
                               lambda: quantize_weight(kernel)[0])
            ws = self.variable("quant", "kernel_scale",
                               lambda: quantize_weight(kernel)[1])
            x = out.transpose(0, 2, 1, 3).reshape(out.shape[0], out.shape[2], D)
            return dot(x, wq.value, ws.value, self.dtype) + bias.astype(
                self.dtype)
        w = kernel.astype(self.dtype).reshape(H, dh, D)
        return jnp.einsum("bhnd,hdo->bno", out, w) + bias.astype(self.dtype)


def remat_kwargs(remat_policy: str) -> dict:
    """jax.checkpoint kwargs for an encoder-block remat policy. Shared by the
    ASTViT block loop and the pipeline-parallel runner (parallel/pp.py).

    - 'full': save nothing (classic remat).
    - 'dots': save matmul outputs — recompute only elementwise ops.
    - 'attn_out': keep attention outputs (~B·N·D per block). NOTE (measured,
      TPU r2): this does NOT skip the attention-kernel recompute — the splash
      kernel is a custom_vjp whose backward consumes its own residuals
      (q,k,v,out,logsumexp), so the remat'd backward re-runs the kernel
      forward regardless of saved downstream tensors (39.8 vs 40.0 clips/s).
      It only saves the proj-input recompute.
    - 'attn_res': save the splash kernel's OWN residuals (padded out +
      logsumexp, named inside the kernel via residual_checkpoint_name): the
      backward then reuses them instead of re-running the kernel forward —
      the decisive remat policy for this model (the kernel refwd is
      ~200 ms/step at B=64; everything else recomputes cheap).
    - 'attn_res_qkv': attn_res + the q/k/v kernel inputs (3·B·N·D per block
      ≈ 6.3 GB @ AST-Base b64): the remat'd backward skips the three qkv
      einsums (the kernel bwd consumes q/k/v directly). Memory ↔ FLOPs —
      only viable when HBM has the headroom (no device-resident pool).
    - 'attn_res_fc1': attn_res + the fc1 preactivation (B·N·4D per block
      ≈ 8.4 GB @ AST-Base b64): the backward skips the fc1 matmul recompute
      (gelu bwd reads the preact; the dropped hidden recomputes elementwise).

    The wide matmul *outputs* (proj, fc2) never need saving: they feed only
    residual adds, whose backward is identity, so the remat refwd already
    DCEs those matmuls under every policy.
    """
    remat_kw: dict = {"static_argnums": (2,)}
    if remat_policy == "dots":
        remat_kw["policy"] = jax.checkpoint_policies.dots_with_no_batch_dims_saveable
    elif remat_policy == "attn_out":
        remat_kw["policy"] = jax.checkpoint_policies.save_only_these_names(
            "attn_out")
    elif remat_policy == "attn_res":
        remat_kw["policy"] = jax.checkpoint_policies.save_only_these_names(
            "attn_res")
    elif remat_policy == "attn_res_qkv":
        remat_kw["policy"] = jax.checkpoint_policies.save_only_these_names(
            "attn_res", "qkv")
    elif remat_policy == "attn_res_fc1":
        remat_kw["policy"] = jax.checkpoint_policies.save_only_these_names(
            "attn_res", "mlp_fc1")
    elif remat_policy == "attn_res_moe":
        # attn_res + the MoE ragged-dispatch residuals (models/moe.py
        # 'moe_res': pre-gelu grouped-matmul output + index tensors) — the
        # remat'd backward skips both gmm re-forwards and the sort replay
        # (~1 fwd MoE pass/block). +~274 MB/block at AST-MoE b64.
        remat_kw["policy"] = jax.checkpoint_policies.save_only_these_names(
            "attn_res", "moe_res")
    elif remat_policy != "full":
        raise ValueError(f"unknown remat_policy {remat_policy!r}")
    return remat_kw


def _fit_block(b: int, n_pad: int) -> int:
    """Largest 128-multiple ≤ b that divides n_pad (kernel grid constraint)."""
    b = min(b, n_pad)
    b -= b % 128
    while b > 128 and n_pad % b:
        b -= 128
    return max(b, 128)


def _dkv_bkv_default(dtype) -> int:
    """Default kv-block width for the fused dkv backward kernel.

    Its scoped-VMEM footprint scales with element width: bkv=1792 fits
    Mosaic's 16 MB budget in bf16 but overflows it in f32 (observed:
    18.15 MB scoped allocation in the fp32 AST-Base Trainer step), where
    the 896 block always compiles at ~1.2 ms/call extra cost."""
    return 1792 if jnp.dtype(dtype).itemsize <= 2 else 896


def _splash_mha(q, k, v, *, sm_scale: float, n_real: int | None = None):
    """Splash attention (the newer TPU Pallas MHA kernel) with pad-to-block +
    segment-id masking: padding tokens form their own segment so they never
    attend to (or are attended by) real tokens; pad rows are sliced off.

    q, k, v: (B, H, N, dh) → (B, H, N, dh). ``n_real``: true token count when
    the caller already padded N to the kernel grain (tokens >= n_real are
    masked); None means all N tokens are real.
    """
    from jax.experimental.pallas.ops.tpu.splash_attention import (
        splash_attention_kernel as splash,
    )
    from jax.experimental.pallas.ops.tpu.splash_attention import (
        splash_attention_mask as splash_mask,
    )

    import os

    B, H, N, dh = q.shape
    grain = _pad_grain()
    blk = grain if N >= grain else 128
    n_pad = -(-N // blk) * blk
    if n_pad != N:
        pad = [(0, 0), (0, 0), (0, n_pad - N), (0, 0)]
        q, k, v = (jnp.pad(t, pad) for t in (q, k, v))
    q = q * sm_scale  # splash applies no softmax scale internally
    if n_real is None:
        n_real = N
    splash_knobs_set = any(
        os.environ.get(k)
        for k in ("DLSC_SPLASH_BLOCKS", "DLSC_SPLASH_BWD_BLOCKS",
                  "DLSC_SPLASH_UNFUSED", "DLSC_SPLASH_LAYOUT",
                  "DLSC_SPLASH_PAD")
    )
    if os.environ.get("DLSC_ATTN_FAST", "1") == "1" and not splash_knobs_set:
        # Shape-specialized forward (single flat softmax per q block, static
        # boundary masking) + the library's fused dkv backward: 34.6 vs
        # 36.9 ms fwd+bwd per call at AST-Base shapes (see ops/attn_fast.py).
        # Falls back to the generic splash path when the f32 logits tile
        # would not fit VMEM alongside k/v — or when any DLSC_SPLASH_* tuning
        # knob is set, so probe sweeps measure the generic kernel they
        # configure rather than silently hitting this fixed config.
        bq_f = _fit_block(896, n_pad)
        if bq_f < 896 and n_pad * n_pad * 4 <= 12 * 1024 * 1024:
            # poorly-divisible n_pad (e.g. 1664 = 13*128): a narrow q block
            # serializes qk->softmax->pv per grid step (compute does not
            # overlap across TPU grid steps — measured 971 vs 959 ms/step at
            # bq=128). Use the whole row as one block; the sub-chunk split
            # keeps the MXU/VPU overlap and the f32 logits tiles fit VMEM.
            bq_f = n_pad
        if env_bq := os.environ.get("DLSC_ATTN_FAST_BQ"):
            bq_f = _fit_block(int(env_bq), n_pad)
        if bq_f * n_pad * 4 <= 12 * 1024 * 1024:
            from dlsc_tpu.ops.attn_fast import make_fast_mha

            # dkv backward kv block: dtype-dependent. The fused dkv kernel's
            # scoped-VMEM demand scales with element width — bkv=1792 fits
            # the 16 MB budget in bf16 (bench/probe/e2e all compile) but
            # overflows it in f32 (observed 18.15 MB scoped allocation in
            # the fp32 Trainer step), where 896 always fits (~1.2 ms/call
            # slower in bf16 terms).
            kernel = make_fast_mha(
                H, n_pad, dh, min(n_real, n_pad), bq_f,
                _fit_block(_dkv_bkv_default(q.dtype), n_pad),
                _fit_block(896, n_pad), str(q.dtype),
                # sub-rows of the q block, default 128 wide (measured: at
                # bq=896 split 7 ran 11.55 vs 12.15 ms/call, bit-identical
                # output); the kernel clamps to the largest valid divisor.
                n_split=int(os.environ.get("DLSC_ATTN_FAST_SPLIT", "0"))
                or max(1, bq_f // 128),
                # backward: the matching shape-specialized kernel (measured
                # A/B vs the library fused dkv kernel via DLSC_ATTN_BWD)
                bwd_impl=os.environ.get("DLSC_ATTN_BWD", "fast"),
                # whole-row backward block: the bwd kernel is per-chunk
                # straight-line (no staged tile materialization), so bq=N
                # always fits and measured fastest (33.9 ms bq1792/ns14 vs
                # 34.4 bq896/ns7, bench_micro bwd_ab)
                bq_bwd=(bq_bwd := _fit_block(
                    int(os.environ.get("DLSC_ATTN_BWD_BQ", str(n_pad))),
                    n_pad)),
                n_split_bwd=int(os.environ.get("DLSC_ATTN_BWD_SPLIT", "0"))
                or max(1, bq_bwd // 128),
                # base-2 softmax probe (fold log2e into the score matmul;
                # needs the fast bwd for the base-2 lse convention)
                use_exp2=(os.environ.get("DLSC_ATTN_EXP2") == "1"
                          and os.environ.get("DLSC_ATTN_BWD", "fast")
                          == "fast"),
                interpret=_attn_interpret(),
            )
            return jax.vmap(kernel)(q, k, v)[:, :, :N]
    if n_real < n_pad:
        # Computed column mask (kv < n_real): evaluated from iota registers
        # inside the kernel, no segment-id operands or mask loads. Step-level
        # perf is identical to segment ids (998 ms) — mask APPLICATION is the
        # cost (~3.7 ms/call fwd vs a mask-free FullMask run) and with
        # block_kv=1792 every tile straddles the boundary, whatever the mask
        # source. Only a custom kernel masking just the boundary sub-tiles
        # could recover it. Pad q-rows attend the real tokens and produce
        # finite garbage that downstream code ignores.
        head_mask = _ColumnMask((n_pad, n_pad), n_real)
    else:
        head_mask = splash_mask.FullMask((n_pad, n_pad))
    segment_ids = None
    mask = splash_mask.MultiHeadMask([head_mask for _ in range(H)])

    # block sizes are probe-tunable (scripts/bench_probe.py): "bq,bkv,bkvc".
    # 896,1792,896 is the best of 15 swept configs at AST's n_pad=1792
    # (_fit clamps to legal divisors at other sequence lengths).
    env = os.environ.get("DLSC_SPLASH_BLOCKS")
    bq, bkv, bkvc = (int(x) for x in env.split(",")) if env else (896, 1792, 896)

    def _fit(b: int) -> int:
        return _fit_block(b, n_pad)

    def _triple(bq: int, bkv: int, bkvc: int) -> tuple[int, int, int]:
        bq, bkv, bkvc = _fit(bq), _fit(bkv), _fit(bkvc)
        bkvc = min(bkvc, bkv)
        while bkv % bkvc:  # kernel: bkv must be a multiple of bkv_compute
            bkvc -= 128
        return bq, bkv, bkvc

    bq, bkv, bkvc = _triple(bq, bkv, bkvc)
    # backward kv block defaults by dtype (see _dkv_bkv_default): 1792 in
    # bf16, 896 in f32 where the wider block overflows scoped VMEM
    benv = os.environ.get("DLSC_SPLASH_BWD_BLOCKS")
    bq_b, bkv_b, bkvc_b = (
        _triple(*(int(x) for x in benv.split(",")))
        if benv
        else _triple(bq, _dkv_bkv_default(q.dtype), min(bkvc, 896))
    )
    fused = os.environ.get("DLSC_SPLASH_UNFUSED") != "1"
    layout = (
        splash.QKVLayout.SEQ_MINOR
        if os.environ.get("DLSC_SPLASH_LAYOUT") == "seq_minor"
        else splash.QKVLayout.HEAD_DIM_MINOR
    )
    bs = splash.BlockSizes(
        block_q=bq, block_kv=bkv, block_kv_compute=bkvc,
        block_q_dkv=bq_b, block_kv_dkv=bkv_b, block_kv_dkv_compute=bkvc_b,
        block_q_dq=None if fused else bq_b,
        block_kv_dq=None if fused else bkv_b,
        use_fused_bwd_kernel=fused,
        q_layout=layout, k_layout=layout, v_layout=layout,
    )
    # Name the kernel's own residuals (padded out + logsumexp) so the
    # 'attn_res' remat policy can save them: the kernel is a custom_vjp whose
    # backward consumes (q, k, v, out, lse) — with out+lse saved, the remat'd
    # backward DCEs the kernel-forward recompute entirely (q/k/v re-derive
    # from the cheap qkv matmul). ~208 MB/block at B=64.
    kernel = splash.make_splash_mha(
        mask=mask, block_sizes=bs, head_shards=1, q_seq_shards=1,
        residual_checkpoint_name="attn_res", interpret=_attn_interpret(),
    )
    out = jax.vmap(kernel, in_axes=(0, 0, 0, None))(q, k, v, segment_ids)
    return out[:, :, :N]


def _ColumnMask(shape: tuple[int, int], bound: int):
    """Splash mask allowing attention only to kv positions < bound
    (computed from iota in-kernel; shared implementation lives in
    ops/attn_fast.py)."""
    from jax.experimental.pallas.ops.tpu.splash_attention import (
        splash_attention_mask as sm,
    )

    from dlsc_tpu.ops.attn_fast import _column_mask

    return _column_mask(sm, shape, bound)

def _flash_mha(q, k, v, *, sm_scale: float, n_real: int | None = None):
    """Pallas TPU flash attention with pad-to-block + segment-id masking.

    Explicit BlockSizes matter: the library defaults pick small blocks that
    run ~5x slower at AST's ~1650-token sequences (measured 109 ms → 20 ms
    at (64, 12, 2048, 64) on v5e with 1024-wide blocks)."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, SegmentIds, flash_attention,
    )

    B, H, N, dh = q.shape
    blk = 512 if N >= 512 else 128
    n_pad = -(-N // blk) * blk
    if n_pad != N:
        pad = [(0, 0), (0, 0), (0, n_pad - N), (0, 0)]
        q, k, v = (jnp.pad(t, pad) for t in (q, k, v))
    if n_real is None:
        n_real = N
    seg = (jnp.arange(n_pad) >= n_real).astype(jnp.int32)[None, :]  # 0 real, 1 pad
    seg = jnp.broadcast_to(seg, (B, n_pad))
    # block size must divide n_pad (kernel asserts seq_len % block == 0):
    # n_pad is a multiple of 512 (or 128 for short seqs), so prefer 1024
    # only when it divides evenly.
    b = next(cand for cand in (1024, 512, 256, 128) if n_pad % cand == 0)
    bs = BlockSizes(
        block_q=b, block_k_major=b, block_k=b, block_b=1,
        block_q_major_dkv=b, block_k_major_dkv=b, block_k_dkv=b, block_q_dkv=b,
        block_k_major_dq=b, block_k_dq=b, block_q_dq=b,
    )
    out = flash_attention(
        q, k, v, segment_ids=SegmentIds(q=seg, kv=seg), sm_scale=sm_scale,
        block_sizes=bs,
    )
    return out[:, :, :N]


class _QDense(nn.Module):
    """nn.Dense-compatible layer (identical param names/inits) with an int8
    w8a8 serving path (ops/quant.py). Used by Mlp only in quant mode so the
    trained/non-quant path stays literally nn.Dense."""

    features: int
    dtype: Any = jnp.float32
    quant: str | None = None

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (x.shape[-1], self.features))
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,))
        if self.quant:
            from dlsc_tpu.ops.quant import int8_dot, quantize_weight, w8_dot

            dot = int8_dot if self.quant == "w8a8" else w8_dot
            wq = self.variable("quant", "kernel_q",
                               lambda: quantize_weight(kernel)[0])
            ws = self.variable("quant", "kernel_scale",
                               lambda: quantize_weight(kernel)[1])
            return dot(x, wq.value, ws.value, self.dtype) + bias.astype(
                self.dtype)
        return x.astype(self.dtype) @ kernel.astype(self.dtype) + bias.astype(
            self.dtype)


class HyperDropout(nn.Module):
    """``nn.Dropout`` whose rate can be overridden at apply time through the
    ``'hyper'`` variable collection.

    With ``hyper=False`` (the default everywhere) this is exactly
    ``nn.Dropout(rate)`` — same mask RNG, same inverted scaling, and a
    zero-rate short-circuit so the compiled program is unchanged. With
    ``hyper=True`` the module creates a ``'hyper'/'rate'`` f32 scalar at init
    and *reads* it at apply, so K vmapped HPO trials can each train with a
    different dropout rate inside one compiled program (hpo/vmapped.py —
    the rate becomes a traced value: the Bernoulli threshold and the 1/keep
    rescale are data-dependent, which vmap handles and a static module
    attribute cannot).
    """

    rate: float
    hyper: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool):
        if self.hyper:
            rate = self.variable(
                "hyper", "rate",
                lambda: jnp.asarray(self.rate, jnp.float32)).value
        else:
            rate = self.rate
            if rate == 0.0:
                return x
        if deterministic:
            return x
        keep = 1.0 - rate
        mask = jax.random.bernoulli(self.make_rng("dropout"), keep, x.shape)
        return jnp.where(mask, x / jnp.asarray(keep, x.dtype),
                         jnp.zeros((), x.dtype))


class Mlp(nn.Module):
    dim: int
    ratio: float = 4.0
    dropout: float = 0.0
    dtype: Any = jnp.float32
    quant: str | None = None
    hyper_dropout: bool = False  # dropout rate read from the 'hyper'
                                 # collection (vmapped HPO, see HyperDropout)

    @nn.compact
    def __call__(self, x, train: bool):
        if self.quant:
            x = _QDense(int(self.dim * self.ratio), self.dtype, self.quant,
                        name="fc1")(x)
        else:
            x = nn.Dense(int(self.dim * self.ratio), dtype=self.dtype,
                         name="fc1")(x)
        # named for the 'attn_res_fc1' remat policy (remat_kwargs)
        x = jax.ad_checkpoint.checkpoint_name(x, "mlp_fc1")
        # exact (erf) GELU to match torch.nn.GELU default
        x = nn.gelu(x, approximate=False)
        x = HyperDropout(self.dropout, self.hyper_dropout)(x, not train)
        if self.quant:
            x = _QDense(self.dim, self.dtype, self.quant, name="fc2")(x)
        else:
            x = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(x)
        x = HyperDropout(self.dropout, self.hyper_dropout)(x, not train)
        return x


def _ln_fused_enabled() -> bool:
    """``DLSC_LN_FUSED=1``: replace the attn-residual + norm2 pair with the
    fused Pallas add+LN kernel (ops/ln_fused.py). Off by default — and stay
    off: the step-level A/B REFUTED the fusion (BASELINE.md round 4
    "LN/residual epilogue": XLA's chain is at ~85% of the HBM roofline and
    beats the Pallas forward by 4 ms), and the kernel's BACKWARD never
    compiled on the real TPU (2× remote-helper 500s) — flipping this flag on
    a training step is expected to fail at compile time. Inference-only
    experiments are the supported use (ADVICE r4)."""
    import os

    return os.environ.get("DLSC_LN_FUSED") == "1"


class _FusedResidLN(nn.Module):
    """``r = x + delta; y = LN(r)`` via the fused kernel, with a param tree
    identical to ``nn.LayerNorm`` (scale/bias, f32, ones/zeros init) so
    checkpoints, the timm importer and TP shardings are unaffected."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, delta):
        from dlsc_tpu.ops.ln_fused import fused_add_ln

        d = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones_init(), (d,))
        bias = self.param("bias", nn.initializers.zeros_init(), (d,))
        return fused_add_ln(x, delta, scale.astype(jnp.float32),
                            bias.astype(jnp.float32),
                            interpret=_attn_interpret())


class Block(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    dropout: float = 0.0        # MLP dropout
    attn_dropout: float = 0.0   # attention-weight dropout (0 keeps flash path)
    dtype: Any = jnp.float32
    use_flash: bool = True
    attn_impl: str = "splash"
    n_real: int | None = None   # see Attention.n_real
    token_sharding: Any = None  # sequence parallelism: a NamedSharding for
                                # the (B, N, D) residual stream (tokens over
                                # the 'model' axis). With Megatron-style TP
                                # param shardings (parallel/tp.py), GSPMD
                                # turns the two per-block all-reduces into
                                # reduce-scatter + all-gather pairs and the
                                # LN/dropout/residual work runs token-sharded.
    quant: str | None = None    # int8 serving quantization (see Attention)
    moe: Any = None             # MoeSpec (models/moe.py): replace the dense
                                # MLP with a top-k routed mixture of experts
    expert_sharding: Any = None # EP: NamedSharding for the MoE (B,E,C,D)
                                # dispatch buffers (expert axis on the mesh)
    head_sharding: Any = None   # TP: NamedSharding for the (B,H,N,dh)
                                # attention activations (see Attention)
    hyper_dropout: bool = False # MLP dropout rate read from the 'hyper'
                                # collection (vmapped HPO, see HyperDropout)
    mlp_slice: bool = False     # run LN2+MLP on only the first
                                # round128(n_real) token rows and zero-pad the
                                # MLP output back (pad rows contribute nothing
                                # to the residual). The attention path must
                                # stay at the kernel-grain N (q/k/v feed the
                                # shape-specialized kernel), but the MLP has
                                # no cross-token coupling, so its FLOPs and
                                # the gelu/dropout elementwise traffic shrink
                                # by the pad fraction (1792 → 1664 rows ≈ 7%
                                # at AST-Base). The slice fuses into LN2 and
                                # the pad into the residual add, so there is
                                # no extra materialization (vs per-block q/k/v
                                # pads, which cost more than they save —
                                # BASELINE.md ledger item 4).

    def _sp(self, x):
        if self.token_sharding is None:
            return x
        return jax.lax.with_sharding_constraint(x, self.token_sharding)

    @nn.compact
    def __call__(self, x, train: bool):
        x = self._sp(x)
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        attn_out = Attention(self.dim, self.num_heads, self.attn_dropout,
                             self.dtype, self.use_flash, self.attn_impl,
                             self.n_real, self.quant, self.head_sharding,
                             name="attn")(y, train)
        rows = x.shape[1]
        if (self.mlp_slice and self.n_real is not None
                and self.moe is None and self.token_sharding is None):
            rows = min(x.shape[1], -(-self.n_real // 128) * 128)
        if (_ln_fused_enabled() and rows == x.shape[1]
                and self.token_sharding is None
                and (jax.default_backend() == "tpu" or _attn_interpret())):
            # fused residual-add + LN2 Pallas kernel (ops/ln_fused.py,
            # VERDICT r3 #1b): param tree identical to nn.LayerNorm
            x, y = _FusedResidLN(self.dtype, name="norm2")(x, attn_out)
        else:
            x = self._sp(x + attn_out)
            y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(
                x[:, :rows] if rows < x.shape[1] else x)
        if self.moe is not None:
            from dlsc_tpu.models.moe import MoeMlp

            mlp_out = MoeMlp(self.dim, self.moe, self.mlp_ratio, self.dropout,
                             self.dtype, self.expert_sharding,
                             n_real=self.n_real, name="moe")(y, train)
        else:
            mlp_out = Mlp(self.dim, self.mlp_ratio, self.dropout,
                          self.dtype, self.quant, self.hyper_dropout,
                          name="mlp")(y, train)
        if rows < x.shape[1]:
            mlp_out = jnp.pad(
                mlp_out, ((0, 0), (0, x.shape[1] - rows), (0, 0)))
        x = self._sp(x + mlp_out)
        return x


class _ScanBlock(nn.Module):
    """Block wrapped for nn.scan: carry = token matrix."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    dropout: float = 0.0
    attn_dropout: float = 0.0
    dtype: Any = jnp.float32
    use_flash: bool = True
    attn_impl: str = "splash"
    n_real: int | None = None
    token_sharding: Any = None
    quant: str | None = None
    moe: Any = None
    expert_sharding: Any = None
    head_sharding: Any = None
    hyper_dropout: bool = False
    mlp_slice: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        x = Block(self.dim, self.num_heads, self.mlp_ratio, self.dropout,
                  self.attn_dropout, self.dtype, self.use_flash,
                  self.attn_impl, self.n_real, self.token_sharding, self.quant,
                  self.moe, self.expert_sharding, self.head_sharding,
                  self.hyper_dropout, self.mlp_slice, name="block")(x, train)
        return x, None


class ASTViT(nn.Module):
    """Audio-spectrogram ViT trunk with the reference's conventions:

    - patch-embed Conv over (n_mels, T) log-mel with configurable stride,
    - positional-embedding table sized for a *10-second* clip
      (``t_dim = sr*10/160 + 1``, reference: src/models/ast.py:16) and
      sliced to the actual token count (``pos_embed[:, :N+1]``, :59),
    - classification from the CLS token through ``sigmoid`` (:63) — the
      reference feeds these probabilities to a CE/KL loss as if they were
      logits; preserved for parity.
    """

    num_classes: int = 50
    emb_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    patch_size: int = 16
    patch_stride: int = 10
    overlap: int = 6
    sample_rate: int = 44_100
    f_dim: int = 128
    dropout: float = 0.1       # MLP dropout
    attn_dropout: float = 0.0  # attention-weight dropout. Deviation from the
                               # reference (ast_small.py:22 passes dropout to
                               # nn.MultiheadAttention): kept at 0 so training
                               # takes the flash-attention path at ~1650-token
                               # sequences; MLP dropout provides the
                               # regularization (common ViT practice).
    dtype: Any = jnp.float32
    sigmoid_head: bool = True
    remat: bool = False        # rematerialize encoder blocks (memory ↔ FLOPs)
    remat_policy: str = "full" # 'full' (save nothing) | 'dots' (save matmul
                               # outputs — recompute only elementwise ops)
    use_flash: bool = True
    attn_impl: str = "splash"  # 'splash' | 'flash' | 'dense'
    scan_blocks: bool = True   # lax.scan over blocks: ~depth× smaller HLO
                               # (compile time), stacked block params
    token_sharding: Any = None # sequence parallelism (see Block): NamedSharding
                               # for the residual stream, e.g.
                               # NamedSharding(mesh, P('data', 'model', None))
    encoder_pad: bool = True   # pad tokens to the kernel grain once for the
                               # whole encoder (TPU flash paths only) instead
                               # of per-block — see __call__
    quant: str | None = None   # int8 serving quantization of the encoder
                               # qkv/proj/fc1/fc2 matmuls (where the FLOPs
                               # are; patch-embed conv, LN and the head stay
                               # in dtype/f32): 'w8a8' (int8 weights AND
                               # dynamic per-token int8 activations — best
                               # latency at batch 1) or 'w8' (weight-only
                               # int8, bf16 activations — no act-quant
                               # epilogues; see ops/quant.py). Inference-only —
                               # materialize the int8 'quant' collection
                               # from trained params via
                               # dlsc_tpu.ops.quant-style mutable apply.
    moe: Any = None            # MoeSpec or dict (models/moe.py): every block's
                               # MLP becomes a top-k routed mixture of experts
                               # (uniform across blocks — required by the scan
                               # layout). Aux losses are sown as 'moe_aux' and
                               # collected by the train step.
    expert_sharding: Any = None  # EP: NamedSharding for the MoE dispatch
                                 # buffers, e.g. P('data', 'model', None, None)
    head_sharding: Any = None    # TP over attention heads: NamedSharding for
                                 # the (B,H,N,dh) q/k/v activations, e.g.
                                 # P(None, 'model', None, None) — the
                                 # attention core runs under shard_map so the
                                 # Pallas kernels stay usable with TP
                                 # (use_flash=True; see Attention /
                                 # parallel/tp.py)
    hyper_dropout: bool = False  # MLP dropout rate read from the 'hyper'
                                 # variable collection instead of the static
                                 # attribute — lets the vmapped HPO runner
                                 # search dropout per trial (HyperDropout,
                                 # hpo/vmapped.py)
    mlp_slice: bool = False      # LN2+MLP on round128(n_real) rows only
                                 # (see Block.mlp_slice); numerically
                                 # identical on the real tokens — pad rows
                                 # never reach the head (CLS) or attention
                                 # (masked keys)

    @property
    def t_dim(self) -> int:
        return int(self.sample_rate * 10 / 160) + 1

    @property
    def grid_size(self) -> tuple[int, int]:
        step = self.patch_size - self.overlap
        return (
            (self.f_dim - self.patch_size) // step + 1,
            (self.t_dim - self.patch_size) // step + 1,
        )

    def embed(self, x):
        """Patch-embed + cls/pos-embed + (TPU) encoder-wide padding — the
        stretch of ``__call__`` before the block stack. Reachable from apply
        via ``model.apply(vars, x, part='embed')`` (``__call__`` stays the
        single compact method; unused params are simply not touched) so the
        pipeline-parallel runner (dlsc_tpu.parallel.pp) can reuse it without
        duplicating the token math. Returns ``(tokens, n_real)`` where
        ``n_real`` is the true token count when padding was applied (else
        None)."""
        # The pos-embed grid is derived from (patch_size - overlap) while the
        # conv uses patch_stride; the reference keeps them equal in every
        # config (ast.yaml stride 10 / overlap 6; ast_small.yaml 16 / 0) and
        # silently misassigns positions otherwise — fail loudly instead.
        if self.patch_stride != self.patch_size - self.overlap:
            raise ValueError(
                f"patch_stride ({self.patch_stride}) must equal patch_size - "
                f"overlap ({self.patch_size - self.overlap}); the positional-"
                "embedding grid assumes it"
            )
        # (B, F, T) or (B, 1, F, T) → NHWC (B, F, T, 1)
        if x.ndim == 4:
            x = x[:, 0]
        B = x.shape[0]
        x = x[..., None].astype(self.dtype)

        x = nn.Conv(
            self.emb_dim, (self.patch_size, self.patch_size),
            (self.patch_stride, self.patch_stride), padding="VALID",
            dtype=self.dtype, name="patch_embed",
        )(x)
        # NHWC (B, F', T', D) → tokens in the reference's flatten order
        # (torch flatten(2) walks H then W on NCHW → row-major over (F', T'))
        x = x.reshape(B, -1, self.emb_dim)
        N = x.shape[1]

        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, self.emb_dim))
        num_patches = self.grid_size[0] * self.grid_size[1]
        pos = self.param(
            "pos_embed", trunc_normal_02, (1, 1 + num_patches, self.emb_dim)
        )
        x = jnp.concatenate([jnp.broadcast_to(cls, (B, 1, self.emb_dim)).astype(self.dtype), x], axis=1)
        x = x + pos[:, : N + 1].astype(self.dtype)

        # Encoder-wide padding (TPU): pad the token matrix to the attention
        # kernel grain ONCE instead of per-block — the per-block q/k/v pad +
        # out slice copies cost ~124 ms/step on AST-Base @ B=64 (measured,
        # bench_micro attn_ctx_grad: 860 → 748 ms). Pad rows are isolated in
        # the kernels via segment ids (n_real) and masked on the dense
        # fallback; LN/MLP on pad rows is harmless (and MoE blocks exclude
        # them from routing/capacity/aux via the same n_real) and the head
        # reads only the CLS token (index 0). Costs ~9% extra matmul rows at
        # AST shapes.
        n_real = None
        n_tok = N + 1
        pad_ok = (
            self.encoder_pad
            and self.use_flash
            and self.attn_impl != "dense"
            and jax.default_backend() == "tpu"
            and self.attn_dropout == 0.0
        )
        if pad_ok:
            grain = _pad_grain()
            n_pad = -(-n_tok // grain) * grain if n_tok >= grain else n_tok
            if n_pad != n_tok:
                x = jnp.pad(x, ((0, 0), (0, n_pad - n_tok), (0, 0)))
                n_real = n_tok
        return x, n_real

    def finalize(self, x):
        """Final LayerNorm + CLS head (+ the reference's sigmoid quirk,
        src/models/ast.py:63) — the stretch of ``__call__`` after the block
        stack, exposed for the pipeline-parallel runner."""
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        logits = nn.Dense(self.num_classes, dtype=jnp.float32, name="head")(
            x[:, 0].astype(jnp.float32)
        )
        return nn.sigmoid(logits) if self.sigmoid_head else logits

    @nn.compact
    def __call__(self, x, train: bool = False, part: str = "all"):
        # ``part`` exposes the embed / finalize stretches to external callers
        # (the pipeline-parallel runner) without a second compact method:
        # 'embed' → (tokens, n_real); 'finalize' → logits from a token
        # matrix; 'all' → the full forward. init() must use part='all'.
        if self.quant not in (None, "w8a8", "w8"):
            # an unknown mode would otherwise silently take the float path
            raise ValueError(
                f"unknown quant mode {self.quant!r} (supported: 'w8a8', "
                "'w8' — weight-only int8, ops/quant.py)")
        if self.quant and self.moe is not None:
            raise ValueError("int8 quant mode does not support MoE blocks")
        if part == "embed":
            return self.embed(x)
        if part == "finalize":
            return self.finalize(x)
        if part != "all":
            raise ValueError(f"unknown part {part!r}")
        x, n_real = self.embed(x)

        from dlsc_tpu.models.moe import as_moe_spec

        moe = as_moe_spec(self.moe)
        remat_kw = remat_kwargs(self.remat_policy)
        if self.scan_blocks:
            body = _ScanBlock
            if self.remat:
                body = nn.remat(body, **remat_kw)
            scanned = nn.scan(
                body,
                variable_axes={"params": 0, "quant": 0, "intermediates": 0,
                               "hyper": 0},
                split_rngs={"params": True, "dropout": True},
                length=self.depth,
                in_axes=nn.broadcast,  # `train` is loop-invariant
                metadata_params={nn.PARTITION_NAME: None},
            )(self.emb_dim, self.num_heads, dropout=self.dropout,
              attn_dropout=self.attn_dropout, dtype=self.dtype,
              use_flash=self.use_flash, attn_impl=self.attn_impl,
              n_real=n_real, token_sharding=self.token_sharding,
              quant=self.quant, moe=moe,
              expert_sharding=self.expert_sharding,
              head_sharding=self.head_sharding,
              hyper_dropout=self.hyper_dropout, mlp_slice=self.mlp_slice,
              name="blocks")
            x, _ = scanned(x, train)
        else:
            block_cls = nn.remat(Block, **remat_kw) if self.remat else Block
            for i in range(self.depth):
                x = block_cls(
                    self.emb_dim, self.num_heads, dropout=self.dropout,
                    attn_dropout=self.attn_dropout, dtype=self.dtype,
                    use_flash=self.use_flash, attn_impl=self.attn_impl,
                    n_real=n_real, token_sharding=self.token_sharding,
                    quant=self.quant, moe=moe,
                    expert_sharding=self.expert_sharding,
                    head_sharding=self.head_sharding,
                    hyper_dropout=self.hyper_dropout,
                    mlp_slice=self.mlp_slice, name=f"blocks_{i}",
                )(x, train)
        return self.finalize(x)
