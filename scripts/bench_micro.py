#!/usr/bin/env python
"""Micro-benchmarks locating where the AST-Base forward time goes on TPU.

The north-star step's forward alone runs at ~32% MFU (447 ms @ batch 64,
scripts/bench_probe.py fwd_only) even though its ideal bf16 time is ~140 ms.
This times each component in isolation:

    pipeline   fused mel + SpecAugment + Mixup (batch 64, 5-s clips)
    matmuls    the 12 blocks' parameter matmuls (qkv/proj/fc1/fc2) as one
               chain on (B*N, D) bf16 tokens
    splash     the splash-attention kernel at the padded AST shape
    dense      unpadded dense attention (einsum softmax einsum) at N=1645
    vit_fwd    the full ASTModel forward (train=True, no loss)

Run ONE instance at a time (serial remote compile queue).
"""

from __future__ import annotations

import sys
import time
from functools import partial
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

B, N, D, H = 64, 1645, 768, 12
DH = D // H


def _time(fn, *args, n=10, label=""):
    """fn is wrapped to reduce its outputs to ONE scalar on device — fetching
    a full-size output would ride the ~31 MB/s axon relay link and dominate
    the measurement (161 MB ≈ 5 s ≈ +520 ms/iter at n=10)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def scalar_fn(*a):
        out = fn(*a)
        return sum(jnp.sum(x.astype(jnp.float32))
                   for x in jax.tree_util.tree_leaves(out))

    out = scalar_fn(*args)
    jax.device_get(out)  # compile + sync
    t0 = time.time()
    for _ in range(n):
        out = scalar_fn(*args)
    jax.device_get(out)
    dt = (time.time() - t0) / n
    print(f"[micro] {label}: {dt * 1e3:.1f} ms", flush=True)
    return dt


def main(which: list[str]) -> None:
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    run_all = not which

    if run_all or "pipeline" in which:
        from dlsc_tpu.data.pipeline import DevicePipeline, PipelineConfig

        pipe = DevicePipeline(PipelineConfig(
            mode="ast", num_classes=50, enable_mixup=True, mixup_alpha=0.5,
            time_mask=192, freq_mask=48,
        ))
        wave = jnp.asarray(rng.standard_normal((B, 220_500)).astype(np.float32) * 0.3)
        labels = jnp.asarray(rng.integers(0, 50, B).astype(np.int32))
        f = jax.jit(lambda w, l: pipe.train_batch(w, l, jax.random.key(0)))
        _time(f, wave, labels, label=f"pipeline b{B}")

    if run_all or "matmuls" in which:
        x = jnp.asarray(rng.standard_normal((B * N, D)), jnp.bfloat16)
        ws = {
            "qkv": jnp.asarray(rng.standard_normal((D, 3 * D)) * 0.02, jnp.bfloat16),
            "proj": jnp.asarray(rng.standard_normal((D, D)) * 0.02, jnp.bfloat16),
            "fc1": jnp.asarray(rng.standard_normal((D, 4 * D)) * 0.02, jnp.bfloat16),
            "fc2": jnp.asarray(rng.standard_normal((4 * D, D)) * 0.02, jnp.bfloat16),
        }

        @jax.jit
        def chain(x, ws):
            for _ in range(12):
                q = x @ ws["qkv"]
                x = q[:, :D] @ ws["proj"]
                h = jax.nn.gelu(x @ ws["fc1"], approximate=False)
                x = h @ ws["fc2"]
            return x

        dt = _time(chain, x, ws, label="matmul chain 12 blocks")
        gf = 2 * B * N * (12 * D * D) * 12 / 1e9
        print(f"[micro]   matmul chain: {gf / dt / 1e3:.1f} TF/s", flush=True)

    if run_all or "splash" in which:
        from dlsc_tpu.models.vit import _splash_mha

        q, k, v = (jnp.asarray(rng.standard_normal((B, H, N, DH)) * 0.1, jnp.bfloat16)
                   for _ in range(3))
        f = jax.jit(partial(_splash_mha, sm_scale=DH**-0.5))
        dt = _time(f, q, k, v, label=f"splash attn ({B},{H},{N}->2048,{DH})")
        n_pad = 2048
        gf = 2 * 2 * B * H * n_pad * n_pad * DH / 1e9
        print(f"[micro]   splash: {gf / dt / 1e3:.1f} TF/s of padded-shape flops",
              flush=True)

    if "fast_grad" in which:
        # the DEFAULT production attention path (no env knobs): fast forward
        # kernel + dtype-selected fused dkv backward, on encoder-pre-padded
        # inputs exactly as the unrolled AST-Base step runs it
        from dlsc_tpu.models.vit import _splash_mha

        n_pad, n_real = 1792, 1645
        q, k, v = (jnp.asarray(rng.standard_normal((B, H, n_pad, DH)) * 0.1,
                               jnp.bfloat16) for _ in range(3))

        def g(q, k, v):
            def f(q, k, v):
                o = _splash_mha(q, k, v, sm_scale=DH**-0.5, n_real=n_real)
                return jnp.sum((o.astype(jnp.float32)) ** 2)
            return jax.grad(f, argnums=(0, 1, 2))(q, k, v)

        dt = _time(jax.jit(g), q, k, v,
                   label=f"fast-path attn fwd+bwd ({B},{H},{n_pad},{DH})")
        gf = 2 * 2 * B * H * n_pad * n_pad * DH * (1 + 2.5) / 1e9
        print(f"[micro]   fast fwd+bwd: {gf / dt / 1e3:.1f} TF/s of "
              "padded-shape flops (fwd + 2.5x bwd)", flush=True)

    if "bwd_ab" in which:
        # A/B the attention backward: library fused dkv kernel vs the
        # shape-specialized backward (ops/attn_fast.py), with bq/split
        # sweeps. Production shapes, encoder-pre-padded inputs.
        import os

        from dlsc_tpu.models.vit import _splash_mha

        n_pad, n_real = 1792, 1645
        q, k, v = (jnp.asarray(rng.standard_normal((B, H, n_pad, DH)) * 0.1,
                               jnp.bfloat16) for _ in range(3))

        def g(q, k, v):
            def f(q, k, v):
                o = _splash_mha(q, k, v, sm_scale=DH**-0.5, n_real=n_real)
                return jnp.sum((o.astype(jnp.float32)) ** 2)
            return jax.grad(f, argnums=(0, 1, 2))(q, k, v)

        gf = 2 * 2 * B * H * n_pad * n_pad * DH * (1 + 2.5) / 1e9
        configs = [("library", "", "")]
        for bq in ("896", "1792"):
            for ns in ("1", "7", "14"):
                configs.append(("fast", bq, ns))
        ref = None
        for impl, bq, ns in configs:
            os.environ["DLSC_ATTN_BWD"] = impl
            for k_, v_ in (("DLSC_ATTN_BWD_BQ", bq),
                           ("DLSC_ATTN_BWD_SPLIT", ns)):
                if v_:
                    os.environ[k_] = v_
                else:
                    os.environ.pop(k_, None)
            label = f"bwd {impl}" + (f" bq{bq} ns{ns}" if bq else "")
            try:
                dt = _time(jax.jit(g), q, k, v, label=label)
                print(f"[micro]   -> {gf / dt / 1e3:.1f} TF/s padded "
                      "(fwd + 2.5x bwd)", flush=True)
                if impl == "library":
                    ref = jax.jit(g)(q, k, v)  # keep on device
                elif ref is not None:
                    got = jax.jit(g)(q, k, v)
                    errs = jax.device_get(jax.jit(
                        lambda a, b: [jnp.max(jnp.abs(
                            x.astype(jnp.float32) - y.astype(jnp.float32)))
                            for x, y in zip(a, b)])(got, ref))
                    print(f"[micro]   max|Δ| vs library dq/dk/dv: "
                          f"{float(errs[0]):.2e} {float(errs[1]):.2e} "
                          f"{float(errs[2]):.2e}", flush=True)
            except Exception as e:
                print(f"[micro] {label} FAILED: {str(e)[:200]}", flush=True)
        for k_ in ("DLSC_ATTN_BWD", "DLSC_ATTN_BWD_BQ", "DLSC_ATTN_BWD_SPLIT"):
            os.environ.pop(k_, None)

    if "splash_sweep" in which:
        import os

        from dlsc_tpu.models.vit import _splash_mha

        q, k, v = (jnp.asarray(rng.standard_normal((B, H, N, DH)) * 0.1, jnp.bfloat16)
                   for _ in range(3))
        n_pad = 2048
        gf = 2 * 2 * B * H * n_pad * n_pad * DH / 1e9
        for blocks in ("512,1024,512", "512,512,512", "1024,1024,1024",
                       "1024,2048,1024", "2048,2048,2048", "1024,2048,2048",
                       "2048,2048,1024", "256,2048,2048"):
            os.environ["DLSC_SPLASH_BLOCKS"] = blocks
            f = jax.jit(partial(_splash_mha, sm_scale=DH**-0.5))
            try:
                dt = _time(f, q, k, v, label=f"splash fwd blocks {blocks}")
                print(f"[micro]   -> {gf / dt / 1e3:.1f} TF/s", flush=True)
            except Exception as e:
                print(f"[micro] blocks {blocks} FAILED: {str(e)[:140]}", flush=True)
        os.environ.pop("DLSC_SPLASH_BLOCKS", None)

    if "splash_grad_sweep" in which:
        import os

        from dlsc_tpu.models.vit import _splash_mha

        q, k, v = (jnp.asarray(rng.standard_normal((B, H, N, DH)) * 0.1, jnp.bfloat16)
                   for _ in range(3))
        # NOTE: 1664 = 13*128 (13 prime) → only 128- or 1664-wide blocks are
        # legal; 1792 = 14*128 → 896-wide blocks are legal. Earlier "832"
        # probes silently clamped to 128-wide blocks.
        for pad, blocks, unfused in (
            ("512", "512,1024,512", False),     # current default (52.1 ms)
            ("256", "896,1792,896", False),     # 1792-pad: 0.77x the flops
            ("256", "896,896,896", False),
            ("256", "1792,1792,896", False),
            ("128", "1664,1664,1664", False),   # 1664-pad: 0.66x, single-block
            ("512", "512,1024,512", True),      # unfused bwd kernels
        ):
            os.environ["DLSC_SPLASH_PAD"] = pad
            os.environ["DLSC_SPLASH_BLOCKS"] = blocks
            if unfused:
                os.environ["DLSC_SPLASH_UNFUSED"] = "1"
            else:
                os.environ.pop("DLSC_SPLASH_UNFUSED", None)

            def g(q, k, v):
                def f(q, k, v):
                    return jnp.sum(
                        _splash_mha(q, k, v, sm_scale=DH**-0.5).astype(jnp.float32))
                return jax.grad(f, argnums=(0, 1, 2))(q, k, v)

            tag = f"pad{pad} blocks {blocks}{' unfused' if unfused else ''}"
            try:
                _time(jax.jit(g), q, k, v, label=f"splash fwd+bwd {tag}")
            except Exception as e:
                print(f"[micro] {tag} FAILED: {str(e)[:140]}", flush=True)
        for k_ in ("DLSC_SPLASH_PAD", "DLSC_SPLASH_BLOCKS", "DLSC_SPLASH_UNFUSED"):
            os.environ.pop(k_, None)

    if "splash_bwd_sweep" in which:
        import os

        from dlsc_tpu.models.vit import _splash_mha

        q, k, v = (jnp.asarray(rng.standard_normal((B, H, N, DH)) * 0.1, jnp.bfloat16)
                   for _ in range(3))
        os.environ["DLSC_SPLASH_PAD"] = "256"
        os.environ["DLSC_SPLASH_BLOCKS"] = "896,1792,896"
        f = jax.jit(partial(_splash_mha, sm_scale=DH**-0.5))
        _time(f, q, k, v, label="splash fwd-only pad1792 896,1792,896")
        # fused dkv backward kernel: tune its blocks independently
        for bwd in ("896,1792,896", "896,896,896", "256,1792,896",
                    "256,896,896", "1792,1792,896", "128,1792,1792",
                    "896,1792,256"):
            os.environ["DLSC_SPLASH_BWD_BLOCKS"] = bwd

            def g(q, k, v):
                def f(q, k, v):
                    return jnp.sum(
                        _splash_mha(q, k, v, sm_scale=DH**-0.5).astype(jnp.float32))
                return jax.grad(f, argnums=(0, 1, 2))(q, k, v)

            try:
                _time(jax.jit(g), q, k, v, label=f"splash fwd+bwd bwdblocks {bwd}")
            except Exception as e:
                print(f"[micro] bwd {bwd} FAILED: {str(e)[:140]}", flush=True)
        for k_ in ("DLSC_SPLASH_PAD", "DLSC_SPLASH_BLOCKS", "DLSC_SPLASH_BWD_BLOCKS"):
            os.environ.pop(k_, None)

    if "step_parts" in which:
        # Bisect the train step: encoder-only grad vs full-model grad vs the
        # probe's full step isolates (pipeline+conv+head+loss) and
        # (adam+metrics) contributions. Uses the current best config.
        import os

        os.environ["DLSC_SPLASH_PAD"] = "256"
        os.environ["DLSC_SPLASH_BLOCKS"] = "896,1792,896"
        import flax.linen as nn_linen

        from dlsc_tpu.models import ASTModel
        from dlsc_tpu.models.vit import ASTViT

        # 1) encoder-only: scanned remat'd blocks, no conv/head/loss
        class TrunkOnly(ASTViT):
            @nn_linen.compact
            def __call__(self, x, train: bool = False):  # x: (B, N, D) tokens
                remat_kw = {"static_argnums": (2,)}
                remat_kw["policy"] = jax.checkpoint_policies.save_only_these_names(
                    "attn_res")
                from dlsc_tpu.models.vit import _ScanBlock
                body = nn_linen.remat(_ScanBlock, **remat_kw)
                scanned = nn_linen.scan(
                    body, variable_axes={"params": 0},
                    split_rngs={"params": True, "dropout": True},
                    length=self.depth, in_axes=nn_linen.broadcast,
                    metadata_params={nn_linen.PARTITION_NAME: None},
                )(self.emb_dim, self.num_heads, dropout=0.0, dtype=self.dtype,
                  attn_impl="splash", name="blocks")
                x, _ = scanned(x, train)
                return x

        trunk = TrunkOnly(num_classes=50, emb_dim=768, depth=12, num_heads=12,
                          dtype=jnp.bfloat16)
        toks = jnp.asarray(rng.standard_normal((B, N + 1, D)), jnp.bfloat16)
        tv = jax.jit(trunk.init, static_argnames=("train",))(
            {"params": jax.random.key(0)}, toks[:2], train=False)

        def tgrad(p, x):
            def f(p):
                return jnp.sum(trunk.apply({"params": p}, x, train=True).astype(jnp.float32))
            return jax.grad(f)(p)

        _time(tgrad, tv["params"], toks, label="encoder-only grad (attn_res)")

        # 2) full model grad (pipeline + conv + encoder + head + loss)
        from dlsc_tpu.data.pipeline import DevicePipeline, PipelineConfig
        from dlsc_tpu.train.losses import CrossEntropyLoss

        pipe = DevicePipeline(PipelineConfig(
            mode="ast", num_classes=50, enable_mixup=True, mixup_alpha=0.5,
            time_mask=192, freq_mask=48,
        ))
        model = ASTModel(num_classes=50, remat=True, remat_policy="attn_res")
        crit = CrossEntropyLoss()
        wave = jnp.asarray(rng.standard_normal((B, 220_500)).astype(np.float32) * 0.3)
        labels = jnp.asarray(rng.integers(0, 50, B).astype(np.int32))
        feats, _ = jax.jit(pipe.train_batch)(wave[:2], labels[:2], jax.random.key(0))
        mv = jax.jit(model.init, static_argnames=("train",))(
            {"params": jax.random.key(0), "dropout": jax.random.key(1)},
            feats, train=False)

        def mgrad(p, w, l):
            def f(p):
                inputs, y = pipe.train_batch(w, l, jax.random.key(3))
                logits = model.apply({"params": p}, inputs, train=True,
                                     rngs={"dropout": jax.random.key(4)})
                return crit(logits, y)
            return jax.grad(f)(p)

        _time(mgrad, mv["params"], wave, labels, label="full-model grad")
        for k_ in ("DLSC_SPLASH_PAD", "DLSC_SPLASH_BLOCKS"):
            os.environ.pop(k_, None)

    if "grad_parts" in which:
        # encoder bwd gap bisection: (a) scan vs unrolled blocks, (b) true
        # bwd throughput of the bare parameter-matmul chain under remat.
        import os

        os.environ["DLSC_SPLASH_PAD"] = "256"
        os.environ["DLSC_SPLASH_BLOCKS"] = "896,1792,896"
        from dlsc_tpu.models.vit import ASTViT

        for scan in (True, False):
            model = ASTViT(num_classes=50, emb_dim=768, depth=12, num_heads=12,
                           dropout=0.0, dtype=jnp.bfloat16, remat=True,
                           remat_policy="attn_res", scan_blocks=scan)
            feats = jnp.asarray(rng.standard_normal((B, 128, 1379)).astype(np.float32))
            mv = jax.jit(model.init, static_argnames=("train",))(
                {"params": jax.random.key(0), "dropout": jax.random.key(1)},
                feats[:2], train=False)

            def g(p, x):
                def f(p):
                    return jnp.sum(model.apply(
                        {"params": p}, x, train=True,
                        rngs={"dropout": jax.random.key(2)}).astype(jnp.float32))
                return jax.grad(f)(p)

            _time(g, mv["params"], feats,
                  label=f"vit grad scan={scan} (attn_res)")

        x = jnp.asarray(rng.standard_normal((B * N, D)), jnp.bfloat16)
        ws = {
            "qkv": jnp.asarray(rng.standard_normal((D, 3 * D)) * 0.02, jnp.bfloat16),
            "proj": jnp.asarray(rng.standard_normal((D, D)) * 0.02, jnp.bfloat16),
            "fc1": jnp.asarray(rng.standard_normal((D, 4 * D)) * 0.02, jnp.bfloat16),
            "fc2": jnp.asarray(rng.standard_normal((4 * D, D)) * 0.02, jnp.bfloat16),
        }

        def block_mm(x, ws):
            q = x @ ws["qkv"]
            x = q[:, :D] @ ws["proj"]
            h = jax.nn.gelu(x @ ws["fc1"], approximate=False)
            return h @ ws["fc2"]

        def chain_grad(x, ws):
            def f(ws):
                y = x
                for _ in range(12):
                    y = jax.checkpoint(block_mm)(y, ws)
                return jnp.sum(y.astype(jnp.float32))
            return jax.grad(f)(ws)

        dt = _time(jax.jit(chain_grad), x, ws, label="matmul chain grad (remat)")
        gf = 2 * B * N * (12 * D * D) * 12 / 1e9  # fwd flops
        print(f"[micro]   chain grad: {gf * (1 + 1 + 2) / dt / 1e3:.1f} TF/s "
              "(fwd+refwd+bwd flops)", flush=True)
        for k_ in ("DLSC_SPLASH_PAD", "DLSC_SPLASH_BLOCKS"):
            os.environ.pop(k_, None)

    if "attn_ctx_grad" in which:
        # attention sub-block (qkv matmul -> splash -> proj) fwd+bwd x12 under
        # the attn_res remat policy — isolates the in-context backward cost
        # (pad/slice copies, layout transposes around the kernel).
        import os

        from dlsc_tpu.models.vit import _splash_mha

        os.environ["DLSC_SPLASH_PAD"] = "256"
        os.environ["DLSC_SPLASH_BLOCKS"] = "896,1792,896"
        Ntok = N + 1
        x0 = jnp.asarray(rng.standard_normal((B, Ntok, D)), jnp.bfloat16)
        wqkv = jnp.asarray(rng.standard_normal((D, 3 * D)) * 0.02, jnp.bfloat16)
        wproj = jnp.asarray(rng.standard_normal((D, D)) * 0.02, jnp.bfloat16)

        def attn_asm(x, wqkv, wproj):
            qkv = (x @ wqkv).reshape(B, Ntok, 3, H, DH).transpose(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
            out = _splash_mha(q, k, v, sm_scale=DH**-0.5)
            out = out.transpose(0, 2, 1, 3).reshape(B, Ntok, D)
            return out @ wproj

        pol = jax.checkpoint_policies.save_only_these_names("attn_res")

        def g(x, wqkv, wproj):
            def f(wqkv, wproj):
                y = x
                for _ in range(12):
                    y = jax.checkpoint(attn_asm, policy=pol)(y, wqkv, wproj)
                return jnp.sum(y.astype(jnp.float32))
            return jax.grad(f, argnums=(0, 1))(wqkv, wproj)

        _time(jax.jit(g), x0, wqkv, wproj, label="12x attn asm grad (attn_res)")

        # variant: kernel-enforced SEQ_MINOR qkv layouts (moves the transpose
        # into the kernel wrapper; may unblock XLA fusing the bwd transposes)
        os.environ["DLSC_SPLASH_LAYOUT"] = "seq_minor"
        try:
            _time(jax.jit(g), x0, wqkv, wproj,
                  label="12x attn asm grad (attn_res, seq_minor)")
        except Exception as e:
            print(f"[micro] seq_minor FAILED: {str(e)[:140]}", flush=True)
        os.environ.pop("DLSC_SPLASH_LAYOUT", None)

        # variant: tokens pre-padded to 1792 — per-block pad/slice copies
        # disappear; matmuls pay +8.8% rows
        xp = jnp.asarray(rng.standard_normal((B, 1792, D)), jnp.bfloat16)

        def gp(x, wqkv, wproj):
            def f(wqkv, wproj):
                y = x
                for _ in range(12):
                    y = jax.checkpoint(attn_asm_pad, policy=pol)(y, wqkv, wproj)
                return jnp.sum(y.astype(jnp.float32))
            return jax.grad(f, argnums=(0, 1))(wqkv, wproj)

        def attn_asm_pad(x, wqkv, wproj):
            Np = 1792
            qkv = (x @ wqkv).reshape(B, Np, 3, H, DH).transpose(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
            out = _splash_mha(q, k, v, sm_scale=DH**-0.5)
            out = out.transpose(0, 2, 1, 3).reshape(B, Np, D)
            return out @ wproj

        _time(jax.jit(gp), xp, wqkv, wproj,
              label="12x attn asm grad (attn_res, encoder-wide 1792)")

        # variant: einsum assembly — 3-D weights fold the head split/merge
        # into the dots (no explicit (B,N,H,dh)<->(B,H,N,dh) transposes)
        wqkv3 = wqkv.reshape(D, 3, H, DH).transpose(1, 0, 2, 3)  # (3,D,H,dh)
        wproj3 = wproj.reshape(H, DH, D)

        def attn_asm_einsum(x, wqkv3, wproj3):
            q = jnp.einsum("bnd,dhk->bhnk", x, wqkv3[0])
            k = jnp.einsum("bnd,dhk->bhnk", x, wqkv3[1])
            v = jnp.einsum("bnd,dhk->bhnk", x, wqkv3[2])
            out = _splash_mha(q, k, v, sm_scale=DH**-0.5)
            return jnp.einsum("bhnd,hdo->bno", out, wproj3)

        def ge(x, wqkv3, wproj3):
            def f(wqkv3, wproj3):
                y = x
                for _ in range(12):
                    y = jax.checkpoint(attn_asm_einsum, policy=pol)(y, wqkv3, wproj3)
                return jnp.sum(y.astype(jnp.float32))
            return jax.grad(f, argnums=(0, 1))(wqkv3, wproj3)

        _time(jax.jit(ge), xp, wqkv3, wproj3,
              label="12x attn asm grad (attn_res, 1792, einsum)")
        for k_ in ("DLSC_SPLASH_PAD", "DLSC_SPLASH_BLOCKS"):
            os.environ.pop(k_, None)

    if run_all or "dense" in which:
        q, k, v = (jnp.asarray(rng.standard_normal((B, H, N, DH)) * 0.1, jnp.bfloat16)
                   for _ in range(3))

        @jax.jit
        def dense(q, k, v):
            attn = jnp.einsum("bhqd,bhkd->bhqk", q, k) * (DH**-0.5)
            attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(q.dtype)
            return jnp.einsum("bhqk,bhkd->bhqd", attn, v)

        try:
            dt = _time(dense, q, k, v, label=f"dense attn ({B},{H},{N},{DH})")
            gf = 2 * 2 * B * H * N * N * DH / 1e9
            print(f"[micro]   dense: {gf / dt / 1e3:.1f} TF/s", flush=True)
        except Exception as e:
            print(f"[micro] dense attn FAILED: {str(e)[:200]}", flush=True)

    if run_all or "attn_module" in which:
        from dlsc_tpu.models.vit import Attention

        attn = Attention(D, H, dtype=jnp.bfloat16)
        x = jnp.asarray(rng.standard_normal((B, N + 1, D)), jnp.bfloat16)
        av = jax.jit(attn.init, static_argnames=("train",))(
            jax.random.key(0), x[:2], train=False)

        def fa(v, x):
            for _ in range(12):
                x = attn.apply(v, x, train=True)
            return x

        _time(fa, av, x, label="12x Attention module (qkv+splash+proj)")

    if run_all or "attn_asm" in which or "attn_asm_nok" in which:
        from dlsc_tpu.models.vit import _splash_mha

        Ntok = N + 1
        x0 = jnp.asarray(rng.standard_normal((B, Ntok, D)), jnp.bfloat16)
        wqkv = jnp.asarray(rng.standard_normal((D, 3 * D)) * 0.02, jnp.bfloat16)
        wproj = jnp.asarray(rng.standard_normal((D, D)) * 0.02, jnp.bfloat16)

        def asm(x, use_kernel: bool):
            qkv = (x @ wqkv).reshape(B, Ntok, 3, H, DH).transpose(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
            if use_kernel:
                out = _splash_mha(q, k, v, sm_scale=DH**-0.5)
            else:
                out = q
            out = out.transpose(0, 2, 1, 3).reshape(B, Ntok, D)
            return out @ wproj

        if run_all or "attn_asm" in which:
            def f_asm(x):
                for _ in range(12):
                    x = asm(x, True)
                return x
            _time(f_asm, x0, label="12x attn assembly (with splash)")
        if run_all or "attn_asm_nok" in which:
            def f_asm_nok(x):
                for _ in range(12):
                    x = asm(x, False)
                return x
            _time(f_asm_nok, x0, label="12x attn assembly (kernel skipped)")

    if "attn_variants" in which:
        from dlsc_tpu.models.vit import _splash_mha

        Ntok = N + 1
        x0 = jnp.asarray(rng.standard_normal((B, Ntok, D)), jnp.bfloat16)
        wqkv = jnp.asarray(rng.standard_normal((D, 3 * D)) * 0.02, jnp.bfloat16)
        wproj = jnp.asarray(rng.standard_normal((D, D)) * 0.02, jnp.bfloat16)

        def tail(out):
            return (out.transpose(0, 2, 1, 3).reshape(B, Ntok, D)) @ wproj

        def v_barrier(x):
            qkv = (x @ wqkv).reshape(B, Ntok, 3, H, DH).transpose(2, 0, 3, 1, 4)
            q, k, v = jax.lax.optimization_barrier((qkv[0], qkv[1], qkv[2]))
            return tail(_splash_mha(q, k, v, sm_scale=DH**-0.5))

        def v_split4d(x):
            qkv = (x @ wqkv).reshape(B, Ntok, 3, H, DH)
            q = qkv[:, :, 0].transpose(0, 2, 1, 3)
            k = qkv[:, :, 1].transpose(0, 2, 1, 3)
            v = qkv[:, :, 2].transpose(0, 2, 1, 3)
            return tail(_splash_mha(q, k, v, sm_scale=DH**-0.5))

        def v_split4d_barrier(x):
            qkv = (x @ wqkv).reshape(B, Ntok, 3, H, DH)
            q = qkv[:, :, 0].transpose(0, 2, 1, 3)
            k = qkv[:, :, 1].transpose(0, 2, 1, 3)
            v = qkv[:, :, 2].transpose(0, 2, 1, 3)
            q, k, v = jax.lax.optimization_barrier((q, k, v))
            return tail(_splash_mha(q, k, v, sm_scale=DH**-0.5))

        for name, fn1 in (("barrier5d", v_barrier), ("split4d", v_split4d),
                          ("split4d_barrier", v_split4d_barrier)):
            def f12x(x, fn1=fn1):
                for _ in range(12):
                    x = fn1(x)
                return x
            try:
                _time(f12x, x0, label=f"12x attn variant {name}")
            except Exception as e:
                print(f"[micro] {name} FAILED: {str(e)[:160]}", flush=True)

    if run_all or "mlp_module" in which:
        from dlsc_tpu.models.vit import Mlp

        mlp = Mlp(D, dtype=jnp.bfloat16)
        x = jnp.asarray(rng.standard_normal((B, N + 1, D)), jnp.bfloat16)
        mv = jax.jit(mlp.init, static_argnames=("train",))(
            jax.random.key(0), x[:2], train=False)

        def fm(v, x):
            for _ in range(12):
                x = mlp.apply(v, x, train=True)
            return x

        _time(fm, mv, x, label="12x Mlp module")

    if run_all or "ln_module" in which:
        import flax.linen as nn

        ln = nn.LayerNorm(epsilon=1e-6, dtype=jnp.bfloat16)
        x = jnp.asarray(rng.standard_normal((B, N + 1, D)), jnp.bfloat16)
        lv = jax.jit(ln.init)(jax.random.key(0), x[:2])

        def fl(v, x):
            for _ in range(24):
                x = ln.apply(v, x)
            return x

        _time(fl, lv, x, label="24x LayerNorm")

    if run_all or "patch_conv" in which:
        import flax.linen as nn

        conv = nn.Conv(D, (16, 16), (10, 10), padding="VALID", dtype=jnp.bfloat16)
        img = jnp.asarray(rng.standard_normal((B, 128, 1379, 1)).astype(np.float32))
        cv = jax.jit(conv.init)(jax.random.key(0), img[:2])

        def f(v, x):
            return conv.apply(v, x)

        _time(f, cv, img, label="patch conv 1ch k16 s10")

    if run_all or "block_unrolled" in which:
        from dlsc_tpu.models.vit import Block

        blk = Block(D, H, dtype=jnp.bfloat16)
        x = jnp.asarray(rng.standard_normal((B, N + 1, D)), jnp.bfloat16)
        bv = jax.jit(blk.init, static_argnames=("train",))(
            jax.random.key(0), x[:2], train=False)

        def f12(v, x):
            for _ in range(12):
                x = blk.apply(v, x, train=True)
            return x

        _time(f12, bv, x, label="12x Block unrolled (same params)")

    if "exp2_ab" in which:
        # A/B the base-2 softmax fold (DLSC_ATTN_EXP2) at the production
        # shape: default vs exp2, fwd+bwd through the fast kernel pair.
        import os

        from dlsc_tpu.models.vit import _splash_mha

        n_pad, n_real = 1664, 1645
        q, k, v = (jnp.asarray(rng.standard_normal((B, H, n_pad, DH)) * 0.1,
                               jnp.bfloat16) for _ in range(3))

        def g(q, k, v):
            def f(q, k, v):
                o = _splash_mha(q, k, v, sm_scale=DH**-0.5, n_real=n_real)
                return jnp.sum((o.astype(jnp.float32)) ** 2)
            return jax.grad(f, argnums=(0, 1, 2))(q, k, v)

        for flag in ("0", "1"):
            os.environ["DLSC_ATTN_EXP2"] = flag
            try:
                # NB: _time jits freshly per call — the env flag is read at
                # trace time, so each flag gets its own compilation
                _time(g, q, k, v,
                      label=f"attn fwd+bwd pad{n_pad} exp2={flag}")
            except Exception as e:
                print(f"[micro] exp2={flag} FAILED: {str(e)[:160]}",
                      flush=True)
        os.environ.pop("DLSC_ATTN_EXP2", None)

    if "ln_fused" in which:
        # A/B the fused residual-add+LN kernel (ops/ln_fused.py) against
        # XLA's fused chain at the north-star LN-site shape: 12 chained
        # sites of r = x + delta; y = LN(r) on (64*1664, 768) bf16, fwd-only
        # and fwd+bwd (VERDICT r3 #1b).
        from dlsc_tpu.ops.ln_fused import fused_add_ln

        rows = 64 * 1664
        x = jnp.asarray(rng.standard_normal((rows, D)), jnp.bfloat16)
        dl = jnp.asarray(rng.standard_normal((rows, D)), jnp.bfloat16)
        gamma = jnp.ones(D, jnp.float32)
        beta = jnp.zeros(D, jnp.float32)

        def xla_site(x, delta, g, b):
            r = x + delta
            rf = r.astype(jnp.float32)
            mu = jnp.mean(rf, axis=-1, keepdims=True)
            var = jnp.mean((rf - mu) ** 2, axis=-1, keepdims=True)
            y = ((rf - mu) * jax.lax.rsqrt(var + 1e-6) * g + b).astype(x.dtype)
            return r, y

        def chain(site, x, dl, g, b):
            # y feeds the next site's delta, r carries the residual stream —
            # the model's exact dataflow
            for _ in range(12):
                x, dl = site(x, dl, g, b)
            return x, dl

        for name, site in (("xla", xla_site), ("pallas", fused_add_ln)):
            f = partial(chain, site)
            try:
                _time(f, x, dl, gamma, beta, label=f"12x add+LN fwd {name}")

                def fg(x, dl, g, b, f=f):
                    def loss(x, dl, g, b):
                        r, y = f(x, dl, g, b)
                        return (jnp.sum(r.astype(jnp.float32)) +
                                jnp.sum(y.astype(jnp.float32)))
                    return jax.grad(loss, argnums=(0, 1, 2, 3))(x, dl, g, b)

                _time(fg, x, dl, gamma, beta,
                      label=f"12x add+LN fwd+bwd {name}")
            except Exception as e:
                print(f"[micro] ln_fused {name} FAILED: {str(e)[:200]}",
                      flush=True)

    if run_all or "vit_fwd_noscan" in which:
        from dlsc_tpu.models.vit import ASTViT

        model = ASTViT(num_classes=50, emb_dim=768, depth=12, num_heads=12,
                       dropout=0.0, dtype=jnp.bfloat16, remat=False,
                       scan_blocks=False)
        feats = jnp.asarray(rng.standard_normal((B, 128, 1379)).astype(np.float32))
        variables = jax.jit(model.init, static_argnames=("train",))(
            {"params": jax.random.key(0), "dropout": jax.random.key(1)},
            feats[:2], train=False,
        )

        def fwd(p, x):
            return model.apply({"params": p}, x, train=True,
                               rngs={"dropout": jax.random.key(2)})

        _time(fwd, variables["params"], feats, label=f"vit fwd noscan b{B}")

    if run_all or "vit_fwd_eval" in which:
        from dlsc_tpu.models import ASTModel

        model = ASTModel(num_classes=50, remat=False)
        feats = jnp.asarray(rng.standard_normal((B, 128, 1379)).astype(np.float32))
        variables = jax.jit(model.init, static_argnames=("train",))(
            {"params": jax.random.key(0), "dropout": jax.random.key(1)},
            feats[:2], train=False,
        )

        def fwd(p, x):
            return model.apply({"params": p}, x, train=False)

        _time(fwd, variables["params"], feats, label=f"vit fwd eval b{B}")

    if run_all or "vit_fwd" in which:
        from dlsc_tpu.models import ASTModel

        model = ASTModel(num_classes=50, remat=False)
        feats = jnp.asarray(rng.standard_normal((B, 128, 1379)).astype(np.float32))
        variables = jax.jit(model.init, static_argnames=("train",))(
            {"params": jax.random.key(0), "dropout": jax.random.key(1)},
            feats[:2], train=False,
        )

        @jax.jit
        def fwd(p, x):
            return model.apply({"params": p}, x, train=True,
                               rngs={"dropout": jax.random.key(2)})

        _time(fwd, variables["params"], feats, label=f"vit fwd b{B}")


if __name__ == "__main__":
    main(sys.argv[1:])
