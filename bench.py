#!/usr/bin/env python
"""Benchmark: clips/sec/chip for the full AST-Base training step
(fused Pallas mel front-end + SpecAugment + Mixup + ViT-Base fwd/bwd +
Adam update) on 5-s/44.1-kHz clips — the BASELINE.json north-star metric.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "clips/sec/chip", "vs_baseline": R}

``vs_baseline`` is measured-TPU-throughput / (20 x measured-CPU-throughput):
BASELINE.json's target is ">=20x CPU end-to-end clips/sec/chip", so
vs_baseline >= 1.0 means the target is met. The CPU reference number below
was measured on this machine (single-core host, same train step, pure-XLA
mel path) — see CPU_BASELINE_PROVENANCE.
"""

from __future__ import annotations

import json
import time

import numpy as np

# Measured on this host (1-core CPU, JAX CPU backend): AST-Base train step,
# 67.90 s/step @ batch 2, steady state, pure-JAX mel.
# See scripts/bench_cpu_baseline.py.
CPU_CLIPS_PER_SEC = 0.0295
CPU_BASELINE_PROVENANCE = "scripts/bench_cpu_baseline.py @ 2026-08-16, batch 2, 3 steps"
TARGET_MULTIPLIER = 20.0  # BASELINE.json: >=20x CPU end-to-end


def main() -> None:
    from dlsc_tpu.utils import wait_for_backend

    wait_for_backend()  # ride out transient axon UNAVAILABLE windows
    import jax
    import jax.numpy as jnp

    from dlsc_tpu.data.pipeline import DevicePipeline, PipelineConfig
    from dlsc_tpu.models import ASTModel
    from dlsc_tpu.train.losses import CrossEntropyLoss
    from dlsc_tpu.train.metrics import MetricState
    from dlsc_tpu.train.optim import adam, build_optimizer, cosine_annealing
    from dlsc_tpu.train.state import TrainState
    from dlsc_tpu.train.steps import make_train_step

    backend = jax.default_backend()
    n_chips = max(jax.device_count(), 1)

    pipe = DevicePipeline(PipelineConfig(
        mode="ast", num_classes=50, enable_mixup=True, mixup_alpha=0.5,
        time_mask=192, freq_mask=48,
    ))
    model = ASTModel(num_classes=50)  # ViT-Base, bf16, remat, flash attention

    rng = np.random.default_rng(0)

    def build(batch):
        wave = jnp.asarray(rng.standard_normal((batch, 220_500)).astype(np.float32) * 0.3)
        labels = jnp.asarray(rng.integers(0, 50, batch).astype(np.int32))
        feats, _ = jax.jit(pipe.train_batch)(wave[:2], labels[:2], jax.random.key(0))
        variables = jax.jit(model.init, static_argnames=("train",))(
            {"params": jax.random.key(0), "dropout": jax.random.key(1)},
            feats, train=False,
        )
        tx, _ = build_optimizer(adam(lr=5e-4, weight_decay=1e-6),
                                cosine_annealing(T_max=100), 25, 1.0)
        state = TrainState.create(
            apply_fn=model.apply, params=variables["params"],
            batch_stats=variables.get("batch_stats"), tx=tx,
            rng=jax.random.key(0),
        )
        ms = MetricState.create(50)
        step = jax.jit(make_train_step(pipe, CrossEntropyLoss()),
                       donate_argnums=(0, 1))
        return step, state, ms, wave, labels

    batch = 64
    attempts_left = 2  # the remote compile helper occasionally 500s
    while batch >= 4:
        try:
            step, state, ms, wave, labels = build(batch)
            state, ms, loss = step(state, ms, wave, labels)   # compile + warmup
            state, ms, loss = step(state, ms, wave, labels)
            # NB: block_until_ready does not reliably synchronize on the
            # axon remote backend; force a host readback instead.
            jax.device_get(loss)
            n_iters = 10
            t0 = time.time()
            for _ in range(n_iters):
                state, ms, loss = step(state, ms, wave, labels)
            jax.device_get(loss)
            dt = time.time() - t0
            break
        except Exception as e:  # OOM backoff / flaky compile-helper retry
            msg = str(e)
            if "RESOURCE_EXHAUSTED" in msg or "out of memory" in msg.lower():
                batch //= 2
                continue
            if "remote_compile" in msg or "INTERNAL" in msg or "UNAVAILABLE" in msg:
                if attempts_left > 0:
                    attempts_left -= 1
                    continue
                batch //= 2
                attempts_left = 2
                continue
            raise
    else:
        raise RuntimeError("could not fit any batch size")

    clips_per_sec_per_chip = batch * n_iters / dt / n_chips
    vs_baseline = clips_per_sec_per_chip / (TARGET_MULTIPLIER * CPU_CLIPS_PER_SEC)

    # MFU (VERDICT r3 #2): useful = real-token matmul/conv FLOPs with the
    # standard bwd multipliers (params x3, attention x3.5), no pad rows, no
    # remat recompute; hw_util additionally counts the pad-1792 rows and the
    # attn_res remat re-forward of the parameter-matmul chain. Peak resolved
    # from the device kind (v5e: 197 bf16 TF/s). See dlsc_tpu/utils/mfu.py.
    from dlsc_tpu.utils.mfu import ast_step_flops, ast_token_counts, peak_tflops

    step_s = dt / n_iters
    n_real, n_pad = ast_token_counts(model, 220_500)
    fl = ast_step_flops(model, n_real, n_pad)
    peak = peak_tflops(jax.devices()[0].device_kind) * 1e12
    mfu = fl.useful * batch / step_s / peak
    hw_util = fl.hardware * batch / step_s / peak

    # MFU decomposition (VERDICT r4 #7): measure the attention kernel and the
    # parameter-matmul chain standalone at the step's exact shapes so the
    # attained TF/s of each band — and the elementwise residual — are
    # auditable from this one JSON. Never fails the bench (best-effort: the
    # remote compile helper 500s flakily).
    decomp = {}
    try:
        def _t(fn, *args, n=5):
            @jax.jit
            def sf(*a):
                out = fn(*a)
                return sum(jnp.sum(x.astype(jnp.float32))
                           for x in jax.tree_util.tree_leaves(out))
            out = sf(*args)
            jax.device_get(out)
            t0 = time.time()
            for _ in range(n):
                out = sf(*args)
            jax.device_get(out)
            return (time.time() - t0) / n

        from dlsc_tpu.models.vit import _splash_mha

        H = model.num_heads
        D = model.emb_dim
        DH = D // H
        depth = model.depth
        q, k, v = (jnp.asarray(
            rng.standard_normal((batch, H, n_pad, DH)).astype(np.float32)
            * 0.1, jnp.bfloat16) for _ in range(3))

        def attn_g(q, k, v):
            def f(q, k, v):
                o = _splash_mha(q, k, v, sm_scale=DH ** -0.5, n_real=n_real)
                return jnp.sum(o.astype(jnp.float32) ** 2)
            return jax.grad(f, argnums=(0, 1, 2))(q, k, v)

        attn_s = _t(attn_g, q, k, v) * depth  # one block's kernel x depth
        attn_fl = 3.5 * depth * 4.0 * n_pad * n_pad * D * batch

        # parameter-matmul chain: qkv/proj/fc1/fc2 at (B*N_pad, D) bf16 —
        # grad (fwd + dW + dx = 3x) plus one refwd (the attn_res remat policy
        # re-runs these matmuls in the backward) = 4x fwd FLOPs, matching
        # utils/mfu.py's hardware accounting
        rows = batch * n_pad
        x0 = jnp.asarray(rng.standard_normal((rows, D)).astype(np.float32)
                         * 0.1, jnp.bfloat16)
        sc = 0.02
        wqkv = jnp.asarray(rng.standard_normal((D, 3 * D)) * sc, jnp.bfloat16)
        wproj = jnp.asarray(rng.standard_normal((D, D)) * sc, jnp.bfloat16)
        w1 = jnp.asarray(rng.standard_normal((D, 4 * D)) * sc, jnp.bfloat16)
        w2 = jnp.asarray(rng.standard_normal((4 * D, D)) * sc, jnp.bfloat16)

        def chain(x, wqkv, wproj, w1, w2):
            for _ in range(depth):
                x = x + (x @ wqkv)[:, :D] @ wproj + (x @ w1) @ w2
            return x

        def chain_g(x, wqkv, wproj, w1, w2):
            def f(wqkv, wproj, w1, w2):
                return jnp.sum(
                    chain(x, wqkv, wproj, w1, w2).astype(jnp.float32) ** 2)
            return jax.grad(f, argnums=(0, 1, 2, 3))(wqkv, wproj, w1, w2)

        chain_fwd_s = _t(chain, x0, wqkv, wproj, w1, w2)
        chain_grad_s = _t(chain_g, x0, wqkv, wproj, w1, w2)
        param_s = chain_grad_s + chain_fwd_s  # grad(3x) + remat refwd(1x)
        param_fl = 4.0 * depth * (4.0 + 2.0 * 4.0) * D * D * 2.0 * rows

        decomp = {
            "attn_kernel_ms": round(attn_s * 1e3, 1),
            "attn_tfs": round(attn_fl / attn_s / 1e12, 1),
            "param_chain_ms": round(param_s * 1e3, 1),
            "param_tfs": round(param_fl / param_s / 1e12, 1),
            "elementwise_other_ms": round(
                (step_s - attn_s - param_s) * 1e3, 1),
            "note": "attn = fast fwd + fused dkv bwd kernel x depth at "
                    "pad-%d; param = qkv/proj/fc1/fc2 chain grad + remat "
                    "refwd at (B*N_pad, %d) bf16; residual = LN/dropout/"
                    "gelu/residual + mel/loss/adam" % (n_pad, D),
        }
    except Exception as e:  # pragma: no cover - chip-side flake
        decomp = {"error": str(e)[:160]}

    print(json.dumps({
        "metric": "AST-Base train-step throughput (fused mel + fwd/bwd + adam), 5s clips",
        "value": round(clips_per_sec_per_chip, 2),
        "unit": "clips/sec/chip",
        "vs_baseline": round(vs_baseline, 3),
        "batch": batch,
        "backend": backend,
        "n_chips": n_chips,
        "step_ms": round(dt / n_iters * 1e3, 2),
        "mfu": round(mfu, 4),
        "hw_util": round(hw_util, 4),
        "mfu_note": "useful-FLOP MFU @ n_real=%d (params x3, attn x3.5) / %.0f TF/s peak; hw_util adds pad-%d rows + attn_res remat refwd" % (n_real, peak / 1e12, n_pad),
        "decomp": decomp,
    }))


if __name__ == "__main__":
    main()
