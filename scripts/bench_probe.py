#!/usr/bin/env python
"""North-star probe matrix: AST-Base train-step variants on the real TPU.

Times the full fused train step (mel + SpecAugment + Mixup + ViT-Base
fwd/bwd + Adam) across attention-kernel / remat / batch-size variants and
prints one line per variant. Used to pick bench.py's configuration
(VERDICT r1 next-step #3). Run ONE instance at a time (serial remote
compile queue).

    python scripts/bench_probe.py [variant ...]   # default: the full matrix
"""

from __future__ import annotations

import sys
import time
import traceback
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

VARIANTS = {
    # name: (batch, model kwargs[, env])
    "flash_remat_b64": (64, dict(remat=True, remat_policy="full", attn_impl="flash")),
    "splash_remat_b64": (64, dict(remat=True, remat_policy="full", attn_impl="splash")),
    "splash_dots_b64": (64, dict(remat=True, remat_policy="dots", attn_impl="splash")),
    "splash_noremat_b64": (64, dict(remat=False, attn_impl="splash")),
    "splash_remat_b128": (128, dict(remat=True, remat_policy="full", attn_impl="splash")),
    "splash_noremat_b32": (32, dict(remat=False, attn_impl="splash")),
    # round 2 follow-ups
    "splash_attnout_b64": (64, dict(remat=True, remat_policy="attn_out", attn_impl="splash")),
    "splash_attnout_b128": (128, dict(remat=True, remat_policy="attn_out", attn_impl="splash")),
    "splash_blocks_1024": (64, dict(remat=True, remat_policy="full", attn_impl="splash"),
                           {"DLSC_SPLASH_BLOCKS": "1024,1024,1024"}),
    "splash_blocks_2048kv": (64, dict(remat=True, remat_policy="full", attn_impl="splash"),
                             {"DLSC_SPLASH_BLOCKS": "512,2048,512"}),
    "splash_unfused_bwd": (64, dict(remat=True, remat_policy="full", attn_impl="splash"),
                           {"DLSC_SPLASH_UNFUSED": "1"}),
    "splash_kv2048_c1024": (64, dict(remat=True, remat_policy="full", attn_impl="splash"),
                            {"DLSC_SPLASH_BLOCKS": "512,2048,1024"}),
    "splash_kv2048_c2048": (64, dict(remat=True, remat_policy="full", attn_impl="splash"),
                            {"DLSC_SPLASH_BLOCKS": "512,2048,2048"}),
    "splash_q1024_kv2048": (64, dict(remat=True, remat_policy="full", attn_impl="splash"),
                            {"DLSC_SPLASH_BLOCKS": "1024,2048,512"}),
    "splash_q256_kv2048": (64, dict(remat=True, remat_policy="full", attn_impl="splash"),
                           {"DLSC_SPLASH_BLOCKS": "256,2048,512"}),
    "splash_q2048_kv2048": (64, dict(remat=True, remat_policy="full", attn_impl="splash"),
                            {"DLSC_SPLASH_BLOCKS": "2048,2048,512"}),
    # padding-granularity variants: attention cost ∝ n_pad²
    # (N=1645 → pad 2048 @512-grain, 1792 @256, 1664 @128)
    "splash_pad512_b64": (64, dict(remat=True, remat_policy="full", attn_impl="splash"),
                          {"DLSC_SPLASH_PAD": "512"}),
    "splash_pad256_b64": (64, dict(remat=True, remat_policy="full", attn_impl="splash"),
                          {"DLSC_SPLASH_PAD": "256", "DLSC_SPLASH_BLOCKS": "256,896,896"}),
    "splash_pad128_b64": (64, dict(remat=True, remat_policy="full", attn_impl="splash"),
                          {"DLSC_SPLASH_PAD": "128"}),
    "splash_pad128_attnout": (64, dict(remat=True, remat_policy="attn_out", attn_impl="splash"),
                              {"DLSC_SPLASH_PAD": "128"}),
    "splash_pad256_attnout": (64, dict(remat=True, remat_policy="attn_out", attn_impl="splash"),
                              {"DLSC_SPLASH_PAD": "256", "DLSC_SPLASH_BLOCKS": "256,896,896"}),
    # pad-1792 with wide blocks: kernel fwd+bwd 40.2 ms vs 52.1 (grad sweep)
    "splash_pad1792_b64": (64, dict(remat=True, remat_policy="full", attn_impl="splash"),
                           {"DLSC_SPLASH_PAD": "256", "DLSC_SPLASH_BLOCKS": "896,1792,896"}),
    "splash_pad1792_b128": (128, dict(remat=True, remat_policy="full", attn_impl="splash"),
                            {"DLSC_SPLASH_PAD": "256", "DLSC_SPLASH_BLOCKS": "896,1792,896"}),
    # attn_res: save kernel out+lse → backward skips the kernel-fwd recompute
    "splash_attnres_pad1792_b64": (64, dict(remat=True, remat_policy="attn_res", attn_impl="splash"),
                                   {"DLSC_SPLASH_PAD": "256", "DLSC_SPLASH_BLOCKS": "896,1792,896"}),
    "splash_attnres_pad1792_b128": (128, dict(remat=True, remat_policy="attn_res", attn_impl="splash"),
                                    {"DLSC_SPLASH_PAD": "256", "DLSC_SPLASH_BLOCKS": "896,1792,896"}),
    # ast_small at AST-Base token count (stride 10 → ~1650 tokens): the
    # VERDICT r1 #5 measurement — splash path in training vs the dense
    # attention the reference's in-attention dropout would force
    "ast_small_splash_b64": (64, dict(attn_impl="splash", remat=True,
                                      remat_policy="attn_res")),
    "ast_small_splash_b128": (128, dict(attn_impl="splash", remat=True,
                                        remat_policy="attn_res")),
    "ast_small_dense_b64": (64, dict(attn_impl="dense", attn_dropout=0.1,
                                     remat=True, remat_policy="full")),
    # dense does not compile at b64 (per-block (B,H,N,N) buffers); smaller
    # batches give the per-clip comparison
    "ast_small_dense_b32": (32, dict(attn_impl="dense", attn_dropout=0.1,
                                     remat=True, remat_policy="full")),
    "ast_small_dense_b16": (16, dict(attn_impl="dense", attn_dropout=0.1,
                                     remat=True, remat_policy="full")),
    # ast_moe train-step numbers (VERDICT r2 #1): shipped config (8 experts,
    # top-2, token router, group 256) under both dispatch lowerings
    "ast_moe_einsum_b64": (64, dict(dispatch="einsum")),
    "ast_moe_scatter_b64": (64, dict(dispatch="scatter")),
    "ast_moe_einsum_b32": (32, dict(dispatch="einsum")),
    "ast_moe_expert_b64": (64, dict(router="expert", dispatch="einsum")),
    # round-5 dropless grouped-matmul dispatch (VERDICT r4 #1): megablox gmm
    # over expert-sorted rows, scatter-free gather VJPs (models/moe.py)
    "ast_moe_ragged_b64": (64, dict(dispatch="ragged")),
    "ast_moe_ragged_b32": (32, dict(dispatch="ragged")),
    "ast_moe_ragged_b128": (128, dict(dispatch="ragged")),
    "ast_moe_ragged_t2048_b64": (64, dict(dispatch="ragged"),
                                 {"DLSC_MOE_GMM_TILE": "2048,384,512"}),
    "ast_moe_ragged_t768_b64": (64, dict(dispatch="ragged"),
                                {"DLSC_MOE_GMM_TILE": "1024,384,768"}),
    "ast_moe_ragged_nobias_b64": (64, dict(dispatch="ragged"),
                                  {"DLSC_MOE_BIAS": "none"}),
    "ast_moe_ragged_xla_b64": (64, dict(dispatch="ragged"),
                               {"DLSC_MOE_GMM": "xla"}),
    # moe_res remat: save the pre-gelu gmm output + index tensors so the
    # backward skips both gmm re-forwards (vit.remat_kwargs attn_res_moe)
    "ast_moe_ragged_res_b64": (64, dict(dispatch="ragged",
                                        remat_policy="attn_res_moe")),
    "ast_moe_ragged_res_b32": (32, dict(dispatch="ragged",
                                        remat_policy="attn_res_moe")),
    # pure library defaults (pad-1792 + 896-blocks + attn_res + encoder_pad)
    "default_b64": (64, dict()),
    # round-4 A/B ladder: custom backward kernel + tight pad-1664
    # (ops/attn_fast.py bwd_kernel; _pad_grain default flip)
    "r4_pad1792_libbwd_b64": (64, dict(), {"DLSC_ATTN_FAST_PAD": "256",
                                           "DLSC_ATTN_BWD": "library"}),
    "r4_pad1792_fastbwd_b64": (64, dict(), {"DLSC_ATTN_FAST_PAD": "256"}),
    "r4_pad1664_b64": (64, dict()),  # new defaults: pad 128 + fast bwd
    "r4_pad1664_bqfull_b64": (64, dict(), {"DLSC_ATTN_BWD_BQ": "1792"}),
    # r4b: whole-row q blocks (bq = n_pad) for poorly-divisible pads
    "r4b_pad1664_b64": (64, dict()),          # pad1664, fwd bq1664, bwd bq1664
    "r4b_pad1792_bwdfull_b64": (64, dict(), {"DLSC_ATTN_FAST_PAD": "256"}),
    # pad1792 with whole-row fwd too (bq 1792 staged, 12.8 MB tiles)
    "r4b_pad1792_allfull_b64": (64, dict(), {"DLSC_ATTN_FAST_PAD": "256",
                                             "DLSC_ATTN_FAST_BQ": "1792"}),
    # second wave at the pad-1664 default: bigger batch (7% smaller
    # activations may admit it), qkv-saving remat retry (6.3->5.9 GB)
    "r4c_pad1664_b128": (128, dict()),
    "r4c_pad1664_b96": (96, dict()),
    "r4c_qkv_pad1664_b64": (64, dict(remat_policy="attn_res_qkv")),
    # round-4 LN/residual epilogue (VERDICT r3 #1b): fused add+LN2 kernel
    "r4d_lnfused_b64": (64, dict(), {"DLSC_LN_FUSED": "1"}),
    # round-4 base-2 softmax (log2e folded into the score matmul operand)
    "r4e_exp2_b64": (64, dict(), {"DLSC_ATTN_EXP2": "1"}),
    # VERDICT r2 #5: LN2+MLP on 1664 of 1792 rows (pad-row slack)
    "mlp_slice_b64": (64, dict(mlp_slice=True)),
    # VERDICT r2 #5: memory↔FLOPs — skip the qkv-einsum / fc1-matmul refwd
    # by saving those tensors (6.3 / 8.4 GB extra @ b64; no pool in probes)
    "attn_res_qkv_b64": (64, dict(remat_policy="attn_res_qkv")),
    "attn_res_fc1_b64": (64, dict(remat_policy="attn_res_fc1")),
    "slice_qkv_b64": (64, dict(mlp_slice=True, remat_policy="attn_res_qkv")),
    # dropout-mask RNG impl: threefry (default) vs TPU hardware RNG
    "default_rbg_b64": (64, dict(), {"DLSC_RNG_IMPL": "rbg"}),
    "default_urbg_b64": (64, dict(), {"DLSC_RNG_IMPL": "unsafe_rbg"}),
    # US8K shapes: 4-s clips -> ~1104 mel frames -> 1310 tokens, pad 1536
    # (_fit clamps the default blocks to 768,1536,768)
    "us8k_ast_b32": (32, dict()),
    "us8k_ast_b64": (64, dict()),
    "default_b128": (128, dict()),
    "default_noscan_b64": (64, dict(scan_blocks=False)),
    "default_b96": (96, dict()),
}


def run_variant(name: str, batch: int, model_kw: dict, n_iters: int = 10) -> float | None:
    import jax
    import jax.numpy as jnp

    from dlsc_tpu.data.pipeline import DevicePipeline, PipelineConfig
    from dlsc_tpu.models import ASTModel
    from dlsc_tpu.models.ast_small import ASTViTSmall
    from dlsc_tpu.train.losses import CrossEntropyLoss
    from dlsc_tpu.train.metrics import MetricState
    from dlsc_tpu.train.optim import adam, build_optimizer, cosine_annealing
    from dlsc_tpu.train.state import TrainState
    from dlsc_tpu.train.steps import make_train_step

    pipe = DevicePipeline(PipelineConfig(
        mode="ast", num_classes=50, enable_mixup=True, mixup_alpha=0.5,
        time_mask=192, freq_mask=48,
    ))
    if name.startswith("ast_moe"):
        from dlsc_tpu.models.ast_moe import ASTMoE as builder
    else:
        builder = ASTViTSmall if name.startswith("ast_small") else ASTModel
    model = builder(num_classes=50, **model_kw)
    n_samples = 176_400 if name.startswith("us8k") else 220_500
    rng = np.random.default_rng(0)
    wave = jnp.asarray(rng.standard_normal((batch, n_samples)).astype(np.float32) * 0.3)
    labels = jnp.asarray(rng.integers(0, 50, batch).astype(np.int32))
    feats, _ = jax.jit(pipe.train_batch)(wave[:2], labels[:2], jax.random.key(0))
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        feats, train=False,
    )
    tx, _ = build_optimizer(adam(lr=5e-4, weight_decay=1e-6),
                            cosine_annealing(T_max=100), 25, 1.0)
    from dlsc_tpu.utils.runtime import rng_key
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        batch_stats=variables.get("batch_stats"), tx=tx, rng=rng_key(0),
    )
    ms = MetricState.create(50)
    step = jax.jit(make_train_step(pipe, CrossEntropyLoss()),
                   donate_argnums=(0, 1))
    t_c = time.time()
    state, ms, loss = step(state, ms, wave, labels)
    jax.device_get(loss)
    compile_s = time.time() - t_c
    state, ms, loss = step(state, ms, wave, labels)  # warmup
    jax.device_get(loss)
    t0 = time.time()
    for _ in range(n_iters):
        state, ms, loss = step(state, ms, wave, labels)
    lossv = float(jax.device_get(loss))
    dt = (time.time() - t0) / n_iters
    clips = batch / dt
    print(f"[probe] {name}: {dt * 1e3:.0f} ms/step  {clips:.1f} clips/s "
          f"(batch {batch}, compile {compile_s:.0f}s, loss {lossv:.3f})",
          flush=True)
    return clips


def run_fwd_probe(batch: int = 64, n_iters: int = 10) -> None:
    """Forward-only timing (train-mode pipeline + ViT fwd + loss, no grad) —
    splits the step into fwd vs bwd+update for diagnostics."""
    import jax
    import jax.numpy as jnp

    from dlsc_tpu.data.pipeline import DevicePipeline, PipelineConfig
    from dlsc_tpu.models import ASTModel
    from dlsc_tpu.train.losses import CrossEntropyLoss

    pipe = DevicePipeline(PipelineConfig(
        mode="ast", num_classes=50, enable_mixup=True, mixup_alpha=0.5,
        time_mask=192, freq_mask=48,
    ))
    model = ASTModel(num_classes=50, remat=False)  # fwd-only: no remat needed
    crit = CrossEntropyLoss()
    rng = np.random.default_rng(0)
    wave = jnp.asarray(rng.standard_normal((batch, 220_500)).astype(np.float32) * 0.3)
    labels = jnp.asarray(rng.integers(0, 50, batch).astype(np.int32))
    feats, _ = jax.jit(pipe.train_batch)(wave[:2], labels[:2], jax.random.key(0))
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        feats, train=False,
    )

    @jax.jit
    def fwd(params, wave, labels):
        inputs, y = pipe.train_batch(wave, labels, jax.random.key(3))
        logits = model.apply({"params": params}, inputs, train=True,
                             rngs={"dropout": jax.random.key(4)})
        return crit(logits, y)

    p = variables["params"]
    jax.device_get(fwd(p, wave, labels))
    t0 = time.time()
    for _ in range(n_iters):
        loss = fwd(p, wave, labels)
    jax.device_get(loss)
    dt = (time.time() - t0) / n_iters
    print(f"[probe] fwd_only_b{batch}: {dt * 1e3:.0f} ms  "
          f"({batch / dt:.1f} clips/s)", flush=True)


def check_splash_correctness() -> None:
    """Splash MHA vs dense attention at a small shape (TPU, f32)."""
    import jax
    import jax.numpy as jnp

    from dlsc_tpu.models.vit import _splash_mha

    B, H, N, dh = 2, 4, 300, 64
    ks = jax.random.split(jax.random.key(0), 3)
    q, k, v = (jax.random.normal(kk, (B, H, N, dh), jnp.float32) for kk in ks)

    @jax.jit
    def both(q, k, v):
        sm = dh**-0.5
        out_s = _splash_mha(q, k, v, sm_scale=sm)
        attn = jax.nn.softmax(jnp.einsum("bhqd,bhkd->bhqk", q, k) * sm, axis=-1)
        out_d = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        return out_s, out_d

    out_s, out_d = jax.device_get(both(q, k, v))
    err = np.abs(out_s - out_d).max()
    print(f"[probe] splash correctness: max abs err {err:.2e}", flush=True)
    assert err < 2e-2, err


def main(argv: list[str]) -> None:
    check_splash_correctness()
    import os

    names = argv or list(VARIANTS)
    results = {}
    for name in names:
        if name == "fwd_only":
            run_fwd_probe()
            continue
        batch, kw, *env = VARIANTS[name]
        for key in ("DLSC_SPLASH_BLOCKS", "DLSC_SPLASH_UNFUSED",
                    "DLSC_SPLASH_PAD", "DLSC_RNG_IMPL",
                    "DLSC_ATTN_FAST_PAD", "DLSC_ATTN_FAST_SPLIT",
                    "DLSC_ATTN_BWD", "DLSC_ATTN_BWD_BQ",
                    "DLSC_ATTN_BWD_SPLIT", "DLSC_LN_FUSED",
                    "DLSC_ATTN_EXP2", "DLSC_MOE_GMM_TILE",
                    "DLSC_MOE_BIAS", "DLSC_MOE_GMM"):
            os.environ.pop(key, None)
        for k, v in (env[0] if env else {}).items():
            os.environ[k] = v
        print(f"[probe] building {name} …", flush=True)
        try:
            results[name] = run_variant(name, batch, kw)
        except Exception as e:
            print(f"[probe] {name} FAILED: {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
            traceback.print_exc()
            results[name] = None
    print("\n[probe] summary:")
    for k, v in results.items():
        print(f"  {k}: {v and round(v, 1)} clips/s")


if __name__ == "__main__":
    main(sys.argv[1:])
