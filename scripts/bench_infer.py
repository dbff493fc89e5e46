#!/usr/bin/env python
"""Serving/inference benchmark: eval-path latency + throughput on the TPU.

Measures the full serving path per batch — PCM float waveform → eval
pipeline (log-mel + renorm / pad + center-crop / mel image; no
augmentation, data/pipeline.py eval_batch) → model forward (train=False) →
softmax → host readback of the probabilities — i.e. exactly what
scripts/predict.py executes per request. The reference has no inference
benchmark (it has no benchmarks at all, SURVEY.md §6); this harness
provides the serving numbers for BASELINE.md. Prints one JSON line per
variant.

    python scripts/bench_infer.py [variant ...]   # default: the full matrix

Run ONE instance at a time (serial remote compile queue).
"""

from __future__ import annotations

import json
import sys
import time
import traceback
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

CLIP = 220_500  # 5 s @ 44.1 kHz

VARIANTS = {
    # name: (model, batch, dtype, pipeline kwargs[, quant])
    "ast_b1": ("ast", 1, "bfloat16", {}),
    "ast_b8": ("ast", 8, "bfloat16", {}),
    "ast_b64": ("ast", 64, "bfloat16", {}),
    "ast_small_b1": ("ast_small", 1, "bfloat16", {}),
    "ast_small_b8": ("ast_small", 8, "bfloat16", {}),
    "ast_small_b64": ("ast_small", 64, "bfloat16", {}),
    "ast_mini_b64": ("ast_mini", 64, "bfloat16", {}),
    # round-5 big-batch serving rows (inference holds no backward
    # activations — batch can scale past the training limits)
    "ast_b128": ("ast", 128, "bfloat16", {}),
    "ast_small_b128": ("ast_small", 128, "bfloat16", {}),
    "ast_mini_b128": ("ast_mini", 128, "bfloat16", {}),
    "ast_moe_b64": ("ast_moe", 64, "bfloat16", {}),
    "envnet_b128": ("envnet_v2", 128, "float32", {}),
    "cnn_b256": ("cnn_esc50", 256, "float32", {}),
    "ast_moe_b32": ("ast_moe", 32, "bfloat16", {}),
    # int8 w8a8 serving quantization (ops/quant.py)
    "ast_int8_b1": ("ast", 1, "bfloat16", {}, "w8a8"),
    "ast_int8_b64": ("ast", 64, "bfloat16", {}, "w8a8"),
    "ast_small_int8_b64": ("ast_small", 64, "bfloat16", {}, "w8a8"),
    "ast_mini_int8_b64": ("ast_mini", 64, "bfloat16", {}, "w8a8"),
    # weight-only int8 (bf16 activations, no act-quant epilogues — VERDICT
    # r3 #4; ops/quant.py w8_dot)
    "ast_w8_b1": ("ast", 1, "bfloat16", {}, "w8"),
    "ast_w8_b8": ("ast", 8, "bfloat16", {}, "w8"),
    "ast_w8_b64": ("ast", 64, "bfloat16", {}, "w8"),
    "ast_small_w8_b1": ("ast_small", 1, "bfloat16", {}, "w8"),
    "ast_small_w8_b8": ("ast_small", 8, "bfloat16", {}, "w8"),
    "ast_small_w8_b64": ("ast_small", 64, "bfloat16", {}, "w8"),
    "envnet_b64": ("envnet_v2", 64, "float32", {}),
    # the reference's 10-crop test-time protocol (preprocessing.py:857-884)
    "envnet_10crop_b16": ("envnet_v2", 16, "float32",
                          {"multi_crop_test": True}),
    "cnn_b64": ("cnn_esc50", 64, "float32", {}),
    "leaf_b32": ("leaf", 32, "float32", {}),
}


def build(which: str, dtype, pipe_kwargs: dict, quant: str | None = None):
    from dlsc_tpu.models import (
        ASTMiniViT, ASTModel, ASTViTSmall, CNN_ESC50, EnvNetV2, LeafModel,
    )

    # serving is forward-only: remat off for the ViT family (irrelevant to
    # inference, and the int8 'quant' collection initializes outside remat)
    if which == "ast":
        return ASTModel(num_classes=50, dtype=dtype, remat=False,
                        quant=quant), "ast"
    if which == "ast_small":
        return ASTViTSmall(num_classes=50, dtype=dtype, remat=False,
                           quant=quant), "ast"
    if which == "ast_mini":
        return ASTMiniViT(num_classes=50, dtype=dtype, quant=quant), "ast"
    if which == "ast_moe":
        from dlsc_tpu.models import ASTMoE

        return ASTMoE(num_classes=50, dtype=dtype, remat=False), "ast"
    if which == "envnet_v2":
        return EnvNetV2(num_classes=50, dtype=dtype), "envnet_v2"
    if which == "cnn_esc50":
        return CNN_ESC50(num_classes=50, dtype=dtype), "cnn_esc50"
    if which == "leaf":
        return LeafModel(num_classes=50, n_filters=128, dtype=dtype), "envnet_v2"
    raise ValueError(which)


def run_variant(name: str, which: str, batch: int, dtype_name: str,
                pipe_kwargs: dict, quant: str | None = None,
                n_iters: int = 20) -> dict | None:
    import jax
    import jax.numpy as jnp

    from dlsc_tpu.data.pipeline import DevicePipeline, PipelineConfig

    dtype = jnp.dtype(dtype_name)
    model, mode = build(which, dtype, pipe_kwargs, quant)
    pipe = DevicePipeline(PipelineConfig(
        mode=mode, num_classes=50, window_length=5.0, padding_ratio=0.5,
        **pipe_kwargs,
    ))
    rng = np.random.default_rng(0)
    wave = jnp.asarray(rng.standard_normal((batch, CLIP)).astype(np.float32) * 0.3)
    zeros = jnp.zeros((batch,), jnp.int32)

    feats, _ = jax.jit(pipe.eval_batch)(wave[:1], zeros[:1])
    if feats.ndim == 3 and mode == "envnet_v2":
        feats = feats[:, 0]  # multi-crop: init on one crop
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        feats, train=False,
    )
    if quant:
        from dlsc_tpu.ops.quant import materialize

        variables = jax.jit(
            lambda v, f: materialize(model, v, f)
        )(variables, feats)

    from dlsc_tpu.serving import make_infer

    infer = jax.jit(make_infer(model, pipe))

    probs = jax.device_get(infer(variables, wave))  # compile + warmup
    probs = jax.device_get(infer(variables, wave))
    assert np.isfinite(probs).all()
    t0 = time.time()
    for _ in range(n_iters):
        probs = jax.device_get(infer(variables, wave))
    dt = time.time() - t0
    ms = dt / n_iters * 1e3

    # True on-device latency (VERDICT r4 #6): the measured latency above
    # includes the axon relay's dispatch + host-readback floor (~29-31 ms at
    # batch 1 for EVERY model — BASELINE.md round 4). Amortize it away with a
    # K-chained forward: each iteration's input is perturbed by the previous
    # iteration's output, so XLA can neither CSE nor overlap the K serving
    # passes; the incremental cost of one more pass is the pure device time.
    #     device_ms = (t_chain − t_single) / (K − 1)
    K = 9
    raw_infer = make_infer(model, pipe)

    @jax.jit
    def infer_chain(variables, wave):
        def body(_, acc):
            p = raw_infer(variables, wave + acc)
            return jnp.sum(p).astype(jnp.float32) * 1e-7
        return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))

    device_ms = None
    try:
        out = jax.device_get(infer_chain(variables, wave))  # compile+warmup
        out = jax.device_get(infer_chain(variables, wave))
        t0 = time.time()
        for _ in range(n_iters):
            out = jax.device_get(infer_chain(variables, wave))
        ms_chain = (time.time() - t0) / n_iters * 1e3
        device_ms = max((ms_chain - ms) / (K - 1), 0.0)
    except Exception:  # best-effort: never fail the relay-path numbers
        traceback.print_exc()

    result = {
        "variant": name,
        "batch": batch,
        "dtype": dtype_name,
        "latency_ms": round(ms, 2),
        "clips_per_sec": round(batch * n_iters / dt, 1),
    }
    if device_ms is not None:
        result["device_ms"] = round(device_ms, 2)
        result["device_clips_per_sec"] = round(batch / device_ms * 1e3, 1)
        result["relay_overhead_ms"] = round(ms - device_ms, 2)
    print(json.dumps(result), flush=True)
    return result


def run_agreement(which: str, batch: int = 64, n_batches: int = 4,
                  quant: str = "w8a8") -> dict:
    """int8-vs-bf16 accuracy delta on a synthetic eval set (VERDICT r2 #4).

    Same params, same eval batches: the quantized path's (``quant``:
    'w8a8' or 'w8') softmax probabilities and top-1 decisions are compared
    against the bf16 reference forward. Reports top-1 agreement rate,
    mean/max |Δp| over the prob simplex, and mean |Δ| of the top-1
    probability — the serving-relevant deltas.
    """
    import jax
    import jax.numpy as jnp

    from dlsc_tpu.data.pipeline import DevicePipeline, PipelineConfig
    from dlsc_tpu.ops.quant import materialize
    from dlsc_tpu.serving import make_infer

    dtype = jnp.bfloat16
    model_bf16, mode = build(which, dtype, {}, None)
    model_int8, _ = build(which, dtype, {}, quant)
    pipe = DevicePipeline(PipelineConfig(
        mode=mode, num_classes=50, window_length=5.0, padding_ratio=0.5))
    rng = np.random.default_rng(0)
    wave0 = jnp.asarray(
        rng.standard_normal((1, CLIP)).astype(np.float32) * 0.3)
    feats, _ = jax.jit(pipe.eval_batch)(wave0, jnp.zeros((1,), jnp.int32))
    variables = jax.jit(model_bf16.init, static_argnames=("train",))(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        feats, train=False)
    qvars = jax.jit(lambda v, f: materialize(model_int8, v, f))(
        variables, feats)
    infer_bf16 = jax.jit(make_infer(model_bf16, pipe))
    infer_int8 = jax.jit(make_infer(model_int8, pipe))

    agree = n = 0
    dps, dtop = [], []
    for b in range(n_batches):
        wave = jnp.asarray(
            rng.standard_normal((batch, CLIP)).astype(np.float32) * 0.3)
        p_ref = np.asarray(jax.device_get(infer_bf16(variables, wave)),
                           np.float32)
        p_q = np.asarray(jax.device_get(infer_int8(qvars, wave)), np.float32)
        agree += int((p_ref.argmax(-1) == p_q.argmax(-1)).sum())
        n += batch
        dps.append(np.abs(p_ref - p_q))
        dtop.append(np.abs(p_ref.max(-1) - p_q.max(-1)))
    result = {
        "variant": f"{which}_{quant}_agreement",
        "clips": n,
        "top1_agreement": round(agree / n, 4),
        "mean_abs_dprob": round(float(np.mean(np.concatenate(dps))), 6),
        "max_abs_dprob": round(float(np.max(np.concatenate(dps))), 5),
        "mean_abs_dtop1prob": round(float(np.mean(np.concatenate(dtop))), 5),
    }
    print(json.dumps(result), flush=True)
    return result


def main(argv: list[str]) -> None:
    if argv and argv[0] in ("agree", "agree_w8"):
        quant = "w8" if argv[0] == "agree_w8" else "w8a8"
        for which in argv[1:] or ["ast", "ast_small"]:
            try:
                run_agreement(which, quant=quant)
            except Exception:
                print(f"[agree {which}] FAILED", flush=True)
                traceback.print_exc()
        return
    names = argv or list(VARIANTS)
    for name in names:
        try:
            run_variant(name, *VARIANTS[name])
        except Exception:
            print(f"[{name}] FAILED", flush=True)
            traceback.print_exc()


if __name__ == "__main__":
    main(sys.argv[1:])
