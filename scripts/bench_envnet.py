#!/usr/bin/env python
"""EnvNet-v2 / LEAF train-step probe on the real TPU.

Round-1 measured EnvNet at 293 clips/s/chip fp32 (109 ms @ b32) — roughly
28% of the fp32-decomposed MXU rate. The reference's guidance is "fp32
(fp16 NaNs)" (configs/base_training.yaml:19-24), but that is a float16
exponent-range problem; bf16 keeps f32's exponent, so a bf16-mixed EnvNet
is numerically plausible and potentially ~2-3x. This probe measures both
precisions (+ larger batches) and prints loss curves over a few steps so
instability would be visible.

    python scripts/bench_envnet.py [variant ...]
"""

from __future__ import annotations

import sys
import time
import traceback
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

VARIANTS = {
    # name: (model, batch, dtype[, model kwargs])
    "envnet_fp32_b32": ("envnet", 32, "float32"),
    "envnet_bf16_b32": ("envnet", 32, "bfloat16"),
    "envnet_fp32_b64": ("envnet", 64, "float32"),
    "envnet_bf16_b64": ("envnet", 64, "bfloat16"),
    "envnet_bf16_b128": ("envnet", 128, "bfloat16"),
    "envnet_fp32_b128": ("envnet", 128, "float32"),
    "envnet_bf16_b256": ("envnet", 256, "bfloat16"),
    "envnet_bf16_b512": ("envnet", 512, "bfloat16"),
    "leaf_fp32_b32": ("leaf", 32, "float32"),
    "leaf_bf16_b32": ("leaf", 32, "bfloat16"),
    "leaf_bf16_b64": ("leaf", 64, "bfloat16"),
    "leaf_bf16_b128": ("leaf", 128, "bfloat16"),
    "cnn_fp32_b128": ("cnn", 128, "float32"),
    "cnn_bf16_b128": ("cnn", 128, "bfloat16"),
    "cnn_bf16_b256": ("cnn", 256, "bfloat16"),
    # pool backward A/B (VERDICT r3 #8): argmax-capture custom-vjp pools
    # (the new default, ops/pool.py) vs XLA reduce-window/select-and-scatter
    "envnet_xlapool_fp32_b32": ("envnet", 32, "float32",
                                {"pool_impl": "xla"}),
    "envnet_xlapool_bf16_b32": ("envnet", 32, "bfloat16",
                                {"pool_impl": "xla"}),
    "envnet_xlapool_bf16_b64": ("envnet", 64, "bfloat16",
                                {"pool_impl": "xla"}),
}


def run_variant(name: str, which: str, batch: int, dtype_name: str,
                model_kw: dict | None = None, n_iters: int = 10) -> float | None:
    import jax
    import jax.numpy as jnp

    from dlsc_tpu.data.pipeline import DevicePipeline, PipelineConfig
    from dlsc_tpu.train.losses import CrossEntropyLoss, KLDivLoss
    from dlsc_tpu.train.metrics import MetricState
    from dlsc_tpu.train.optim import adam, build_optimizer, cosine_annealing
    from dlsc_tpu.train.state import TrainState
    from dlsc_tpu.train.steps import make_train_step

    dtype = jnp.dtype(dtype_name)
    if which == "envnet":
        from dlsc_tpu.models.envnet_v2 import EnvNetV2

        model = EnvNetV2(num_classes=50, dtype=dtype, **(model_kw or {}))
        bc = True
    elif which == "cnn":
        from dlsc_tpu.models.cnn_esc50 import CNN_ESC50

        model = CNN_ESC50(num_classes=50, dtype=dtype)
        bc = False
    else:
        from dlsc_tpu.models.leaf import LeafModel

        # match the shipped config (configs/model/leaf.yaml): 128 filters,
        # no BC mixing
        model = LeafModel(num_classes=50, n_filters=128, dtype=dtype)
        bc = False

    pipe = DevicePipeline(PipelineConfig(
        mode="cnn_esc50" if which == "cnn" else "envnet_v2", num_classes=50,
        enable_bc_mixing=bc, window_length=5.0, padding_ratio=0.5,
    ))
    rng = np.random.default_rng(0)
    wave = jnp.asarray(rng.standard_normal((batch, 220_500)).astype(np.float32) * 0.3)
    labels = jnp.asarray(rng.integers(0, 50, batch).astype(np.int32))
    feats, _ = jax.jit(pipe.train_batch)(wave[:2], labels[:2], jax.random.key(0))
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        feats, train=False,
    )
    tx, _ = build_optimizer(adam(lr=1e-4, weight_decay=1e-4),
                            cosine_annealing(T_max=100), 25, 1.0)
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        batch_stats=variables.get("batch_stats"), tx=tx, rng=jax.random.key(0),
    )
    ms = MetricState.create(50)
    crit = KLDivLoss() if bc else CrossEntropyLoss()
    step = jax.jit(make_train_step(pipe, crit), donate_argnums=(0, 1))
    t_c = time.time()
    state, ms, loss = step(state, ms, wave, labels)
    l0 = float(jax.device_get(loss))
    compile_s = time.time() - t_c
    state, ms, loss = step(state, ms, wave, labels)
    jax.device_get(loss)
    t0 = time.time()
    for _ in range(n_iters):
        state, ms, loss = step(state, ms, wave, labels)
    lN = float(jax.device_get(loss))
    dt = (time.time() - t0) / n_iters
    clips = batch / dt
    print(f"[env] {name}: {dt * 1e3:.0f} ms/step  {clips:.1f} clips/s "
          f"(batch {batch}, compile {compile_s:.0f}s, "
          f"loss {l0:.3f}->{lN:.3f} finite={np.isfinite(lN)})", flush=True)
    return clips


def main(argv: list[str]) -> None:
    names = argv or list(VARIANTS)
    results = {}
    for name in names:
        which, batch, dt, *kw = VARIANTS[name]
        print(f"[env] building {name} ...", flush=True)
        try:
            results[name] = run_variant(name, which, batch, dt,
                                        kw[0] if kw else None)
        except Exception as e:
            print(f"[env] {name} FAILED: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
            traceback.print_exc()
            results[name] = None
    print("\n[env] summary:")
    for k, v in results.items():
        print(f"  {k}: {v and round(v, 1)} clips/s")


if __name__ == "__main__":
    main(sys.argv[1:])
