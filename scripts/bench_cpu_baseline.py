#!/usr/bin/env python
"""One-time CPU baseline measurement for bench.py's vs_baseline ratio.

Runs the same AST-Base train step (pure-JAX mel path) on the JAX CPU backend
and prints clips/sec. The measured value is recorded as
``CPU_CLIPS_PER_SEC`` in bench.py (BASELINE.json target: TPU >= 20x CPU).
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main(batch: int = 2, iters: int = 3) -> float:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from dlsc_tpu.data.pipeline import DevicePipeline, PipelineConfig
    from dlsc_tpu.models import ASTModel
    from dlsc_tpu.train.losses import CrossEntropyLoss
    from dlsc_tpu.train.metrics import MetricState
    from dlsc_tpu.train.optim import adam, build_optimizer
    from dlsc_tpu.train.state import TrainState
    from dlsc_tpu.train.steps import make_train_step

    assert jax.default_backend() == "cpu", jax.default_backend()
    pipe = DevicePipeline(PipelineConfig(
        mode="ast", num_classes=50, enable_mixup=True, time_mask=192, freq_mask=48,
    ))
    model = ASTModel(num_classes=50)
    rng = np.random.default_rng(0)
    wave = jnp.asarray(rng.standard_normal((batch, 220_500)).astype(np.float32) * 0.3)
    labels = jnp.asarray(rng.integers(0, 50, batch).astype(np.int32))
    feats, _ = jax.jit(pipe.train_batch)(wave, labels, jax.random.key(0))
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)}, feats, train=False,
    )
    tx, _ = build_optimizer(adam(lr=5e-4), None, 25, 1.0)
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        batch_stats=variables.get("batch_stats"), tx=tx, rng=jax.random.key(0),
    )
    ms = MetricState.create(50)
    step = jax.jit(make_train_step(pipe, CrossEntropyLoss()), donate_argnums=(0, 1))
    state, ms, _ = step(state, ms, wave, labels)  # compile + warmup
    import jax as _j

    _j.block_until_ready(state.params)
    t0 = time.time()
    for _ in range(iters):
        state, ms, loss = step(state, ms, wave, labels)
    _j.block_until_ready(loss)
    dt = time.time() - t0
    cps = batch * iters / dt
    print(f"CPU AST-Base train step: {dt/iters:.2f} s/step @ batch {batch} "
          f"-> {cps:.4f} clips/sec")
    return cps


if __name__ == "__main__":
    main()
