#!/usr/bin/env python
"""Export a model as a self-contained serving artifact (StableHLO + vars).

Usage:
    python scripts/export.py model=ast_mini +out=exports/ast_mini \
        [+ckpt_path=outputs/.../checkpoints/epoch-...] \
        [+batch=8] [+clip_samples=220500] [+platforms=[cpu,tpu]]

Packages the compiled inference path (eval pipeline + forward + softmax;
dlsc_tpu.serving.make_infer) via jax.export, plus the model variables and a
manifest, into ``out``. Without ``+ckpt_path`` the export uses randomly
initialized weights (a smoke artifact — the printed warning says so).
Deployment needs only ``dlsc_tpu.serving.load_exported`` (no model code):

    serve = dlsc_tpu.serving.load_exported("exports/ast_mini")
    probs = serve(wave)  # (batch, clip_samples) f32 → (batch, C)

reference: none (the reference ships no serving/export story).
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import scripts.train as train_script
from dlsc_tpu.config import compose
from dlsc_tpu.serving import export_model
from dlsc_tpu.train import Trainer, build_from_cfg


def main(argv: list[str] | None = None) -> Path:
    config_path, config_name, overrides = train_script.parse_cli(
        list(argv if argv is not None else sys.argv[1:])
    )
    cfg = compose(config_path, config_name, overrides)
    out = cfg.select("out", default=None)
    if not out:
        raise SystemExit("pass +out=<artifact dir>")
    ckpt = cfg.select("ckpt_path", default=None)
    batch = int(cfg.select("batch", default=8))
    clip_samples = int(cfg.select(
        "clip_samples",
        default=int(cfg.select("dataset.sample_rate", default=44_100) * 5),
    ))
    platforms = cfg.select("platforms", default=None)
    if platforms is not None:
        platforms = tuple(platforms)

    datamodule = train_script.build_datamodule(cfg)
    built = build_from_cfg(cfg)
    pipe = datamodule.pipeline

    import jax
    import jax.numpy as jnp

    model = built["model"]
    wave = jnp.zeros((2, clip_samples), jnp.float32)
    feats, _ = jax.jit(pipe.eval_batch)(wave, jnp.zeros((2,), jnp.int32))
    if feats.ndim == 3 and pipe.cfg.mode == "envnet_v2":
        feats = feats[:, 0]
    if ckpt:
        # init happens inside init_state; a second model.init here would pay
        # a duplicate (minutes-long on the remote helper) compile for nothing
        trainer = Trainer(**cfg.trainer.to_dict(), enable_checkpointing=False)
        state = trainer.init_state(model, datamodule, built["optim_spec"],
                                   built["sched_spec"])
        from dlsc_tpu.train.checkpoint import restore_state

        state = restore_state(ckpt, state)
        variables = {"params": state.params}
        if state.batch_stats is not None:
            variables["batch_stats"] = state.batch_stats
    else:
        print("WARNING: exporting randomly initialized weights "
              "(no +ckpt_path given) — smoke artifact only")
        variables = jax.jit(model.init, static_argnames=("train",))(
            {"params": jax.random.key(0), "dropout": jax.random.key(1)},
            feats, train=False,
        )

    quant = cfg.select("quant", default=None)
    if quant:
        # int8 w8a8 serving quantization (ViT family; ops/quant.py): rebuild
        # the model in quant mode (remat off — forward-only) and materialize
        # the int8 collection from the (restored) params.
        import dataclasses

        from dlsc_tpu.ops.quant import materialize

        if not hasattr(model, "quant"):
            raise SystemExit(
                f"+quant={quant} is only supported by the ViT family "
                f"(ast/ast_small/ast_mini), not {type(model).__name__}")
        replace = {"quant": str(quant)}
        if hasattr(model, "remat"):
            replace["remat"] = False
        model = dataclasses.replace(model, **replace)
        variables = jax.jit(
            lambda v, f: materialize(model, v, f))(variables, feats)

    model_name = cfg.select("model._target_", default="model")
    path = export_model(
        model, pipe, variables, out, batch=batch, clip_samples=clip_samples,
        platforms=platforms,
        meta={"model": str(model_name), "ckpt_path": str(ckpt or ""),
              "sample_rate": int(cfg.select("dataset.sample_rate",
                                            default=44_100)),
              **({"quant": str(quant)} if quant else {})},
    )
    print(f"exported serving artifact: {path}")
    return path


if __name__ == "__main__":
    main()
