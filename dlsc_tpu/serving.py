"""Serving export: compile the inference path once, deploy it anywhere.

``jax.export`` serializes the jitted serving function — eval pipeline
(log-mel / pad+crop, no augmentation) + forward (train=False) + softmax —
as versioned StableHLO with the target platform(s) baked in. The artifact
directory holds that blob, an orbax checkpoint of the variables, and a JSON
manifest; a deployment process needs only this module (no model classes,
no configs) to serve:

    serve = load_exported("exports/ast_mini")
    probs = serve(wave)            # (B, clip_samples) f32 → (B, C) probs

TPU-native story: the exported program embeds the fused Pallas mel kernel
and attention kernels exactly as compiled for serving, and the artifact is
reproducible/versioned (StableHLO serialization survives jax upgrades per
its compatibility guarantees).

reference: none — the reference has no inference/serving path beyond
rerunning training code (SURVEY.md §2.5: evaluate.py is an empty file);
`scripts/predict.py` covers the interactive entry, this module the
deployment one.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Callable

import numpy as np


def make_infer(model, pipe) -> Callable:
    """The serving function: ``infer(variables, wave) -> probs``.

    Mirrors the eval path of train/steps.py exactly: eval pipeline, forward
    with train=False, the reference's 10-crop mean when the pipeline is
    configured for it (preprocessing.py:857-884), softmax probabilities.
    """
    import jax
    import jax.numpy as jnp

    def infer(variables, wave):
        labels = jnp.zeros((wave.shape[0],), jnp.int32)
        inputs, _ = pipe.eval_batch(wave, labels)
        if inputs.ndim == 3 and pipe.cfg.mode == "envnet_v2":
            B, n_crops, W = inputs.shape
            out = model.apply(variables, inputs.reshape(B * n_crops, W),
                              train=False)
            out = out.reshape(B, n_crops, -1).mean(axis=1)
        else:
            out = model.apply(variables, inputs, train=False)
        return jax.nn.softmax(out, axis=-1)

    return infer


def export_model(
    model,
    pipe,
    variables: Any,
    out_dir: str | Path,
    *,
    batch: int = 8,
    clip_samples: int = 220_500,
    platforms: tuple[str, ...] | None = None,
    mesh=None,
    meta: dict | None = None,
) -> Path:
    """Export ``make_infer(model, pipe)`` as a self-contained artifact dir.

    ``platforms``: lowering targets (default: the current backend). Pass
    ``("cpu", "tpu")`` for a single artifact servable on both.

    ``mesh``: optional ``jax.sharding.Mesh`` with a 'data' axis — the
    exported program is then a multi-chip SPMD serving step (variables
    replicated, batch sharded over 'data'); loading requires the same
    device count. ``batch`` must divide the 'data' axis size.
    """
    import jax
    import jax.numpy as jnp
    import orbax.checkpoint as ocp
    from jax import export as jexport

    out_dir = Path(out_dir).absolute()
    out_dir.mkdir(parents=True, exist_ok=True)
    platforms = tuple(platforms or (jax.default_backend(),))

    host_vars = jax.tree_util.tree_map(
        lambda x: np.asarray(jax.device_get(x)), variables
    )
    infer = make_infer(model, pipe)
    var_spec = jax.tree_util.tree_map(
        lambda p: jax.ShapeDtypeStruct(p.shape, p.dtype), host_vars
    )
    wave_spec = jax.ShapeDtypeStruct((batch, clip_samples), jnp.float32)
    mesh_shape = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        if batch % int(mesh.shape["data"]):
            raise ValueError(
                f"batch {batch} not divisible by mesh data axis "
                f"{int(mesh.shape['data'])}"
            )
        rep = NamedSharding(mesh, P())
        bat = NamedSharding(mesh, P("data"))
        fn = jax.jit(
            infer,
            in_shardings=(jax.tree_util.tree_map(lambda _: rep, var_spec), bat),
            out_shardings=bat,
        )
        mesh_shape = dict(mesh.shape)
    else:
        fn = jax.jit(infer)
    exp = jexport.export(fn, platforms=platforms)(var_spec, wave_spec)
    (out_dir / "serving.stablehlo").write_bytes(exp.serialize())

    vpath = out_dir / "variables"
    if vpath.exists():
        import shutil

        shutil.rmtree(vpath)
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(vpath, host_vars)
    ckpt.wait_until_finished()

    manifest = {
        "batch": batch,
        "clip_samples": clip_samples,
        "platforms": list(platforms),
        "num_classes": int(pipe.cfg.num_classes),
        "pipeline_mode": pipe.cfg.mode,
        "mesh": mesh_shape,  # None = single-device program
        **(meta or {}),
    }
    (out_dir / "manifest.json").write_text(json.dumps(manifest, indent=1))
    return out_dir


def load_exported(art_dir: str | Path) -> Callable:
    """Load an artifact dir into a ready-to-call ``serve(wave) -> probs``.

    The variables are bound at load time; the call is jitted so repeated
    requests reuse the compiled executable. ``serve.manifest`` carries the
    export metadata (expected batch / clip_samples / platforms).
    """
    import jax
    from jax import export as jexport

    art_dir = Path(art_dir).absolute()
    manifest = json.loads((art_dir / "manifest.json").read_text())
    exp = jexport.deserialize((art_dir / "serving.stablehlo").read_bytes())
    import orbax.checkpoint as ocp

    variables = ocp.StandardCheckpointer().restore(art_dir / "variables")
    # Upload the weights ONCE at load time (orbax restores host numpy arrays;
    # leaving them in the closure would re-transfer the whole tree on every
    # request). Per-leaf device_put — no leaf is near the axon single-transfer
    # cliff. For a mesh-exported program, replicate over the same mesh shape.
    if manifest.get("mesh"):
        from jax.sharding import NamedSharding, PartitionSpec as P

        shape = manifest["mesh"]
        mesh = jax.make_mesh(tuple(shape.values()), tuple(shape.keys()))
        variables = jax.device_put(variables, NamedSharding(mesh, P()))
    else:
        variables = jax.device_put(variables)

    call = jax.jit(exp.call)

    def serve(wave):
        return call(variables, wave)

    serve.manifest = manifest
    return serve
