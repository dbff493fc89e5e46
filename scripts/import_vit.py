#!/usr/bin/env python
"""Convert a timm/DeiT ViT ``.pth`` checkpoint into a dlsc_tpu pretrained
params artifact (orbax), applying the reference's AST init recipe.

The reference downloads ``deit_base_patch16_384`` at model-construction time
(reference: src/models/ast.py:19 ``timm.create_model(..., pretrained=True)``).
This environment has no network egress, so the conversion is a separate
offline step: once a ``.pth`` file exists on disk, run

    python scripts/import_vit.py --checkpoint deit_base_patch16_384.pth \
        --out pretrained/ast_base [--num-classes 50]

then train with the warm start:

    python scripts/train.py model=ast +pretrained_path=pretrained/ast_base

Handles DeiT release checkpoints ({"model": state_dict} wrappers), DDP
``module.`` prefixes, and distilled variants (distillation token dropped) —
see dlsc_tpu.models.ast.load_torch_vit.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv: list[str] | None = None) -> Path | None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--checkpoint", required=True, help="timm/DeiT .pth file")
    ap.add_argument("--out", required=True, help="output orbax directory")
    ap.add_argument("--num-classes", type=int, default=50)
    ap.add_argument("--emb-dim", type=int, default=768)
    ap.add_argument("--depth", type=int, default=12)
    ap.add_argument("--num-heads", type=int, default=12)
    ap.add_argument("--sample-rate", type=int, default=44_100)
    ap.add_argument(
        "--audit", action="store_true",
        help="validate the checkpoint end-to-end (key/shape/transform audit "
             "report) without writing the orbax artifact — the arrival-day "
             "one-command check for real timm/AudioSet weights, which have "
             "never transited this path in the zero-egress build "
             "environment (PARITY_PROTOCOL.md open risk)")
    args = ap.parse_args(argv)

    # host-side tool: run on CPU, never touch the TPU compile queue
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import torch

    from dlsc_tpu.models.ast import ASTModel, load_torch_vit
    from dlsc_tpu.train.checkpoint import save_params

    raw = torch.load(args.checkpoint, map_location="cpu", weights_only=True)
    # DeiT release files wrap the weights: {"model": state_dict, ...}
    for wrapper in ("model", "state_dict"):
        if isinstance(raw, dict) and wrapper in raw and isinstance(raw[wrapper], dict):
            raw = raw[wrapper]
            break

    model = ASTModel(
        num_classes=args.num_classes, emb_dim=args.emb_dim, depth=args.depth,
        num_heads=args.num_heads, sample_rate=args.sample_rate,
        dtype=jnp.float32,
    )
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.key(0), jnp.zeros((1, 128, 128)), train=False
    )
    audit: dict = {}
    params = load_torch_vit(variables["params"], raw, model, audit=audit)
    if args.audit:
        print(f"== audit: {args.checkpoint} ==")
        print(f"source keys: {audit['n_source_keys']} "
              f"(consumed {len(audit['consumed'])}, "
              f"ignored {len(audit['ignored'])}, "
              f"leftover {len(audit['leftover'])})")
        for note in audit["notes"]:
            print(f"  transform: {note}")
        for key in audit["ignored"]:
            print(f"  ignored (head reinitialized for audio): {key}")
        if audit["leftover"]:
            print(f"  LEFTOVER (would fail strict load): {audit['leftover']}")
        print(f"target: {audit['n_target_leaves']} param leaves, "
              f"{audit['layout']} block layout — every mapped shape checked")
        # numerical smoke: one forward through the converted params must be
        # finite (catches dtype/NaN surprises in the file itself)
        feats = jnp.zeros((1, 128, 128), jnp.float32)
        out_probs = model.apply({"params": params}, feats, train=False)
        finite = bool(jnp.all(jnp.isfinite(out_probs)))
        print(f"forward smoke (zeros input): finite={finite}, "
              f"output shape {tuple(out_probs.shape)}")
        if not finite:
            raise SystemExit("converted params produce non-finite outputs")
        print("AUDIT OK — rerun without --audit to write the artifact")
        return None  # nothing was written — no artifact path to hand back
    out = save_params(
        args.out, params,
        meta={"source": str(args.checkpoint), "num_classes": args.num_classes,
              "emb_dim": args.emb_dim, "depth": args.depth},
    )
    print(f"imported {len(raw)} torch tensors -> {out}")
    return out


if __name__ == "__main__":
    main()
