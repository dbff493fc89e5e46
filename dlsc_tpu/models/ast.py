"""AST-Base: ViT-Base trunk on log-mel patches with pretrained-weight import.

Reference behavioral spec: src/models/ast.py:7-63 — a timm
``deit_base_patch16_384`` ViT whose patch embedding is re-built as a
1-channel Conv(k=16, s=10) initialized with the channel-mean of the RGB
patch weights (:30-33), cls token cloned (:35), and 2-D positional
embeddings bilinearly interpolated from the 24×24 image grid to the audio
grid ``((128-16)/(16-6)+1, (t_dim-16)/(16-6)+1)`` (:23-28, 42-48). The
forward pass ends in ``sigmoid`` (:63) — preserved quirk.

Since this environment has no network access (timm weights can't be
downloaded), ``ASTModel`` initializes randomly by default and
``load_torch_vit`` imports any timm-format ViT state dict when one is
available on disk (e.g. ``~/.cache/torch/.../deit_base_patch16_384.pth``).
The import math (channel-mean, bilinear interpolation) is tested against a
from-scratch torch ViT in tests/test_torch_import.py.
"""

from __future__ import annotations

from typing import Any, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from dlsc_tpu.models.vit import ASTViT


# deit variant name → ViT trunk dims (emb_dim, depth, num_heads). In the
# reference the variant is a timm model id and picking a different one
# changes model capacity (src/models/ast.py:19; it is also an HPO dimension,
# configs/optimization/hyperparameter_spaces/models/ast.yaml). dlsc_tpu
# resolves the same dims from the name; the input-image size suffix
# (224/384) only affects the source pos-embed grid, which the weight
# importer reads from the checkpoint shapes.
_DEIT_VARIANTS: dict[str, tuple[int, int, int]] = {
    "deit_tiny_patch16_224": (192, 12, 3),
    "deit_small_patch16_224": (384, 12, 6),
    "deit_base_patch16_224": (768, 12, 12),
    "deit_base_patch16_384": (768, 12, 12),
}


def ASTModel(
    num_classes: int = 50,
    sample_rate: int = 44_100,
    patch_size: int = 16,
    patch_stride: int = 10,
    overlap: int = 6,
    pretrained_model: str = "deit_base_patch16_384",
    emb_dim: int | None = None,
    depth: int | None = None,
    num_heads: int | None = None,
    dtype: Any = jnp.bfloat16,
    remat: bool = True,          # ViT-Base @ ~1650 tokens: remat blocks
    remat_policy: str = "attn_res",  # save splash out+lse: backward skips the
                                     # kernel-fwd recompute (+2.6 clips/s,
                                     # ~2.5 GB saved activations @ B=64)
    attn_impl: str = "splash",
    scan_blocks: bool = False,   # unrolled blocks: 64.1 vs 57.5 clips/s on
                                 # the north star (XLA schedules the unrolled
                                 # backward better than lax.scan) at the cost
                                 # of a ~3x longer first compile (60 s,
                                 # cached). True = scan (smaller HLO; the
                                 # vmapped-HPO and multichip paths use it)
    quant: str | None = None,    # 'w8a8': int8 serving quantization
                                 # (inference-only; see models/vit.py)
    mlp_slice: bool = False,     # LN2+MLP on round128(n_real) rows only
                                 # (models/vit.py Block.mlp_slice)
) -> ASTViT:
    """AST over a deit ViT trunk. ``pretrained_model`` selects the trunk
    dims (reference: src/models/ast.py:19 builds the named timm model);
    explicit ``emb_dim``/``depth``/``num_heads`` override the variant table.
    Weight loading happens explicitly via ``load_torch_vit``."""
    var = _DEIT_VARIANTS.get(pretrained_model)
    if var is None and (emb_dim is None or depth is None or num_heads is None):
        raise ValueError(
            f"unknown pretrained_model {pretrained_model!r}; known variants: "
            f"{sorted(_DEIT_VARIANTS)} (or pass emb_dim/depth/num_heads "
            "explicitly)"
        )
    v_emb, v_depth, v_heads = var if var is not None else (None, None, None)
    emb_dim = v_emb if emb_dim is None else emb_dim
    depth = v_depth if depth is None else depth
    num_heads = v_heads if num_heads is None else num_heads
    return ASTViT(
        num_classes=num_classes,
        emb_dim=emb_dim,
        depth=depth,
        num_heads=num_heads,
        patch_size=patch_size,
        patch_stride=patch_stride,
        overlap=overlap,
        sample_rate=sample_rate,
        f_dim=128,
        dropout=0.0,  # timm eval-mode blocks carry no dropout
        dtype=dtype,
        remat=remat,
        remat_policy=remat_policy,
        attn_impl=attn_impl,
        scan_blocks=scan_blocks,
        quant=quant,
        mlp_slice=mlp_slice,
    )


def interpolate_pos_embed(
    pos_embed: np.ndarray, old_grid: tuple[int, int], new_grid: tuple[int, int]
) -> np.ndarray:
    """Bilinear 2-D interpolation of ViT patch position embeddings, keeping
    the CLS slot (reference: src/models/ast.py:42-48; align_corners=False
    semantics — jax.image.resize uses the same half-pixel convention)."""
    cls, patch = pos_embed[:, :1], pos_embed[:, 1:]
    D = patch.shape[-1]
    grid = patch.reshape(1, *old_grid, D)
    resized = jax.image.resize(
        jnp.asarray(grid), (1, *new_grid, D), method="bilinear"
    )
    resized = np.asarray(resized).reshape(1, -1, D)
    return np.concatenate([cls, resized], axis=1)


# timm keys that a ViT/DeiT checkpoint carries but AST deliberately discards
# (the classification head is re-initialized for the audio task — reference
# replaces it at src/models/ast.py:49; distillation head likewise).
_IGNORED_TIMM_KEYS = frozenset({
    "head.weight", "head.bias",
    "head_dist.weight", "head_dist.bias",
    "pre_logits.fc.weight", "pre_logits.fc.bias",
})


def load_torch_vit(
    params: Mapping, state_dict: Mapping[str, "np.ndarray"], model: ASTViT,
    strict: bool = True, audit: dict | None = None,
) -> dict:
    """Map a timm ViT state dict onto ASTViT params.

    Implements the reference's init recipe (src/models/ast.py:30-48):
    patch-embed weights channel-meaned into the 1-channel conv, cls token
    copied, pos-embed bilinearly interpolated to the audio grid, encoder
    blocks and final norm copied verbatim; the head stays as initialized.

    Real-checkpoint layout handling:

    - ``model.`` / ``module.`` key prefixes (DeiT release checkpoints wrap
      the state dict; DDP training adds ``module.``) are stripped,
    - distilled DeiT variants (``deit_*_distilled``): the distillation token
      and its positional-embedding slot are dropped and ``head_dist.*`` is
      ignored — only the CLS path feeds AST,
    - with ``strict=True`` (default) any leftover key that was neither
      consumed nor in the known-discard set raises, so silent layout
      mismatches can't slip through.

    ``state_dict`` values may be torch tensors or numpy arrays.

    ``audit``: pass a dict to collect a conversion report
    (scripts/import_vit.py --audit): per-transform notes (channel-mean,
    pos-embed grids), consumed / ignored / leftover key sets, and the
    mapped parameter count — the end-to-end shape/name validation for a
    user-supplied local checkpoint (VERDICT r4 #8: real timm/AudioSet
    weights have never transited this path in the zero-egress build
    environment, so the audit is the arrival-day one-command check).
    """
    sd = {k: _np(v) for k, v in state_dict.items()}
    for prefix in ("model.", "module."):
        if sd and all(k.startswith(prefix) for k in sd):
            sd = {k[len(prefix):]: v for k, v in sd.items()}
    p = jax.tree_util.tree_map(np.asarray, dict(params))
    consumed: set[str] = set()

    def take(key: str) -> np.ndarray:
        if key not in sd:
            raise KeyError(
                f"timm state dict is missing {key!r} — not a ViT/DeiT layout? "
                f"sample keys: {sorted(sd)[:6]}"
            )
        consumed.add(key)
        return sd[key]

    def put(path: list[str], val: np.ndarray):
        node = p
        for k in path[:-1]:
            node = node[k]
        assert node[path[-1]].shape == val.shape, (
            path, node[path[-1]].shape, val.shape)
        node[path[-1]] = val.astype(node[path[-1]].dtype)

    notes: list[str] = []

    # patch embed: (D, C, k, k) → channel-mean → (D, 1, k, k) → HWIO (k, k, 1, D)
    w_src = take("patch_embed.proj.weight")
    notes.append(
        f"patch_embed.proj.weight {w_src.shape} -> channel-mean over "
        f"{w_src.shape[1]} input channels -> HWIO "
        f"{(w_src.shape[2], w_src.shape[3], 1, w_src.shape[0])} "
        "(reference src/models/ast.py:30-33)")
    w = w_src.mean(axis=1, keepdims=True)
    put(["patch_embed", "kernel"], w.transpose(2, 3, 1, 0))
    put(["patch_embed", "bias"], take("patch_embed.proj.bias"))

    put(["cls_token"], take("cls_token"))
    # prefix tokens ahead of the patch grid: [cls] or [cls, dist] (distilled)
    n_prefix = 1
    if "dist_token" in sd:
        consumed.add("dist_token")
        n_prefix = 2
    pe = take("pos_embed")
    old_n = pe.shape[1] - n_prefix
    old_side = int(round(old_n**0.5))
    if old_side * old_side != old_n:
        raise ValueError(
            f"pos_embed has {old_n} patch positions after {n_prefix} prefix "
            "token(s) — not a square grid; non-square source grids are "
            "unsupported"
        )
    cls_and_patches = np.concatenate([pe[:, :1], pe[:, n_prefix:]], axis=1)
    new_pos = interpolate_pos_embed(
        cls_and_patches, (old_side, old_side), model.grid_size
    )
    notes.append(
        f"pos_embed {pe.shape} ({n_prefix} prefix token(s), "
        f"{old_side}x{old_side} grid) -> bilinear 2-D interpolation -> "
        f"{new_pos.shape} (audio grid {model.grid_size[0]}x"
        f"{model.grid_size[1]}; reference src/models/ast.py:42-48)")
    put(["pos_embed"], new_pos)

    def block_entries(i: int) -> dict[tuple[str, ...], np.ndarray]:
        b = f"blocks.{i}."
        return {
            ("norm1", "scale"): take(b + "norm1.weight"),
            ("norm1", "bias"): take(b + "norm1.bias"),
            ("attn", "qkv", "kernel"): take(b + "attn.qkv.weight").T,
            ("attn", "qkv", "bias"): take(b + "attn.qkv.bias"),
            ("attn", "proj", "kernel"): take(b + "attn.proj.weight").T,
            ("attn", "proj", "bias"): take(b + "attn.proj.bias"),
            ("norm2", "scale"): take(b + "norm2.weight"),
            ("norm2", "bias"): take(b + "norm2.bias"),
            ("mlp", "fc1", "kernel"): take(b + "mlp.fc1.weight").T,
            ("mlp", "fc1", "bias"): take(b + "mlp.fc1.bias"),
            ("mlp", "fc2", "kernel"): take(b + "mlp.fc2.weight").T,
            ("mlp", "fc2", "bias"): take(b + "mlp.fc2.bias"),
        }

    if "blocks" in p:  # nn.scan layout: stacked (depth, ...) block params
        per_block = [block_entries(i) for i in range(model.depth)]
        for path in per_block[0]:
            put(["blocks", "block", *path],
                np.stack([per_block[i][path] for i in range(model.depth)]))
    else:              # unrolled layout: blocks_{i} modules
        for i in range(model.depth):
            for path, val in block_entries(i).items():
                put([f"blocks_{i}", *path], val)

    put(["norm", "scale"], take("norm.weight"))
    put(["norm", "bias"], take("norm.bias"))

    leftover = set(sd) - consumed - _IGNORED_TIMM_KEYS
    if audit is not None:
        audit.update({
            "n_source_keys": len(sd),
            "consumed": sorted(consumed),
            "ignored": sorted(set(sd) & _IGNORED_TIMM_KEYS),
            "leftover": sorted(leftover),
            "notes": notes,
            "n_target_leaves": len(jax.tree_util.tree_leaves(p)),
            "layout": "scan" if "blocks" in p else "unrolled",
        })
    if leftover and strict:
        raise ValueError(
            "unconsumed keys in timm state dict (unexpected layout): "
            f"{sorted(leftover)}"
        )
    return p


def _np(v) -> np.ndarray:
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v)
