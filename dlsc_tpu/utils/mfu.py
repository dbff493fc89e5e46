"""Model-FLOPs-utilization accounting for the ViT train step.

Two numbers, so the gap between them is visible (VERDICT r3 #2):

- **useful MFU** — model matmul/conv FLOPs at the *real* token count
  (no pad rows, no remat recompute), with the standard fwd+bwd multipliers
  (parameter matmuls ×3: fwd + dW + dx; attention score/context matmuls
  ×3.5: 2 fwd + 5 bwd), divided by step time × chip peak. This is the
  number a user's loss curve actually pays for.
- **hardware utilization** — the FLOPs the chip is *scheduled* to run:
  padded token count (1792 vs 1645 at AST-Base 5-s shapes) plus the remat
  re-forward of the parameter-matmul chain (the ``attn_res`` policy saves
  the attention kernel's own residuals, so only the qkv/proj/fc1/fc2
  matmuls recompute). LN/gelu/softmax/dropout FLOPs are excluded from both
  (elementwise work is bandwidth-, not FLOP-bound on TPU).

Peak is resolved from the device kind (v5e ≈ 197 bf16 TFLOP/s/chip).

reference: no MFU reporting exists in the reference repo (it publishes no
benchmarks at all — BASELINE.md); this module feeds bench.py and
scripts/bench_probe.py.
"""

from __future__ import annotations

import dataclasses

# bf16 peak matmul TFLOP/s per chip by jax device_kind (lowercased substring
# match). v5e: 394 int8 / 197 bf16; v4: 275; v5p: 459; v6e (Trillium): 918.
_PEAK_TFLOPS = (
    ("v5 lite", 197.0),
    ("v5e", 197.0),
    ("v6 lite", 918.0),
    ("v6e", 918.0),
    ("v5p", 459.0),
    ("v5", 459.0),
    ("v4", 275.0),
    ("v3", 123.0),
    ("v2", 45.0),
)


def peak_tflops(device_kind: str, dtype_bytes: int = 2) -> float:
    """Per-chip peak matmul TFLOP/s for ``device_kind`` (jax
    ``device.device_kind``); int8 (dtype_bytes=1) doubles the bf16 rate on
    v5e+. Unknown kinds fall back to v5e's 197 (the bench target chip)."""
    kind = device_kind.lower()
    for sub, tf in _PEAK_TFLOPS:
        if sub in kind:
            return tf * (2.0 if dtype_bytes == 1 else 1.0)
    return 197.0 * (2.0 if dtype_bytes == 1 else 1.0)


@dataclasses.dataclass(frozen=True)
class StepFlops:
    """Per-sample FLOP totals for one optimizer step of a ViT-family model."""

    useful: float    # real-token fwd+bwd matmul/conv FLOPs (no pad, no remat)
    hardware: float  # scheduled FLOPs: padded tokens + remat re-forward
    fwd_useful: float  # real-token forward-only FLOPs (serving MFU)


def vit_step_flops(
    *,
    n_real: int,
    n_pad: int,
    emb_dim: int,
    depth: int,
    mlp_ratio: float = 4.0,
    patch_pixels: int = 16 * 16,
    num_classes: int = 50,
    remat_refwd: bool = True,
) -> StepFlops:
    """FLOP model for the AST/ViT train step (per sample).

    Matmul/conv terms only:

    - patch embed: ``n_patches · patch_pixels · D · 2`` (1 input channel),
    - per block parameter matmuls: qkv (3D²) + proj (D²) + fc1/fc2 (2·4D²)
      → ``(4 + 2·mlp_ratio)·D² · 2 · N`` each direction,
    - per block attention: qk + pv → ``4·N²·D`` forward (dh·H = D), and the
      five backward matmuls (s-recompute, dv, dp, dq, dk) → ``10·N²·D``,
    - head: ``D · num_classes · 2`` on the pooled token.

    Backward multipliers: parameter matmuls ×2 (dW + dx), attention ×2.5.
    ``remat_refwd`` adds one extra forward of the per-block parameter
    matmuls at the padded count (the ``attn_res`` remat policy: attention
    forward is NOT recomputed — its residuals are saved; the wide matmul
    outputs are DCE'd but the matmuls themselves re-run).
    """
    D = float(emb_dim)
    mm_per_tok = (4.0 + 2.0 * mlp_ratio) * D * D * 2.0  # per block, fwd

    def _fwd(n: int) -> tuple[float, float]:
        n_patches = n - 1  # cls token carries no patch conv
        patch = n_patches * patch_pixels * D * 2.0
        params = depth * mm_per_tok * n
        attn = depth * 4.0 * float(n) * float(n) * D
        head = D * num_classes * 2.0
        return patch + params + head, attn

    p_real, a_real = _fwd(n_real)
    p_pad, a_pad = _fwd(n_pad)
    useful = 3.0 * p_real + 3.5 * a_real
    hardware = 3.0 * p_pad + 3.5 * a_pad
    if remat_refwd:
        hardware += depth * mm_per_tok * n_pad
    return StepFlops(useful=useful, hardware=hardware,
                     fwd_useful=p_real + a_real)


def ast_step_flops(model, n_real: int, n_pad: int) -> StepFlops:
    """``vit_step_flops`` with dims pulled from an ``ASTViT`` instance."""
    return vit_step_flops(
        n_real=n_real,
        n_pad=n_pad,
        emb_dim=model.emb_dim,
        depth=model.depth,
        patch_pixels=model.patch_size * model.patch_size,
        num_classes=model.num_classes,
        remat_refwd=bool(model.remat),
    )


def ast_token_counts(model, n_samples: int, hop: int = 160,
                     win: int = 400, n_fft: int = 1024) -> tuple[int, int]:
    """(n_real, n_pad) token counts for a waveform of ``n_samples`` through
    the AST mel front-end (torchaudio center-pad frame math, ops/mel.py) and
    the encoder-wide kernel-grain padding (models/vit.py:_pad_grain)."""
    from dlsc_tpu.models.vit import _pad_grain

    t_dim = n_samples // hop + 1
    step = model.patch_size - model.overlap
    f_tok = (model.f_dim - model.patch_size) // step + 1
    t_tok = (t_dim - model.patch_size) // step + 1
    n_real = f_tok * t_tok + 1  # + cls
    grain = _pad_grain()
    n_pad = -(-n_real // grain) * grain if n_real >= grain else n_real
    return n_real, n_pad
