"""Mixture-of-Experts MLP for the ViT encoder + expert parallelism (EP).

Beyond-reference capability: the reference stack has no MoE and no expert
parallelism (SURVEY.md §2.7 audit — "Expert parallelism (EP) / MoE: absent").
This module adds the TPU-native version: a token-choice top-k router with
static capacity (GShard/Switch style), experts laid out as one stacked
(E, ...) weight tensor so a single batched einsum runs all experts on the
MXU, and EP expressed purely as shardings — the expert axis of the stacked
weights and of the (B, E, C, D) dispatch buffers is sharded over a mesh
axis, and GSPMD inserts the token all-to-alls.

Design notes (TPU-first):
- Static shapes throughout: capacity C = ceil(top_k * N * capacity_factor
  / E) is computed from the static token count; over-capacity tokens are
  dropped (their block output is 0 and the Block residual passes them
  through — the standard Switch behavior).
- Dispatch/combine use scatter-add/gather with O(tokens·D) work — linear in
  sequence length, unlike the classic one-hot einsum dispatch whose
  (B, S, E, C) tensor is quadratic in S at AST's ~1650-token sequences.
- The router runs in f32 (bf16 gate logits destabilize top-k ordering);
  expert matmuls run in the model dtype (bf16 on TPU).
- Aux losses (load-balance + router z-loss) are sown into the
  'intermediates' collection as 'moe_aux'; the train step collects and adds
  them (dlsc_tpu.train.steps). They are pre-scaled by their weights here so
  the step needs no MoE-specific config.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class MoeSpec:
    """Static MoE configuration carried by ASTViT/Block (hashable so the
    module pytree stays jit-friendly)."""

    n_experts: int
    top_k: int = 2
    capacity_factor: float = 1.25
    aux_weight: float = 1e-2      # load-balance loss weight (Switch: 1e-2)
    router_z_weight: float = 1e-3  # router logit z-loss weight (ST-MoE: 1e-3)

    def __post_init__(self):
        if self.top_k < 1 or self.top_k > self.n_experts:
            raise ValueError(
                f"top_k={self.top_k} must be in [1, n_experts={self.n_experts}]"
            )


def as_moe_spec(spec: "MoeSpec | dict | None") -> "MoeSpec | None":
    """Normalize a config-provided dict (mini-Hydra instantiation passes
    plain dicts) into a MoeSpec."""
    if spec is None or isinstance(spec, MoeSpec):
        return spec
    return MoeSpec(**dict(spec))


class MoeMlp(nn.Module):
    """Drop-in MoE replacement for vit.Mlp: top-k routed expert FFNs.

    Params (module name 'moe' by convention — parallel/ep.py shards these):
      router/kernel (D, E) f32 · wi (E, D, F) · bi (E, F) · wo (E, F, D) ·
      bo (E, D), where F = dim * ratio.

    ``expert_sharding``: optional NamedSharding for the (B, E, C, D)
    dispatch buffers — e.g. P('data', 'model', None, None) — constraining
    the expert axis onto the mesh so expert compute is parallel and GSPMD
    materializes the dispatch/combine all-to-alls over ICI.
    """

    dim: int
    spec: MoeSpec
    ratio: float = 4.0
    dropout: float = 0.0
    dtype: Any = jnp.float32
    expert_sharding: Any = None
    n_real: int | None = None  # true token count under encoder-wide padding
                               # (vit.py embed): pad tokens must not be
                               # routed — they would pile onto one expert
                               # (identical post-LN rows → identical logits),
                               # steal capacity from real tokens, and skew
                               # the aux-loss statistics. Tokens >= n_real
                               # get no expert (output 0) and are excluded
                               # from the aux means.

    @nn.compact
    def __call__(self, x, train: bool):
        B, N, D = x.shape
        E, K = self.spec.n_experts, self.spec.top_k
        F = int(self.dim * self.ratio)
        n_real = N if self.n_real is None else min(self.n_real, N)
        C = max(1, -(-K * n_real * int(100 * self.spec.capacity_factor)
                     // (100 * E)))

        # --- router (f32) ---------------------------------------------------
        logits = nn.Dense(
            E, use_bias=False, dtype=jnp.float32, name="router"
        )(x.astype(jnp.float32))                     # (B, N, E)
        gates = jax.nn.softmax(logits, axis=-1)
        topv, topi = jax.lax.top_k(gates, K)          # (B, N, K)
        # normalize the selected gates to sum to 1 (GShard); K=1 → weight 1
        topv = topv / jnp.maximum(
            jnp.sum(topv, axis=-1, keepdims=True), 1e-9
        )

        # --- capacity positions (stage-major priority: all 1st choices rank
        # before any 2nd choice, ties broken by token order) ----------------
        assign = jax.nn.one_hot(topi, E, dtype=jnp.float32)   # (B, N, K, E)
        valid = None
        if n_real < N:
            valid = (jnp.arange(N) < n_real).astype(jnp.float32)  # (N,)
            assign = assign * valid[None, :, None, None]  # pad: no assignment
        am = assign.transpose(0, 2, 1, 3).reshape(B, K * N, E)
        pos_flat = jnp.cumsum(am, axis=1) - 1.0               # (B, K*N, E)
        pos_stage = pos_flat.reshape(B, K, N, E).transpose(0, 2, 1, 3)
        pos = jnp.sum(pos_stage * assign, axis=-1)            # (B, N, K)
        keep = (pos < C).astype(x.dtype)                      # (B, N, K)
        if valid is not None:
            # pad tokens have assign == 0 and pos == 0 < C; mask them out
            keep = keep * valid[None, :, None].astype(x.dtype)
        pi = jnp.clip(pos, 0, C - 1).astype(jnp.int32)
        b_idx = jnp.broadcast_to(jnp.arange(B)[:, None, None], (B, N, K))

        # --- dispatch: scatter tokens into per-expert capacity buffers ------
        contrib = x[:, :, None, :].astype(self.dtype) * keep[..., None]
        buf = jnp.zeros((B, E, C, D), self.dtype).at[b_idx, topi, pi].add(
            contrib
        )
        buf = self._ep(buf)

        # --- expert FFN: one batched einsum over the stacked experts --------
        lecun = jax.nn.initializers.lecun_normal(
            in_axis=-2, out_axis=-1, batch_axis=0
        )
        wi = self.param("wi", lecun, (E, D, F))
        bi = self.param("bi", nn.initializers.zeros_init(), (E, F))
        wo = self.param("wo", lecun, (E, F, D))
        bo = self.param("bo", nn.initializers.zeros_init(), (E, D))
        h = jnp.einsum("becd,edf->becf", buf, wi.astype(self.dtype))
        h = nn.gelu(h + bi.astype(self.dtype)[None, :, None, :],
                    approximate=False)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        out = jnp.einsum("becf,efd->becd", h, wo.astype(self.dtype))
        out = out + bo.astype(self.dtype)[None, :, None, :]
        out = self._ep(out)

        # --- combine: gather each token's expert outputs, weight by gates ---
        got = out[b_idx, topi, pi]                            # (B, N, K, D)
        y = jnp.sum(
            got * (topv.astype(self.dtype) * keep)[..., None], axis=2
        )
        y = nn.Dropout(self.dropout, deterministic=not train)(y)

        # --- aux losses over REAL tokens only (pre-weighted; collected by
        # the train step) ----------------------------------------------------
        nv = float(B * n_real)
        frac = jnp.sum(assign[:, :, 0, :], axis=(0, 1)) / nv  # routed fraction
        gv = gates if valid is None else gates * valid[None, :, None]
        prob = jnp.sum(gv, axis=(0, 1)) / nv                  # mean gate prob
        balance = E * jnp.sum(frac * prob)
        z2 = jax.scipy.special.logsumexp(logits, axis=-1) ** 2
        if valid is not None:
            z2 = z2 * valid[None, :]
        z = jnp.sum(z2) / nv
        self.sow(
            "intermediates", "moe_aux",
            self.spec.aux_weight * balance + self.spec.router_z_weight * z,
        )
        return y

    def _ep(self, buf):
        if self.expert_sharding is None:
            return buf
        return jax.lax.with_sharding_constraint(buf, self.expert_sharding)


def collect_moe_aux(intermediates: Any) -> jnp.ndarray | float:
    """Sum every 'moe_aux' value sown into an intermediates collection
    (tuple-valued sow entries; stacked along depth under nn.scan)."""
    if not intermediates:
        return 0.0
    from dlsc_tpu.parallel.mesh import path_keys

    total = 0.0
    for path, leaf in jax.tree_util.tree_flatten_with_path(intermediates)[0]:
        if any(k == "moe_aux" for k in path_keys(path)):
            total = total + jnp.sum(leaf)
    return total
