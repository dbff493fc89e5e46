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
- Three dispatch lowerings (all measured on v5e — scripts/bench_moe.py,
  scripts/bench_probe.py, BASELINE.md rounds 3+5):
  * 'ragged' (round 5) — DROPLESS grouped matmuls (megablox gmm) over
    expert-sorted rows with scatter-free gather VJPs and a static pad-row
    slice. Fastest at the AST-MoE train step: 447 ms vs einsum's 535 at
    b64 (+19%), and no token drops at all.
  * 'einsum' — GShard one-hot matmuls with routing groups of ≤256 tokens:
    one-hot operands bounded by the group size, every op an MXU matmul,
    zero scatters. fwd+bwd 20.7 ms vs scatter 25.8 at the bench_moe block
    shape. The EP path uses this lowering (its (B, E, C, D) capacity
    buffers are what parallel/ep.py shards).
  * 'scatter' — scatter-add/gather (O(tokens·D) HBM traffic); loses to the
    serializing XLA:TPU scatter expander everywhere except the degenerate
    single full-sequence group.
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
import jax.ad_checkpoint  # checkpoint_name is not reachable as a lazy attr
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class MoeSpec:
    """Static MoE configuration carried by ASTViT/Block (hashable so the
    module pytree stays jit-friendly)."""

    n_experts: int
    top_k: int = 2
    capacity_factor: float = 1.25
    aux_weight: float = 1e-2      # load-balance loss weight (Switch: 1e-2)
    router_z_weight: float = 1e-3  # router logit z-loss weight (ST-MoE: 1e-3)
    router: str = "token"         # 'token': token-choice top-k (Switch/GShard
                                  # — needs the load-balance aux loss) or
                                  # 'expert': expert-choice (Zhou 2022 — each
                                  # expert picks its top-C tokens; perfectly
                                  # balanced by construction, no balance loss,
                                  # variable experts-per-token). Expert-choice
                                  # measures ~9% faster at the full train step
                                  # (130.0 vs 119.5 clips/s, BASELINE.md
                                  # round 3) but token-choice stays the
                                  # default: EC expert assignment depends on
                                  # the co-batched tokens, so inference
                                  # results vary with batch composition —
                                  # set router='expert' where that is
                                  # acceptable.
    dispatch: str = "einsum"      # dispatch lowering:
                                  # 'einsum' — GShard one-hot matmuls (zero
                                  #   scatters, all MXU, O(S·E·C) one-hot
                                  #   operands per group);
                                  # 'scatter' — scatter-add/gather
                                  #   (O(tokens·D) HBM traffic but XLA:TPU
                                  #   serializes the scatter expander);
                                  # 'ragged' — DROPLESS grouped matmul
                                  #   (megablox-style): token-expert
                                  #   assignments are sorted by expert and
                                  #   the expert FFN runs as two grouped
                                  #   matmuls (Pallas megablox gmm on TPU,
                                  #   lax.ragged_dot elsewhere) directly on
                                  #   the sorted rows. No capacity, no
                                  #   drops, no one-hot operands; dispatch
                                  #   and combine are gathers whose custom
                                  #   VJP backward is also gathers (zero
                                  #   scatters fwd+bwd). Token-choice router
                                  #   only; falls back to 'einsum' under
                                  #   expert_sharding (EP shards the
                                  #   (B,E,C,D) capacity buffers, which the
                                  #   ragged path does not materialize).
                                  # Routing semantics of einsum/scatter are
                                  # identical; 'ragged' additionally keeps
                                  # over-capacity tokens (dropless — a
                                  # strict superset of the routed compute).
                                  # einsum-vs-scatter default picked by
                                  # measured TPU v5e step time
                                  # (scripts/bench_moe.py, BASELINE.md
                                  # round 3): at the AST-MoE shape
                                  # (384d/8E/top-2, B=32, N=1792, group 256)
                                  # einsum fwd+bwd = 21.0 ms vs scatter
                                  # 25.8 ms; round-5 measurements for
                                  # 'ragged' live in BASELINE.md round 5.
    group_size: int = 256         # routing group: tokens are routed within
                                  # fixed groups of ≤ this many tokens (the
                                  # largest divisor of N is used), with
                                  # per-group capacity — bounds the one-hot
                                  # dispatch cost to O(group_size) per token
                                  # and matches GShard/Switch group semantics.

    def __post_init__(self):
        if self.top_k < 1 or self.top_k > self.n_experts:
            raise ValueError(
                f"top_k={self.top_k} must be in [1, n_experts={self.n_experts}]"
            )
        if self.dispatch not in ("scatter", "einsum", "ragged"):
            raise ValueError(
                f"dispatch={self.dispatch!r} must be 'scatter', 'einsum' or"
                " 'ragged'")
        if self.dispatch == "ragged" and self.router != "token":
            raise ValueError(
                "dispatch='ragged' is dropless token-choice only — "
                "expert-choice is capacity-based by construction")
        if self.router not in ("token", "expert"):
            raise ValueError(
                f"router={self.router!r} must be 'token' or 'expert'")
        if self.group_size < 1:
            raise ValueError(f"group_size={self.group_size} must be >= 1")


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

    ``expert_sharding``: optional NamedSharding for the (B·G, E, C, D)
    dispatch buffers — e.g. P('data', 'model', None, None) — constraining
    the expert axis onto the mesh so expert compute is parallel and GSPMD
    materializes the dispatch/combine all-to-alls over ICI.

    Routing is per fixed-size token group (``spec.group_size``, GShard
    semantics) for the capacity lowerings, and global for the dropless one.
    Three dispatch lowerings share identical routing decisions:
    ``spec.dispatch='scatter'`` (scatter-add/gather), ``'einsum'`` (one-hot
    matmuls, zero scatters), and ``'ragged'`` (dropless grouped matmuls
    over expert-sorted rows — no capacity at all) — A/B them on target
    hardware; scripts/bench_moe.py measures all three.
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
        # routing groups: largest divisor of N ≤ group_size; capacity is per
        # group (min with n_real keeps the single-group padded case at the
        # same capacity as the equivalent unpadded run)
        S = _group_size(N, self.spec.group_size)
        G = N // S
        C = max(1, -(-K * min(S, n_real) * int(100 * self.spec.capacity_factor)
                     // (100 * E)))

        # --- router (f32) ---------------------------------------------------
        logits = nn.Dense(
            E, use_bias=False, dtype=jnp.float32, name="router"
        )(x.astype(jnp.float32))                     # (B, N, E)
        gates = jax.nn.softmax(logits, axis=-1)
        valid = None
        if n_real < N:
            valid = (jnp.arange(N) < n_real).astype(jnp.float32)  # (N,)

        # z-loss over real tokens (both router modes; stabilizes the gate)
        nv = float(B * n_real)
        z2 = jax.scipy.special.logsumexp(logits, axis=-1) ** 2
        if valid is not None:
            z2 = z2 * valid[None, :]
        aux = self.spec.router_z_weight * jnp.sum(z2) / nv

        if self.spec.router == "expert":
            # expert-choice (Zhou 2022): each expert takes its top-C tokens —
            # perfectly balanced by construction, no load-balance loss
            y = self._expert_choice(x, gates, valid, B, N, D, E, F, S, G, C,
                                    train)
            y = nn.Dropout(self.dropout, deterministic=not train)(y)
            self.sow("intermediates", "moe_aux", aux)
            return y

        topv, topi = jax.lax.top_k(gates, K)          # (B, N, K)
        # normalize the selected gates to sum to 1 (GShard); K=1 → weight 1
        topv = topv / jnp.maximum(
            jnp.sum(topv, axis=-1, keepdims=True), 1e-9
        )
        assign = jax.nn.one_hot(topi, E, dtype=jnp.float32)   # (B, N, K, E)
        if valid is not None:
            assign = assign * valid[None, :, None, None]  # pad: no assignment

        # load-balance loss over REAL tokens (identical for every
        # token-choice lowering — routing decisions are shared; pre-weighted,
        # collected by the train step)
        frac = jnp.sum(assign[:, :, 0, :], axis=(0, 1)) / nv  # routed fraction
        gv = gates if valid is None else gates * valid[None, :, None]
        prob = jnp.sum(gv, axis=(0, 1)) / nv                  # mean gate prob
        aux = aux + self.spec.aux_weight * E * jnp.sum(frac * prob)

        if self.spec.dispatch == "ragged" and self.expert_sharding is None:
            # dropless grouped-matmul dispatch: no capacity, no one-hot
            # dispatch operands; drop_frac is 0 by construction
            y = self._ragged(x, topi, topv, valid, B, N, D, E, K, F, train)
            self._sow_stats(
                jnp.zeros((), jnp.float32), jnp.sum(assign, axis=(0, 1, 2)))
            y = nn.Dropout(self.dropout, deterministic=not train)(y)
            self.sow("intermediates", "moe_aux", aux)
            return y

        # --- capacity positions per group (stage-major priority: all 1st
        # choices rank before any 2nd choice, ties broken by token order) ----
        a4 = assign.reshape(B, G, S, K, E)
        am = a4.transpose(0, 1, 3, 2, 4).reshape(B, G, K * S, E)
        pos_flat = jnp.cumsum(am, axis=2) - 1.0               # (B, G, K*S, E)
        pos_stage = pos_flat.reshape(B, G, K, S, E).transpose(0, 1, 3, 2, 4)
        pos = jnp.sum(pos_stage * a4, axis=-1)                # (B, G, S, K)
        keep = (pos < C).astype(x.dtype)                      # (B, G, S, K)
        if valid is not None:
            # pad tokens have assign == 0 and pos == 0 < C; mask them out
            keep = keep * valid.reshape(G, S)[None, :, :, None].astype(x.dtype)
        pi = jnp.clip(pos, 0, C - 1).astype(jnp.int32)
        xg = x.reshape(B * G, S, D).astype(self.dtype)
        wk = (topv.astype(self.dtype).reshape(B, G, S, K) * keep)  # combine w

        # observability: capacity-dropped assignment fraction + dispatched
        # per-expert load (collect_moe_stats → train metrics moe/*)
        keep32 = keep.astype(jnp.float32)
        self._sow_stats(
            1.0 - jnp.sum(keep32) / (K * nv),
            jnp.sum(a4 * keep32[..., None], axis=(0, 1, 2, 3)))

        # --- dispatch → expert FFN → combine --------------------------------
        # ('ragged' + expert_sharding lands here on the einsum lowering: EP
        # shards the (B,E,C,D) capacity buffers, which ragged never builds)
        if self.spec.dispatch != "scatter":
            # GShard one-hot matmul dispatch: zero scatters, all MXU. The
            # (B, G, S, E, C) one-hot operands cost O(S·E·C) per group —
            # bounded by group_size, not sequence length.
            keepE = (a4.astype(self.dtype) * keep[..., None])  # (B,G,S,K,E)
            oc = jax.nn.one_hot(pi, C, dtype=self.dtype) * keep[..., None]
            disp = jnp.einsum("bgske,bgskc->bgsec", keepE, oc)
            buf = jnp.einsum(
                "bgsec,bgsd->bgecd", disp, xg.reshape(B, G, S, D)
            ).reshape(B * G, E, C, D)
            out = self._ffn(buf, E, F, D, train)               # (B*G,E,C,D)
            comb = jnp.einsum("bgske,bgskc,bgsk->bgsec", keepE, oc, wk)
            y = jnp.einsum(
                "bgsec,bgecd->bgsd", comb, out.reshape(B, G, E, C, D)
            ).reshape(B, N, D)
        else:
            # scatter-add dispatch / gather combine: O(tokens·D) HBM traffic
            topi_g = topi.reshape(B * G, S, K)
            pi_g = pi.reshape(B * G, S, K)
            keep_g = keep.reshape(B * G, S, K)
            bg = jnp.broadcast_to(
                jnp.arange(B * G)[:, None, None], (B * G, S, K))
            contrib = xg[:, :, None, :] * keep_g[..., None]
            buf = jnp.zeros((B * G, E, C, D), self.dtype).at[
                bg, topi_g, pi_g].add(contrib)
            out = self._ffn(buf, E, F, D, train)               # (B*G,E,C,D)
            got = out[bg, topi_g, pi_g]                        # (B*G,S,K,D)
            y = jnp.sum(
                got * (wk.reshape(B * G, S, K))[..., None], axis=2
            ).reshape(B, N, D)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        self.sow("intermediates", "moe_aux", aux)
        return y

    def _sow_stats(self, drop_frac, load):
        """Observability (train metrics ``moe/drop_frac`` / ``moe/util``,
        collected by :func:`collect_moe_stats`): the fraction of routing
        assignments lost (to capacity for token-choice; untaken tokens for
        expert-choice) and the normalized entropy of the per-expert
        dispatched load (1.0 = perfectly balanced routing)."""
        p = load / jnp.maximum(jnp.sum(load), 1e-9)
        util = -jnp.sum(p * jnp.log(p + 1e-9)) / float(np.log(load.shape[0]))
        self.sow("intermediates", "moe_stats",
                 jnp.stack([drop_frac, util]).astype(jnp.float32))

    def _expert_choice(self, x, gates, valid, B, N, D, E, F, S, G, C, train):
        """Expert-choice routing: per group, each expert gathers its top-C
        tokens by gate score (dispatch is a pure gather; combine is a one-hot
        einsum — no scatters in either direction). A token may be taken by
        0..E experts; untaken tokens ride the Block residual. Combine weights
        are the raw gate values (no top-k normalization — matches the
        expert-choice paper)."""
        g4 = gates.reshape(B, G, S, E)
        scores = g4.transpose(0, 1, 3, 2)                   # (B, G, E, S)
        vmask = None
        if valid is not None:
            vmask = valid.reshape(G, S)
            # pads rank below every real token (gates are in (0, 1))
            scores = jnp.where(vmask[None, :, None, :] > 0, scores, -1.0)
        wv, ti = jax.lax.top_k(scores, C)                    # (B, G, E, C)
        oh = jax.nn.one_hot(ti, S, dtype=self.dtype)         # (B, G, E, C, S)
        if vmask is not None:
            # an all-pad group would still pick pads — zero them out
            oh = oh * vmask[None, :, None, None, :].astype(self.dtype)
        wv = jnp.maximum(wv, 0.0).astype(self.dtype)
        xg = x.reshape(B, G, S, D).astype(self.dtype)
        buf = jnp.einsum("bgecs,bgsd->bgecd", oh, xg).reshape(B * G, E, C, D)
        out = self._ffn(buf, E, F, D, train)                 # (B*G, E, C, D)
        y = jnp.einsum(
            "bgecs,bgecd->bgsd", oh * wv[..., None],
            out.reshape(B, G, E, C, D),
        ).reshape(B, N, D)
        # observability: 'dropped' here = real tokens taken by NO expert
        # (they ride the residual); load is per-expert taken-slot count
        oh32 = oh.astype(jnp.float32)
        taken = jnp.sum(oh32, axis=(2, 3))                   # (B, G, S)
        real = (vmask[None] if vmask is not None
                else jnp.ones((1, G, S), jnp.float32))
        nv = B * (jnp.sum(vmask) if vmask is not None else float(G * S))
        self._sow_stats(
            jnp.sum((taken <= 0) * real) / nv,
            jnp.sum(oh32, axis=(0, 1, 3, 4)))
        return y

    def _expert_params(self, E: int, F: int, D: int):
        """Stacked expert weights — shared by every dispatch lowering so the
        param tree (and EP shardings / checkpoints) is dispatch-independent."""
        lecun = jax.nn.initializers.lecun_normal(
            in_axis=-2, out_axis=-1, batch_axis=0
        )
        wi = self.param("wi", lecun, (E, D, F))
        bi = self.param("bi", nn.initializers.zeros_init(), (E, F))
        wo = self.param("wo", lecun, (E, F, D))
        bo = self.param("bo", nn.initializers.zeros_init(), (E, D))
        return wi, bi, wo, bo

    def _ragged(self, x, topi, topv, valid, B, N, D, E, K, F, train):
        """Dropless dispatch on grouped matmuls (VERDICT r4 #1, megablox /
        MegaBlocks style): the M = B·N·K token-expert assignment rows are
        sorted by expert id, the expert FFN runs as two grouped matmuls
        directly over the sorted row blocks (`_grouped_matmul`: Pallas
        megablox `gmm` on TPU, `jax.lax.ragged_dot` elsewhere), and the
        per-row expert biases ride an (M, E) one-hot matmul. Dispatch is a
        row gather and combine an inverse-permutation gather; both carry a
        custom VJP whose backward is ALSO a gather (`_gather_rows` /
        `_combine_rows`), so no scatter ever reaches XLA:TPU's serializing
        scatter expander. Compared to the einsum lowering this removes the
        O(S·E·C) one-hot dispatch/combine einsums AND the 1.25× capacity
        overcompute, at the cost of one M-element sort pair. Pad tokens
        (>= n_real) take the virtual expert id E, sort to the tail, and are
        STATICALLY sliced out of the grouped matmuls; any pad rows kept by
        the tile-grain rounding combine with weight zero, so values and
        gradients match the masked semantics exactly (tests)."""
        T, M = B * N, B * N * K
        n_r = N if self.n_real is None else min(self.n_real, N)
        m_real = B * n_r * K                        # static: pads are a
        e_flat = topi.reshape(M)                    # fixed tail per sequence
        if valid is not None:
            # pads get the virtual expert id E: the stable sort pushes all
            # their rows past m_real, so the grouped matmuls run on a STATIC
            # (m_real, ·) slice — the pad fraction costs no FFN FLOPs and no
            # gather traffic (e.g. 10.3% at the AST-MoE 689/768 trunk)
            pad_row = (jnp.arange(N) >= n_r)        # (N,)
            e_flat = jnp.where(
                jnp.broadcast_to(pad_row[None, :, None], (B, N, K)).reshape(M),
                E, e_flat)
        group_sizes = jnp.sum(                      # (E,) sums to m_real
            jax.nn.one_hot(e_flat, E, dtype=jnp.float32), axis=0
        ).astype(jnp.int32)                         # (one_hot(E, E) == 0)
        # round the slice up to the gmm m-tile (megablox requires rows %
        # tile_m == 0); the extra rows are pad rows appended to the last
        # expert's group — computed but combine-weight-zero, so values and
        # gradients stay exact (their dout rows are exactly 0)
        tile_m = _gmm_tiling()[0] if _gmm_impl() == "pallas" else 8
        m_pad = min(M, -(-m_real // tile_m) * tile_m)
        if m_pad > m_real:
            group_sizes = group_sizes.at[E - 1].add(m_pad - m_real)
        # two argsorts (a counting-rank cumsum replacing the second one
        # measured equal — 11.96 vs 11.74 ms/block on v5e, round-5 sweep:
        # sorts are cheap relative to the gathers/matmuls at these sizes)
        order_full = jnp.argsort(e_flat, stable=True)   # sorted row -> flat
        inv2 = jnp.argsort(order_full).reshape(T, K)    # (t, k) -> sorted;
        order = order_full[:m_pad]                      # pad rows >= m_real
        m_real = m_pad
        e_sorted = e_flat[order]
        dt = self.dtype
        # 'moe_res' checkpoint names (remat_policy='attn_res_moe',
        # vit.remat_kwargs): saving the pre-gelu grouped-matmul output lets
        # the remat'd backward skip BOTH gmm re-forwards — gmm1's output is
        # the saved tensor, and gmm2's lhs rebuilds from it elementwise
        # (gelu+dropout). The index/weight tensors (~1 MB/block) are named
        # too so the sort/router replay is also DCE'd. Cost: one
        # (m_real, F) bf16 tensor per block (~274 MB at AST-MoE b64).
        cname = jax.ad_checkpoint.checkpoint_name
        order = cname(order, "moe_res")
        inv2 = cname(inv2, "moe_res")
        e_sorted = cname(e_sorted, "moe_res")
        group_sizes = cname(group_sizes, "moe_res")
        tok = order // K
        xs = _gather_rows(
            x.reshape(T, D).astype(dt), tok, inv2)  # (m_real, D)
        wi, bi, wo, bo = self._expert_params(E, F, D)
        bias = _row_bias(e_sorted, dt)                  # per-row expert bias
        h = _grouped_matmul(xs, wi.astype(dt), group_sizes)
        h = cname(h + bias(bi), "moe_res")              # pre-gelu residual
        h = nn.gelu(h, approximate=False)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        out = _grouped_matmul(h, wo.astype(dt), group_sizes)  # (m_real, D)
        wk = topv.astype(dt)
        if valid is not None:
            wk = wk * valid[None, :, None].astype(dt)
        wk = cname(wk, "moe_res")
        y = _combine_rows(out, inv2, order)             # (T, K, D); pad rows
        y = jnp.sum(y * wk.reshape(T, K)[..., None], axis=1)  # read the zero
        y = y.reshape(B, N, D)                          # sentinel row
        # bo applied in TOKEN space: y += Σ_k w_k · bo[e_(t,k)] contracts the
        # (B,N,K,E) assignment one-hot with (E,D) — a tiny matmul instead of
        # the (m_real, E) @ (E, D) row expansion in sorted space (the row-
        # bias expansions cost ~23 ms/step at AST-MoE b64: nobias probe 426
        # vs 449 ms; this halves that for free). Exact: same per-row bias,
        # pad tokens masked by wk.
        aw = jnp.sum(jax.nn.one_hot(topi, E, dtype=dt) * wk[..., None],
                     axis=2)                            # (B, N, E)
        y = y + aw @ bo.astype(dt)
        return y

    def _ffn(self, buf, E: int, F: int, D: int, train: bool):
        """Stacked-expert FFN over (BG, E, C, D) capacity buffers — one
        batched einsum per matmul runs every expert on the MXU."""
        buf = self._ep(buf)
        wi, bi, wo, bo = self._expert_params(E, F, D)
        h = jnp.einsum("becd,edf->becf", buf, wi.astype(self.dtype))
        h = nn.gelu(h + bi.astype(self.dtype)[None, :, None, :],
                    approximate=False)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        out = jnp.einsum("becf,efd->becd", h, wo.astype(self.dtype))
        out = out + bo.astype(self.dtype)[None, :, None, :]
        return self._ep(out)

    def _ep(self, buf):
        if self.expert_sharding is None:
            return buf
        return jax.lax.with_sharding_constraint(buf, self.expert_sharding)


def _gmm_impl() -> str:
    """Grouped-matmul lowering for dispatch='ragged': 'pallas' (megablox gmm
    kernels) or 'xla' (jax.lax.ragged_dot). 'auto' picks pallas on TPU.
    Override with DLSC_MOE_GMM=pallas|xla for A/B runs (bench_moe.py)."""
    import os

    impl = os.environ.get("DLSC_MOE_GMM", "auto")
    if impl == "auto":
        return "pallas" if jax.default_backend() == "tpu" else "xla"
    return impl


def _gmm_tiling() -> tuple:
    """megablox (m, k, n) tile sizes; DLSC_MOE_GMM_TILE='m,k,n' to probe."""
    import os

    raw = os.environ.get("DLSC_MOE_GMM_TILE")
    if raw:
        return tuple(int(v) for v in raw.split(","))
    # measured on v5e (round-5 sweep, AST-MoE block shapes): (1024,384,512)
    # fwd 12.8 vs 18.6 ms for the megablox default-ish (512,128,128)
    return (1024, 384, 512)


def _row_bias(e_sorted, dtype):
    """Per-row expert bias for the sorted (M, ·) activations: returns a
    closure mapping a stacked (E, F) bias table to its (M, F) row expansion.
    Two lowerings (DLSC_MOE_BIAS, A/B'd on chip): 'gather' (bias[e_sorted],
    fuses into the consuming elementwise op) or 'onehot' ((M, E) @ (E, F)
    matmul)."""
    import os

    impl = os.environ.get("DLSC_MOE_BIAS", "onehot")

    def expand(table):
        t = table.astype(dtype)
        if impl == "gather":
            # loses on chip: the gather's default VJP scatter-adds M rows
            # into the (E, F) table (serializing scatter expander) — grad
            # 27.7 vs 21.5 ms/block (round-5 sweep); 'onehot' keeps both
            # directions as matmuls
            return t[e_sorted]
        if impl == "none":  # debug/bench bound only — drops the bias!
            return jnp.zeros((1, t.shape[1]), dtype)
        oh_e = jax.nn.one_hot(e_sorted, t.shape[0], dtype=dtype)
        return oh_e @ t
    return expand


def _fit_tile(t: int, dim: int, grain: int) -> int | None:
    """Largest tile <= t that divides ``dim`` and is a multiple of ``grain``
    (megablox requires every dimension divisible by its tile), or None."""
    t = max(grain, min(t, dim))
    t -= t % grain
    while t >= grain:
        if dim % t == 0:
            return t
        t -= grain
    return None


def _grouped_matmul(lhs, rhs, group_sizes):
    """out[sizes[:g].sum() : sizes[:g+1].sum()] = lhs[rows of g] @ rhs[g].

    lhs (M, k) sorted so each expert's rows are contiguous, rhs (E, k, n),
    group_sizes (E,) int32 summing to M. On TPU this is the Pallas megablox
    gmm (its library custom_vjp pairs gmm for dlhs with tgmm for drhs),
    with the configured tiling shrunk per-dimension to the divisibility
    megablox requires; the portable path — and the fallback when no legal
    tiling exists — is jax.lax.ragged_dot (differentiable in jax>=0.9)."""
    if _gmm_impl() == "pallas":
        m, k = lhs.shape
        n = rhs.shape[-1]
        tm0, tk0, tn0 = _gmm_tiling()
        tm = _fit_tile(tm0, m, 8)
        tk = _fit_tile(tk0, k, 128)
        tn = _fit_tile(tn0, n, 128)
        if tm is not None and tk is not None and tn is not None:
            from jax.experimental.pallas.ops.tpu.megablox import ops as _mb

            return _mb.gmm(lhs, rhs, group_sizes, lhs.dtype, (tm, tk, tn))
    return jax.lax.ragged_dot(
        lhs, rhs, group_sizes, preferred_element_type=lhs.dtype)


@jax.custom_vjp
def _gather_rows(x, tok, inv2):
    """Dispatch gather: xs[m] = x[tok[m]] for the first m_real = len(tok)
    expert-sorted rows (``tok`` is already the sliced sorted→token map; pad
    rows sort past m_real and are never dispatched).

    The custom backward uses the inverse mapping ``inv2`` ((T, K) → sorted
    row): dx[t] = Σ_k g[inv2[t, k]] — a gather+sum, NOT the scatter-add XLA
    would otherwise derive for a gather's transpose. Pad (t, k) pairs have
    inv2 >= m_real and read an appended zero sentinel row, so pad tokens get
    exactly zero gradient."""
    del inv2
    return x[tok]


def _gather_rows_fwd(x, tok, inv2):
    return x[tok], (inv2, tok.shape[0])


def _gather_rows_bwd(res, g):
    inv2, m_real = res
    g_ext = jnp.concatenate([g, jnp.zeros((1,) + g.shape[1:], g.dtype)])
    return (jnp.sum(g_ext[jnp.minimum(inv2, m_real)], axis=1), None, None)


_gather_rows.defvjp(_gather_rows_fwd, _gather_rows_bwd)


@jax.custom_vjp
def _combine_rows(out, inv2, order):
    """Combine gather: y[t, k] = out[inv2[t, k]] (expert-sorted rows back to
    token order; pad pairs, inv2 >= m_real = out.shape[0], read an appended
    zero sentinel). Backward is the forward permutation as a gather:
    dout[m] = g.reshape(T·K, D)[order[m]] (order[m] is the flat (t·K+k) pair
    at sorted position m < m_real) — again no scatter."""
    del order
    ext = jnp.concatenate([out, jnp.zeros((1,) + out.shape[1:], out.dtype)])
    return ext[jnp.minimum(inv2, out.shape[0])]


def _combine_rows_fwd(out, inv2, order):
    ext = jnp.concatenate([out, jnp.zeros((1,) + out.shape[1:], out.dtype)])
    return ext[jnp.minimum(inv2, out.shape[0])], (order, out.shape)


def _combine_rows_bwd(res, g):
    order, out_shape = res
    return (g.reshape(-1, out_shape[-1])[order], None, None)


_combine_rows.defvjp(_combine_rows_fwd, _combine_rows_bwd)


def _group_size(n: int, cap: int) -> int:
    """Largest divisor of ``n`` that is ≤ ``cap`` (≥ 1)."""
    for s in range(min(cap, n), 0, -1):
        if n % s == 0:
            return s
    return 1


#: train-metric names produced by collect_moe_stats — pass to
#: MetricState.create(extras=MOE_METRICS) to stream them per epoch
MOE_METRICS = ("moe/drop_frac", "moe/util")


def collect_moe_stats(intermediates: Any) -> dict:
    """Mean over blocks of the sown ``moe_stats`` pairs → ``{"moe/drop_frac",
    "moe/util"}``. Empty dict when nothing was sown (dense models, or the
    pipeline-parallel path where intermediates cannot cross the shard_map).
    Emptiness is static at trace time, so callers can gate on it freely."""
    if not intermediates:
        return {}
    from dlsc_tpu.parallel.mesh import path_keys

    vals = [
        leaf
        for path, leaf in jax.tree_util.tree_flatten_with_path(intermediates)[0]
        if any(k == "moe_stats" for k in path_keys(path))
    ]
    if not vals:
        return {}
    flat = jnp.concatenate([v.reshape(-1, 2) for v in vals], axis=0)
    m = jnp.mean(flat, axis=0)
    return {"moe/drop_frac": m[0], "moe/util": m[1]}


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
