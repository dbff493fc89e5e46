#!/usr/bin/env python
"""A/B the MoE dispatch lowerings on TPU at AST-MoE block shapes.

models/moe.py implements two dispatch lowerings with identical routing
semantics (asserted in tests/test_moe.py::test_dispatch_modes_agree):

    scatter   scatter-add dispatch / gather combine — O(tokens·D) HBM
              traffic, but XLA:TPU lowers scatters via the serializing
              scatter expander
    einsum    GShard one-hot matmuls — zero scatters, all MXU, one-hot
              operand cost O(group_size·E·C) per token group

This times a fwd and a fwd+bwd MoE *block stack* (depth blocks of
MoeMlp only — attention is dispatch-independent) for both modes and a
few group sizes, at the AST-MoE default shape (384-dim, 8 experts,
top-2, B=32, N=1792 padded tokens). Run ONE instance at a time (serial
remote compile queue).

Usage: python scripts/bench_moe.py [fwd|grad ...]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

B, N, D, E, K, DEPTH = 32, 1792, 384, 8, 2, 12


def _time(fn, *args, n=10, label=""):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def scalar_fn(*a):
        out = fn(*a)
        return sum(jnp.sum(x.astype(jnp.float32))
                   for x in jax.tree_util.tree_leaves(out))

    out = scalar_fn(*args)
    jax.device_get(out)  # compile + sync
    t0 = time.time()
    for _ in range(n):
        out = scalar_fn(*args)
    jax.device_get(out)
    dt = (time.time() - t0) / n
    print(json.dumps({"bench": label, "ms": round(dt * 1e3, 2)}), flush=True)
    return dt


def main(which: list[str]) -> None:
    from dlsc_tpu.utils import wait_for_backend

    wait_for_backend()
    import jax
    import jax.numpy as jnp

    from dlsc_tpu.models.moe import MoeMlp, MoeSpec, collect_moe_aux

    which = which or ["fwd", "grad"]
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, N, D)).astype(np.float32) * 0.1,
                    dtype=jnp.bfloat16)

    modes = [("token", "einsum"), ("token", "scatter"), ("expert", "einsum"),
             ("token", "ragged")]
    if which and which[0] in ("ragged", "ragged_xla"):
        # round-5 grouped-matmul A/B: dropless ragged dispatch only
        # (ragged = megablox pallas gmm; ragged_xla = lax.ragged_dot)
        import os
        if which[0] == "ragged_xla":
            os.environ["DLSC_MOE_GMM"] = "xla"
        modes = [("token", "ragged")]
        which = which[1:] or ["fwd", "grad"]
    for router, dispatch in modes:
        group_sizes = (256,) if dispatch == "ragged" else (256, 448, N)
        for gs in group_sizes:
            spec = MoeSpec(n_experts=E, top_k=K, router=router,
                           dispatch=dispatch, group_size=gs)
            m = MoeMlp(D, spec, dtype=jnp.bfloat16)
            v = jax.jit(m.init, static_argnames=("train",))(
                jax.random.key(0), x, train=False)
            label = f"{router}_{dispatch}_g{gs}"

            if "fwd" in which:
                _time(lambda p, t: m.apply({"params": p}, t, train=False),
                      v["params"], x, label=f"fwd_{label}")
            if "grad" in which:
                def loss(p, t):
                    out, mut = m.apply({"params": p}, t, train=False,
                                       mutable=["intermediates"])
                    return (jnp.sum(out.astype(jnp.float32) ** 2)
                            + collect_moe_aux(mut["intermediates"]))

                # one MoeMlp grad ≈ one block's MoE cost; DEPTH× for a stack
                _time(jax.grad(loss), v["params"], x, label=f"grad_{label}")


if __name__ == "__main__":
    main(sys.argv[1:])
