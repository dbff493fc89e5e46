"""CPU parity tests for the shape-specialized attention kernel.

``ops/attn_fast.py``'s production numerics are validated on real TPU
hardware by ``scripts/bench_probe.py`` (check_splash_correctness); these
tests lock the same math — flat softmax, static column masking, the
custom_vjp residual wiring into the library's fused dkv backward — in CI
via the Pallas interpreter, so kernel edits can't silently drift.

reference: behavioral equivalent of torch.nn.MultiheadAttention used by
src/models/ast_small.py:22 (full bidirectional MHA over real tokens).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dlsc_tpu.ops.attn_fast import make_fast_mha

H, N, DH = 2, 256, 64


def _dense_oracle(q, k, v, n_real):
    """(H, N, dh) dense softmax attention masking kv positions >= n_real.

    Matches the kernel convention: q is already softmax-scale-scaled by the
    caller, pad q-rows still attend real tokens (their output is garbage the
    model ignores — compare only rows < n_real)."""
    s = jnp.einsum(
        "hqd,hkd->hqk", q.astype(jnp.float32), k.astype(jnp.float32)
    )
    if n_real < q.shape[1]:
        keep = jnp.arange(q.shape[1])[None, None, :] < n_real
        s = jnp.where(keep, s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("hqk,hkd->hqd", p, v.astype(jnp.float32))


def _qkv(seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(
        rng.standard_normal((H, N, DH)).astype(np.float32), dtype=dtype
    )
    return mk(), mk(), mk()


@pytest.mark.parametrize("n_real,n_split", [(N, 1), (200, 1), (200, 4)])
def test_forward_matches_dense(n_real, n_split):
    q, k, v = _qkv()
    q = q * DH**-0.5
    kernel = make_fast_mha(
        H, N, DH, n_real, 128, 128, 128, "float32",
        n_split=n_split, interpret=True,
    )
    got = kernel(q, k, v)
    want = _dense_oracle(q, k, v, n_real)
    np.testing.assert_allclose(
        np.asarray(got)[:, :n_real], np.asarray(want)[:, :n_real],
        rtol=2e-5, atol=2e-5,
    )


@pytest.mark.slow
@pytest.mark.parametrize("bwd_impl,n_real,n_split_bwd", [
    ("library", 200, 0),
    ("fast", 200, 0),     # pad boundary: 200 < n_cols=256 → in-kernel mask
    ("fast", N, 0),       # no mask
    ("fast", 200, 4),     # sub-chunked backward
])
def test_gradients_match_dense(bwd_impl, n_real, n_split_bwd):
    """The custom_vjp backward (both the shape-specialized kernel and the
    library fused dkv path) produces the dense oracle's gradients, incl.
    with a pad boundary."""
    q, k, v = _qkv(seed=1)
    q = q * DH**-0.5
    kernel = make_fast_mha(
        H, N, DH, n_real, 128, 128, 128, "float32", interpret=True,
        bwd_impl=bwd_impl, n_split_bwd=n_split_bwd,
    )
    # weight real rows only: pad q-rows are explicitly unspecified
    w = (jnp.arange(N) < n_real).astype(jnp.float32)[None, :, None]

    def loss_k(q, k, v):
        return jnp.sum((kernel(q, k, v) * w) ** 2)

    def loss_d(q, k, v):
        return jnp.sum((_dense_oracle(q, k, v, n_real) * w) ** 2)

    got = jax.grad(loss_k, argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(loss_d, argnums=(0, 1, 2))(q, k, v)
    for g, x, name in zip(got, want, "qkv"):
        scale = np.abs(np.asarray(x)).max() or 1.0
        np.testing.assert_allclose(
            np.asarray(g) / scale, np.asarray(x) / scale,
            rtol=5e-5, atol=5e-5, err_msg=f"d{name}",
        )


def test_exp2_matches_default_fwd_and_grads():
    """Base-2 softmax variant (use_exp2): identical outputs and gradients to
    the natural-base kernel — 2^(log2e*(s-m)) = e^(s-m) and the lse
    convention switches consistently between fwd and the fast bwd."""
    n_real = 200
    q, k, v = _qkv(seed=7)
    q = q * DH**-0.5
    base = make_fast_mha(H, N, DH, n_real, 128, 128, 128, "float32",
                         interpret=True, bwd_impl="fast")
    exp2 = make_fast_mha(H, N, DH, n_real, 128, 128, 128, "float32",
                         interpret=True, bwd_impl="fast", use_exp2=True)
    o_base = base(q, k, v)
    o_exp2 = exp2(q, k, v)
    np.testing.assert_allclose(np.asarray(o_exp2)[:, :n_real],
                               np.asarray(o_base)[:, :n_real], atol=1e-5)

    def loss(f, q, k, v):
        return jnp.sum(f(q, k, v)[:, :n_real].astype(jnp.float32) ** 2)

    g_base = jax.grad(lambda *a: loss(base, *a), argnums=(0, 1, 2))(q, k, v)
    g_exp2 = jax.grad(lambda *a: loss(exp2, *a), argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_exp2, g_base, ["dq", "dk", "dv"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4,
                                   err_msg=name)
