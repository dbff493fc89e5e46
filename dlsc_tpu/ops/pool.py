"""Max pooling with an argmax-capture backward (EnvNet's pools).

XLA lowers ``nn.max_pool``'s gradient through select-and-scatter, which
re-reads the pool *input* (451 MB for EnvNet's (1,64) front-end pool at
batch 32). For the non-overlapping pools EnvNet uses (stride == window
everywhere: (1,64), (5,3), (1,2)×3 — reference: src/models/envnet_v2.py:
23, 44), the gradient is a pure scatter of dy into the per-window argmax
slot, expressible as ONE fused elementwise compare+select pass over the
input shape — no input re-read, no select-and-scatter (VERDICT r3 #8).

**Measured outcome (v5e, round 4): refuted.** scripts/bench_envnet.py
A/B: xla 81 vs grab 91 ms/step (bf16 b32), 105 vs 121 (fp32 b32) — the
forward argmax reduce plus the window-expanded compare/select write cost
more than select-and-scatter's input re-read at these window shapes, so
``EnvNetV2`` defaults to ``pool_impl='xla'`` and this module remains the
measured-alternative probe knob. This closes the round-3 step-anatomy
hypothesis ("the pool-backward itself was never attacked") with numbers.

Forward values are identical to ``nn.max_pool`` (VALID, stride=window;
the dropped remainder gets zero gradient). On max ties the subgradient
goes to the first maximum (torch's MaxPool semantics); XLA's
select-and-scatter makes its own tie choice, so *gradients* on exactly
tied inputs may route differently — measure-zero for float data.

2-D windows decompose into sequential per-axis pools: with aligned
non-overlapping windows, ``max over (5,3)`` ≡ ``max over rows then max
over cols`` (and the captured argmax chain composes in the backward).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def axis_max_pool(x, window: int, axis: int):
    """Non-overlapping (stride == window) VALID max pool along ``axis``."""
    return _pool_fwd(x, window, axis)[0]


def _reshape_windows(x, window: int, axis: int):
    n = x.shape[axis]
    nw = n // window
    xc = jax.lax.slice_in_dim(x, 0, nw * window, axis=axis)
    shape = x.shape[:axis] + (nw, window) + x.shape[axis + 1:]
    return xc.reshape(shape), nw


def _pool_fwd(x, window: int, axis: int):
    xr, _ = _reshape_windows(x, window, axis)
    m = xr.max(axis=axis + 1)
    am = xr.argmax(axis=axis + 1).astype(jnp.int32)
    return m, (am, x.shape[axis])


def _pool_bwd(window: int, axis: int, res, dy):
    am, n = res
    nw = n // window
    # dxr[..., w, j, ...] = dy[..., w, ...] where j == argmax, else 0 —
    # one elementwise pass over the (cropped) input shape.
    iota_shape = dy.shape[:axis + 1] + (window,) + dy.shape[axis + 1:]
    j = jax.lax.broadcasted_iota(jnp.int32, iota_shape, axis + 1)
    dxr = jnp.where(j == jnp.expand_dims(am, axis + 1),
                    jnp.expand_dims(dy, axis + 1), jnp.zeros((), dy.dtype))
    flat = dy.shape[:axis] + (nw * window,) + dy.shape[axis + 1:]
    dx = dxr.reshape(flat)
    if nw * window < n:  # VALID remainder: zero gradient
        pad = [(0, 0)] * dx.ndim
        pad[axis] = (0, n - nw * window)
        dx = jnp.pad(dx, pad)
    return (dx,)


axis_max_pool.defvjp(lambda x, w, a: _pool_fwd(x, w, a), _pool_bwd)


def max_pool_grab(x, window: tuple[int, int]):
    """``nn.max_pool(x, window, strides=window, padding='VALID')`` on NHWC
    via per-axis argmax-capture pools (H then W; skips unit axes)."""
    wh, ww = window
    if wh > 1:
        x = axis_max_pool(x, wh, 1)
    if ww > 1:
        x = axis_max_pool(x, ww, 2)
    return x
