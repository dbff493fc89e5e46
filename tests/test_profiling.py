"""Profiling subsystem: trace capture and throughput meter."""

import time

from dlsc_tpu.utils.profiling import Throughput, device_memory_stats, trace


def test_trace_capture(tmp_path):
    import jax
    import jax.numpy as jnp

    with trace(tmp_path / "prof"):
        x = jax.jit(lambda a: a * 2)(jnp.ones((64, 64)))
        jax.block_until_ready(x)
    files = list((tmp_path / "prof").rglob("*"))
    assert files, "trace produced no artifacts"


def test_throughput_meter():
    m = Throughput(n_chips=2)
    m.tick(16)
    time.sleep(0.02)
    m.tick(16)
    time.sleep(0.02)
    m.tick(16)
    cps = m.clips_per_sec_per_chip
    assert 0 < cps < 16 / 0.02  # sane bounds


def test_device_memory_stats_shape():
    stats = device_memory_stats()
    assert isinstance(stats, dict)
