"""Prefetch loader: ordering, error propagation, overlap."""

import time

import pytest

from dlsc_tpu.data.loader import prefetch


def test_prefetch_preserves_order():
    out = list(prefetch(range(20), lambda x: x * 2, size=4))
    assert out == [x * 2 for x in range(20)]


def test_prefetch_propagates_errors():
    def gen():
        yield 1
        raise RuntimeError("boom")

    it = prefetch(gen(), lambda x: x)
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="boom"):
        next(it)


def test_prefetch_overlaps_transfer():
    def slow_transfer(x):
        time.sleep(0.02)
        return x

    src = range(10)
    t0 = time.time()
    for _ in prefetch(src, slow_transfer, size=3):
        time.sleep(0.02)  # consumer work
    serial_estimate = 10 * 0.04
    assert time.time() - t0 < serial_estimate * 0.85  # overlap achieved


def test_prefetch_early_break_stops_worker():
    import threading

    produced = []

    def gen():
        for i in range(1000):
            produced.append(i)
            yield i

    before = threading.active_count()
    it = prefetch(gen(), lambda x: x, size=2)
    for i, v in enumerate(it):
        if i >= 3:
            break
    it.close()
    time.sleep(0.3)
    assert threading.active_count() <= before + 1
    # worker stopped early (did not drain the whole source)
    assert len(produced) < 50
