"""Host loader utilities: background prefetch of batches to device.

The reference overlaps IO with compute via DataLoader worker processes
(reference: src/datasets/esc50.py:595-605). Here the host work is an mmap
slice + device_put, so a single background thread that stays ``size``
batches ahead of the training loop gives the same overlap without process
forking (and composes with sharded device_put for multi-chip).
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator

_SENTINEL = object()


def prefetch(
    iterator: Iterable,
    transfer: Callable,
    size: int = 2,
) -> Iterator:
    """Yield ``transfer(item)`` for each item, computed ``size`` items ahead
    on a daemon thread. Exceptions propagate to the consumer; closing the
    generator early (break / GeneratorExit) stops and unblocks the worker so
    no thread or queued device buffers leak."""
    q: queue.Queue = queue.Queue(maxsize=size)
    stop = threading.Event()

    def worker():
        try:
            for item in iterator:
                out = transfer(item)
                while not stop.is_set():
                    try:
                        q.put(out, timeout=0.1)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
        except BaseException as e:  # noqa: BLE001 — forward to consumer
            if not stop.is_set():
                q.put(("__error__", e))
            return
        q.put(_SENTINEL)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _SENTINEL:
                break
            if isinstance(item, tuple) and len(item) == 2 and item[0] == "__error__":
                raise item[1]
            yield item
    finally:
        stop.set()
        while not q.empty():  # drop staged items so buffers free promptly
            try:
                q.get_nowait()
            except queue.Empty:
                break
