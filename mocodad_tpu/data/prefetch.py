"""Async host->device batch prefetching.

The reference delegates input pipelining to torch DataLoader worker
processes (utils/dataset.py:306, num_workers=8). The TPU-native
equivalent is simpler: batch assembly (numpy gather + padding) runs in a
background thread while the device executes the previous step, and
`shard_batch`/`device_put` are queued ahead so the transfer overlaps
compute. Device work never waits on host work unless the host falls a
full `depth` batches behind.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Dict, Iterator, Optional

import numpy as np


def prefetch(iterator: Iterator[Dict[str, np.ndarray]],
             place: Optional[Callable[[Dict], Dict]] = None,
             depth: int = 2) -> Iterator[Dict]:
    """Wrap a host batch iterator with a background producer thread.

    place: optional callable applied in the producer thread (e.g.
    `lambda b: shard_batch(b, mesh)`) so device placement is also issued
    ahead of consumption; jax transfers are async, so this just fronts
    the dispatch cost.

    The producer shuts down promptly if the consumer abandons the
    iterator (generator close / GC / an exception in the consuming loop):
    queue puts poll a stop flag instead of blocking forever.
    """
    q: queue.Queue = queue.Queue(maxsize=depth)
    _END = object()
    stop = threading.Event()
    err = []

    def _put(item) -> bool:
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def producer():
        try:
            for batch in iterator:
                if not _put(place(batch) if place is not None else batch):
                    return
        except BaseException as e:  # surface worker errors to the consumer
            err.append(e)
        finally:
            _put(_END)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    try:
        while True:
            try:
                # bounded wait: if the producer thread dies without ever
                # enqueuing the sentinel (interpreter teardown, thread
                # killed), surface an error instead of blocking forever
                item = q.get(timeout=5.0)
            except queue.Empty:
                if not t.is_alive() and q.empty():
                    if err:
                        raise err[0]
                    raise RuntimeError(
                        'prefetch producer died without signalling '
                        'end-of-stream')
                continue
            if item is _END:
                if err:
                    raise err[0]
                return
            yield item
    finally:
        stop.set()
