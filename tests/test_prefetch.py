"""Async batch prefetcher: ordering, placement hook, error propagation."""

import numpy as np
import pytest

from mocodad_tpu.data.prefetch import prefetch


def test_prefetch_preserves_order_and_content():
    batches = [{'x': np.full((2,), i)} for i in range(10)]
    out = list(prefetch(iter(batches), depth=3))
    assert [int(b['x'][0]) for b in out] == list(range(10))


def test_prefetch_place_runs_in_producer():
    batches = [{'x': np.ones(2) * i} for i in range(5)]
    out = list(prefetch(iter(batches),
                        place=lambda b: {'x2': b['x'] * 2}))
    assert [float(b['x2'][0]) for b in out] == [0.0, 2.0, 4.0, 6.0, 8.0]


def test_prefetch_producer_stops_on_abandoned_iterator():
    import threading
    import time

    started = threading.Event()
    produced = []

    def gen():
        for i in range(1000):
            started.set()
            produced.append(i)
            yield {'x': np.zeros(1)}

    it = prefetch(gen(), depth=1)
    next(it)
    started.wait(5)
    it.close()          # consumer walks away mid-stream
    time.sleep(0.5)     # producer must unblock and exit, not spin forever
    n = len(produced)
    time.sleep(0.3)
    assert len(produced) == n  # no further production after close


def test_prefetch_propagates_worker_errors():
    def gen():
        yield {'x': np.zeros(1)}
        raise RuntimeError('boom')

    it = prefetch(gen())
    next(it)
    with pytest.raises(RuntimeError, match='boom'):
        list(it)
