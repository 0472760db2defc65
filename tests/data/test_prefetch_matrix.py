"""PrefetchIterator concurrency matrix.

Parity target: the reference DataLoader-worker failure semantics
(generator exceptions propagate to the consumer; abandoned iterators leak
nothing) against sleap_nn_tpu/data/prefetch.py.
"""

from __future__ import annotations

import gc
import threading
import time

import pytest

from sleap_nn_tpu.data.prefetch import PrefetchIterator


def test_yields_all_items_in_order():
    it = PrefetchIterator(iter(range(20)), prefetch=3)
    assert list(it) == list(range(20))


def test_generator_exception_propagates_to_consumer():
    def gen():
        yield 1
        yield 2
        raise ValueError("decoder died mid-video")

    it = PrefetchIterator(gen(), prefetch=2)
    got = []
    with pytest.raises(ValueError, match="decoder died"):
        for x in it:
            got.append(x)
    assert got == [1, 2]


def test_exception_on_first_item_propagates():
    def gen():
        raise OSError("cannot open video")
        yield  # pragma: no cover

    it = PrefetchIterator(gen(), prefetch=2)
    with pytest.raises(OSError, match="cannot open"):
        next(it)


def test_close_releases_worker_thread():
    release = threading.Event()

    def gen():
        for i in range(1000):
            yield i
        release.set()

    it = PrefetchIterator(gen(), prefetch=1)
    assert next(it) == 0
    t = it.thread
    it.close()
    t.join(timeout=5)
    assert not t.is_alive()
    assert not release.is_set()  # worker exited early, not by exhaustion


def test_close_is_idempotent_and_stops_iteration():
    it = PrefetchIterator(iter(range(10)), prefetch=2)
    next(it)
    it.close()
    it.close()
    with pytest.raises(StopIteration):
        next(it)


def test_abandoned_iterator_gc_releases_thread():
    def gen():
        i = 0
        while True:
            yield i
            i += 1

    it = PrefetchIterator(gen(), prefetch=1)
    next(it)
    t = it.thread
    del it
    gc.collect()
    t.join(timeout=5)
    assert not t.is_alive(), "worker leaked after the iterator was GC'd"


def test_slow_consumer_bounded_queue():
    produced = []

    def gen():
        for i in range(100):
            produced.append(i)
            yield i

    it = PrefetchIterator(gen(), prefetch=2)
    time.sleep(0.3)  # let the worker run ahead as far as it can
    # Bounded queue: the producer cannot run arbitrarily far ahead.
    assert len(produced) <= 2 + 2  # queue capacity + in-flight item slack
    assert next(it) == 0
    it.close()


def test_empty_generator_stops_immediately():
    it = PrefetchIterator(iter(()), prefetch=2)
    with pytest.raises(StopIteration):
        next(it)
