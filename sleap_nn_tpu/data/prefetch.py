"""Bounded background-thread prefetch for host-side data generators.

Overlaps host decode/collate work with device compute: the training loop's
``next(batch)`` returns a batch that was prepared while the previous jitted
step was executing (JAX dispatch is asynchronous, so the host is otherwise
idle during device steps). Equivalent role to the reference's DataLoader
worker processes (reference: sleap_nn/data/custom_datasets.py get_train_val
dataloaders, num_workers) — a thread is the right grain here because batch
assembly is numpy-bound slicing, not Python-level CPU work.
"""

from __future__ import annotations

import queue
import threading
import weakref
from typing import Optional


class PrefetchIterator:
    """Wrap a generator with a bounded background-thread prefetch queue.

    Abandonment-safe: consumers that break out of iteration early (the
    steps-per-epoch cap does this every epoch) would otherwise leave the
    worker parked forever on the bounded queue, leaking a thread plus the
    buffered batches. The worker's puts poll a stop flag, and the flag is
    raised by :meth:`close`, garbage collection of the iterator, or
    generator exhaustion — so no thread or pinned batch outlives its
    consumer.
    """

    def __init__(self, gen, prefetch: int = 2):
        self.q: queue.Queue = queue.Queue(maxsize=prefetch)
        self._done = object()
        # Error transported via a mutable cell, not an attribute: the worker
        # closure must hold NO reference to self, or the running thread keeps
        # the iterator alive and the GC finalizer below can never fire.
        self._err_cell: list = []
        self._stop = threading.Event()
        stop = self._stop
        q = self.q
        done = self._done
        err_cell = self._err_cell

        def put(item) -> bool:
            """Bounded put that gives up when the consumer went away."""
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def worker():
            try:
                for item in gen:
                    if not put(item):
                        return  # abandoned: drop everything, exit
            except BaseException as e:  # propagate into the consumer
                err_cell.append(e)
            finally:
                put(done)

        self.thread = threading.Thread(target=worker, daemon=True)
        self.thread.start()
        # GC of the iterator releases the worker even without close().
        self._finalizer = weakref.finalize(self, stop.set)

    @property
    def _err(self) -> Optional[BaseException]:
        return self._err_cell[0] if self._err_cell else None

    def close(self):
        """Release the worker thread (safe to call multiple times)."""
        self._stop.set()
        # Drain anything buffered so the worker's pending put unblocks.
        try:
            while True:
                self.q.get_nowait()
        except queue.Empty:
            pass

    def __iter__(self):
        return self

    def __next__(self):
        if self._stop.is_set():
            raise StopIteration
        item = self.q.get()
        if item is self._done:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item
