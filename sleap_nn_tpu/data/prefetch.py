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
from typing import Optional


class PrefetchIterator:
    """Wrap a generator with a bounded background-thread prefetch queue."""

    def __init__(self, gen, prefetch: int = 2):
        self.q: queue.Queue = queue.Queue(maxsize=prefetch)
        self._done = object()
        self._err: Optional[BaseException] = None

        def worker():
            try:
                for item in gen:
                    self.q.put(item)
            except BaseException as e:  # propagate into the consumer
                self._err = e
            finally:
                self.q.put(self._done)

        self.thread = threading.Thread(target=worker, daemon=True)
        self.thread.start()

    def __iter__(self):
        return self

    def __next__(self):
        item = self.q.get()
        if item is self._done:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item
