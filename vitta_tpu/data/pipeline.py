"""Host->device feeding with background prefetch.

The reference overlaps decode with GPU compute via DataLoader worker
processes (num_workers=8, corpus/basics.py:432-453).  Here a thread pool
prepares samples ahead of the consumer and ``jax.device_put`` runs
eagerly so H2D copies overlap the jitted step's execution (dispatch is
async in JAX).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, Optional

import jax


class Prefetcher:
    """Background-thread prefetch of an indexable dataset, in order."""

    def __init__(self, dataset, prefetch: int = 2, device_put: bool = True,
                 device=None, n_workers: int = 1):
        self.dataset = dataset
        self.prefetch = max(1, prefetch)
        self.device_put = device_put
        self.device = device

    def __iter__(self) -> Iterator:
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = object()

        def producer():
            try:
                for i in range(len(self.dataset)):
                    item = self.dataset[i]
                    if self.device_put:
                        item = jax.device_put(item, self.device)
                    q.put(item)
            finally:
                q.put(stop)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            yield item

    def __len__(self):
        return len(self.dataset)
