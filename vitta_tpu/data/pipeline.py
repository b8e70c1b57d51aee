"""Host->device feeding with background prefetch.

The reference overlaps decode with GPU compute via DataLoader worker
processes (num_workers=8, corpus/basics.py:432-453, utils/opts.py:63).
Here a thread pool prepares samples ahead of the consumer (decode and
the C++ preprocessing kernels release the GIL, so threads genuinely
overlap on multi-core hosts) and ``jax.device_put`` runs eagerly so H2D
copies overlap the jitted step's execution (dispatch is async in JAX).
"""

from __future__ import annotations

import collections
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator

import jax


class Prefetcher:
    """Ordered multi-worker prefetch of an indexable dataset.

    ``n_workers`` threads call ``dataset[i]`` concurrently; results are
    yielded strictly in index order with at most
    ``max(prefetch, n_workers)`` items in flight.
    """

    def __init__(self, dataset, prefetch: int = 2, device_put: bool = True,
                 device=None, n_workers: int = 1, start: int = 0):
        self.dataset = dataset
        self.prefetch = max(1, prefetch)
        self.device_put = device_put
        self.device = device
        self.n_workers = max(1, n_workers)
        # first index to yield (mid-stream resume, adapt/stream_ckpt.py)
        self.start = start

    def _fetch(self, i: int):
        item = self.dataset[i]
        if self.device_put:
            item = jax.device_put(item, self.device)
        return item

    def __iter__(self) -> Iterator:
        n = len(self.dataset)
        window = max(self.prefetch, self.n_workers)
        with ThreadPoolExecutor(max_workers=self.n_workers) as pool:
            pending = collections.deque(
                pool.submit(self._fetch, i)
                for i in range(self.start, min(self.start + window, n)))
            nxt = self.start + len(pending)
            while pending:
                item = pending.popleft().result()
                if nxt < n:
                    pending.append(pool.submit(self._fetch, nxt))
                    nxt += 1
                yield item

    def __len__(self):
        return len(self.dataset) - self.start
