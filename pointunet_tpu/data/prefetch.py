"""Host-side pipeline overlap: background prefetch of batch iterators.

Fills the role of the reference's tensorpack `QueueInput` +
`MultiProcessMapDataZMQ(nr_proc=2)` (reference data_sampler.py:343,
train.py:270): while the device runs step N, the host prepares batch N+1.
A bounded queue keeps memory flat; threads suffice because the batch
builders are numpy (which releases the GIL for the heavy ops) and the
consumer blocks in the XLA runtime anyway.
"""
from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator, Sequence

_STOP = object()


class PrefetchIterator:
    """Wrap an iterator; a daemon thread stays ``buffer_size`` items ahead.

    Exceptions in the producer propagate to the consumer on the next
    ``__next__``. The producer thread exits when the source is exhausted,
    the consumer is garbage-collected, or ``close()`` is called.
    """

    def __init__(self, source: Iterable, buffer_size: int = 4):
        self._queue: queue.Queue = queue.Queue(maxsize=max(1, buffer_size))
        self._closed = threading.Event()
        self._thread = threading.Thread(
            target=self._produce, args=(iter(source),), daemon=True
        )
        self._thread.start()

    def _produce(self, it: Iterator):
        try:
            for item in it:
                while not self._closed.is_set():
                    try:
                        self._queue.put(item, timeout=0.5)
                        break
                    except queue.Full:
                        continue
                if self._closed.is_set():
                    return
            self._put(_STOP)
        except BaseException as e:  # propagate to the consumer
            self._put(e)

    def _put(self, item):
        while not self._closed.is_set():
            try:
                self._queue.put(item, timeout=0.5)
                return
            except queue.Full:
                continue

    def __iter__(self):
        return self

    def __next__(self):
        if self._closed.is_set():
            raise StopIteration
        item = self._queue.get()
        if item is _STOP:
            self._closed.set()
            raise StopIteration
        if isinstance(item, BaseException):
            self._closed.set()
            raise item
        return item

    def close(self):
        self._closed.set()

    def __del__(self):
        self.close()


def prefetch(source: Iterable, buffer_size: int = 4) -> Iterable:
    """Convenience wrapper; buffer_size <= 0 disables prefetching."""
    if buffer_size <= 0:
        return source
    return PrefetchIterator(source, buffer_size)


def prefetch_map(
    fn: Callable, items: Sequence, num_threads: int = 2,
    buffer_size: int = 4,
) -> Iterable:
    """Ordered parallel map with bounded lookahead — the
    MultiProcessMapDataZMQ analog for per-item preprocessing."""
    from concurrent.futures import ThreadPoolExecutor

    def gen():
        with ThreadPoolExecutor(num_threads) as pool:
            pending = []
            it = iter(items)
            try:
                for _ in range(buffer_size):
                    pending.append(pool.submit(fn, next(it)))
            except StopIteration:
                it = None
            while pending:
                yield pending.pop(0).result()
                if it is not None:
                    try:
                        pending.append(pool.submit(fn, next(it)))
                    except StopIteration:
                        it = None

    return gen()
