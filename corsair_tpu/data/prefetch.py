"""Bounded host-side batch prefetch: overlap item preparation with
device extraction.

TPU-native replacement for the reference's
``DataLoader(num_workers=2..8, collate_pair_fn)`` input pipeline
(``evaluation.py:161-174``): while the device runs batch *i*'s forward,
worker threads read/normalize/voxelize batch *i+1*'s items, so host
preparation no longer serializes against the accelerator. The queue is
bounded (``depth`` batches in flight) so memory stays flat at scale.

Determinism contract: batches are SUBMITTED in order. With
``workers=1`` every item callable runs in exactly the serial-execution
order, which keeps paths that consume the global ``np.random`` stream
(the strict-protocol mining path, ``datasets/ScannetDataset.py:197-292``)
bit-identical to the unprefetched run. Item callables that are pure
functions of their index (the eval light path, the CAD library) are
safe at any worker count.
"""

from __future__ import annotations

from collections import deque
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterator, Sequence, TypeVar

T = TypeVar("T")


def prefetch_ordered(
    make: Callable[[int], T],
    n: int,
    workers: int = 2,
    depth: int = 2,
) -> Iterator[T]:
    """Yield ``make(0), make(1), ..., make(n-1)`` in order, computing up
    to ``depth`` results ahead on ``workers`` threads.

    Exceptions raised inside ``make`` propagate to the consumer at the
    corresponding yield (pending work is cancelled/drained).
    """
    if n <= 0:
        return
    if workers <= 0:
        for i in range(n):
            yield make(i)
        return
    with ThreadPoolExecutor(max_workers=workers) as ex:
        pending: deque = deque()
        nxt = 0
        try:
            while pending or nxt < n:
                while nxt < n and len(pending) < depth + 1:
                    pending.append(ex.submit(make, nxt))
                    nxt += 1
                yield pending.popleft().result()
        finally:
            for f in pending:
                f.cancel()


def prefetch_item_batches(
    getter: Callable[[int], dict],
    indices_batches: Sequence[Sequence[int]],
    workers: int = 2,
    depth: int = 2,
) -> Iterator[list]:
    """Prefetch batches of dataset items: each yielded element is
    ``[getter(i) for i in indices_batches[k]]``, in batch order."""
    def make(k: int) -> list:
        return [getter(i) for i in indices_batches[k]]

    return prefetch_ordered(make, len(indices_batches), workers=workers,
                            depth=depth)
