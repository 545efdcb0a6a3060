"""Host prefetch pipeline: ordering, boundedness, error propagation."""

import threading
import time

import pytest

from corsair_tpu.data.prefetch import prefetch_item_batches, prefetch_ordered


def test_yields_in_order_any_workers():
    for workers in (0, 1, 4):
        out = list(prefetch_ordered(lambda i: i * i, 20, workers=workers))
        assert out == [i * i for i in range(20)]


def test_single_worker_preserves_serial_execution_order():
    """workers=1: the make calls RUN in index order (the strict-protocol
    determinism contract — global-RNG consumers see the serial order)."""
    ran = []
    lock = threading.Lock()

    def make(i):
        with lock:
            ran.append(i)
        time.sleep(0.002)
        return i

    assert list(prefetch_ordered(make, 16, workers=1, depth=3)) == list(
        range(16)
    )
    assert ran == list(range(16))


def test_bounded_depth():
    """No more than depth+1 batches are ever materialized ahead of the
    consumer (flat memory at 652-CAD scale)."""
    in_flight = []
    peak = [0]
    lock = threading.Lock()

    def make(i):
        with lock:
            in_flight.append(i)
            peak[0] = max(peak[0], len(in_flight))
        time.sleep(0.005)
        return i

    gen = prefetch_ordered(make, 12, workers=4, depth=2)
    for v in gen:
        time.sleep(0.01)  # slow consumer
        with lock:
            in_flight.remove(v)
    # consumer holds 1, prefetcher at most depth+1 more
    assert peak[0] <= 4


def test_exception_propagates():
    def make(i):
        if i == 3:
            raise ValueError("boom")
        return i

    gen = prefetch_ordered(make, 6, workers=2)
    out = []
    with pytest.raises(ValueError, match="boom"):
        for v in gen:
            out.append(v)
    assert out == [0, 1, 2]


def test_item_batches():
    items = {i: {"v": i} for i in range(10)}
    batches = [range(0, 4), range(4, 8), range(8, 10)]
    got = list(
        prefetch_item_batches(items.__getitem__, batches, workers=2)
    )
    assert [len(b) for b in got] == [4, 4, 2]
    assert got[2] == [{"v": 8}, {"v": 9}]
