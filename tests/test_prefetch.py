"""Background prefetch iterator: ordering, completion, error propagation."""

import time

import pytest

from double_yolo_kaist_tpu.data.pipeline import prefetch


def test_prefetch_preserves_order():
    assert list(prefetch(iter(range(20)), depth=3)) == list(range(20))


def test_prefetch_overlaps():
    def slow_producer():
        for i in range(4):
            time.sleep(0.05)
            yield i

    t0 = time.perf_counter()
    for _ in prefetch(slow_producer(), depth=2):
        time.sleep(0.05)  # consumer work overlaps producer work
    elapsed = time.perf_counter() - t0
    # serial would be ~0.4s; overlapped ~0.25s
    assert elapsed < 0.38, elapsed


def test_prefetch_propagates_errors():
    def bad():
        yield 1
        raise ValueError("boom")

    it = prefetch(bad())
    assert next(it) == 1
    with pytest.raises(ValueError, match="boom"):
        list(it)
