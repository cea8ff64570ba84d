"""Background prefetch iterator: ordering, completion, error propagation."""

import time

import pytest

from double_yolo_kaist_tpu.data.pipeline import prefetch


def test_prefetch_preserves_order():
    assert list(prefetch(iter(range(20)), depth=3)) == list(range(20))


def test_prefetch_overlaps():
    def slow_producer():
        for i in range(6):
            time.sleep(0.05)
            yield i

    # measured serial baseline in the same (possibly loaded) environment
    t0 = time.perf_counter()
    for _ in slow_producer():
        time.sleep(0.05)
    serial = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in prefetch(slow_producer(), depth=2):
        time.sleep(0.05)  # consumer work overlaps producer work
    overlapped = time.perf_counter() - t0
    # perfect overlap halves the time; require a clear relative win
    assert overlapped < serial * 0.85, (overlapped, serial)


def test_prefetch_propagates_errors():
    def bad():
        yield 1
        raise ValueError("boom")

    it = prefetch(bad())
    assert next(it) == 1
    with pytest.raises(ValueError, match="boom"):
        list(it)
