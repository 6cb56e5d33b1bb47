"""Native frame ring tests (C++ seqlock ring with Python fallback)."""

import threading

import numpy as np
import pytest

from tti.native import FrameRing, _load_library

SHAPE = (8, 12, 3)


@pytest.fixture(params=["native", "python"])
def ring(request):
    if request.param == "native":
        if _load_library() is None:
            pytest.skip("no compiler for native ring")
        return FrameRing(4, SHAPE, native=True)
    return FrameRing(4, SHAPE, native=False)


def _frame(value):
    return np.full(SHAPE, value, np.uint8)


def test_push_snapshot_order(ring):
    for v in range(3):
        ring.push(_frame(v))
    batch = ring.snapshot(3)
    assert batch.shape == (3, *SHAPE)
    assert [int(batch[i, 0, 0, 0]) for i in range(3)] == [0, 1, 2]


def test_overwrite_keeps_newest(ring):
    for v in range(7):  # capacity 4 -> keeps 3,4,5,6
        ring.push(_frame(v))
    batch = ring.snapshot(4)
    assert [int(b[0, 0, 0]) for b in batch] == [3, 4, 5, 6]
    assert ring.head() == 7


def test_snapshot_fewer_than_requested(ring):
    ring.push(_frame(9))
    batch = ring.snapshot(4)
    assert batch.shape[0] == 1
    assert int(batch[0, 0, 0, 0]) == 9


def test_wrong_frame_size_rejected(ring):
    with pytest.raises(ValueError):
        ring.push(np.zeros((2, 2), np.uint8))


def test_concurrent_producer_consumer():
    if _load_library() is None:
        pytest.skip("no compiler for native ring")
    ring = FrameRing(8, SHAPE, native=True)
    stop = threading.Event()
    errors = []

    def producer():
        v = 0
        while not stop.is_set():
            ring.push(_frame(v % 251))
            v += 1

    def consumer():
        for _ in range(2000):
            batch = ring.snapshot(4)
            for frame in batch:
                # Every frame must be uniform (no torn copies).
                if frame.min() != frame.max():
                    errors.append("torn frame")
                    return

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    consumer()
    stop.set()
    t.join(timeout=2)
    assert not errors
    assert ring.head() > 0


def test_gather_batch_native():
    from tti.native import gather_batch

    if _load_library() is None:
        pytest.skip("no compiler")
    rings = [FrameRing(4, SHAPE, native=True) for _ in range(3)]
    rings[0].push(_frame(10))
    rings[2].push(_frame(30))
    out = np.zeros((3, *SHAPE), np.uint8)
    mask = gather_batch(rings, out)
    assert mask == 0b101
    assert out[0, 0, 0, 0] == 10 and out[2, 0, 0, 0] == 30
    assert out[1].sum() == 0  # empty ring left untouched


def test_gather_batch_python_fallback():
    from tti.native import gather_batch

    rings = [FrameRing(4, SHAPE, native=False) for _ in range(2)]
    rings[1].push(_frame(7))
    out = np.zeros((2, *SHAPE), np.uint8)
    mask = gather_batch(rings, out)
    assert mask == 0b10
    assert out[1, 0, 0, 0] == 7
