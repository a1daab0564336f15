import os
import threading
import time

import numpy as np
import pytest

from fast_artistic_videos_tpu.core import io
from fast_artistic_videos_tpu.utils import pipeline


def test_file_complete_flo(tmp_path, rng):
    p = str(tmp_path / "a.flo")
    flow = rng.normal(size=(8, 8, 2)).astype(np.float32)
    io.write_flo(p, flow)
    assert pipeline.file_complete(p)
    # truncated payload is detected (the reference's 1 Hz poll + 1 s sleep
    # guessed at completeness; we check the declared size)
    data = open(p, "rb").read()
    open(p, "wb").write(data[: len(data) // 2])
    assert not pipeline.file_complete(p)


def test_file_complete_pgm(tmp_path):
    p = str(tmp_path / "a.pgm")
    io.write_pgm(p, np.zeros((6, 6), np.uint8))
    assert pipeline.file_complete(p)
    open(p, "wb").write(open(p, "rb").read()[:-10])
    assert not pipeline.file_complete(p)


def test_wait_for_file_timeout(tmp_path):
    assert not pipeline.wait_for_file(str(tmp_path / "never"), poll_seconds=0.01,
                                      timeout=0.05)


def test_wait_for_file_concurrent_producer(tmp_path):
    """The reference's producer/consumer contract: the consumer blocks until
    the (complete) file appears (utils.lua:74-80)."""
    p = str(tmp_path / "late.flo")

    def producer():
        time.sleep(0.1)
        io.write_flo(p, np.zeros((4, 4, 2), np.float32))

    t = threading.Thread(target=producer)
    t.start()
    assert pipeline.wait_for_file(p, poll_seconds=0.01, timeout=5.0)
    t.join()


def test_prefetcher_order_and_stop():
    seen = []

    def load(i):
        if i > 4:
            return None
        return i * 10

    out = list(pipeline.Prefetcher(load, range(1, 10), depth=2))
    assert out == [(1, 10), (2, 20), (3, 30), (4, 40)]
    del seen


def test_prefetcher_propagates_errors():
    def load(i):
        if i == 2:
            raise RuntimeError("boom")
        return i

    with pytest.raises(RuntimeError, match="boom"):
        list(pipeline.Prefetcher(load, range(5)))


def test_async_writer(tmp_path):
    w = pipeline.AsyncWriter()
    done = []
    for i in range(5):
        w.put(lambda i=i: done.append(i))
    w.close()
    assert done == [0, 1, 2, 3, 4]


def test_async_writer_surfaces_errors():
    w = pipeline.AsyncWriter()
    w.put(lambda: 1 / 0)
    with pytest.raises(ZeroDivisionError):
        w.close()
