"""Background prefetcher (data/prefetch.py)."""

import threading
import time

import numpy as np
import jax
import pytest

from pychain_tpu.data import Prefetcher, prefetch


def test_order_and_completeness():
    items = list(range(57))
    out = list(prefetch(iter(items), depth=3))
    assert out == items


def test_transfer_runs_in_producer_thread():
    main = threading.get_ident()
    seen = []

    def transfer(x):
        seen.append(threading.get_ident())
        return jax.device_put(np.full((2, 2), x, np.float32))

    out = list(prefetch(range(5), depth=2, transfer=transfer))
    assert len(out) == 5
    assert all(isinstance(o, jax.Array) for o in out)
    np.testing.assert_allclose(np.asarray(out[3]), 3.0)
    assert all(t != main for t in seen)


def test_producer_exception_propagates_in_position():
    def gen():
        yield 1
        yield 2
        raise RuntimeError("boom")

    p = prefetch(gen(), depth=2)
    assert next(p) == 1
    assert next(p) == 2
    with pytest.raises(RuntimeError, match="boom"):
        next(p)
    # after the error the iterator is exhausted, not wedged
    with pytest.raises(StopIteration):
        next(p)


def test_transfer_exception_propagates():
    def bad(x):
        if x == 1:
            raise ValueError("bad transfer")
        return x

    p = prefetch(range(4), depth=2, transfer=bad)
    assert next(p) == 0
    with pytest.raises(ValueError, match="bad transfer"):
        next(p)


def test_early_break_and_close_stop_producer():
    produced = []

    def gen():
        for i in range(10_000):
            produced.append(i)
            yield i

    with Prefetcher(gen(), depth=2) as p:
        got = [next(p) for _ in range(3)]
    assert got == [0, 1, 2]
    n_after_close = len(produced)
    time.sleep(0.3)
    # bounded queue + stop event: the producer halted near where we left
    assert len(produced) == n_after_close
    assert len(produced) <= 3 + 2 + 2


def test_depth_validation():
    with pytest.raises(ValueError):
        prefetch(range(3), depth=0)


def test_overlaps_slow_producer():
    """With depth=2, a consumer that takes as long as the producer
    finishes in ~max(times), not the sum."""
    def gen():
        for i in range(6):
            time.sleep(0.05)
            yield i

    t0 = time.time()
    for _ in prefetch(gen(), depth=2):
        time.sleep(0.05)
    overlapped = time.time() - t0
    # serial would be ~0.6s; allow generous slack for CI jitter
    assert overlapped < 0.55
