"""Background batch prefetching — overlap host-side batch assembly and
host->device transfer with device compute.

The reference's training loops (pychain_example) assemble each batch on
the host synchronously between steps; on a TPU the accelerator sits
idle during padding, graph batching, and feature decode.  ``prefetch``
runs the producing iterator in a daemon thread with a bounded queue,
optionally applying a ``transfer`` function (typically
``jax.device_put`` with a sharding) inside the producer thread so the
copy is in flight before the consumer asks for the batch.

JAX dispatch is already asynchronous; what this hides is the *host*
work (python-side assembly, decode, padding) and the enqueue of the
transfer, which otherwise serialize with the step dispatch.
"""

from __future__ import annotations

import queue
import threading


class _End:
    """Queue sentinel: producer finished (possibly with an error)."""

    def __init__(self, exc=None):
        self.exc = exc


class Prefetcher:
    """Iterate ``iterator`` in a background thread, ``depth`` items ahead.

    ``transfer`` (optional) is applied to each item IN THE PRODUCER
    THREAD before it is queued — pass ``jax.device_put`` (or a partial
    with a sharding) to overlap host->device copies with compute.

    Exceptions raised by the iterator or by ``transfer`` re-raise in
    the consumer at the position they occurred.  ``close()`` stops the
    producer promptly (also called by ``__exit__`` and the finalizer);
    breaking out of a consuming loop early is safe.
    """

    def __init__(self, iterator, depth: int = 2, transfer=None):
        if depth < 1:
            raise ValueError("depth must be >= 1")
        self._queue = queue.Queue(maxsize=depth)
        self._stop = threading.Event()
        self._thread = threading.Thread(
            target=self._produce, args=(iter(iterator), transfer),
            daemon=True)
        self._thread.start()

    def _produce(self, it, transfer):
        try:
            for item in it:
                if transfer is not None:
                    item = transfer(item)
                while not self._stop.is_set():
                    try:
                        self._queue.put(item, timeout=0.1)
                        break
                    except queue.Full:
                        continue
                if self._stop.is_set():
                    return
            end = _End()
        except BaseException as exc:  # noqa: BLE001 — re-raised in consumer
            end = _End(exc)
        while not self._stop.is_set():
            try:
                self._queue.put(end, timeout=0.1)
                return
            except queue.Full:
                continue

    def __iter__(self):
        return self

    def __next__(self):
        if self._stop.is_set():
            raise StopIteration
        item = self._queue.get()
        if isinstance(item, _End):
            self._stop.set()
            if item.exc is not None:
                raise item.exc
            raise StopIteration
        return item

    def close(self):
        self._stop.set()
        # drain so a blocked producer can observe the stop event
        try:
            while True:
                self._queue.get_nowait()
        except queue.Empty:
            pass
        self._thread.join(timeout=5.0)

    def __enter__(self):
        return self

    def __exit__(self, *exc_info):
        self.close()
        return False

    def __del__(self):
        try:
            self._stop.set()
        except Exception:  # pragma: no cover — interpreter teardown
            pass


def prefetch(iterator, depth: int = 2, transfer=None) -> Prefetcher:
    """Convenience constructor; see :class:`Prefetcher`."""
    return Prefetcher(iterator, depth=depth, transfer=transfer)
