"""Host-side batch prefetch.

The reference overlaps batch assembly with device compute via
``DataLoader(num_workers=4)`` (ref main.py:155). The equivalent here is a
single background thread that runs the (C++/numpy) batch assembly ahead of
the training loop, bounded by a small queue. Device interaction
(``jnp.asarray`` / ``device_put``) stays on the caller's thread — only the
host-side numpy work moves; order is preserved exactly, so training is
bit-identical with prefetch on or off.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, TypeVar

T = TypeVar("T")

_SENTINEL = object()


def prefetched(it: Iterable[T], depth: int = 2) -> Iterator[T]:
    """Iterate ``it`` on a daemon thread, keeping up to ``depth`` items
    ready. Exceptions from the producer re-raise at the consumer's next
    item. ``depth <= 0`` returns ``it`` unchanged.

    An abandoned consumer (exception/break mid-epoch, generator GC) stops
    the producer: the generator's ``finally`` sets a stop event that the
    producer polls while putting, so no thread stays blocked holding
    assembled batches."""
    if depth <= 0:
        return iter(it)

    q: queue.Queue = queue.Queue(maxsize=depth)
    stop = threading.Event()

    def _put(item) -> bool:
        """put() that gives up when the consumer is gone."""
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            for item in it:
                if not _put(item):
                    return
        except BaseException as e:  # noqa: BLE001 — re-raised in consumer
            _put((_SENTINEL, e))
            return
        _put((_SENTINEL, None))

    def gen():
        # start the producer at FIRST iteration, not at call time: a
        # never-started generator has no frame, so its finally never runs —
        # an eagerly-started thread would leak forever (blocked in _put,
        # holding up to ``depth`` dense batches) if the caller drops the
        # generator before iterating
        threading.Thread(target=worker, daemon=True).start()
        try:
            while True:
                item = q.get()
                if isinstance(item, tuple) and len(item) == 2 \
                        and item[0] is _SENTINEL:
                    if item[1] is not None:
                        raise item[1]
                    return
                yield item
        finally:
            stop.set()

    return gen()
