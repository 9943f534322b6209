"""Device prefetch: overlap host->device batch transfer with TPU compute.

The reference hides host latency behind MXNet's threaded C++ iterator; on
TPU the equivalent is keeping N batches in flight with ``jax.device_put`` on
a background thread, so the train step never waits on PCIe/tunnel transfer.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional

import jax


def prefetch_to_device(iterable, size: int = 2, sharding=None) -> Iterator:
    """Yield batches already resident on device, ``size`` in flight.

    ``sharding`` (e.g. a batch NamedSharding) controls placement; None puts
    on the default device.
    """
    q: queue.Queue = queue.Queue(maxsize=size)
    _END = object()

    def put(batch):
        if callable(sharding):
            return sharding(batch)  # custom per-leaf placement
        if sharding is not None:
            return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
        return jax.tree.map(jax.device_put, batch)

    def producer():
        try:
            for batch in iterable:
                q.put(put(batch))
            q.put(_END)
        except BaseException as e:  # surface to the consumer, don't die silently
            q.put(e)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            break
        if isinstance(item, BaseException):
            raise item
        yield item
