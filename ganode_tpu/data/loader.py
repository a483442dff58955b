"""Device feeding: background prefetch and multi-host array assembly.

The reference used DataLoader worker processes for decode parallelism (reference
dataset/data_loader.py:64-68); here decode happened offline (see ucf101.pack_ucf101),
so the loader's job is only to keep the device fed: a small thread pool pulls
batches from the (pure, keyed) samplers and stages them on device ahead of the
training step.
"""
from __future__ import annotations

import queue
import threading
from typing import Iterator

import jax
import numpy as np


def prefetch(iterator: Iterator, size: int = 2) -> Iterator:
    """Run ``iterator`` in a background thread, keeping ``size`` batches staged on
    the default device."""
    q: queue.Queue = queue.Queue(maxsize=size)
    _sentinel = object()

    def worker():
        try:
            for item in iterator:
                q.put(jax.device_put(item))
        finally:
            q.put(_sentinel)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _sentinel:
            return
        yield item


def make_global_batch(local_batch: np.ndarray, sharding) -> jax.Array:
    """Assemble a process-local batch into a globally sharded jax.Array (the
    multi-host feeding path: each host provides its stripe)."""
    return jax.make_array_from_process_local_data(sharding, local_batch)
