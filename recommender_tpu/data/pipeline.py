"""Host input-pipeline utilities: fixed-shape batching and device prefetch.

TPU-native replacement for the reference's uniform
``.shuffle(k·batch).batch(b).prefetch(10)`` idiom (``ctr/train.py:59-61``,
``dien/train.py:120-122``, ``esmm/train.py:219-234``, ``eges/train.py:99-103``)
without the tf.data C++ runtime: numpy batches are produced by (optionally
background-threaded) generators and transferred ahead of compute so the
chip never waits on the host.
"""
from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator

import jax
import numpy as np


def batch_iterator(
    arrays: dict,
    batch_size: int,
    *,
    shuffle: bool = True,
    seed: int = 0,
    drop_remainder: bool = True,
    epochs: int | None = 1,
) -> Iterator[dict]:
    """Yield dict batches from a dict of equal-length numpy arrays."""
    n = len(next(iter(arrays.values())))
    rng = np.random.default_rng(seed)
    epoch = 0
    while epochs is None or epoch < epochs:
        idx = rng.permutation(n) if shuffle else np.arange(n)
        stop = (n // batch_size) * batch_size if drop_remainder else n
        for s in range(0, stop, batch_size):
            sel = idx[s : s + batch_size]
            yield {k: v[sel] for k, v in arrays.items()}
        epoch += 1


def prefetch_to_device(it: Iterable, size: int = 2, put_fn: Callable = None) -> Iterator:
    """Run the host iterator in a background thread, ``size`` batches ahead.

    ``put_fn`` (e.g. ``Trainer.put_batch``) runs in the background thread so
    H2D transfer overlaps the previous step's compute.
    """
    q: queue.Queue = queue.Queue(maxsize=size)
    _END = object()

    def producer():
        try:
            for item in it:
                q.put(put_fn(item) if put_fn else item)
        finally:
            q.put(_END)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            return
        yield item


def shard_for_host(arrays: dict, host_id: int, num_hosts: int) -> dict:
    """Deterministic per-host data sharding (replaces
    ``experimental_distribute_dataset``, ``dien/distribute_train.py:190-191``)."""
    return {k: v[host_id::num_hosts] for k, v in arrays.items()}
