"""Host-side data pipeline: batching, shuffling, device prefetch.

Replaces the reference's torch DataLoader stack (oasis.py:25-45,
brats.py:18-37). Datasets expose `__len__` and `get_pair(index, rng)`
returning a dict of channels-last numpy arrays (the 8-tuple schema:
x, y, seg_x, seg_y, lm_x, lm_y, mask_x, mask_y; absent modalities are
None). The loader threads an explicit numpy Generator for reproducible
pair sampling (the reference uses the global `random` module:
oasis.py:62-67) and overlaps HDF5 reads + host->device copies with
compute via a background prefetch thread.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Iterator

import jax
import numpy as np

BATCH_KEYS = ("x", "y", "seg_x", "seg_y", "lm_x", "lm_y", "mask_x", "mask_y")


def _collate(items: list[dict[str, Any]]) -> dict[str, np.ndarray]:
    out = {}
    for k in items[0]:
        vals = [it[k] for it in items]
        if vals[0] is None:
            continue
        out[k] = np.stack(vals, axis=0)
    return out


class DataLoader:
    """Iterates a dataset in batches; one epoch per __iter__ call."""

    def __init__(
        self,
        dataset,
        batch_size: int = 1,
        shuffle: bool = False,
        seed: int = 0,
        drop_last: bool = False,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self._epoch = 0

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def __iter__(self) -> Iterator[dict[str, np.ndarray]]:
        n = len(self.dataset)
        rng = np.random.default_rng((self.seed, self._epoch))
        order = rng.permutation(n) if self.shuffle else np.arange(n)
        self._epoch += 1
        for start in range(0, n, self.batch_size):
            idx = order[start : start + self.batch_size]
            if self.drop_last and len(idx) < self.batch_size:
                return
            items = [self.dataset.get_pair(int(i), rng) for i in idx]
            yield _collate(items)


def prefetch_to_device(iterator, size: int = 2, sharding=None):
    """Background-thread prefetch: reads ahead and stages batches on
    device so the accelerator never waits on h5py/host memory."""
    q: queue.Queue = queue.Queue(maxsize=size)
    _sentinel = object()

    def producer():
        try:
            for batch in iterator:
                if sharding is not None:
                    batch = jax.device_put(batch, sharding)
                else:
                    batch = jax.device_put(batch)
                q.put(batch)
        except BaseException as e:  # propagate errors to consumer
            q.put(("__error__", e))
            return
        q.put(_sentinel)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _sentinel:
            return
        if isinstance(item, tuple) and len(item) == 2 and item[0] == "__error__":
            raise item[1]
        yield item
