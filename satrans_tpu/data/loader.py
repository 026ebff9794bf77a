"""Host-sharded, globally-shuffled batch iterator with device prefetch.

Replaces the reference's ``DataLoader(shuffle=True)`` over an in-memory
TensorDataset (basemodel.py:278-279) with:

* a seeded global permutation, re-drawn per epoch;
* per-host sharding: host h of H takes permutation slice h::H, so the global
  batch is the union of per-host shards (the standard multi-host JAX input
  pattern - each process feeds its addressable devices only);
* a background thread that assembles the next numpy batch and enqueues its
  device transfer while the current step runs.
"""

from __future__ import annotations

import queue
import threading

import numpy as np


class ShardedBatchIterator:
    def __init__(self, data: dict[str, np.ndarray], labels: np.ndarray,
                 batch_size: int, *, shuffle: bool = True, seed: int = 0,
                 host_id: int = 0, num_hosts: int = 1,
                 drop_remainder: bool = False):
        self.data = data
        self.labels = labels
        self.n = len(labels)
        if batch_size % num_hosts:
            raise ValueError("global batch_size must divide by num_hosts")
        self.host_batch = batch_size // num_hosts
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.host_id = host_id
        self.num_hosts = num_hosts
        self.drop_remainder = drop_remainder
        self.steps = (self.n // batch_size if drop_remainder
                      else (self.n - 1) // batch_size + 1)

    def epoch(self, epoch_idx: int):
        """Yield (batch_dict, labels, weight) numpy triples for this host."""
        rng = np.random.default_rng(self.seed + epoch_idx)
        perm = rng.permutation(self.n) if self.shuffle else np.arange(self.n)
        # host shard of the global permutation
        shard = perm[self.host_id::self.num_hosts]
        hb = self.host_batch
        for step in range(self.steps):
            idx = shard[step * hb:(step + 1) * hb]
            bsz = len(idx)
            w = np.zeros(hb, np.float32)
            w[:bsz] = 1.0
            batch = {k: _pad(v[idx], hb) for k, v in self.data.items()}
            yield batch, _pad(self.labels[idx], hb), w


def _pad(arr, target):
    n = len(arr)
    if n == target:
        return arr
    pad = [(0, target - n)] + [(0, 0)] * (arr.ndim - 1)
    return np.pad(arr, pad)


class Prefetcher:
    """Run a producer iterator in a background thread with a bounded queue."""

    _END = object()

    def __init__(self, iterator, depth: int = 2, transform=None):
        self.q: queue.Queue = queue.Queue(maxsize=depth)
        self.transform = transform

        def work():
            # A producer crash must surface in the consumer, not masquerade
            # as a normal end-of-epoch (training would silently continue on
            # truncated data): enqueue the exception and re-raise on get.
            try:
                for item in iterator:
                    self.q.put(self.transform(item) if self.transform else item)
            except BaseException as e:  # noqa: BLE001 - relayed, not handled
                self.q.put(e)
            else:
                self.q.put(self._END)

        self.thread = threading.Thread(target=work, daemon=True)
        self.thread.start()

    def __iter__(self):
        while True:
            item = self.q.get()
            if item is self._END:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
