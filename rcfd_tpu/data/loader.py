"""Threaded prefetching data loader (host side).

The reference feeds the GPU with torch DataLoader worker processes
(src/radarnet_main.py:111-121, src/fusionnet_main.py:112-123). Here the
loader is a thread pool (PIL/numpy release the GIL for decode/copy) with a
bounded prefetch queue; batches are stacked numpy arrays ready for
jax.device_put. Determinism: each sample draw gets a Generator seeded by
(seed, epoch, position), so results do not depend on worker count or
scheduling.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional

import numpy as np


def device_prefetch(iterator, sharding=None, buffer_size: int = 2):
    """Double-buffered host->HBM transfer: device_put the next batch(es)
    while the current one computes (streaming input pipeline,
    BASELINE config 5). `sharding` is an optional jax Sharding for the
    batch (e.g. NamedSharding(mesh, P('data'))). Under multi-process
    (multi-host) execution each process feeds its LOCAL batch slice and
    the global array is assembled across hosts."""
    import collections

    import jax

    queue = collections.deque()
    multihost = jax.process_count() > 1

    def put(batch):
        if sharding is not None:
            if multihost:
                return jax.tree_util.tree_map(
                    lambda x: jax.make_array_from_process_local_data(
                        sharding, np.asarray(x)), batch)
            return jax.device_put(batch, sharding)
        return jax.device_put(batch)

    for batch in iterator:
        queue.append(put(batch))
        if len(queue) >= buffer_size:
            yield queue.popleft()
    while queue:
        yield queue.popleft()


def iter_device_batches(dataset, batch_size: int, fields=None,
                        prefetch: int = 2, pack_fields=(),
                        pack_factor: int = 2):
    """Bulk-inference feeder: yield (idxs, host_samples, device_arrays)
    with the host fetch + H2D transfer overlapped against the consumer's
    device compute (the train loops already double-buffer via
    device_prefetch; this brings the same overlap to the validate / run /
    stage-1.5-bridge iterators, which previously did synchronous
    dataset.get + jnp.asarray per batch).

    - The tail batch is padded by repeating its last sample so one
      compiled shape serves the whole manifest (padded outputs must be
      dropped by the consumer — len(idxs) gives the real count).
    - `fields`: which sample-tuple positions to stack + transfer
      (default: the first len(sample) positions). Remaining positions
      stay host-only (e.g. ground truth used for metrics).
    - Samples are yielded exactly as the dataset produced them
      (integer transport included — decode host copies via
      transport.decode_np where numpy math needs floats).
    - `pack_fields`: sample positions to space-to-depth pack
      (`pack_factor` x `pack_factor`, ops/s2d_stem.py) on the host
      before transfer; the stems consume the packed layout directly —
      exact. Fields whose H or W do not divide by the factor are
      transferred unpacked (the consumer keys its graph on the input
      shape, so both forms share one code path)."""
    import jax

    from ..ops.s2d_stem import pack_np

    n_sample = len(dataset)
    bsz = max(1, min(batch_size, n_sample))

    def stage(j, stacked):
        if j in pack_fields and stacked.ndim == 4 and \
                stacked.shape[1] % pack_factor == 0 and \
                stacked.shape[2] % pack_factor == 0:
            stacked = pack_np(stacked, pack_factor)
        return jax.device_put(stacked)

    def produce(out_q, stop):
        try:
            for start in range(0, n_sample, bsz):
                if stop.is_set():
                    return
                idxs = list(range(start, min(start + bsz, n_sample)))
                samples = [dataset.get(i) for i in idxs]
                padded = samples + [samples[-1]] * (bsz - len(samples))
                use = fields if fields is not None else range(len(padded[0]))
                device = tuple(
                    stage(j, np.stack([s[j] for s in padded]))
                    for j in use)
                out_q.put((idxs, samples, device))
            out_q.put(None)
        except BaseException as e:  # surface fetch errors to the consumer
            out_q.put(e)

    out_q: 'queue.Queue' = queue.Queue(maxsize=max(1, prefetch))
    stop = threading.Event()
    thread = threading.Thread(target=produce, args=(out_q, stop), daemon=True)
    thread.start()
    try:
        while True:
            item = out_q.get()
            if item is None:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()
        while thread.is_alive():
            try:
                out_q.get_nowait()
            except queue.Empty:
                break


class DataLoader:
    def __init__(self,
                 dataset,
                 batch_size: int,
                 shuffle: bool = False,
                 num_workers: int = 8,
                 seed: int = 0,
                 drop_last: bool = False,
                 prefetch: int = 2,
                 process_index: int = 0,
                 process_count: int = 1):
        """batch_size is the GLOBAL batch size. Under multi-host DP pass
        (jax.process_index(), jax.process_count()): every process builds
        the identical global order (same seed/epoch) and yields only its
        contiguous per-host slice of each batch; sample RNG streams are
        keyed by GLOBAL position so results match single-host runs."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.epoch = 0
        assert batch_size % process_count == 0, \
            'global batch size must divide the process count'
        self.process_index = process_index
        self.process_count = process_count

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last or self.process_count > 1:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def _order(self):
        n = len(self.dataset)
        if self.shuffle:
            rng = np.random.default_rng((self.seed, self.epoch))
            return rng.permutation(n)
        return np.arange(n)

    def __iter__(self) -> Iterator:
        order = self._order()
        n = len(order)
        batches = []
        local = self.batch_size // self.process_count
        lo, hi = self.process_index * local, (self.process_index + 1) * local
        for start in range(0, n, self.batch_size):
            idx = order[start:start + self.batch_size]
            if len(idx) < self.batch_size and \
                    (self.drop_last or self.process_count > 1):
                # ragged tails cannot be split evenly across hosts
                continue
            # per-host contiguous slice; RNG positions stay GLOBAL
            batches.append((start + lo, idx[lo:hi]))

        out_q: 'queue.Queue' = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def fetch_sample(pos, index):
            rng = np.random.default_rng((self.seed, self.epoch, int(pos)))
            return self.dataset.get(int(index), rng)

        def fetch_batch(start, idx):
            # datasets with a batched native-decode path (get_batch) decode
            # the whole batch in one GIL-free C++ call per stream
            rngs = [np.random.default_rng((self.seed, self.epoch, int(p)))
                    for p in range(start, start + len(idx))]
            return self.dataset.get_batch(
                [int(i) for i in idx], rngs, n_threads=self.num_workers)

        use_batched = hasattr(self.dataset, 'get_batch')

        def producer():
            try:
                if use_batched:
                    # overlap successive batched native decodes
                    with ThreadPoolExecutor(max_workers=2) as ex:
                        futures = []
                        it = iter(batches)
                        for _ in range(2):
                            nxt = next(it, None)
                            if nxt is not None:
                                futures.append(ex.submit(fetch_batch, *nxt))
                        while futures:
                            if stop.is_set():
                                return
                            out_q.put(futures.pop(0).result())
                            nxt = next(it, None)
                            if nxt is not None:
                                futures.append(ex.submit(fetch_batch, *nxt))
                else:
                    with ThreadPoolExecutor(
                            max_workers=self.num_workers) as ex:
                        for start, idx in batches:
                            if stop.is_set():
                                return
                            samples = list(ex.map(
                                fetch_sample,
                                range(start, start + len(idx)), idx))
                            collated = tuple(
                                np.stack([s[i] for s in samples], axis=0)
                                for i in range(len(samples[0])))
                            out_q.put(collated)
                out_q.put(None)
            except BaseException as e:  # surface worker errors to the consumer
                out_q.put(e)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                item = out_q.get()
                if item is None:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
            # drain so the producer can exit
            while thread.is_alive():
                try:
                    out_q.get_nowait()
                except queue.Empty:
                    break
        self.epoch += 1
