"""Host-side input pipeline: threaded loading, batching, device prefetch.

Replaces the reference's `DataLoader(batch, shuffle, num_workers=12,
drop_last=True)` (model_tool/loader.py:60-61) with a TPU-oriented feed:

- thread-pool sample loading (PIL decode / numpy projection release the
  GIL for the heavy parts), a sliding window of in-flight samples
- deterministic per-(seed, epoch, index) sample RNG -> reproducible runs
  regardless of worker scheduling
- fixed-shape batches (drop_last) so the train step compiles once
- `prefetch_to_device`: stages the next batches onto the device (with an
  optional NamedSharding for the data-parallel mesh) while the current
  step runs — the TPU never waits on PCIe.
"""

from __future__ import annotations

import collections
import itertools
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, Optional

import jax
import numpy as np


def _collate(samples) -> Dict[str, np.ndarray]:
    return {k: np.stack([s[k] for s in samples]) for k in samples[0]}


class Loader:
    """Epoch-based batch iterator over a dataset with `sample(i, rng)`."""

    def __init__(self, dataset, batch_size: int, shuffle: bool,
                 num_workers: int = 8, seed: int = 0, drop_last: bool = True,
                 prefetch_batches: int = 2, process_index: int | None = None,
                 process_count: int | None = None):
        """`batch_size` is always the GLOBAL batch. On a multi-host slice
        each process constructs the same global permutation (same seed →
        identical on every host) but loads and yields only its own
        `batch_size / process_count` slice of every batch; the global
        array is assembled device-side by `parallel.mesh.put_global`
        (jax.make_array_from_process_local_data). Defaults read the jax
        runtime; pass explicit values to simulate a rank in tests."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch_batches = max(1, prefetch_batches)
        if (process_count is None) != (process_index is None):
            # the pair is all-or-nothing: silently defaulting the other
            # half would duplicate (or mislabel) every host's batch slice
            raise ValueError("process_count and process_index must be "
                             "given together (or both left to the jax "
                             "runtime)")
        if process_count is None:
            process_count = jax.process_count()
            process_index = jax.process_index()
        if batch_size % process_count:
            raise ValueError(f"global batch {batch_size} not divisible by "
                             f"{process_count} processes")
        self.process_index = process_index
        self.process_count = process_count
        self.local_batch = batch_size // process_count
        self._pool: Optional[ThreadPoolExecutor] = None

    def __len__(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _ensure_pool(self) -> ThreadPoolExecutor:
        if self._pool is None:
            self._pool = ThreadPoolExecutor(max_workers=self.num_workers,
                                            thread_name_prefix="loader")
        return self._pool

    def epoch(self, epoch: int = 0) -> Iterator[Dict[str, np.ndarray]]:
        """Yield numpy batches for one epoch (this process's slice of
        each global batch; == the global batch when single-process)."""
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            np.random.default_rng((self.seed, epoch)).shuffle(order)
        if self.drop_last:
            order = order[: (n // self.batch_size) * self.batch_size]

        if self.process_count > 1:
            # keep only this host's CONTIGUOUS slice of every batch (the
            # device-order convention make_array_from_process_local_data
            # assembles by); the per-(seed, epoch, GLOBAL index) sample
            # RNG keeps augmentation identical to the single-host run
            if not self.drop_last:
                raise ValueError("multi-process loading requires drop_last "
                                 "(a partial global batch cannot shard "
                                 "evenly across hosts)")
            steps = len(order) // self.batch_size
            order = (order[: steps * self.batch_size]
                     .reshape(steps, self.process_count, self.local_batch)
                     [:, self.process_index].reshape(-1))

        pool = self._ensure_pool()

        def load(index: int):
            rng = np.random.default_rng((self.seed, epoch, int(index)))
            return self.dataset.sample(int(index), rng)

        window = self.local_batch * (self.prefetch_batches + 1)
        futures = collections.deque()
        it = iter(order)
        # islice consumes from `it`, so the main loop naturally continues
        # where the priming window stopped (a bare next(it) here raised
        # StopIteration -> RuntimeError when len(order) <= window)
        for idx in itertools.islice(it, window):
            futures.append(pool.submit(load, idx))

        batch = []
        for fut in iter(lambda: futures.popleft() if futures else None, None):
            batch.append(fut.result())
            nxt = next(it, None)
            if nxt is not None:
                futures.append(pool.submit(load, nxt))
            if len(batch) == self.local_batch:
                yield _collate(batch)
                batch = []
        if batch and not self.drop_last:
            yield _collate(batch)

    def close(self):
        if self._pool is not None:
            self._pool.shutdown(wait=False, cancel_futures=True)
            self._pool = None


def prefetch_to_device(iterator, size: int = 2, sharding=None):
    """Stage `size` batches ahead on device. With a NamedSharding pytree,
    batches land pre-sharded across the mesh's data axis (host->HBM
    copies overlap the running step because jax dispatch is async); on a
    multi-host slice each process contributes only its local slice
    (parallel.mesh.put_global)."""
    queue = collections.deque()

    def put(batch):
        if sharding is None:
            return jax.device_put(batch)
        # single place for multi-host assembly (local import: mesh is a
        # parallel-layer module and data must not depend on it at import)
        from monodepth_tpu.parallel.mesh import put_global

        return put_global(batch, sharding)

    for batch in iterator:
        queue.append(put(batch))
        if len(queue) > size:
            yield queue.popleft()
    while queue:
        yield queue.popleft()
