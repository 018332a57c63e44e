"""Per-host sharded epoch sampling + a simple collating loader.

TPU-native replacement for torch's DistributedSampler + DataLoader
(reference train_contrast.py:551-609): a global permutation keyed by
(seed, epoch) — the reference's `sampler.set_epoch(epoch)` — is sharded
contiguously per host; each host feeds its local batch slice, and the jitted
step shards the batch over the mesh's data axes.  `drop_last` keeps shapes
static (the reference relies on the same).

Host ↔ data-axis mapping: host h takes the strided slice perm[h::n_hosts]
of one global permutation, so every host yields the SAME number of batches
per epoch (collectives stay aligned step for step).  The global step batch
is the concatenation of the per-host batches in process-index order; when
placed with P(("dp", "fsdp")) the rows of host h land on the dp coordinates
[h·local_bsz, (h+1)·local_bsz) — exactly the layout
`jax.make_array_from_process_local_data` produces on a real multi-host mesh
(test: tests/test_sampling.py::test_two_host_loader_alignment_and_dp_axis).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Iterator, Optional, Sequence

import numpy as np


@dataclasses.dataclass
class ShardedSampler:
    dataset_size: int
    num_shards: int = 1
    shard_index: int = 0
    shuffle: bool = True
    seed: int = 42
    drop_last: bool = True

    def epoch_indices(self, epoch: int) -> np.ndarray:
        idx = np.arange(self.dataset_size)
        if self.shuffle:
            rng = np.random.default_rng((self.seed, epoch))
            rng.shuffle(idx)
        if self.drop_last:
            usable = (self.dataset_size // self.num_shards) * self.num_shards
            idx = idx[:usable]
        else:
            pad = (-len(idx)) % self.num_shards
            if pad:
                reps = int(np.ceil(pad / max(len(idx), 1)))
                idx = np.concatenate([idx, np.tile(idx, reps)[:pad]])
        return idx[self.shard_index::self.num_shards]


# worker-process globals, installed by _pool_init via initargs (the
# dataset/collator are passed ONCE at pool start, not pickled per task —
# torch DataLoader's worker model, train_contrast.py:584-609 num_workers=4)
_W_DATASET = None
_W_COLLATE = None


def _pool_init(dataset, collate_fn):
    global _W_DATASET, _W_COLLATE
    _W_DATASET = dataset
    _W_COLLATE = collate_fn


def _pool_fetch(chunk):
    import os

    batch = _W_COLLATE([_W_DATASET[int(i)] for i in chunk])
    return os.getpid(), batch


@dataclasses.dataclass
class DataLoader:
    """Minimal map-style loader: dataset + collate_fn + batching.

    `num_workers=0` (default) fetches+collates inline — collation is cheap
    numpy work and the TPU step overlaps with the next batch's host prep via
    async dispatch.  `num_workers>0` runs fetch+collate in a
    FORKSERVER-context process pool with `prefetch_factor` batches in
    flight per worker, preserving batch order — the role of the reference's
    torch `num_workers=4` loader processes (train_contrast.py:584-609);
    relevant here when PDB-graph featurization or tokenization runs online.
    Workers must not touch JAX (they do pure numpy/tokenizer work).

    forkserver rather than fork: the pool is created lazily at first
    __iter__, i.e. AFTER the JAX/TPU client (and the remote-execution
    tunnel) have spawned threads — fork()ing a multi-threaded process can
    deadlock a long run non-deterministically (Python 3.12 warns about
    exactly this).  The tradeoff is that `dataset` and `collate_fn` must be
    picklable (module-level classes, no lambdas/closures); every collator
    in data/collate*.py is."""

    dataset: Any
    collate_fn: Callable[[list], Any]
    batch_size: int
    sampler: Optional[ShardedSampler] = None
    drop_last: bool = True
    num_workers: int = 0
    prefetch_factor: int = 2

    def __post_init__(self):
        if self.sampler is None:
            self.sampler = ShardedSampler(len(self.dataset))
        self.epoch = 0
        self._pool = None

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __len__(self) -> int:
        n = len(self.sampler.epoch_indices(0))
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _chunks(self):
        idx = self.sampler.epoch_indices(self.epoch)
        for start in range(0, len(idx), self.batch_size):
            chunk = idx[start:start + self.batch_size]
            if self.drop_last and len(chunk) < self.batch_size:
                break
            yield chunk

    def _ensure_pool(self):
        if self._pool is None:
            import multiprocessing as mp
            from concurrent.futures import ProcessPoolExecutor

            self._pool = ProcessPoolExecutor(
                max_workers=self.num_workers,
                mp_context=mp.get_context("forkserver"),
                initializer=_pool_init,
                initargs=(self.dataset, self.collate_fn))
        return self._pool

    def shutdown(self):
        """Stop worker processes (idempotent; also runs at GC)."""
        if self._pool is not None:
            self._pool.shutdown(wait=False, cancel_futures=True)
            self._pool = None

    def __del__(self):
        try:
            self.shutdown()
        except Exception:
            pass

    def __iter__(self) -> Iterator:
        if self.num_workers <= 0:
            for chunk in self._chunks():
                yield self.collate_fn(
                    [self.dataset[int(i)] for i in chunk])
            return

        import collections

        pool = self._ensure_pool()
        depth = max(1, self.prefetch_factor) * self.num_workers
        pending: "collections.deque" = collections.deque()
        chunks = self._chunks()
        try:
            for chunk in chunks:
                pending.append(pool.submit(_pool_fetch, chunk))
                if len(pending) >= depth:
                    yield pending.popleft().result()[1]
            while pending:
                yield pending.popleft().result()[1]
        finally:
            for f in pending:
                f.cancel()


def prefetch(iterator, size: int = 2):
    """Background-thread prefetch: overlaps host collation/IO with device
    steps (the role of the reference's num_workers=4 loader processes,
    train_contrast.py:584-609, at a fraction of the machinery)."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=size)
    _END = object()

    def worker():
        try:
            for item in iterator:
                q.put(item)
        finally:
            q.put(_END)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            break
        yield item
