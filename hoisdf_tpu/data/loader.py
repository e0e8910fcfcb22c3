"""Threaded prefetching data loader with multi-host sharding.

Replaces torch's DataLoader (common/base.py:79-92: 15 workers, shuffle,
drop_last) with a thread-pool pipeline: samples are decoded concurrently and
batches stacked ahead of consumption, keeping the TPU fed without a torch
dependency.  Epoch-aware so per-sample RNG streams are reproducible.

Multi-host (SURVEY §5 "input pipeline sharded per host"): on a pod slice
every JAX process constructs the SAME global per-epoch permutation (the
shuffle RNG is keyed off ``(seed, epoch)`` only), then takes the strided
slice ``order[shard_id::num_shards]`` — disjoint across hosts by
construction — trimmed to ``n // num_shards`` entries so every host steps
the same number of batches per epoch (a requirement for SPMD lockstep; up
to ``num_shards - 1`` samples are dropped per epoch, different ones each
epoch under shuffle).  ``shard_id``/``num_shards`` default to
``jax.process_index()``/``jax.process_count()``, so single-process runs are
byte-identical to the unsharded loader and pod runs shard automatically.
See docs/SCALING.md §"Multi-host data sharding".
"""

from __future__ import annotations

import multiprocessing
import queue
import threading
from concurrent.futures import ProcessPoolExecutor, ThreadPoolExecutor
from typing import Dict, Iterator, Optional

import numpy as np

# Fork-inherited dataset for process workers: set in the parent immediately
# before forking the pool so children get it by COW inheritance instead of a
# per-task (or even per-worker) pickle of the whole dataset.  PIL decode and
# numpy already release the GIL, so threads are the default; process mode is
# for datasets whose per-sample cost is dominated by Python bytecode (see
# scripts/bench_loader.py for the measured split).
_FORK_DATASET = None


def _process_fetch(args) -> dict:
    i, epoch = args
    return _FORK_DATASET.__getitem__(int(i), epoch=epoch)


def _default_shard() -> tuple:
    """(process_index, process_count) — (0, 1) when jax is unavailable or
    uninitialized (pure-numpy fixture tests import this module without a
    backend)."""
    try:
        import jax

        return jax.process_index(), jax.process_count()
    except Exception:  # noqa: BLE001
        return 0, 1


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        num_workers: int = 8,
        drop_last: bool = False,
        seed: int = 0,
        prefetch_batches: int = 2,
        shard_id: Optional[int] = None,
        num_shards: Optional[int] = None,
        worker_mode: str = "thread",
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.seed = seed
        self.prefetch_batches = prefetch_batches
        self.epoch = 0
        if (shard_id is None) != (num_shards is None):
            raise ValueError("pass both shard_id and num_shards, or neither")
        if shard_id is None:
            shard_id, num_shards = _default_shard()
        if not (0 <= shard_id < num_shards):
            raise ValueError(f"shard_id {shard_id} not in [0, {num_shards})")
        self.shard_id = int(shard_id)
        self.num_shards = int(num_shards)
        if worker_mode not in ("thread", "process"):
            raise ValueError(f"worker_mode {worker_mode!r}")
        # "process": fork-inherited ProcessPoolExecutor — sidesteps the GIL
        # for Python-bound datasets (the reference uses 15 worker PROCESSES,
        # common/base.py:83).  Fork the pool before heavy jax/TPU backend
        # use: forking with a live TPU client is unsafe, so loaders are
        # created at startup (train_loop does) or kept in thread mode.
        self.worker_mode = worker_mode

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def _shard_len(self) -> int:
        return len(self.dataset) // self.num_shards if self.num_shards > 1 \
            else len(self.dataset)

    def __len__(self) -> int:
        n = self._shard_len()
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _order(self) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng((self.seed, self.epoch)).shuffle(idx)
        if self.num_shards > 1:
            idx = idx[self.shard_id :: self.num_shards][: self._shard_len()]
        return idx

    def _make_pool(self):
        if self.worker_mode == "process":
            global _FORK_DATASET
            _FORK_DATASET = self.dataset
            pool = ProcessPoolExecutor(
                self.num_workers, mp_context=multiprocessing.get_context("fork")
            )
            epoch = self.epoch
            return pool, lambda ids, p=pool: p.map(
                _process_fetch, [(int(i), epoch) for i in ids]
            )
        pool = ThreadPoolExecutor(self.num_workers)
        epoch = self.epoch
        fetch = lambda i: self.dataset.__getitem__(int(i), epoch=epoch)  # noqa: E731
        return pool, lambda ids, p=pool: p.map(fetch, ids)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        order = self._order()
        n_batches = len(self)
        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch_batches)
        stop = threading.Event()

        def put(item) -> bool:
            """Bounded put that gives up when the consumer is gone — a caller
            abandoning the iterator mid-epoch must not strand the producer on
            a full queue (in process mode that would leak forked workers)."""
            while not stop.is_set():
                try:
                    out_q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            pool, run = self._make_pool()
            with pool:
                for b in range(n_batches):
                    if stop.is_set():
                        return
                    ids = order[b * self.batch_size : (b + 1) * self.batch_size]
                    samples = list(run(ids))
                    batch = {
                        k: np.stack([s[k] for s in samples])
                        for k in samples[0]
                    }
                    if not put(batch):
                        return
            put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                batch = out_q.get()
                if batch is None:
                    return
                yield batch
        finally:
            stop.set()
