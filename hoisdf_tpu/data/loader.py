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
``jax.process_index()``/``jax.process_count()``, resolved LAZILY at first
iteration (not construction) so building a loader never initializes the
JAX backend as a side effect; on a pod, construct/iterate loaders only
after ``jax.distributed.initialize()`` (train_loop --multihost does).
Single-process runs are byte-identical to the unsharded loader.
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
# before the pool forks (the fork is forced synchronously under __init__, so
# two loaders constructed back-to-back cannot race on it) — children get the
# dataset by COW inheritance instead of a per-task pickle.  PIL decode and
# numpy already release the GIL, so threads are the default; process mode is
# for scaling past the ~24% GIL-held fraction on many-core hosts (see
# scripts/bench_loader.py for the measured split).
_FORK_DATASET = None


def _process_fetch(args) -> dict:
    i, epoch = args
    return _FORK_DATASET.__getitem__(int(i), epoch=epoch)


def _process_probe(_):
    """No-op worker task: forces the lazy pool fork under __init__."""
    return 0


def _default_shard() -> tuple:
    """(process_index, process_count) — (0, 1) when jax is unavailable or
    uninitialized (pure-numpy fixture tests import this module without a
    backend)."""
    try:
        import jax

        return jax.process_index(), jax.process_count()
    except Exception:  # noqa: BLE001
        return 0, 1


def pad_batch(d: Dict[str, np.ndarray], n: int) -> Dict[str, np.ndarray]:
    """Pad every array's leading dim to ``n`` by repeating the last row —
    keeps a jitted step at one static shape for the short tail batch; pair
    with :func:`trim_batch` before metrics (evaluate.py / train_loop.py)."""
    return {
        k: np.concatenate([v] + [v[-1:]] * (n - v.shape[0]), axis=0)
        if v.shape[0] < n else v
        for k, v in d.items()
    }


def trim_batch(d: Dict, n: int) -> Dict:
    """Drop pad rows: slice every value's leading dim back to ``n``."""
    return {k: v[:n] for k, v in d.items()}


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
        if shard_id is not None and not (0 <= shard_id < num_shards):
            raise ValueError(f"shard_id {shard_id} not in [0, {num_shards})")
        # None = resolve lazily from jax process info at first use.
        self._shard = (
            (int(shard_id), int(num_shards)) if shard_id is not None else None
        )
        if worker_mode not in ("thread", "process"):
            raise ValueError(f"worker_mode {worker_mode!r}")
        self.worker_mode = worker_mode
        self._pool = None
        if worker_mode == "process":
            # Fork the worker pool ONCE, eagerly, while _FORK_DATASET is
            # still this loader's dataset (no race with other loaders) and
            # before the caller starts jit compiles / TPU dispatches —
            # forking a process with a live TPU client is unsafe, which is
            # why the pool must not be created lazily at epoch start.
            global _FORK_DATASET
            _FORK_DATASET = dataset
            self._pool = ProcessPoolExecutor(
                self.num_workers,
                mp_context=multiprocessing.get_context("fork"),
            )
            # Force the fork NOW (ProcessPoolExecutor forks lazily on first
            # submit) so a later _FORK_DATASET rebind cannot leak into these
            # workers.
            list(self._pool.map(_process_probe, range(self.num_workers)))

    @property
    def shard_id(self) -> int:
        return self._resolve_shard()[0]

    @property
    def num_shards(self) -> int:
        return self._resolve_shard()[1]

    def _resolve_shard(self) -> tuple:
        if self._shard is None:
            self._shard = _default_shard()
        return self._shard

    def close(self) -> None:
        if self._pool is not None:
            self._pool.shutdown(wait=False, cancel_futures=True)
            self._pool = None

    def __del__(self):  # best effort
        try:
            self.close()
        except Exception:  # noqa: BLE001
            pass

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def _shard_len(self) -> int:
        n_shards = self.num_shards
        return len(self.dataset) // n_shards if n_shards > 1 \
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

    def _run_fn(self, epoch: int):
        """(pool, run(ids) -> samples) for this epoch; the process pool is
        the long-lived fork from __init__, the thread pool is per-epoch."""
        if self.worker_mode == "process":
            if self._pool is None:
                raise RuntimeError("DataLoader.close()d; process pool gone")
            return None, lambda ids: self._pool.map(
                _process_fetch, [(int(i), epoch) for i in ids]
            )
        pool = ThreadPoolExecutor(self.num_workers)
        fetch = lambda i: self.dataset.__getitem__(int(i), epoch=epoch)  # noqa: E731
        return pool, lambda ids: pool.map(fetch, ids)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        order = self._order()
        n_batches = len(self)
        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch_batches)
        stop = threading.Event()

        def put(item) -> bool:
            """Bounded put that gives up when the consumer is gone — a caller
            abandoning the iterator mid-epoch must not strand the producer on
            a full queue."""
            while not stop.is_set():
                try:
                    out_q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            ephemeral, run = self._run_fn(self.epoch)
            try:
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
            except BaseException as exc:  # noqa: BLE001 — forward, don't hang
                put(exc)
            finally:
                if ephemeral is not None:
                    ephemeral.shutdown(wait=False, cancel_futures=True)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                batch = out_q.get()
                if batch is None:
                    return
                if isinstance(batch, BaseException):
                    raise batch
                yield batch
        finally:
            stop.set()
