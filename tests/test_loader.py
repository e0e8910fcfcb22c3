"""DataLoader: ordering, reproducibility, batching."""

import numpy as np

from hoisdf_tpu.data.loader import DataLoader


class ToyDataset:
    def __len__(self):
        return 23

    def __getitem__(self, idx, epoch=0):
        rng = np.random.default_rng((0, epoch, idx))
        return {"x": np.full((3,), idx, np.float32), "r": rng.random(2)}


def test_loader_batches_and_drop_last():
    dl = DataLoader(ToyDataset(), batch_size=4, drop_last=True)
    batches = list(dl)
    assert len(batches) == 5
    assert batches[0]["x"].shape == (4, 3)


def test_loader_keeps_remainder_without_drop_last():
    dl = DataLoader(ToyDataset(), batch_size=4, drop_last=False)
    batches = list(dl)
    assert len(batches) == 6
    assert batches[-1]["x"].shape == (3, 3)


def test_loader_shuffle_is_epoch_seeded():
    dl = DataLoader(ToyDataset(), batch_size=23, shuffle=True, seed=1)
    dl.set_epoch(0)
    a = next(iter(dl))["x"][:, 0]
    dl.set_epoch(0)
    b = next(iter(dl))["x"][:, 0]
    dl.set_epoch(1)
    c = next(iter(dl))["x"][:, 0]
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)
    assert sorted(a.tolist()) == list(range(23))


def test_sample_rng_depends_on_epoch():
    ds = ToyDataset()
    r0 = ds.__getitem__(3, epoch=0)["r"]
    r1 = ds.__getitem__(3, epoch=1)["r"]
    assert not np.array_equal(r0, r1)


# ---- multi-host sharding (docs/SCALING.md; SURVEY §5 "input pipeline
# sharded per host") --------------------------------------------------------


def _shard_indices(num_shards, epoch, shuffle=True):
    out = []
    for sid in range(num_shards):
        dl = DataLoader(
            ToyDataset(), batch_size=23, shuffle=shuffle, seed=1,
            shard_id=sid, num_shards=num_shards,
        )
        dl.set_epoch(epoch)
        out.append(np.concatenate([b["x"][:, 0] for b in dl]).astype(int))
    return out

def test_shards_are_disjoint_and_equal_length():
    """Every simulated host gets a disjoint, equal-length slice of the
    global epoch permutation (VERDICT r3 #3 'done' criterion)."""
    for num_shards in (2, 3):
        shards = _shard_indices(num_shards, epoch=0)
        lens = {len(s) for s in shards}
        assert lens == {23 // num_shards}, lens  # SPMD lockstep: equal steps
        flat = np.concatenate(shards)
        assert len(set(flat.tolist())) == len(flat)  # disjoint
        assert set(flat.tolist()) <= set(range(23))


def test_shard_partition_is_deterministic_and_epoch_varies():
    a = _shard_indices(2, epoch=0)
    b = _shard_indices(2, epoch=0)
    c = _shard_indices(2, epoch=1)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
    assert any(not np.array_equal(x, y) for x, y in zip(a, c))


def test_default_single_process_shard_is_identity():
    """With jax reporting one process, explicit (0, 1) and the default must
    both reproduce the unsharded loader exactly."""
    base = np.concatenate(
        [b["x"][:, 0] for b in DataLoader(ToyDataset(), 4, seed=1)]
    )
    dflt = np.concatenate(
        [b["x"][:, 0] for b in DataLoader(ToyDataset(), 4, seed=1,
                                          shard_id=0, num_shards=1)]
    )
    np.testing.assert_array_equal(base, dflt)


def test_shard_arg_validation():
    import pytest

    with pytest.raises(ValueError):
        DataLoader(ToyDataset(), 4, shard_id=1)  # missing num_shards
    with pytest.raises(ValueError):
        DataLoader(ToyDataset(), 4, shard_id=2, num_shards=2)  # out of range


def test_worker_exception_propagates_to_consumer():
    """A dataset failure inside the producer must raise in the consuming
    loop, not leave it blocked forever on the prefetch queue."""
    import pytest

    class FailingDataset(ToyDataset):
        def __getitem__(self, idx, epoch=0):
            if idx == 5:
                raise ValueError("boom at idx 5")
            return super().__getitem__(idx, epoch=epoch)

    dl = DataLoader(FailingDataset(), batch_size=4, num_workers=2)
    with pytest.raises(ValueError, match="boom at idx 5"):
        for _ in dl:
            pass


def test_abandoned_iterator_releases_producer():
    """Breaking out of the batch loop mid-epoch must not strand the
    producer thread on a full prefetch queue (in process mode that would
    leak a forked worker pool per abandoned epoch)."""
    import gc
    import threading
    import time

    before = threading.active_count()
    for _ in range(5):
        it = iter(DataLoader(ToyDataset(), 2, prefetch_batches=1))
        next(it)  # producer now blocked on the full queue
        it.close()  # generator finally: stop.set()
    gc.collect()
    deadline = time.time() + 10
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.1)
    assert threading.active_count() <= before + 1, threading.active_count()
    # and a fresh full iteration still works afterwards
    assert len(list(DataLoader(ToyDataset(), 4))) == 6


def test_process_worker_mode_matches_thread_mode():
    """The fork-inherited process pool (docs/PERFORMANCE.md loader table:
    thread scaling is Amdahl-capped at ~4.2x by the 24% GIL-held fraction,
    so production training uses data_worker_mode='process') must produce
    byte-identical batches in identical order to the default thread pool."""
    kw = dict(batch_size=4, shuffle=True, seed=3, num_workers=2)
    dl_t = DataLoader(ToyDataset(), worker_mode="thread", **kw)
    dl_p = DataLoader(ToyDataset(), worker_mode="process", **kw)
    for epoch in (0, 1):
        dl_t.set_epoch(epoch)
        dl_p.set_epoch(epoch)
        bt, bp = list(dl_t), list(dl_p)
        assert len(bt) == len(bp)
        for a, b in zip(bt, bp):
            assert a.keys() == b.keys()
            for k in a:
                np.testing.assert_array_equal(a[k], b[k])
