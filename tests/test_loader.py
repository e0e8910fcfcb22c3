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
