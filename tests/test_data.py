"""Data layer tests: h5 schema roundtrip, pair sampling, loader, prefetch."""

import numpy as np

from pulpo_tpu.data.loader import DataLoader, prefetch_to_device
from pulpo_tpu.data.oasis import OASIS, create_data_loaders
from pulpo_tpu.data.synthetic import SyntheticDataset, write_oasis_style_h5


def test_synthetic_dataset_pairs():
    ds = SyntheticDataset(shape=(8, 9, 10), n=5, segs=True, lms=True, seed=0)
    rng = np.random.default_rng(0)
    item = ds.get_pair(2, rng)
    assert item["x"].shape == (8, 9, 10, 1)
    assert item["seg_x"].shape == (8, 9, 10, 4)
    assert item["lm_x"].shape == (5, 3)
    # partner differs from index
    assert not np.array_equal(item["x"], item["y"])


def test_oasis_h5_roundtrip(tmp_path):
    path = write_oasis_style_h5(tmp_path / "OASIS.h5", shape=(8, 10, 12),
                                n_per_split=(4, 2, 2, 2), seg_dim=5)
    ds = OASIS("training", segs=True, path=path)
    assert len(ds) == 4
    assert ds.input_size == (8, 10, 12)
    item = ds.get_pair(0, np.random.default_rng(1))
    assert item["x"].shape == (8, 10, 12, 1)
    assert item["seg_x"].shape == (8, 10, 12, 5)
    # one-hot
    np.testing.assert_allclose(item["seg_x"].sum(-1), 1.0)

    lm_ds = OASIS("test_lm", lms=True, path=path)
    item = lm_ds.get_pair(0, np.random.default_rng(2))
    assert item["lm_x"].shape == (4, 3)


def test_loaders_and_prefetch(tmp_path):
    path = write_oasis_style_h5(tmp_path / "OASIS.h5", shape=(8, 10, 12))
    train, val, test_seg, test_lm = create_data_loaders(
        batch_size=2, segs=False, path=path)
    batches = list(prefetch_to_device(iter(train)))
    assert len(batches) == 2
    assert batches[0]["x"].shape == (2, 8, 10, 12, 1)
    # test loaders force batch 1
    assert next(iter(test_seg))["x"].shape[0] == 1


def test_loader_epoch_reshuffles(tmp_path):
    ds = SyntheticDataset(shape=(6, 6, 6), n=6, seed=0)
    dl = DataLoader(ds, batch_size=6, shuffle=True, seed=0)
    e1 = next(iter(dl))["x"]
    e2 = next(iter(dl))["x"]
    assert not np.array_equal(e1, e2)  # epoch-dependent order/partners


def test_lungct_reader(tmp_path):
    import h5py

    # build a LungCT.h5 fixture directly (converter needs nibabel)
    rng = np.random.default_rng(0)
    path = tmp_path / "LungCT.h5"
    with h5py.File(path, "w") as f:
        f.attrs["shape"] = np.asarray([8, 10, 12])
        for split, n in (("training", 3), ("validation", 2), ("test", 2)):
            g = f.create_group(split)
            g.attrs["N"] = n
            for side in ("inhale", "exhale"):
                gg = g.create_group(side)
                gi = gg.create_group("image")
                gl = gg.create_group("landmarks")
                for i in range(n):
                    gi.create_dataset(str(i), data=rng.random((8, 10, 12), np.float32))
                    if split == "test":
                        gl.create_dataset(str(i), data=rng.random((4, 3), np.float32))

    from pulpo_tpu.data.lungct import create_data_loaders

    train, val, test = create_data_loaders(1, lms=True, path=path)
    item = next(iter(test))
    assert item["x"].shape == (1, 8, 10, 12, 1)
    assert item["lm_x"].shape == (1, 4, 3)
    assert len(train) == 3
