"""Native C++ data loader tests (built on demand with g++)."""

import numpy as np
import pytest

native = pytest.importorskip("pulpo_tpu.native")


@pytest.fixture(scope="module")
def store(tmp_path_factory):
    rng = np.random.default_rng(0)
    d = tmp_path_factory.mktemp("store")
    vols = rng.random((6, 8, 10, 12), dtype=np.float32)
    segs = rng.integers(0, 4, (6, 8, 10, 12)).astype(np.int16)
    path = d / "train.bin"
    try:
        native.write_volume_store(path, vols, segs, num_classes=4)
        ds = native.NativeDataset(path, segs=True, n_slots=3, n_threads=2)
    except native.NativeUnavailable as e:
        pytest.skip(f"native loader unavailable: {e}")
    return path, vols, segs, ds


def test_native_shapes_and_onehot(store):
    path, vols, segs, ds = store
    assert len(ds) == 6
    assert ds.input_size == (8, 10, 12)
    items = list(ds.epoch(shuffle=False, seed=0))
    assert len(items) == 6
    it = items[0]
    assert it["x"].shape == (8, 10, 12, 1)
    assert it["seg_x"].shape == (8, 10, 12, 4)
    np.testing.assert_allclose(it["seg_x"].sum(-1), 1.0)


def test_native_pairs_match_store(store):
    path, vols, segs, ds = store
    items = list(ds.epoch(shuffle=False, seed=1))
    # sequential epoch: item i's x must be volume i
    for i, it in enumerate(items):
        np.testing.assert_array_equal(it["x"][..., 0], vols[i])
        # partner is some volume != i
        assert not np.array_equal(it["y"], it["x"])
        matches = [j for j in range(6) if np.array_equal(it["y"][..., 0], vols[j])]
        assert matches and matches[0] != i
        # one-hot of the right label volume
        np.testing.assert_array_equal(np.argmax(it["seg_x"], -1), segs[i])


def test_native_shuffled_epochs_differ(store):
    path, vols, segs, ds = store
    e1 = [it["x"] for it in ds.epoch(shuffle=True, seed=2)]
    e2 = [it["x"] for it in ds.epoch(shuffle=True, seed=2)]
    assert len(e1) == len(e2) == 6
    assert any(not np.array_equal(a, b) for a, b in zip(e1, e2))


def test_native_from_h5(store, tmp_path):
    from pulpo_tpu.data.synthetic import write_oasis_style_h5

    h5 = write_oasis_style_h5(tmp_path / "OASIS.h5", shape=(6, 8, 10),
                              n_per_split=(3, 2, 2, 2), seg_dim=5)
    out = native.convert_h5_to_store(h5, "training", tmp_path / "train.bin",
                                     with_segs=True)
    ds = native.NativeDataset(out, segs=True)
    assert len(ds) == 3
    assert ds.num_classes == 5
    items = list(ds.epoch(shuffle=False))
    assert len(items) == 3
