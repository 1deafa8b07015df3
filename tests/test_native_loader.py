"""Native C++ data loader tests: correctness vs the numpy iterator, shuffle
determinism, remainder handling, epoch restart."""

import numpy as np
import pytest

from rlvae_tpu.data.native_loader import NativeBatchLoader, _lib


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    return rng.normal(size=(37, 4, 3, 2)).astype(np.float32)


def test_native_lib_builds():
    assert _lib() is not None, "native loader failed to compile with g++"


def test_batches_cover_dataset(data, tmp_path):
    loader = NativeBatchLoader(data, batch_size=8, raw_path=tmp_path / "d.bin")
    assert loader.native
    batches = list(loader.epoch(seed=3))
    assert len(batches) == 37 // 8
    assert all(b.shape == (8, 4, 3, 2) for b in batches)
    # every emitted row is a real dataset row (match by first element signature)
    flat = data.reshape(37, -1)
    got = np.concatenate([b.reshape(8, -1) for b in batches])
    for row in got:
        assert (np.abs(flat - row).sum(axis=1) < 1e-6).any()
    # no duplicate rows within the epoch
    sigs = [tuple(np.round(r[:4], 5)) for r in got]
    assert len(set(sigs)) == len(sigs)


def test_shuffle_determinism_and_epochs(data, tmp_path):
    loader = NativeBatchLoader(data, batch_size=8, raw_path=tmp_path / "d.bin")
    a = np.concatenate(list(loader.epoch(seed=1)))
    b = np.concatenate(list(loader.epoch(seed=1)))  # epoch restart, same seed
    np.testing.assert_array_equal(a, b)
    c = np.concatenate(list(loader.epoch(seed=2)))
    assert not np.array_equal(a, c)


def test_no_shuffle_order(data, tmp_path):
    loader = NativeBatchLoader(data, batch_size=8, raw_path=tmp_path / "d.bin")
    batches = list(loader.epoch(shuffle=False))
    np.testing.assert_array_equal(batches[0], data[:8])
    np.testing.assert_array_equal(batches[1], data[8:16])


def test_fallback_matches_native(data, tmp_path):
    native = NativeBatchLoader(data, batch_size=8, raw_path=tmp_path / "d.bin")
    fallback = NativeBatchLoader(data, batch_size=8)
    fallback._handle = None  # force numpy path
    fallback.native = False
    n_batches_native = len(list(native.epoch(seed=0)))
    n_batches_fallback = len(list(fallback.epoch(seed=0)))
    assert n_batches_native == n_batches_fallback
