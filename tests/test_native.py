"""Native batch-assembly extension tests (with numpy-fallback parity)."""

import numpy as np

from satrans_tpu import native


def test_gather_rows_matches_numpy(rng):
    src = rng.integers(0, 100, size=(1000, 7)).astype(np.int32)
    idx = rng.integers(0, 1000, size=64)
    np.testing.assert_array_equal(native.gather_rows(src, idx), src[idx])


def test_gather_rows_float(rng):
    src = rng.random((500, 3)).astype(np.float32)
    idx = rng.integers(0, 500, size=32)
    np.testing.assert_array_equal(native.gather_rows(src, idx), src[idx])


def test_gather_columns(rng):
    cols = [rng.integers(0, 50, 300).astype(np.int32) for _ in range(5)]
    idx = rng.integers(0, 300, size=40)
    want = np.stack([c[idx] for c in cols], axis=1)
    np.testing.assert_array_equal(native.gather_columns(cols, idx), want)


def test_shuffle_is_permutation():
    p = native.shuffle_indices(5000, seed=7)
    assert sorted(p.tolist()) == list(range(5000))
    p2 = native.shuffle_indices(5000, seed=7)
    np.testing.assert_array_equal(p, p2)  # deterministic
    p3 = native.shuffle_indices(5000, seed=8)
    assert not np.array_equal(p, p3)
