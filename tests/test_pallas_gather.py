"""Row-DMA gather kernel vs XLA take (interpret mode)."""

import numpy as np
import jax.numpy as jnp

from satrans_tpu.ops.pallas import gather


def _mk(rows=512, n=100, w=128, arrays=1, seed=0):
    rng = np.random.default_rng(seed)
    srcs = tuple(jnp.asarray(rng.standard_normal((rows, w)).astype(np.float32))
                 for _ in range(arrays))
    ids = jnp.asarray(rng.integers(0, rows, size=n).astype(np.int32))
    return srcs, ids


def test_gather_rows_matches_take():
    srcs, ids = _mk()
    out, = gather.gather_rows(srcs, ids, rb=32, interpret=True)
    np.testing.assert_array_equal(np.asarray(out),
                                  np.asarray(jnp.take(srcs[0], ids, axis=0)))


def test_gather_rows_multi_array_and_padding():
    """3-array form (the bank+mu+nu row read) with N not a multiple of rb
    (internal pad by repeating the last id, sliced off)."""
    srcs, ids = _mk(rows=300, n=77, arrays=3, seed=1)
    outs = gather.gather_rows(srcs, ids, rb=32, interpret=True)
    assert len(outs) == 3
    for o, s in zip(outs, srcs):
        assert o.shape == (77, 128)
        np.testing.assert_array_equal(np.asarray(o),
                                      np.asarray(jnp.take(s, ids, axis=0)))


def test_gather_rows_duplicates_and_empty():
    srcs, _ = _mk(rows=64, arrays=2)
    ids = jnp.asarray(np.array([3, 3, 3, 0, 63, 63], np.int32))
    outs = gather.gather_rows(srcs, ids, rb=4, interpret=True)
    for o, s in zip(outs, srcs):
        np.testing.assert_array_equal(np.asarray(o),
                                      np.asarray(jnp.take(s, ids, axis=0)))
    empty = gather.gather_rows(srcs, jnp.zeros((0,), jnp.int32),
                               rb=4, interpret=True)
    for o in empty:
        assert o.shape == (0, 128)
