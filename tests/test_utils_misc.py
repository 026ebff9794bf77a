"""utils + profiling + auc_jax tests."""

import numpy as np

import jax
import jax.numpy as jnp

from satrans_tpu import utils
from satrans_tpu.ops import profiling
from satrans_tpu.train import metrics


def test_composite_domain_ids():
    data = {"a": np.array([1, 1, 2, 2]), "b": np.array([5, 6, 5, 6])}
    cols, m = utils.get_domain_feat(data, "a|b")
    assert cols == ["a", "b"]
    assert len(set(data["a|b"])) == 4
    # same mapping applied to new data
    data2 = {"a": np.array([2, 1]), "b": np.array([6, 5])}
    utils.get_domain_feat(data2, "a|b", m)
    assert data2["a|b"][0] == data["a|b"][3]
    assert data2["a|b"][1] == data["a|b"][0]


def test_bpr_loss():
    pos = jnp.asarray([2.0, 3.0])
    neg = jnp.asarray([0.0, 1.0])
    val = float(utils.bpr_loss(pos, neg))
    want = -np.mean(np.log(1 / (1 + np.exp(-2.0))))
    np.testing.assert_allclose(val, want, rtol=1e-5)


def test_negative_sampling_avoids_positives():
    edges = (np.array([0, 0, 1]), np.array([3, 4, 3]))
    row, col, neg = utils.structured_negative_sampling_bipartite(
        jax.random.PRNGKey(0), edges, num_nodes=6, num_users=2)
    pos = set(row * 6 + col)
    assert all(r * 6 + n not in pos for r, n in zip(row, neg))
    assert (neg >= 2).all() and (neg < 6).all()


def test_auc_jax_matches_numpy(rng):
    y = rng.integers(0, 2, 500).astype(np.float32)
    s = rng.random(500).astype(np.float32)
    s[::7] = 0.5  # ties
    want = metrics.auc(y, s)
    got = float(metrics.auc_jax(jnp.asarray(y), jnp.asarray(s)))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_auc_jax_weighted_subset(rng):
    y = rng.integers(0, 2, 400).astype(np.float32)
    s = rng.random(400).astype(np.float32)
    w = (rng.random(400) < 0.5).astype(np.float32)
    want = metrics.auc(y[w > 0], s[w > 0])
    got = float(metrics.auc_jax(jnp.asarray(y), jnp.asarray(s),
                                weight=jnp.asarray(w)))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_roofline_bookkeeping():
    r = profiling.roofline(seconds=1e-3, flops=1e9, bytes_moved=1e8)
    assert r["tflops"] == 1.0
    assert r["bound"] == "memory"
    assert r["speed_of_light_s"] > 0


def test_time_fn_runs():
    f = jax.jit(lambda x: x * 2 + 1)
    dt = profiling.time_fn(f, jnp.ones(128), iters=3, warmup=1)
    assert dt > 0


def test_kernel_bench_smoke():
    """Kernel microbench harness runs end-to-end (tiny sizes, CPU)."""
    from satrans_tpu.bench import kernels
    out = kernels.run(batch=64, fields=5, dim=8, vocab_rows=1024, heads=2)
    assert "embedding_gather" in out and "scoring" in out
    for r in out.values():
        assert r["seconds"] > 0


def test_prefetcher_propagates_producer_errors():
    """ADVICE r1 (low): a loader crash must not look like end-of-epoch."""
    import pytest
    from satrans_tpu.data.loader import Prefetcher

    def boom():
        yield 1
        raise RuntimeError("producer died")

    it = iter(Prefetcher(boom()))
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="producer died"):
        next(it)


def test_validate_ids_rejects_out_of_vocab():
    """ADVICE r1 (low): vocab violations fail loudly, not silently."""
    import numpy as np
    import pytest
    from satrans_tpu.features import FeatureLayout, SparseFeature

    layout = FeatureLayout([SparseFeature("a", 10, 8),
                            SparseFeature("b", 300, 8)])
    ok = {"a": np.array([0, 9]), "b": np.array([1, 299])}
    layout.validate_ids(ok)
    bad = {"a": np.array([0, 10]), "b": np.array([1, 2])}
    with pytest.raises(ValueError, match="'a'"):
        layout.validate_ids(bad)
