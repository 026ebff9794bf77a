"""Pallas equality-GEMM kernel (ops/pallas/eqgemm.py) vs the XLA combine.

The kernel computes the lazy bank update's duplicate-summed per-position
gradients (embeddings.eqgemm_combine) without materializing the [F, B, B]
equality tensor; it contracts in ONE bf16 MXU pass with f32 accumulation.
Tests run the kernel in interpret mode (CPU):

* equality vs the exact-f32 XLA einsum within the bf16 error class
  (the operand cast to bf16 bounds elementwise relative error by ~2^-8);
* the row-DMA scatter's precondition: duplicate positions of one field
  receive BYTE-identical rows, and positions of a boundary-shared row seen
  from different fields receive the byte-identical exact-f32 total
  (eqgemm_combine overwrites those in f32 regardless of impl);
* the pad path (B not a multiple of the row tile) and single-field /
  all-unique edge shapes.

Hardware-mode timing + accuracy + bit-identity evidence lives in
bench/eqgemm_probe.py -> bench_results/eqgemm_probe_v5e_r4.json.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from satrans_tpu import embeddings
from satrans_tpu.ops.pallas import eqgemm


def _xla_combine(ids, g):
    e = (ids[:, :, None] == ids[:, None, :])
    return jnp.einsum("fij,fjw->fiw", e.astype(g.dtype), g,
                      precision="highest")


def _rand(F, B, W, vocab, seed=0):
    rng = np.random.default_rng(seed)
    ids = rng.integers(0, vocab, size=(F, B)).astype(np.int32)
    g = (rng.normal(size=(F, B, W)) * 1e-2).astype(np.float32)
    return ids, g


@pytest.mark.parametrize("F,B,W,vocab,tile", [
    (3, 512, 128, 40, 256),   # heavy duplicates, divisible B
    (1, 256, 16, 7, 256),     # single field, tiny W
    (2, 300, 32, 10, 256),    # pad path: B % tile != 0
    (2, 64, 8, 10_000, 32),   # (almost) all-unique ids
])
def test_kernel_matches_exact_combine(F, B, W, vocab, tile):
    ids, g = _rand(F, B, W, vocab, seed=F * B)
    want = np.asarray(_xla_combine(jnp.asarray(ids), jnp.asarray(g)))
    got = np.asarray(eqgemm.eqgemm_positions(
        jnp.asarray(ids), jnp.asarray(g), tile=tile, interpret=True))
    assert got.shape == want.shape
    scale = np.abs(want).max()
    # one bf16 pass: elementwise relative error bounded by the g->bf16 cast
    np.testing.assert_allclose(got, want, atol=2 ** -7 * scale)


def test_duplicate_positions_bit_identical():
    """Duplicate positions within a field are the same contraction in the
    same subtile order -> byte-identical outputs (the scatter's racing-
    writers precondition is precision-INDEPENDENT)."""
    ids, g = _rand(3, 512, 128, 25, seed=7)
    ids[0, :64] = 3  # force a large duplicate group spanning two row tiles
    out = np.asarray(eqgemm.eqgemm_positions(
        jnp.asarray(ids), jnp.asarray(g), tile=256, interpret=True))
    for f in range(ids.shape[0]):
        _, inv = np.unique(ids[f], return_inverse=True)
        for u in range(inv.max() + 1):
            rows = out[f][inv == u]
            assert (rows == rows[0]).all()


def test_combine_dispatch_shared_rows_exact():
    """eqgemm_combine(impl='interpret') routes through the kernel and still
    overwrites boundary-shared rows with one exact-f32 cross-field total."""
    rng = np.random.default_rng(11)
    F, B, W = 3, 256, 32
    ids = np.stack([rng.integers(0, 11, B), rng.integers(10, 21, B),
                    rng.integers(20, 30, B)]).astype(np.int32)
    ids[0, :20] = 10
    ids[1, 20:40] = 10
    ids[1, 40:60] = 20
    ids[2, :20] = 20
    g = (rng.normal(size=(F, B, W)) * 1e-2).astype(np.float32)
    shared = ((10, (0, 1)), (20, (1, 2)))
    s = np.asarray(embeddings.eqgemm_combine(
        jnp.asarray(ids), jnp.asarray(g), shared, impl="interpret"))
    flat_ids = ids.reshape(-1)
    flat_g = g.reshape(-1, W)
    for row in (10, 20):
        vals = s.reshape(-1, W)[flat_ids == row]
        assert vals.shape[0] >= 40
        # byte-identical across ALL positions (both fields) - the actual
        # scatter precondition
        np.testing.assert_array_equal(
            vals, np.broadcast_to(vals[0], vals.shape))
        # and an exact-f32-class total (NOT the kernel's bf16 class): the
        # overwrite bypasses the kernel entirely.  f64 reference; f32
        # summation-order tolerance only.
        fields = dict(shared)[row]
        want = np.sum(np.stack(
            [np.where((ids[f] == row)[:, None], g[f].astype(np.float64),
                      0.0).sum(0) for f in fields]), axis=0)
        np.testing.assert_allclose(vals[0], want, rtol=1e-5, atol=1e-8)


def test_combine_dispatch_matches_xla_everywhere():
    """Full eqgemm_combine parity: interpret-kernel impl vs xla impl over
    every position (not just shared rows), within the bf16 error class."""
    rng = np.random.default_rng(3)
    F, B, W = 3, 192, 16
    ids = np.stack([rng.integers(0, 11, B), rng.integers(10, 21, B),
                    rng.integers(20, 30, B)]).astype(np.int32)
    g = rng.normal(size=(F, B, W)).astype(np.float32)
    shared = ((10, (0, 1)), (20, (1, 2)))
    a = np.asarray(embeddings.eqgemm_combine(
        jnp.asarray(ids), jnp.asarray(g), shared, impl="xla"))
    b = np.asarray(embeddings.eqgemm_combine(
        jnp.asarray(ids), jnp.asarray(g), shared, impl="interpret"))
    np.testing.assert_allclose(b, a, atol=2 ** -7 * np.abs(a).max())


def test_lazy_update_interpret_kernel_integration(monkeypatch):
    """lazy_update with SATRANS_EQGEMM=interpret (kernel combine) matches
    the xla-combine run within the bf16 gradient-combine error class."""
    import optax

    from satrans_tpu.features import FeatureLayout
    from satrans_tpu.models import SATrans
    from satrans_tpu.data.synthetic import synthetic_columns, synthetic_data
    from satrans_tpu.train import bank_optimizer
    import jax

    cols = synthetic_columns(num_sparse=3, vocab=300, dim=8)
    layout = FeatureLayout(cols)
    x, _ = synthetic_data(n=256, num_sparse=3, vocab=300)
    model = SATrans(layout=layout, domain_cols=["domain"],
                    num_domains_list=[3], domain_att_layer_num=1,
                    att_head_num=2, meta_dnn_hidden_units=(16, 8),
                    l2_reg_embedding=1e-4)
    plan = bank_optimizer.make_eq_plan(model)
    assert plan is not None

    params, _ = model.init(jax.random.PRNGKey(0))
    opt = optax.adam(0.01)
    opt_state = bank_optimizer.lazy_init(opt, params)
    batch = {k: jnp.asarray(v) for k, v in layout.batch_from_dict(x).items()}
    flat_ids = embeddings.bank_gather_plan(params["emb"], layout, batch)
    rng = np.random.default_rng(0)
    g_rows = jnp.asarray(rng.normal(
        size=(flat_ids.shape[0],
              params["emb"]["bank"].shape[1])).astype(np.float32) * 1e-2)
    g_rest = jax.tree.map(jnp.zeros_like,
                          bank_optimizer._split_bank(params)[0])

    def run():
        return bank_optimizer.lazy_update(
            opt, params, opt_state, flat_ids, g_rows, g_rest,
            lr=0.01, l2=1e-4, eq_plan=plan)

    monkeypatch.setenv("SATRANS_EQGEMM", "xla")
    p_x, _ = run()
    monkeypatch.setenv("SATRANS_EQGEMM", "interpret")
    p_k, _ = run()
    a = np.asarray(p_x["emb"]["bank"])
    b = np.asarray(p_k["emb"]["bank"])
    # Where the combined gradient is well away from zero, a bf16-class
    # combine perturbation moves the Adam update by O(2^-8 * lr).  Where
    # duplicates nearly cancel, bf16 rounding can flip the tiny sum's sign
    # and Adam's normalization amplifies that to a full +-lr step - an
    # intrinsic property of the bf16 combine (identical on TPU where the
    # XLA path is ALSO one bf16 pass), so bound it separately: every
    # element within Adam's hard per-step cap, and near-all within the
    # smooth-regime tolerance.
    diff = np.abs(b - a)
    assert diff.max() <= 2.2 * 0.01          # 2 * lr (one step each way)
    assert np.mean(diff > 3e-4) < 0.005      # <0.5% cancellation flips
