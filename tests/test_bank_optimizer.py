"""Sparse embedding-bank optimizer modes (train/bank_optimizer.py).

``fused`` must be numerically identical to the faithful ``dense`` path
(same formulas, same duplicate-combine order) for every strategy; ``lazy``
must match dense exactly when every physical bank row is touched every step
at l2=0 (its deviations only concern untouched rows / the L2 channel).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from satrans_tpu import embeddings
from satrans_tpu.data.synthetic import synthetic_columns, synthetic_data
from satrans_tpu.features import FeatureLayout, SparseFeature
from satrans_tpu.models import MMOE, AdaSparse, DeepFM, SATrans
from satrans_tpu.train import Trainer


def _satrans_setup(n=600, l2=1e-4):
    cols = synthetic_columns(num_sparse=4, vocab=400, dim=8, num_varlen=1)
    layout = FeatureLayout(cols)
    x, y = synthetic_data(n=n, num_sparse=4, vocab=400, num_varlen=1)
    model = SATrans(layout=layout, domain_cols=["domain"],
                    num_domains_list=[3], domain_att_layer_num=2,
                    att_head_num=2, meta_dnn_hidden_units=(16, 8),
                    l2_reg_embedding=l2)
    return model, x, y


def _fit(model, x, y, bank_update, *, lr=0.01, batch=256, epochs=1,
         scan_steps=1):
    tr = Trainer(model, seed=7)
    tr.compile(learning_rate=lr, bank_update=bank_update)
    tr.fit(x, y, batch_size=batch, epochs=epochs, shuffle=False, verbose=0,
           scan_steps=scan_steps)
    return tr


def _assert_tree_close(a, b, atol=1e-6, rtol=1e-5):
    fa, _ = jax.tree_util.tree_flatten(a)
    fb, _ = jax.tree_util.tree_flatten(b)
    assert len(fa) == len(fb)
    for la, lb in zip(fa, fb):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   atol=atol, rtol=rtol)


def test_gather_plan_matches_embed_fields():
    """The plan gathers exactly the rows embed_fields gathers, in order."""
    model, x, y = _satrans_setup(n=64)
    layout = model.layout
    params, _ = model.init(jax.random.PRNGKey(0))
    batch = {k: jnp.asarray(v) for k, v in layout.batch_from_dict(x).items()}
    plan = embeddings.bank_gather_plan(params["emb"], layout, batch)
    rows = jnp.take(params["emb"]["bank"], plan, axis=0)
    feed = embeddings.BankRowFeed(rows, params["emb"]["bank"].shape)
    fed = embeddings.embed_fields(
        dict(params["emb"], bank=feed), layout, batch)
    feed.assert_consumed()
    ref = embeddings.embed_fields(params["emb"], layout, batch)
    np.testing.assert_allclose(np.asarray(fed), np.asarray(ref), atol=1e-7)


def test_fused_equals_dense_satrans():
    """fused == dense through a fit with l2>0, varlen, and a tail batch."""
    model, x, y = _satrans_setup()
    tr_d = _fit(model, x, y, "dense")
    tr_f = _fit(model, x, y, "fused")
    assert tr_f._bank_mode == "fused" and tr_d._bank_mode == "dense"
    _assert_tree_close(tr_d.params, tr_f.params)
    _assert_tree_close(tr_d.opt_state, tr_f.opt_state)
    # predictions agree too
    np.testing.assert_allclose(tr_d.predict(x, 256), tr_f.predict(x, 256),
                               atol=1e-6)


def test_fused_equals_dense_scan_path():
    model, x, y = _satrans_setup(n=512)
    tr_d = _fit(model, x, y, "dense", scan_steps=2)
    tr_f = _fit(model, x, y, "fused", scan_steps=2)
    _assert_tree_close(tr_d.params, tr_f.params)


def test_fused_equals_dense_zoo_and_mtl():
    cols = synthetic_columns(num_sparse=3, vocab=300, dim=8)
    layout = FeatureLayout(cols)
    x, y = synthetic_data(n=500, num_sparse=3, vocab=300)
    for model in (DeepFM(layout=layout),
                  MMOE(layout=layout, num_tasks=3, domain_col="domain")):
        tr_d = _fit(model, x, y, "dense")
        tr_f = _fit(model, x, y, "fused")
        _assert_tree_close(tr_d.params, tr_f.params)


def test_fused_eq_matches_dense():
    """fused_eq == dense up to the eq-GEMM's f32 summation order (same
    update formulas incl. full-table L2 through Adam; PARITY.md notes the
    reduction-order freedom).  No varlen so the EqPlan engages."""
    from satrans_tpu.train import bank_optimizer

    cols = synthetic_columns(num_sparse=3, vocab=300, dim=8)
    layout = FeatureLayout(cols)
    x, y = synthetic_data(n=512, num_sparse=3, vocab=300)
    model = SATrans(layout=layout, domain_cols=["domain"],
                    num_domains_list=[3], domain_att_layer_num=1,
                    att_head_num=2, meta_dnn_hidden_units=(16, 8),
                    l2_reg_embedding=1e-4)
    assert bank_optimizer.make_eq_plan(model) is not None
    tr_d = _fit(model, x, y, "dense")
    tr_e = _fit(model, x, y, "fused_eq")
    assert tr_e._bank_mode == "fused_eq"
    _assert_tree_close(tr_d.params, tr_e.params, atol=2e-5, rtol=1e-4)
    _assert_tree_close(tr_d.opt_state, tr_e.opt_state, atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(tr_d.predict(x, 256), tr_e.predict(x, 256),
                               atol=1e-4)


def test_fused_eq_without_plan_is_bitwise_fused():
    """Varlen breaks the per-field grouping -> make_eq_plan is None ->
    fused_eq falls back to the sort combine = bit-identical to 'fused'."""
    from satrans_tpu.train import bank_optimizer

    model, x, y = _satrans_setup(n=512)
    assert bank_optimizer.make_eq_plan(model) is None
    tr_f = _fit(model, x, y, "fused")
    tr_e = _fit(model, x, y, "fused_eq")
    _assert_tree_close(tr_f.params, tr_e.params, atol=0, rtol=0)


def test_fused_eq_oob_ids_dropped_like_dense():
    """OOB ids on the eq path keep fused/dense drop semantics: their
    contributions reach no in-range row and their writes are dropped."""
    from satrans_tpu.train import bank_optimizer
    import optax

    cols = synthetic_columns(num_sparse=3, vocab=300, dim=8)
    layout = FeatureLayout(cols)
    x, y = synthetic_data(n=256, num_sparse=3, vocab=300)
    model = SATrans(layout=layout, domain_cols=["domain"],
                    num_domains_list=[3], domain_att_layer_num=1,
                    att_head_num=2, meta_dnn_hidden_units=(16, 8),
                    l2_reg_embedding=1e-4)
    plan = bank_optimizer.make_eq_plan(model)
    assert plan is not None
    params, _ = model.init(jax.random.PRNGKey(0))
    opt = optax.adam(0.01, b1=0.9, b2=0.999, eps=1e-8)
    opt_state = opt.init(params)
    batch = {k: jnp.asarray(v) for k, v in layout.batch_from_dict(x).items()}
    flat_ids = np.array(
        embeddings.bank_gather_plan(params["emb"], layout, batch))
    R = params["emb"]["bank"].shape[0]
    flat_ids[::7] = R + 5     # OOB high (same raw id -> combined, dropped)
    flat_ids[3] = -2          # OOB negative
    flat_ids = jnp.asarray(flat_ids)
    rng = np.random.default_rng(0)
    g_rows = jnp.asarray(rng.normal(
        size=(flat_ids.shape[0],
              params["emb"]["bank"].shape[1])).astype(np.float32))
    g_rest = jax.tree.map(jnp.zeros_like,
                          bank_optimizer._split_bank(params)[0])

    p_sort, s_sort = bank_optimizer.fused_update(
        opt, params, opt_state, flat_ids, g_rows, g_rest, lr=0.01, l2=1e-4)
    p_eq, s_eq = bank_optimizer.fused_update(
        opt, params, opt_state, flat_ids, g_rows, g_rest, lr=0.01, l2=1e-4,
        eq_plan=plan)
    _assert_tree_close(p_sort, p_eq, atol=2e-5, rtol=1e-4)
    _assert_tree_close(s_sort, s_eq, atol=2e-5, rtol=1e-4)


def test_fused_eq_pallas_scatter_matches_xla(monkeypatch):
    """fused_eq committing per-position duplicates through the row-DMA
    kernel (interpret) is bit-identical to the XLA duplicate-set path."""
    from satrans_tpu.train import bank_optimizer
    import optax

    cols = synthetic_columns(num_sparse=3, vocab=300, dim=8)
    layout = FeatureLayout(cols)
    x, y = synthetic_data(n=256, num_sparse=3, vocab=300)
    model = SATrans(layout=layout, domain_cols=["domain"],
                    num_domains_list=[3], domain_att_layer_num=1,
                    att_head_num=2, meta_dnn_hidden_units=(16, 8),
                    l2_reg_embedding=1e-4)
    plan = bank_optimizer.make_eq_plan(model)
    assert plan is not None
    params, _ = model.init(jax.random.PRNGKey(0))
    opt = optax.adam(0.01, b1=0.9, b2=0.999, eps=1e-8)
    opt_state = opt.init(params)
    batch = {k: jnp.asarray(v) for k, v in layout.batch_from_dict(x).items()}
    flat_ids = embeddings.bank_gather_plan(params["emb"], layout, batch)
    rng = np.random.default_rng(0)
    g_rows = jnp.asarray(rng.normal(
        size=(flat_ids.shape[0],
              params["emb"]["bank"].shape[1])).astype(np.float32))
    g_rest = jax.tree.map(jnp.zeros_like,
                          bank_optimizer._split_bank(params)[0])

    def run():
        return bank_optimizer.fused_update(
            opt, params, opt_state, flat_ids, g_rows, g_rest,
            lr=0.01, l2=1e-4, eq_plan=plan)

    monkeypatch.setenv("SATRANS_SCATTER", "xla")
    p_x, s_x = run()
    monkeypatch.setenv("SATRANS_SCATTER", "interpret")
    p_p, s_p = run()
    _assert_tree_close(p_x, p_p, atol=0, rtol=0)
    _assert_tree_close(s_x, s_p, atol=0, rtol=0)


def test_eq_combine_drops_per_field_oov():
    """A per-field OOV id aliases a NEIGHBOR field's row - a cross-field
    duplicate the per-field equality GEMMs cannot combine.  _eq_combine
    must DROP that position deterministically (round-4 review: racing it
    against the victim field's writer lost one side's gradient), leaving
    the victim row exactly the victim field's own update.  Ground truth:
    the sort-combine run with the OOV position replaced by a zero-grad
    duplicate of another already-touched row (identical touch set and
    totals)."""
    from satrans_tpu.train import bank_optimizer
    import optax

    cols = synthetic_columns(num_sparse=3, vocab=300, dim=8)
    layout = FeatureLayout(cols)
    x, y = synthetic_data(n=256, num_sparse=3, vocab=300)
    model = SATrans(layout=layout, domain_cols=["domain"],
                    num_domains_list=[3], domain_att_layer_num=1,
                    att_head_num=2, meta_dnn_hidden_units=(16, 8),
                    l2_reg_embedding=1e-4)
    plan = bank_optimizer.make_eq_plan(model)
    assert plan is not None and len(plan.ranges) == plan.fields == 3

    params, _ = model.init(jax.random.PRNGKey(0))
    opt = optax.adam(0.01, b1=0.9, b2=0.999, eps=1e-8)
    batch = {k: jnp.asarray(v) for k, v in layout.batch_from_dict(x).items()}
    flat_ids = np.array(
        embeddings.bank_gather_plan(params["emb"], layout, batch))
    F = plan.fields
    # field-0 of sample 0 carries an id INSIDE field 1's row range (not a
    # boundary-shared row), and field-1 of sample 5 genuinely touches it
    victim = plan.ranges[1][0] + 2
    assert victim > plan.ranges[0][1]          # truly outside field 0
    flat_ids[0 * F + 0] = victim
    flat_ids[5 * F + 1] = victim
    rng = np.random.default_rng(0)
    g_rows = rng.normal(size=(flat_ids.shape[0],
                              params["emb"]["bank"].shape[1])
                        ).astype(np.float32)
    g_rest = jax.tree.map(jnp.zeros_like,
                          bank_optimizer._split_bank(params)[0])

    # ground truth: OOV position -> zero-grad duplicate of another
    # in-range field-0 row (same touch set, same totals, sort combine)
    ids_ref = flat_ids.copy()
    g_ref = g_rows.copy()
    ids_ref[0 * F + 0] = flat_ids[1 * F + 0]
    g_ref[0 * F + 0] = 0.0

    opt_state = bank_optimizer.lazy_init(opt, params)
    p_eq, s_eq = bank_optimizer.lazy_update(
        opt, params, opt_state, jnp.asarray(flat_ids), jnp.asarray(g_rows),
        g_rest, lr=0.01, l2=1e-4, eq_plan=plan)
    p_ref, s_ref = bank_optimizer.lazy_update(
        opt, params, opt_state, jnp.asarray(ids_ref), jnp.asarray(g_ref),
        g_rest, lr=0.01, l2=1e-4)
    np.testing.assert_allclose(np.asarray(p_eq["emb"]["bank"]),
                               np.asarray(p_ref["emb"]["bank"]),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(s_eq[1]["last"]),
                                  np.asarray(s_ref[1]["last"]))

    # same contract on the fused_eq path (vs the sort-combine fused)
    opt_state_f = opt.init(params)
    pf_eq, sf_eq = bank_optimizer.fused_update(
        opt, params, opt_state_f, jnp.asarray(flat_ids),
        jnp.asarray(g_rows), g_rest, lr=0.01, l2=1e-4, eq_plan=plan)
    pf_ref, sf_ref = bank_optimizer.fused_update(
        opt, params, opt_state_f, jnp.asarray(ids_ref), jnp.asarray(g_ref),
        g_rest, lr=0.01, l2=1e-4)
    _assert_tree_close(pf_eq, pf_ref, atol=2e-5, rtol=1e-4)
    _assert_tree_close(sf_eq, sf_ref, atol=2e-5, rtol=1e-4)


def test_scatter_drop_oob_skips_negative_ids():
    """drop_oob predicates on 0 <= id < R: a negative id must be skipped,
    not DMA'd before the array base (round-4 review)."""
    from satrans_tpu.ops.pallas import scatter as pallas_scatter

    rng = np.random.default_rng(5)
    rows, w, n = 64, 128, 32
    ids = rng.choice(rows, size=n, replace=False).astype(np.int32)
    ids[3] = -1
    ids[7] = -2_000_000
    ids[11] = rows          # sentinel
    vals = rng.normal(size=(n, w)).astype(np.float32)
    a = jnp.asarray(rng.normal(size=(rows, w)).astype(np.float32))
    got = pallas_scatter.scatter_rows_set(
        (a,), jnp.asarray(ids), (jnp.asarray(vals),),
        rb=16, interpret=True, drop_oob=True)[0]
    # NOTE the oracle sentinels negatives first: XLA .at[].set(mode='drop')
    # WRAPS negative ids numpy-style (only >= R is dropped), so raw -1
    # would hit the last row - which is why callers sentinel negatives
    # before XLA scatters and the kernel predicates them off itself
    want = a.at[np.where(ids < 0, rows, ids)].set(vals, mode="drop")
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_auto_resolves_to_dense_for_now():
    # auto stays 'dense' until the sparse combine is faster on-chip
    # (see Trainer._resolve_bank_mode)
    model, x, y = _satrans_setup(n=64)
    tr = Trainer(model, seed=0)
    tr.compile(bank_update="auto")
    tr._strategy = tr._resolve_strategy(None)
    tr._ensure_initialized()
    assert tr._bank_mode == "dense"
    import optax
    tr2 = Trainer(model, seed=0)
    tr2.compile(optimizer=optax.adam(1e-3))  # custom transform -> dense
    tr2._strategy = tr2._resolve_strategy(None)
    tr2._ensure_initialized()
    assert tr2._bank_mode == "dense"


def test_non_standard_model_rejected():
    cols = synthetic_columns(num_sparse=3, vocab=300, dim=8)
    layout = FeatureLayout(cols)
    model = AdaSparse(layout=layout, domain_col="domain", num_domains=3,
                      domain_emb_dim=8)
    tr = Trainer(model, seed=0)
    tr.compile(bank_update="fused")
    tr._strategy = tr._resolve_strategy(None)
    with pytest.raises(ValueError, match="standard_bank_access"):
        tr._ensure_initialized()
    # auto quietly falls back
    tr2 = Trainer(model, seed=0)
    tr2.compile(bank_update="auto")
    tr2._strategy = tr2._resolve_strategy(None)
    tr2._ensure_initialized()
    assert tr2._bank_mode == "dense"


def test_lazy_matches_dense_when_all_rows_touched_l2_zero():
    """Every physical row touched every step + l2=0 -> lazy == dense.

    dim=8 packs 16 logical rows per physical row; a 512-example uniform
    batch over vocab 300 covers all 19 physical rows per field with
    probability ~1 (and the fixed seed makes it deterministic).
    """
    cols = synthetic_columns(num_sparse=3, vocab=300, dim=8)
    layout = FeatureLayout(cols)
    x, y = synthetic_data(n=1024, num_sparse=3, vocab=300)
    model = SATrans(layout=layout, domain_cols=["domain"],
                    num_domains_list=[3], domain_att_layer_num=1,
                    att_head_num=2, meta_dnn_hidden_units=(16, 8),
                    l2_reg_embedding=0.0)
    tr_d = _fit(model, x, y, "dense", batch=512)
    tr_l = _fit(model, x, y, "lazy", batch=512)
    np.testing.assert_allclose(np.asarray(tr_d.params["emb"]["bank"]),
                               np.asarray(tr_l.params["emb"]["bank"]),
                               atol=1e-6, rtol=1e-5)
    np.testing.assert_allclose(tr_d.predict(x, 512), tr_l.predict(x, 512),
                               atol=1e-6)


def test_lazy_trains_with_l2():
    """Smoke: lazy mode with decoupled L2 learns and stays finite."""
    model, x, y = _satrans_setup(n=1024, l2=1e-5)
    tr = _fit(model, x, y, "lazy", batch=256, epochs=2)
    pred = tr.predict(x, 512)
    assert np.isfinite(pred).all()
    from satrans_tpu.train import metrics
    assert metrics.auc(y, pred) > 0.55


def test_fused_under_mesh_matches_dense():
    mesh = jax.sharding.Mesh(np.array(jax.devices()), ("data",))
    model, x, y = _satrans_setup(n=512)
    tr_d = _fit(model, x, y, "dense")
    tr_m = Trainer(model, mesh=mesh, shard_embeddings=True, seed=7)
    tr_m.compile(learning_rate=0.01, bank_update="fused")
    tr_m.fit(x, y, batch_size=256, epochs=1, shuffle=False, verbose=0)
    assert tr_m._bank_mode == "fused"
    # mesh pads the bank rows; compare the common prefix
    bank_d = np.asarray(tr_d.params["emb"]["bank"])
    bank_m = np.asarray(tr_m.params["emb"]["bank"])[:bank_d.shape[0]]
    np.testing.assert_allclose(bank_d, bank_m, atol=1e-5, rtol=1e-5)


def test_fused_eq_under_mesh_matches_dense():
    """fused_eq under an 8-device mesh (force_xla: SPMD einsum combine +
    duplicate-index scatter, collectives inserted by XLA) matches the
    single-device dense fit.  No varlen so the EqPlan engages."""
    from satrans_tpu.train import bank_optimizer

    mesh = jax.sharding.Mesh(np.array(jax.devices()), ("data",))
    cols = synthetic_columns(num_sparse=3, vocab=300, dim=8)
    layout = FeatureLayout(cols)
    x, y = synthetic_data(n=512, num_sparse=3, vocab=300)
    model = SATrans(layout=layout, domain_cols=["domain"],
                    num_domains_list=[3], domain_att_layer_num=1,
                    att_head_num=2, meta_dnn_hidden_units=(16, 8),
                    l2_reg_embedding=1e-4)
    assert bank_optimizer.make_eq_plan(model) is not None
    tr_d = _fit(model, x, y, "dense")
    tr_m = Trainer(model, mesh=mesh, shard_embeddings=True, seed=7)
    tr_m.compile(learning_rate=0.01, bank_update="fused_eq")
    tr_m.fit(x, y, batch_size=256, epochs=1, shuffle=False, verbose=0)
    assert tr_m._bank_mode == "fused_eq"
    bank_d = np.asarray(tr_d.params["emb"]["bank"])
    bank_m = np.asarray(tr_m.params["emb"]["bank"])[:bank_d.shape[0]]
    np.testing.assert_allclose(bank_d, bank_m, atol=1e-5, rtol=1e-4)


def test_lazy_under_mesh_matches_single():
    """The routed shard-local lazy update (parallel/bank_sharded.py) on an
    8-device mesh == single-device lazy, through a full fit with l2>0,
    varlen fields, untouched rows, and a tail batch (VERDICT r2 weak #1:
    the headline mode must run multi-chip)."""
    mesh = jax.sharding.Mesh(np.array(jax.devices()), ("data",))
    model, x, y = _satrans_setup(n=512, l2=1e-4)
    tr_s = _fit(model, x, y, "lazy", batch=256)
    tr_m = Trainer(model, mesh=mesh, shard_embeddings=True, seed=7)
    # capacity_factor=None -> exact exchange (no overflow possible)
    tr_m.compile(learning_rate=0.01, bank_update="lazy",
                 lazy_capacity_factor=None)
    tr_m.fit(x, y, batch_size=256, epochs=1, shuffle=False, verbose=0)
    assert tr_m._bank_mode == "lazy"
    bank_s = np.asarray(tr_s.params["emb"]["bank"])
    bank_m = np.asarray(tr_m.params["emb"]["bank"])[:bank_s.shape[0]]
    np.testing.assert_allclose(bank_s, bank_m, atol=1e-6, rtol=1e-5)
    # lazy opt state agrees too (mu/nu/last shard with the rows)
    mu_s = np.asarray(tr_s.opt_state[1]["mu"])
    mu_m = np.asarray(tr_m.opt_state[1]["mu"])[:mu_s.shape[0]]
    np.testing.assert_allclose(mu_s, mu_m, atol=1e-6, rtol=1e-5)
    last_s = np.asarray(tr_s.opt_state[1]["last"])
    last_m = np.asarray(tr_m.opt_state[1]["last"])[:last_s.shape[0]]
    np.testing.assert_array_equal(last_s, last_m)
    np.testing.assert_allclose(tr_s.predict(x, 256), tr_m.predict(x, 256),
                               atol=1e-5)


def test_lazy_mesh_scan_and_capacity():
    """Routed lazy under the fused scan path with the default (bounded)
    capacity factor: trains, stays finite, reports zero overflow on a
    benign batch."""
    mesh = jax.sharding.Mesh(np.array(jax.devices()), ("data",))
    model, x, y = _satrans_setup(n=512, l2=1e-5)
    tr = Trainer(model, mesh=mesh, shard_embeddings=True, seed=7)
    tr.compile(learning_rate=0.01, bank_update="lazy")
    tr.fit(x, y, batch_size=256, epochs=1, shuffle=False, verbose=0,
           scan_steps=2)
    assert np.isfinite(tr.predict(x, 256)).all()


def test_lazy_mesh_alltoall_gather_matches_single():
    """lazy + the explicit all-to-all forward exchange: the gather comes
    through parallel/embedding_sharded and the update through
    parallel/bank_sharded - still equal to single-device lazy."""
    mesh = jax.sharding.Mesh(np.array(jax.devices()), ("data",))
    model, x, y = _satrans_setup(n=512, l2=1e-4)
    tr_s = _fit(model, x, y, "lazy", batch=256)
    tr_m = Trainer(model, mesh=mesh, shard_embeddings=True,
                   embedding_exchange="alltoall", seed=7)
    tr_m.compile(learning_rate=0.01, bank_update="lazy",
                 lazy_capacity_factor=None)
    tr_m.fit(x, y, batch_size=256, epochs=1, shuffle=False, verbose=0)
    bank_s = np.asarray(tr_s.params["emb"]["bank"])
    bank_m = np.asarray(tr_m.params["emb"]["bank"])[:bank_s.shape[0]]
    np.testing.assert_allclose(bank_s, bank_m, atol=1e-6, rtol=1e-5)


def test_fused_alltoall_exchange_matches_dense():
    """Explicit all-to-all embedding exchange under a sharded mesh trains
    identically to the faithful dense path."""
    mesh = jax.sharding.Mesh(np.array(jax.devices()), ("data",))
    model, x, y = _satrans_setup(n=512)
    tr_d = _fit(model, x, y, "dense")
    tr_m = Trainer(model, mesh=mesh, shard_embeddings=True,
                   embedding_exchange="alltoall", seed=7)
    tr_m.compile(learning_rate=0.01, bank_update="fused")
    tr_m.fit(x, y, batch_size=256, epochs=1, shuffle=False, verbose=0)
    assert tr_m._bank_mode == "fused"
    bank_d = np.asarray(tr_d.params["emb"]["bank"])
    bank_m = np.asarray(tr_m.params["emb"]["bank"])[:bank_d.shape[0]]
    np.testing.assert_allclose(bank_d, bank_m, atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(tr_d.predict(x, 256), tr_m.predict(x, 256),
                               atol=1e-5)


def test_auto_resolves_to_fused_eq_under_alltoall():
    """bank_update left at the default must WORK with the distributed
    one-liner (VERDICT r4 weak #2): auto resolves to fused_eq - the
    recommended exact-parity mode under alltoall - instead of raising."""
    mesh = jax.sharding.Mesh(np.array(jax.devices()), ("data",))
    model, x, y = _satrans_setup(n=512)
    tr = Trainer(model, mesh=mesh, shard_embeddings=True,
                 embedding_exchange="alltoall", seed=7)
    tr.compile(learning_rate=0.01)  # bank_update defaults to 'auto'
    tr.fit(x, y, batch_size=256, epochs=1, shuffle=False, verbose=0)
    assert tr._bank_mode == "fused_eq"
    # and it still matches the faithful dense path
    tr_d = _fit(model, x, y, "dense")
    bank_d = np.asarray(tr_d.params["emb"]["bank"])
    bank_m = np.asarray(tr.params["emb"]["bank"])[:bank_d.shape[0]]
    np.testing.assert_allclose(bank_d, bank_m, atol=1e-5, rtol=1e-5)


def test_alltoall_requires_fused_and_mesh():
    model, _, _ = _satrans_setup(n=64)
    with pytest.raises(ValueError, match="alltoall"):
        Trainer(model, embedding_exchange="alltoall")
    mesh = jax.sharding.Mesh(np.array(jax.devices()), ("data",))
    tr = Trainer(model, mesh=mesh, shard_embeddings=True,
                 embedding_exchange="alltoall")
    tr.compile(bank_update="dense")
    tr._strategy = tr._resolve_strategy(None)
    with pytest.raises(ValueError, match="fused"):
        tr._ensure_initialized()


def test_eqgemm_combine_matches_duplicate_sum():
    """eqgemm_combine == per-row duplicate sum, incl. boundary-shared rows
    (a physical row straddling two fields' logical ranges)."""
    rng = np.random.default_rng(3)
    F, B, W = 3, 64, 16
    # field row ranges [0,10), [10,20), [20,30) with rows 9/10 and 19/20
    # arranged so rows 10 and 20 are drawn by BOTH neighbouring fields
    ids = np.stack([rng.integers(0, 11, B), rng.integers(10, 21, B),
                    rng.integers(20, 30, B)]).astype(np.int32)
    g = rng.normal(size=(F, B, W)).astype(np.float32)
    shared = ((10, (0, 1)), (20, (1, 2)))
    s = np.asarray(embeddings.eqgemm_combine(jnp.asarray(ids),
                                             jnp.asarray(g), shared))
    flat_ids = ids.reshape(-1)
    flat_g = g.reshape(-1, W)
    for pos in range(F * B):
        want = flat_g[flat_ids == flat_ids[pos]].sum(axis=0)
        np.testing.assert_allclose(s.reshape(-1, W)[pos], want,
                                   atol=1e-4, rtol=1e-5)


def test_lazy_eq_plan_matches_sort_path():
    """lazy_update with an EqPlan == the sort-based combine (same formulas,
    f32 summation order aside)."""
    from satrans_tpu.train import bank_optimizer
    import optax

    cols = synthetic_columns(num_sparse=3, vocab=300, dim=8)
    layout = FeatureLayout(cols)
    x, y = synthetic_data(n=512, num_sparse=3, vocab=300)
    model = SATrans(layout=layout, domain_cols=["domain"],
                    num_domains_list=[3], domain_att_layer_num=1,
                    att_head_num=2, meta_dnn_hidden_units=(16, 8),
                    l2_reg_embedding=1e-4)
    plan = bank_optimizer.make_eq_plan(model)
    assert plan is not None and plan.fields == 3
    # vocab 300 is not a multiple of the dim-8 pack factor (16): the plan
    # must carry the straddled boundary rows
    assert len(plan.shared) == 2

    params, _ = model.init(jax.random.PRNGKey(0))
    opt = optax.adam(0.01, b1=0.9, b2=0.999, eps=1e-8)
    opt_state = bank_optimizer.lazy_init(opt, params)
    batch = {k: jnp.asarray(v) for k, v in layout.batch_from_dict(x).items()}
    flat_ids = embeddings.bank_gather_plan(params["emb"], layout, batch)
    rng = np.random.default_rng(0)
    g_rows = jnp.asarray(rng.normal(
        size=(flat_ids.shape[0],
              params["emb"]["bank"].shape[1])).astype(np.float32))
    g_rest = jax.tree.map(jnp.zeros_like,
                          bank_optimizer._split_bank(params)[0])

    p_sort, s_sort = jax.jit(
        lambda p, o: bank_optimizer.lazy_update(
            opt, p, o, flat_ids, g_rows, g_rest, lr=0.01, l2=1e-4))(
        params, opt_state)
    p_eq, s_eq = jax.jit(
        lambda p, o: bank_optimizer.lazy_update(
            opt, p, o, flat_ids, g_rows, g_rest, lr=0.01, l2=1e-4,
            eq_plan=plan))(params, opt_state)
    np.testing.assert_allclose(np.asarray(p_sort["emb"]["bank"]),
                               np.asarray(p_eq["emb"]["bank"]),
                               atol=2e-5, rtol=1e-4)
    for key in ("mu", "nu", "last"):
        np.testing.assert_allclose(np.asarray(s_sort[1][key]),
                                   np.asarray(s_eq[1][key]),
                                   atol=2e-5, rtol=1e-4)


def test_pallas_scatter_rows_set_interpret():
    """Row-DMA scatter kernel (interpret) == XLA .at[].set, including
    duplicate ids with identical values and the internal pad-to-block."""
    from satrans_tpu.ops.pallas import scatter as pallas_scatter

    rng = np.random.default_rng(3)
    rows, w, n = 500, 128, 70  # n deliberately NOT a multiple of rb
    ids = np.sort(rng.choice(rows, size=n, replace=False)).astype(np.int32)
    ids[5] = ids[4]  # duplicate pair...
    vals = rng.normal(size=(n, w)).astype(np.float32)
    vals[5] = vals[4]  # ...carrying identical values
    vals2 = rng.normal(size=(n, w)).astype(np.float32)
    vals2[5] = vals2[4]
    a = jnp.asarray(rng.normal(size=(rows, w)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(rows, w)).astype(np.float32))

    got_a, got_b = pallas_scatter.scatter_rows_set(
        (a, b), jnp.asarray(ids), (jnp.asarray(vals), jnp.asarray(vals2)),
        rb=32, interpret=True)
    np.testing.assert_array_equal(np.asarray(got_a),
                                  np.asarray(a.at[ids].set(vals)))
    np.testing.assert_array_equal(np.asarray(got_b),
                                  np.asarray(b.at[ids].set(vals2)))


def test_lazy_eq_plan_pallas_scatter_matches_xla(monkeypatch):
    """lazy_update committing rows through the Pallas kernel (interpret) is
    bit-identical to the XLA scatter path."""
    from satrans_tpu.train import bank_optimizer
    import optax

    cols = synthetic_columns(num_sparse=3, vocab=300, dim=8)
    layout = FeatureLayout(cols)
    x, y = synthetic_data(n=256, num_sparse=3, vocab=300)
    model = SATrans(layout=layout, domain_cols=["domain"],
                    num_domains_list=[3], domain_att_layer_num=1,
                    att_head_num=2, meta_dnn_hidden_units=(16, 8),
                    l2_reg_embedding=1e-4)
    plan = bank_optimizer.make_eq_plan(model)
    assert plan is not None

    params, _ = model.init(jax.random.PRNGKey(0))
    opt = optax.adam(0.01, b1=0.9, b2=0.999, eps=1e-8)
    opt_state = bank_optimizer.lazy_init(opt, params)
    batch = {k: jnp.asarray(v) for k, v in layout.batch_from_dict(x).items()}
    flat_ids = embeddings.bank_gather_plan(params["emb"], layout, batch)
    rng = np.random.default_rng(0)
    g_rows = jnp.asarray(rng.normal(
        size=(flat_ids.shape[0],
              params["emb"]["bank"].shape[1])).astype(np.float32))
    g_rest = jax.tree.map(jnp.zeros_like,
                          bank_optimizer._split_bank(params)[0])

    def run():
        return bank_optimizer.lazy_update(
            opt, params, opt_state, flat_ids, g_rows, g_rest,
            lr=0.01, l2=1e-4, eq_plan=plan)

    monkeypatch.setenv("SATRANS_SCATTER", "xla")
    p_x, s_x = run()
    monkeypatch.setenv("SATRANS_SCATTER", "interpret")
    p_p, s_p = run()
    np.testing.assert_array_equal(np.asarray(p_x["emb"]["bank"]),
                                  np.asarray(p_p["emb"]["bank"]))
    for key in ("mu", "nu", "last"):
        np.testing.assert_array_equal(np.asarray(s_x[1][key]),
                                      np.asarray(s_p[1][key]))


def test_pallas_scatter_drop_oob_interpret():
    """drop_oob skips sentinel ids (>= row count) exactly like XLA's
    mode='drop' scatter."""
    from satrans_tpu.ops.pallas import scatter as pallas_scatter

    rng = np.random.default_rng(9)
    rows, w, n = 300, 128, 50
    ids = np.sort(rng.choice(rows, size=n, replace=False)).astype(np.int32)
    ids[-7:] = rows  # sentinel tail, as fused_update produces
    vals = rng.normal(size=(n, w)).astype(np.float32)
    a = jnp.asarray(rng.normal(size=(rows, w)).astype(np.float32))

    (got,) = pallas_scatter.scatter_rows_set(
        (a,), jnp.asarray(ids), (jnp.asarray(vals),),
        rb=16, interpret=True, drop_oob=True)
    want = a.at[ids].set(vals, mode="drop")
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_fused_pallas_scatter_matches_xla(monkeypatch):
    """fused_update committing its touched-row corrections through the
    drop_oob Pallas kernel (interpret) is bit-identical to the XLA path."""
    from satrans_tpu.train import bank_optimizer
    import optax

    cols = synthetic_columns(num_sparse=3, vocab=300, dim=8)
    layout = FeatureLayout(cols)
    x, y = synthetic_data(n=256, num_sparse=3, vocab=300)
    model = SATrans(layout=layout, domain_cols=["domain"],
                    num_domains_list=[3], domain_att_layer_num=1,
                    att_head_num=2, meta_dnn_hidden_units=(16, 8),
                    l2_reg_embedding=1e-4)
    params, _ = model.init(jax.random.PRNGKey(0))
    opt = optax.adam(0.01, b1=0.9, b2=0.999, eps=1e-8)
    opt_state = opt.init(params)
    batch = {k: jnp.asarray(v) for k, v in layout.batch_from_dict(x).items()}
    flat_ids = embeddings.bank_gather_plan(params["emb"], layout, batch)
    rng = np.random.default_rng(1)
    g_rows = jnp.asarray(rng.normal(
        size=(flat_ids.shape[0],
              params["emb"]["bank"].shape[1])).astype(np.float32))
    g_rest = jax.tree.map(jnp.zeros_like,
                          bank_optimizer._split_bank(params)[0])

    def run():
        return bank_optimizer.fused_update(
            opt, params, opt_state, flat_ids, g_rows, g_rest,
            lr=0.01, l2=1e-4)

    monkeypatch.setenv("SATRANS_SCATTER", "xla")
    p_x, s_x = run()
    monkeypatch.setenv("SATRANS_SCATTER", "interpret")
    p_p, s_p = run()
    np.testing.assert_array_equal(np.asarray(p_x["emb"]["bank"]),
                                  np.asarray(p_p["emb"]["bank"]))
    ix, ax_ = bank_optimizer._find_adam_state(s_x)
    ip, ap_ = bank_optimizer._find_adam_state(s_p)
    np.testing.assert_array_equal(np.asarray(ax_.mu["emb"]["bank"]),
                                  np.asarray(ap_.mu["emb"]["bank"]))
    np.testing.assert_array_equal(np.asarray(ax_.nu["emb"]["bank"]),
                                  np.asarray(ap_.nu["emb"]["bank"]))


def test_eqgemm_shared_row_positions_bit_identical():
    """Every position of a boundary-shared row carries the byte-identical
    total regardless of which field saw it (the row-DMA scatter's racing-
    writers precondition, ADVICE r2 finding 1)."""
    rng = np.random.default_rng(11)
    F, B, W = 3, 128, 16
    ids = np.stack([rng.integers(0, 11, B), rng.integers(10, 21, B),
                    rng.integers(20, 30, B)]).astype(np.int32)
    # force many hits on the shared rows from both sides
    ids[0, :20] = 10
    ids[1, 20:40] = 10
    ids[1, 40:60] = 20
    ids[2, :20] = 20
    g = rng.normal(size=(F, B, W)).astype(np.float32)
    shared = ((10, (0, 1)), (20, (1, 2)))
    s = np.asarray(embeddings.eqgemm_combine(jnp.asarray(ids),
                                             jnp.asarray(g), shared))
    for row in (10, 20):
        vals = s.reshape(-1, W)[ids.reshape(-1) == row]
        assert vals.shape[0] >= 40
        np.testing.assert_array_equal(vals, np.broadcast_to(vals[0], vals.shape))


def test_eqgemm_batch_cap_engages_sort_path(monkeypatch):
    """Above the documented [F,B,B] memory cap the lazy update falls back to
    the sort combine (VERDICT r2 weak #8) - bitwise: capped eq_plan run ==
    eq_plan=None run."""
    from satrans_tpu.train import bank_optimizer
    import optax

    plan = bank_optimizer.EqPlan(fields=10, shared=(),
                                 ranges=((0, 10**9),) * 10)
    assert bank_optimizer.use_eqgemm(plan, 10 * 8192)       # 2.7 GB <= 4 GB
    assert not bank_optimizer.use_eqgemm(plan, 10 * 32768)  # 43 GB > 4 GB
    assert not bank_optimizer.use_eqgemm(None, 10 * 128)
    assert not bank_optimizer.use_eqgemm(plan, 0)

    cols = synthetic_columns(num_sparse=3, vocab=300, dim=8)
    layout = FeatureLayout(cols)
    x, y = synthetic_data(n=256, num_sparse=3, vocab=300)
    model = SATrans(layout=layout, domain_cols=["domain"],
                    num_domains_list=[3], domain_att_layer_num=1,
                    att_head_num=2, meta_dnn_hidden_units=(16, 8),
                    l2_reg_embedding=1e-4)
    plan = bank_optimizer.make_eq_plan(model)
    params, _ = model.init(jax.random.PRNGKey(0))
    opt = optax.adam(0.01)
    opt_state = bank_optimizer.lazy_init(opt, params)
    batch = {k: jnp.asarray(v) for k, v in layout.batch_from_dict(x).items()}
    flat_ids = embeddings.bank_gather_plan(params["emb"], layout, batch)
    rng = np.random.default_rng(0)
    g_rows = jnp.asarray(rng.normal(
        size=(flat_ids.shape[0],
              params["emb"]["bank"].shape[1])).astype(np.float32))
    g_rest = jax.tree.map(jnp.zeros_like,
                          bank_optimizer._split_bank(params)[0])

    monkeypatch.setenv("SATRANS_EQGEMM_MAX_BYTES", "1")
    p_cap, s_cap = bank_optimizer.lazy_update(
        opt, params, opt_state, flat_ids, g_rows, g_rest, lr=0.01, l2=1e-4,
        eq_plan=plan)
    monkeypatch.delenv("SATRANS_EQGEMM_MAX_BYTES")
    p_sort, s_sort = bank_optimizer.lazy_update(
        opt, params, opt_state, flat_ids, g_rows, g_rest, lr=0.01, l2=1e-4)
    np.testing.assert_array_equal(np.asarray(p_cap["emb"]["bank"]),
                                  np.asarray(p_sort["emb"]["bank"]))
    np.testing.assert_array_equal(np.asarray(s_cap[1]["mu"]),
                                  np.asarray(s_sort[1]["mu"]))


def test_pallas_scatter_empty_ids_noop():
    """N=0 (no large-bank rows touched) returns the arrays unchanged instead
    of lowering a zero-trip Pallas grid (ADVICE r2 finding 4)."""
    from satrans_tpu.ops.pallas import scatter as pallas_scatter

    a = jnp.arange(12.0).reshape(3, 4)
    (got,) = pallas_scatter.scatter_rows_set(
        (a,), jnp.zeros((0,), jnp.int32), (jnp.zeros((0, 4)),),
        interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(a))


def test_lazy_oob_ids_consistent_across_state(monkeypatch):
    """OOB ids are clipped to the last row for ALL four lazy-state scatters
    (bank/mu/nu/last), on both the XLA and Pallas paths (ADVICE r2 finding
    2: previously 'last' dropped while the Pallas DMA clamped)."""
    from satrans_tpu.train import bank_optimizer
    import optax

    cols = synthetic_columns(num_sparse=3, vocab=300, dim=8)
    layout = FeatureLayout(cols)
    x, y = synthetic_data(n=128, num_sparse=3, vocab=300)
    model = SATrans(layout=layout, domain_cols=["domain"],
                    num_domains_list=[3], domain_att_layer_num=1,
                    att_head_num=2, meta_dnn_hidden_units=(16, 8),
                    l2_reg_embedding=1e-4)
    plan = bank_optimizer.make_eq_plan(model)
    params, _ = model.init(jax.random.PRNGKey(0))
    opt = optax.adam(0.01)
    opt_state = bank_optimizer.lazy_init(opt, params)
    batch = {k: jnp.asarray(v) for k, v in layout.batch_from_dict(x).items()}
    flat_ids = np.array(
        embeddings.bank_gather_plan(params["emb"], layout, batch))
    R = params["emb"]["bank"].shape[0]
    flat_ids[:8] = R + 5  # plant OOB ids (out-of-vocab data rows)
    flat_ids = jnp.asarray(flat_ids)
    rng = np.random.default_rng(0)
    g_rows = jnp.asarray(rng.normal(
        size=(flat_ids.shape[0],
              params["emb"]["bank"].shape[1])).astype(np.float32))
    g_rest = jax.tree.map(jnp.zeros_like,
                          bank_optimizer._split_bank(params)[0])

    for impl, use_plan in (("xla", True), ("interpret", True),
                           ("xla", False)):
        monkeypatch.setenv("SATRANS_SCATTER", impl)
        p, s = bank_optimizer.lazy_update(
            opt, params, opt_state, flat_ids, g_rows, g_rest,
            lr=0.01, l2=1e-4, eq_plan=plan if use_plan else None)
        last = np.asarray(s[1]["last"])
        mu = np.asarray(s[1]["mu"])
        bank = np.asarray(p["emb"]["bank"])
        # the clipped row R-1 was touched: bank/mu changed AND last advanced
        assert last[R - 1] == 1, (impl, use_plan)
        assert not np.array_equal(mu[R - 1],
                                  np.zeros_like(mu[R - 1])), (impl, use_plan)
        assert not np.array_equal(
            bank[R - 1], np.asarray(params["emb"]["bank"])[R - 1])


def _lazy_fixture():
    from satrans_tpu.train import bank_optimizer
    import optax

    cols = synthetic_columns(num_sparse=3, vocab=300, dim=8)
    layout = FeatureLayout(cols)
    x, y = synthetic_data(n=256, num_sparse=3, vocab=300)
    model = SATrans(layout=layout, domain_cols=["domain"],
                    num_domains_list=[3], domain_att_layer_num=1,
                    att_head_num=2, meta_dnn_hidden_units=(16, 8),
                    l2_reg_embedding=1e-4)
    params, _ = model.init(jax.random.PRNGKey(0))
    opt = optax.adam(0.01, b1=0.9, b2=0.999, eps=1e-8)
    batch = {k: jnp.asarray(v) for k, v in layout.batch_from_dict(x).items()}
    flat_ids = embeddings.bank_gather_plan(params["emb"], layout, batch)
    rng = np.random.default_rng(0)
    g_rows = jnp.asarray(rng.normal(
        size=(flat_ids.shape[0],
              params["emb"]["bank"].shape[1])).astype(np.float32))
    g_rest = jax.tree.map(jnp.zeros_like,
                          bank_optimizer._split_bank(params)[0])
    return bank_optimizer, model, params, opt, flat_ids, g_rows, g_rest


def test_lazy_update_pallas_gather_matches_xla(monkeypatch):
    """lazy_update reading bank/mu/nu rows through the row-DMA gather
    kernel (interpret) is bit-identical to the jnp.take path."""
    bank_optimizer, model, params, opt, flat_ids, g_rows, g_rest = \
        _lazy_fixture()
    opt_state = bank_optimizer.lazy_init(opt, params)
    monkeypatch.setenv("SATRANS_SCATTER", "xla")

    def run():
        return bank_optimizer.lazy_update(
            opt, params, opt_state, flat_ids, g_rows, g_rest,
            lr=0.01, l2=1e-4)

    monkeypatch.setenv("SATRANS_GATHER", "xla")
    p_x, s_x = run()
    monkeypatch.setenv("SATRANS_GATHER", "interpret")
    p_p, s_p = run()
    np.testing.assert_array_equal(np.asarray(p_x["emb"]["bank"]),
                                  np.asarray(p_p["emb"]["bank"]))
    for key in ("mu", "nu", "last"):
        np.testing.assert_array_equal(np.asarray(s_x[1][key]),
                                      np.asarray(s_p[1][key]))


def test_fused_update_pallas_gather_matches_xla(monkeypatch):
    bank_optimizer, model, params, opt, flat_ids, g_rows, g_rest = \
        _lazy_fixture()
    opt_state = opt.init(params)
    monkeypatch.setenv("SATRANS_SCATTER", "xla")

    def run():
        return bank_optimizer.fused_update(
            opt, params, opt_state, flat_ids, g_rows, g_rest,
            lr=0.01, l2=1e-4)

    monkeypatch.setenv("SATRANS_GATHER", "xla")
    p_x, s_x = run()
    monkeypatch.setenv("SATRANS_GATHER", "interpret")
    p_p, s_p = run()
    np.testing.assert_array_equal(np.asarray(p_x["emb"]["bank"]),
                                  np.asarray(p_p["emb"]["bank"]))


def test_default_row_gather_matches_take(monkeypatch):
    """The Trainer-injected single-device gather_fn == jnp.take (incl. the
    OOB clip both share)."""
    bank_optimizer, model, params, opt, flat_ids, g_rows, g_rest = \
        _lazy_fixture()
    bank = params["emb"]["bank"]
    monkeypatch.setenv("SATRANS_GATHER", "xla")
    assert bank_optimizer.default_row_gather() is None
    monkeypatch.setenv("SATRANS_GATHER", "interpret")
    fn = bank_optimizer.default_row_gather()
    ids = jnp.concatenate([flat_ids,
                           jnp.asarray([bank.shape[0] + 5], jnp.int32)])
    np.testing.assert_array_equal(
        np.asarray(fn(bank, ids)),
        np.asarray(jnp.take(bank, ids, axis=0, mode="clip")))


def test_forward_gather_interpret_matches_xla():
    """embeddings._gather_packed through the row-DMA kernel (interpret) ==
    the XLA indexing path, in a full model forward."""
    bank_optimizer, model, params, opt, flat_ids, g_rows, g_rest = \
        _lazy_fixture()
    cols = synthetic_columns(num_sparse=3, vocab=300, dim=8)
    layout = FeatureLayout(cols)
    x, _ = synthetic_data(n=64, num_sparse=3, vocab=300)
    batch = {k: jnp.asarray(v) for k, v in layout.batch_from_dict(x).items()}
    _, state = model.init(jax.random.PRNGKey(0))
    try:
        assert embeddings.set_forward_gather("xla") == "xla"
        want, _, _ = model.apply(params, state, batch)
        assert embeddings.set_forward_gather("interpret") == "interpret"
        got, _, _ = model.apply(params, state, batch)
    finally:
        embeddings.set_forward_gather("xla")
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


# ---------------------------------------------------------------------------
# round-5: stale-by-one commit pipeline (bank_update='lazy_stale')
# ---------------------------------------------------------------------------

def _stale_setup(n=512, vocab=400):
    from satrans_tpu.data.synthetic import synthetic_columns, synthetic_data
    cols = synthetic_columns(num_sparse=3, vocab=vocab, dim=8)
    layout = FeatureLayout(cols)
    model = SATrans(layout=layout, domain_cols=["domain"],
                    num_domains_list=[3], domain_att_layer_num=1,
                    att_head_num=2, meta_dnn_hidden_units=(16, 8),
                    l2_reg_embedding=1e-4, dropout_rate=0.0)
    x, y = synthetic_data(n=n, num_sparse=3, vocab=vocab, seed=5)
    return layout, model, x, y


def _fit_mode(model, x, y, mode, batch=128, scan_steps=1):
    tr = Trainer(model, seed=7, scan_unroll=1)
    tr.compile(learning_rate=0.01, bank_update=mode)
    tr.fit(x, y, batch_size=batch, epochs=1, shuffle=False, verbose=0,
           scan_steps=scan_steps)
    return tr


def test_lazy_stale_single_step_chunks_equal_lazy():
    """With scan chunks of ONE step, the pipeline degenerates to plain
    lazy exactly: the body commits the empty pending and the chunk-end
    flush commits the step's rows - same math, same order."""
    _, model, x, y = _stale_setup()
    tr_l = _fit_mode(model, x, y, "lazy", scan_steps=1)
    tr_s = _fit_mode(model, x, y, "lazy_stale", scan_steps=1)
    for k in ("bank", "small"):
        np.testing.assert_allclose(np.asarray(tr_s.params["emb"][k]),
                                   np.asarray(tr_l.params["emb"][k]),
                                   atol=1e-6, rtol=1e-5, err_msg=k)
    np.testing.assert_allclose(tr_s.predict(x, 128), tr_l.predict(x, 128),
                               atol=1e-5)


def test_lazy_stale_disjoint_batches_equal_lazy():
    """When consecutive batches touch DISJOINT embedding rows, a
    one-step-late commit is invisible (no read ever races a deferred
    write, and commit-time row values match), so stale == lazy exactly.
    This pins the pipeline's bookkeeping (pending threading, sentinel
    drops, trailing flush) without the staleness confound."""
    from satrans_tpu.data.synthetic import synthetic_columns
    cols = synthetic_columns(num_sparse=3, vocab=2000, dim=8)
    layout = FeatureLayout(cols)
    model = SATrans(layout=layout, domain_cols=["domain"],
                    num_domains_list=[3], domain_att_layer_num=1,
                    att_head_num=2, meta_dnn_hidden_units=(16, 8),
                    l2_reg_embedding=1e-4, dropout_rate=0.0)
    # 4 batches of 64; batch i draws ids from its OWN quarter of the vocab
    rng = np.random.default_rng(0)
    parts = []
    for i in range(4):
        lo, hi = 1 + i * 450, 1 + (i + 1) * 450
        parts.append({f"f{j}": rng.integers(lo, hi, 64) for j in range(2)})
        parts[-1]["f2"] = rng.integers(lo, hi, 64)
        parts[-1]["domain"] = rng.integers(1, 4, 64)
    x = {k: np.concatenate([p[k] for p in parts]) for k in parts[0]}
    y = rng.integers(0, 2, 256).astype(np.float32)
    # NOTE the domain column is shared across batches - its rows live in
    # the SIDE bank (vocab <= 256), which updates densely, not lazily
    tr_l = _fit_mode(model, x, y, "lazy", batch=64, scan_steps=4)
    tr_s = _fit_mode(model, x, y, "lazy_stale", batch=64, scan_steps=4)
    np.testing.assert_allclose(np.asarray(tr_s.params["emb"]["bank"]),
                               np.asarray(tr_l.params["emb"]["bank"]),
                               atol=1e-6, rtol=1e-5)


def test_lazy_stale_trains_and_stays_close():
    """Overlapping batches: stale is a real deviation - it must still
    LEARN like plain lazy (the deferred commit shifts each read by one
    step; convergence evidence at scale lives in
    bench/lazy_convergence.py --mode stale)."""
    from satrans_tpu.train import metrics

    _, model, x, y = _stale_setup(n=1024)

    def fit(mode):
        tr = Trainer(model, seed=7)
        tr.compile(learning_rate=0.01, bank_update=mode)
        tr.fit(x, y, batch_size=128, epochs=4, shuffle=False, verbose=0,
               scan_steps=4)
        return tr

    p_l = fit("lazy").predict(x, 256)
    p_s = fit("lazy_stale").predict(x, 256)
    assert np.isfinite(p_s).all()
    auc_l, auc_s = metrics.auc(y, p_l), metrics.auc(y, p_s)
    assert auc_s > 0.8, auc_s                 # actually learns
    assert abs(auc_s - auc_l) < 0.02, (auc_l, auc_s)
    corr = np.corrcoef(p_l, p_s)[0, 1]
    assert corr > 0.9, corr


def test_lazy_stale_rejects_mesh():
    mesh = jax.sharding.Mesh(np.array(jax.devices()), ("data",))
    _, model, _, _ = _stale_setup()
    tr = Trainer(model, mesh=mesh, shard_embeddings=True)
    tr.compile(bank_update="lazy_stale")
    tr._strategy = tr._resolve_strategy(None)
    with pytest.raises(ValueError, match="single-device"):
        tr._ensure_initialized()
